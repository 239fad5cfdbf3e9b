"""Sweep int8-path tile params for the 7B decode (M=1) qmm shapes.

The round-4 roofline table (PERF.md) shows the per-op %-of-bound spread:
wqkv 71% / wo 55% / gate|up 73% / w_down 63% / lm_head 78%. This sweep
asks whether different (tn, kc) choices close the weak shapes' gap —
deeper K-steps (fewer grid steps, larger DMAs) vs the current
~1M-element tk*tn heuristic.

Timing: hoist-proof in-scan slope (bench.py method). Gemv configs must
still be confirmed with a real-model tg256 run before changing defaults
(tune_qmm.py CAUTION note).

Usage: python -m tpulamm.tools.sweep_decode_shapes [shape ...]
  shapes: wqkv wo gateup wdown lmhead (default: wo wdown)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpulamm.gguf.constants import GGMLType
from tpulamm.ops.pallas_qmm import qmm_pallas
from tpulamm.ops.qtensor import QTensor
from tpulamm.quant import formats

SHAPES = {
    "wqkv": (12288, 4096),
    "wo": (4096, 4096),
    "gateup": (22016, 4096),
    "wdown": (4096, 11008),
    "lmhead": (32000, 4096),
}

# (tn, kc) candidates per shape: include the current dispatch choice and
# deeper/wider variants. kc*256 = tk.
CANDS = {
    "wqkv": [(None, None), (6144, 1), (4096, 1), (4096, 2), (2048, 2),
             (2048, 4), (3072, 2), (12288, 1)],
    "wo": [(None, None), (4096, 1), (4096, 2), (4096, 4), (2048, 2),
           (2048, 4), (2048, 8), (1024, 8), (1024, 16)],
    "gateup": [(None, None), (5504, 1), (5504, 2), (2752, 2), (2752, 4),
               (11008, 1), (22016, 1)],
    "wdown": [(None, None), (4096, 1), (4096, 2), (4096, 4), (2048, 2),
              (2048, 4), (2048, 8), (1024, 8)],
    # tn must be a multiple of 128 (kernel tile layout): use
    # multiple-of-128 divisors of 32000 (advisor r4 — 8000/4000/2000
    # always FAILed and added noise, not data)
    "lmhead": [(None, None), (6400, 1), (3200, 2), (1600, 4), (16000, 1),
               (32000, 1)],
}


def bench_one(x, qt, tn, kc, iters=(100, 1100), reps=7):
    def make(n_it):
        @jax.jit
        def loop(xin):
            def body(c, _):
                xx = xin.at[0, 0].add(c * jnp.float32(1e-20))
                out = qmm_pallas(xx, qt, tn=tn, kc=kc)
                return out.sum(), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_it)
            return c
        return loop

    try:
        l1, l2 = make(iters[0]), make(iters[1])
        l1(x).block_until_ready()
        l2(x).block_until_ready()
    except Exception as e:  # noqa: BLE001
        return None, str(e).splitlines()[0][:90]

    def t(loop):
        t0 = time.perf_counter()
        loop(x).block_until_ready()
        return time.perf_counter() - t0

    slopes = sorted(t(l2) - t(l1) for _ in range(reps))
    return slopes[len(slopes) // 2] / (iters[1] - iters[0]), None


def main():
    names = sys.argv[1:] or ["wo", "wdown"]
    rng = np.random.default_rng(0)
    for name in names:
        n, k = SHAPES[name]
        w = np.abs(rng.normal(size=(n, k))).astype(np.float32)
        qt = QTensor.from_gguf_raw(formats.quantize(w, GGMLType.Q4_0),
                                   GGMLType.Q4_0, (n, k), layout="mm")
        x = jnp.asarray(rng.normal(size=(1, k)).astype(np.float32) * 0.3)
        qbytes = sum(p.size * p.dtype.itemsize for p in qt.planes.values())
        print(f"== {name} N={n} K={k} packed={qbytes/1e6:.1f}MB "
              f"bound={qbytes/819e9*1e6:.1f}us", flush=True)
        for tn, kc in CANDS[name]:
            dt, err = bench_one(x, qt, tn, kc)
            tag = f"tn={tn} kc={kc}"
            if err:
                print(f"  {tag:18s} FAIL {err}", flush=True)
            else:
                print(f"  {tag:18s} {dt*1e6:7.1f}us {qbytes/dt/1e9:6.0f} "
                      f"GB/s {qbytes/819e9/dt*100:5.1f}%-of-bound",
                      flush=True)


if __name__ == "__main__":
    main()
