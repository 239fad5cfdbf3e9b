"""Sweep qmm kernel tile parameters on the attached TPU.

Usage: python -m tpulamm.tools.tune_qmm [qtype] [M] [N] [K]

Timing is the hoist-proof on-device scan SLOPE (bench.py method): the
kernel runs inside lax.scan with a data dependence so nothing can be
hoisted or dead-coded, and the per-iteration time is the slope between a
short and a long scan — immune to the tunneled transport's per-dispatch
floor.

CAUTION (round-1/2 lesson, PERF.md): isolated wins do NOT always transfer
to the real model scan — gemv-regime configs especially must be confirmed
with an in-scan tg256 measurement before changing defaults.
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


def bench_one(x, qt, m, n, k, tn, kc, compute_dtype, iters=(5, 45)):
    def make(n_it):
        @jax.jit
        def loop(xin):
            def body(c, _):
                xx = xin.at[0, 0].add(
                    (c * jnp.bfloat16(1e-20)).astype(xin.dtype))
                out = qmm_pallas(xx, qt, tn=tn, kc=kc,
                                 compute_dtype=compute_dtype)
                return out.sum(), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_it)
            return c
        return loop

    try:
        l1, l2 = make(iters[0]), make(iters[1])
        l1(x).block_until_ready()
        l2(x).block_until_ready()
    except Exception as e:  # noqa: BLE001
        return None, str(e).splitlines()[0][:100]

    def t(loop):
        t0 = time.perf_counter()
        loop(x).block_until_ready()
        return time.perf_counter() - t0

    slopes = sorted(t(l2) - t(l1) for _ in range(5))
    return slopes[len(slopes) // 2] / (iters[1] - iters[0]), None


def main():
    qname = sys.argv[1] if len(sys.argv) > 1 else "q4_0"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 11008
    qtype = getattr(GGMLType, qname.upper())
    rng = np.random.default_rng(0)
    w = np.abs(rng.normal(size=(n, k))).astype(np.float32)
    qt = QTensor.from_gguf_raw(formats.quantize(w, qtype), qtype, (n, k),
                               layout="mm")
    x = jnp.asarray(np.abs(rng.normal(size=(m, k))).astype(np.float32),
                    jnp.bfloat16)

    flops = 2.0 * m * k * n
    qbytes = sum(p.size * p.dtype.itemsize for p in qt.planes.values())
    print(f"M={m} K={k} N={n} {qname} packed={qbytes / 1e6:.1f}MB "
          f"BW floor @819GB/s = {qbytes / 819e9 * 1e6:.0f}us")

    for tn in (256, 512, 1024, 2048):
        if n % tn:
            continue
        for kc in (1, 2, 4, 8):
            for cd in (jnp.float32, jnp.bfloat16):
                dt, err = bench_one(x, qt, m, n, k, tn, kc, cd)
                tag = f"tn={tn:5d} kc={kc} {jnp.dtype(cd).name:9s}"
                if err:
                    print(f"{tag} FAIL {err}")
                else:
                    print(f"{tag} {dt * 1e6:8.1f}us "
                          f"{flops / dt / 1e12:7.1f} TFLOPS "
                          f"{qbytes / dt / 1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
