"""Sweep qmm kernel tile parameters on the attached TPU.

Usage: python -m tpulamm.tools.tune_qmm [qtype] [M]
"""

import itertools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpulamm.gguf.constants import GGMLType
from tpulamm.ops.pallas_qmm import qmm_pallas
from tpulamm.ops.qtensor import QTensor
from tpulamm.quant import formats


def bench_one(x, qt, tn, kc, xdtype, iters=20):
    xd = jnp.asarray(x, dtype=xdtype)
    try:
        out = qmm_pallas(xd, qt, tn=tn, kc=kc).block_until_ready()
    except Exception as e:
        return None, str(e).splitlines()[0][:100]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = qmm_pallas(xd, qt, tn=tn, kc=kc)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt, None


def main():
    qname = sys.argv[1] if len(sys.argv) > 1 else "q4_0"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    qtype = getattr(GGMLType, qname.upper())
    N, K = 4096, 11008
    rng = np.random.default_rng(0)
    w = np.abs(rng.normal(size=(N, K))).astype(np.float32)
    raw = formats.quantize(w, qtype)
    qt = QTensor.from_gguf_raw(raw, qtype, (N, K), layout="mm")
    x = np.abs(rng.normal(size=(m, K))).astype(np.float32)

    flops = 2.0 * m * K * N
    qbytes = sum(p.size * p.dtype.itemsize for p in qt.planes.values())
    print(f"M={m} K={K} N={N} {qname} packed={qbytes/1e6:.1f}MB "
          f"BW-bound floor @819GB/s = {qbytes/819e9*1e6:.0f}us")

    for tn, kc, xd in itertools.product((256, 512, 1024), (1, 2, 4),
                                        ("float32", "bfloat16")):
        if N % tn or (K // 256) % kc:
            continue
        dt, err = bench_one(x, qt, tn, kc, jnp.dtype(xd))
        if err:
            print(f"tn={tn:5d} kc={kc} x={xd:9s} FAIL {err}")
        else:
            print(f"tn={tn:5d} kc={kc} x={xd:9s} {dt*1e6:8.1f}us "
                  f"{flops/dt/1e9:9.1f} GFLOPS  {qbytes/dt/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
