"""Fused dequant-matmul dispatch.

qmatmul(x, qt) computes x @ dequant(W).T for a mm-layout QTensor W of shape
(N, K): (..., K) -> (..., N). This is the TPU-native replacement for the
reference's lamm_mul_mat / ggml_compute_forward_mul_mat hot path
(src/loongarch_matmul.cpp:64-143, ggml.c:10736).

On TPU the Pallas kernels in ops.pallas_qmm keep the weights packed in HBM
and dequantize (256, TN) tiles in VMEM. On CPU (tests) or for unsupported
shapes we fall back to dequantize-then-dot, which XLA still fuses reasonably.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpulamm.ops.qtensor import QTensor, dequant_mm


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def qmatmul(x: jnp.ndarray, qt: QTensor, *, compute_dtype=jnp.bfloat16,
            impl: str | None = None) -> jnp.ndarray:
    """x: (..., K) activations; qt: (N, K) mm-layout QTensor -> (..., N) f32.

    impl: None = auto, "pallas", "ref".
    """
    assert qt.layout == "mm", "qmatmul needs an mm-layout QTensor"
    n, k = qt.mm_dims     # plane-derived: local dims inside shard_map
    lead = x.shape[:-1]
    xm = x.reshape(-1, k)

    if impl is None:
        impl = "pallas" if _use_pallas() else "ref"
    if impl == "pallas" and (n % 128 != 0 or k % 256 != 0):
        impl = "ref"      # shard too small to tile (tiny tp shards)
    if impl == "pallas":
        from tpulamm.ops.pallas_qmm import qmm_pallas
        out = qmm_pallas(xm, qt, compute_dtype=compute_dtype)
    else:
        w = dequant_mm(qt, dtype=compute_dtype)            # (K, N)
        out = jnp.dot(xm.astype(compute_dtype), w,
                      preferred_element_type=jnp.float32)
    return out.reshape(*lead, n)


def dense_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x (..., K) @ w (N, K) -> (..., N) for unquantized (F32/F16) weights."""
    return jnp.dot(x.astype(w.dtype), w.T,
                   preferred_element_type=jnp.float32)
