"""Pallas TPU kernels: fused dequantize + matmul over packed weight planes.

TPU-native replacement for the reference's LAMM GEMM kernels
(src/lamm_kernel_*.hpp, src/lamm_impl.hpp): where LAMM unpacks quant blocks
into LASX registers and does int8 dot products with 4x4 register tiling, these
kernels DMA packed planes from HBM into VMEM tiles, unpack a (256, TN) weight
tile with constant shifts/masks (layouts from quant/repack.py are designed so
no cross-lane shuffles are needed), apply per-group scales, and feed the MXU.

Weights never exist dequantized in HBM — per-token decode traffic stays at
the quantized byte count, which is what makes 4-bit decode fast (BASELINE.md
roofline note: decode is weight-streaming-bound).

Grid: (N/TN, K/256), K innermost; the f32 output block is resident in VMEM
across the K sweep and accumulates partial MXU products.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulamm.gguf.constants import GGMLType
from tpulamm.quant.repack import SPECS

TK = 256  # K-elements per grid step (one repack chunk)

# plane name order per format (must match the BlockSpec lists below)
PLANE_ORDER: dict[GGMLType, tuple[str, ...]] = {
    GGMLType.Q4_0: ("qs", "scales"),
    GGMLType.Q4_1: ("qs", "scales", "mins"),
    GGMLType.Q5_0: ("qs", "qh", "scales"),
    GGMLType.Q5_1: ("qs", "qh", "scales", "mins"),
    GGMLType.Q8_0: ("q8", "scales"),
    GGMLType.Q2_K: ("q2", "scales", "mins"),
}

# rows of each plane per TK=256 K-chunk
PLANE_ROWS = {"qs": 128, "qh": 32, "q2": 64, "q8": 256}


def _unpack_values(qtype: GGMLType, planes: dict[str, jnp.ndarray]) -> jnp.ndarray:
    """VMEM tiles -> (TK, TN) f32 integer values. Constant shifts only."""
    spec = SPECS[qtype]
    if spec.bits in (4, 5):
        v = planes["qs"][:].astype(jnp.int32)            # (128, TN)
        vals = jnp.concatenate([v & 0xF, (v >> 4) & 0xF], axis=0)
        if spec.bits == 5:
            h = planes["qh"][:].astype(jnp.int32)        # (32, TN)
            hb = jnp.concatenate([(h >> t) & 1 for t in range(8)], axis=0)
            vals = vals | (hb << 4)
        return vals.astype(jnp.float32)
    if spec.bits == 2:
        v = planes["q2"][:].astype(jnp.int32)            # (64, TN)
        vals = jnp.concatenate([(v >> (2 * t)) & 3 for t in range(4)], axis=0)
        return vals.astype(jnp.float32)
    if spec.bits == 8:
        return planes["q8"][:].astype(jnp.float32)       # (256, TN)
    raise ValueError(qtype)


def _make_kernel(qtype: GGMLType, compute_dtype, tn: int, n_k: int):
    spec = SPECS[qtype]
    names = PLANE_ORDER[qtype]
    groups = TK // spec.group

    def kernel(x_ref, *refs):
        plane_refs = dict(zip(names, refs[:-1]))
        out_ref = refs[-1]
        kstep = pl.program_id(1)

        vals = _unpack_values(qtype, plane_refs)          # (TK, TN) f32
        scales = plane_refs["scales"][:]                  # (groups, TN) f32
        w = vals.reshape(groups, spec.group, tn)
        w = (w - spec.zero) * scales[:, None, :]
        if spec.has_min:
            w = w + plane_refs["mins"][:][:, None, :]
        w = w.reshape(TK, tn).astype(compute_dtype)

        x = x_ref[:].astype(compute_dtype)                # (M, TK)
        part = jnp.dot(x, w, preferred_element_type=jnp.float32)

        @pl.when(kstep == 0)
        def _():
            out_ref[:] = part

        @pl.when(kstep > 0)
        def _():
            out_ref[:] = out_ref[:] + part

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("qtype", "n", "k", "tn", "compute_dtype",
                                    "interpret"))
def _qmm_call(x, planes: dict, *, qtype: GGMLType, n: int, k: int, tn: int,
              compute_dtype, interpret: bool):
    m = x.shape[0]
    spec = SPECS[qtype]
    names = PLANE_ORDER[qtype]
    groups = TK // spec.group
    n_k = k // TK

    in_specs = [pl.BlockSpec((m, TK), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)]
    for name in names:
        if name in PLANE_ROWS:
            rows = PLANE_ROWS[name]
        else:  # scales / mins
            rows = groups
        in_specs.append(pl.BlockSpec((rows, tn), lambda i, j: (j, i),
                                     memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((m, tn), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    qbytes = sum(p.size * p.dtype.itemsize for p in planes.values())
    cost = pl.CostEstimate(
        flops=2 * m * k * n,
        bytes_accessed=qbytes + m * k * 4 + m * n * 4,
        transcendentals=0,
    )

    kernel = _make_kernel(qtype, compute_dtype, tn, n_k)
    return pl.pallas_call(
        kernel,
        grid=(n // tn, n_k),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(x, *[planes[nm] for nm in names])


def qmm_pallas(x: jnp.ndarray, qt, *, compute_dtype=jnp.bfloat16,
               tn: int | None = None, interpret: bool = False) -> jnp.ndarray:
    """x: (M, K); qt: mm-layout QTensor (N, K) -> (M, N) f32."""
    n, k = qt.shape
    assert k % TK == 0, f"K={k} must be a multiple of {TK}"
    assert n % 128 == 0, f"N={n} must be a multiple of 128"
    if tn is None:
        tn = 256 if n % 256 == 0 else 128
    m = x.shape[0]
    # pad the batch dim to the f32 sublane quantum
    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = _qmm_call(x.astype(jnp.float32), qt.planes, qtype=qt.qtype, n=n,
                    k=k, tn=tn, compute_dtype=jnp.dtype(compute_dtype),
                    interpret=interpret)
    return out[:m]
