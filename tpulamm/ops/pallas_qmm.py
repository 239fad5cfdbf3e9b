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
    # Q2_K keeps its sub-scales COMPACT in HBM (raw scale bytes + fp16
    # d/dmin bits, decoded in-kernel): dense f32 per-16 scale/min planes
    # cost 0.5 B/elem on top of the 0.25 B/elem crumbs — 2.3x the format's
    # file size, which is exactly the capacity Q2_K exists to save
    GGMLType.Q2_K: ("q2", "scd", "dm"),
}

# rows of each plane per TK=256 K-chunk
PLANE_ROWS = {"qs": 128, "qh": 32, "q2": 64, "q8": 256, "scd": 16, "dm": 8}


def _f16_decode(u16: jnp.ndarray) -> jnp.ndarray:
    """uint16 raw fp16 bits -> f32, with integer ops only.

    Mosaic has no f16 vector type, so the fp16 scale planes cross the
    kernel boundary bitcast to uint16 and are decoded here: widen to i32,
    rebuild the f32 bit pattern (exponent rebias +112, mantissa << 13),
    and handle zero/subnormal inputs as exact small floats. Inf/NaN cannot
    occur (quant scales are finite by construction)."""
    w = u16.astype(jnp.int32)
    sign = (w >> 15) & 1
    exp = (w >> 10) & 0x1F
    mant = w & 0x3FF
    bits = (sign << 31) | ((exp + 112) << 23) | (mant << 13)
    normal = pltpu.bitcast(bits, jnp.float32)
    tiny = mant.astype(jnp.float32) * jnp.float32(5.960464477539063e-08)
    tiny = jnp.where(sign == 1, -tiny, tiny)
    return jnp.where(exp == 0, tiny, normal)


def _load_scales(ref) -> jnp.ndarray:
    """Scale/min plane ref -> f32 tile (planes are u16-bitcast fp16 or
    f32)."""
    v = ref[:]
    if v.dtype == jnp.uint16:
        return _f16_decode(v)
    return v.astype(jnp.float32)


def _group_scales(qtype: GGMLType, plane_refs: dict, kc: int, tn: int):
    """-> (scales (groups, tn) f32, mins (groups, tn) f32 | None).

    Q2_K decodes its compact planes here: scale = d * (scd & 0xF),
    min = -dmin * (scd >> 4) — per-GROUP work (1/16 element density), so
    the decode is cheap while the HBM stream stays at the format's own
    byte count. Other formats read their dense scale/min planes."""
    if qtype == GGMLType.Q2_K:
        scd = plane_refs["scd"][:].astype(jnp.int32)      # (16kc, tn)
        dm = _f16_decode(plane_refs["dm"][:])             # (8kc, tn)
        dm3 = dm.reshape(kc, 8, tn)
        d = dm3[:, :1, :]                                 # (kc, 1, tn)
        dmin = dm3[:, 1:2, :]
        sc3 = scd.reshape(kc, 16, tn)
        scales = (sc3 & 0xF).astype(jnp.float32) * d
        mins = (sc3 >> 4).astype(jnp.float32) * (-dmin)
        return scales.reshape(kc * 16, tn), mins.reshape(kc * 16, tn)
    scales = _load_scales(plane_refs["scales"])
    mins = (_load_scales(plane_refs["mins"])
            if "mins" in plane_refs else None)
    return scales, mins


def _unpack_values(qtype: GGMLType, planes: dict[str, jnp.ndarray],
                   kc: int, tn: int, idtype=jnp.int32) -> jnp.ndarray:
    """VMEM tiles covering kc 256-element K-chunks -> (kc*256, TN) values.

    Constant shifts only; the per-chunk interleave is a sublane concat.
    idtype: integer width for the unpack arithmetic (int32 = reference path).
    """
    spec = SPECS[qtype]
    if spec.bits in (4, 5):
        v = planes["qs"][:].astype(idtype).reshape(kc, 128, tn)
        vals = jnp.concatenate([v & 0xF, (v >> 4) & 0xF], axis=1)
        if spec.bits == 5:
            # build the 5th bit directly at position 4: the shifts/masks
            # run on the 1/8-size qh plane instead of a full-width << 4
            h4 = (planes["qh"][:].astype(idtype) << 4).reshape(kc, 32, tn)
            hb4 = jnp.concatenate([(h4 >> t) & 16 for t in range(8)],
                                  axis=1)
            vals = vals | hb4
        return vals.reshape(kc * 256, tn)
    if spec.bits == 2:
        v = planes["q2"][:].astype(idtype).reshape(kc, 64, tn)
        vals = jnp.concatenate([(v >> (2 * t)) & 3 for t in range(4)], axis=1)
        return vals.reshape(kc * 256, tn)
    if spec.bits == 8:
        return planes["q8"][:]                           # (kc*256, TN) int8
    raise ValueError(qtype)


def _unpack_values_i8(qtype: GGMLType, planes: dict[str, jnp.ndarray],
                      kc: int, tn: int) -> jnp.ndarray:
    """Fast unpack -> (kc*256, TN) int8 values, full VPU register density.

    Mosaic cannot shift narrow integer vectors, so per-byte shifts are done in
    the packed-int32 domain: bitcast 4 bytes -> i32, shift, mask with a
    replicated per-byte constant, bitcast back. Byte positions are untouched
    by construction, so the (unknown) sublane packing order of the bitcast
    cancels out. This is the TPU analogue of the reference's LASX nibble
    tricks (lamm_simd_loongarch.h load_quants :267, spread_bits :220).
    """
    spec = SPECS[qtype]

    def per_byte(v_u8, shift: int, byte_mask: int, post_shift: int = 0):
        w = pltpu.bitcast(v_u8, jnp.int32)
        w = (w >> shift) & jnp.int32(byte_mask * 0x01010101)
        if post_shift:
            w = w << post_shift
        return pltpu.bitcast(w, jnp.int8)

    if spec.bits in (4, 5):
        v = planes["qs"][:]                              # (kc*128, TN) u8
        lo = (v & 0xF).astype(jnp.int8).reshape(kc, 128, tn)
        hi = per_byte(v, 4, 0x0F).reshape(kc, 128, tn)
        vals = jnp.concatenate([lo, hi], axis=1)         # (kc, 256, TN) i8
        vals = vals.reshape(kc * 256, tn)
        if spec.bits == 5:
            h = planes["qh"][:]                          # (kc*32, TN) u8
            hb = jnp.concatenate(
                [per_byte(h, t, 0x01, 4).reshape(kc, 32, tn)
                 for t in range(8)], axis=1)             # bit at position 4
            hb = hb.reshape(kc * 256, tn)
            # i8 arithmetic is unsupported; OR the disjoint bit planes in the
            # packed-i32 domain
            vals = pltpu.bitcast(
                pltpu.bitcast(vals, jnp.int32) | pltpu.bitcast(hb, jnp.int32),
                jnp.int8)
        return vals.reshape(kc * 256, tn)
    if spec.bits == 2:
        v = planes["q2"][:]                              # (kc*64, TN) u8
        vals = jnp.concatenate(
            [per_byte(v, 2 * t, 0x03).reshape(kc, 64, tn) for t in range(4)],
            axis=1)
        return vals.reshape(kc * 256, tn)
    if spec.bits == 8:
        return planes["q8"][:]
    raise ValueError(qtype)


def _quantize_acts(xm: jnp.ndarray, ga: int):
    """Per-group symmetric int8 activation quantization (XLA prologue).

    The reference quantizes activations to Q8_0/Q8_1/Q8_K per 32/256-group
    before every integer vec_dot (ggml.c:10867-10886 INIT phase; type map
    ggml.c:458-778 vec_dot_type column). TPU analogue: qx int8 codes with a
    per-(row, group) f32 scale, plus the EXACT per-group activation sums
    (f32, pre-quantization) used for the zero/min correction term — the
    correction therefore carries no activation-quantization error at all
    (better than the reference's integer bsums).

    Returns (qxT (G, M, ga) int8, sxT (G, M) f32, gsumT (G, M) f32) — all
    group-major so every VMEM block has M (block == array dim) on the lane
    axis.
    """
    m, k = xm.shape
    g = k // ga
    xg = xm.astype(jnp.float32).reshape(m, g, ga)
    amax = jnp.max(jnp.abs(xg), axis=-1)
    s = amax * jnp.float32(1.0 / 127.0)
    s_safe = jnp.where(s > 0, s, jnp.float32(1.0))
    qx = jnp.clip(jnp.round(xg / s_safe[..., None]), -127, 127)
    qxT = qx.astype(jnp.int8).transpose(1, 0, 2)
    return qxT, s_safe.T, xg.sum(-1).T


def _make_int8_kernel(qtype: GGMLType, tn: int, kc: int, k_total: int):
    """int8 x int8 MXU dequant-dot kernel (decode/gemv regime).

    Structure (the reference's vec_dot architecture, MXU-shaped):
      out[m,n] = sum_g sx[m,g] * sw[g,n] * idot[g,m,n]
               + gsum[m,:] @ (min[g,n] - zero*sw[g,n])
    where idot is a per-group int8xint8 -> i32 batched MXU dot of depth
    `group` (32; 16 for Q2_K). Weights are never widened past int8 on the
    VPU — the per-element scale FMA of the f32 path becomes per-GROUP plane
    math at M/group density, which is what this path buys in the
    VPU-unpack-bound decode regime (PERF.md Decode floor).
    """
    spec = SPECS[qtype]
    names = PLANE_ORDER[qtype]
    tk = kc * TK
    gw = spec.group
    groups = tk // gw
    has_tail = k_total % tk != 0
    corr = spec.zero != 0 or spec.has_min

    def kernel(qx_ref, sx_ref, *refs):
        if corr:
            gsum_ref, refs = refs[0], refs[1:]
        plane_refs = dict(zip(names, refs[:-1]))
        out_ref = refs[-1]
        kstep = pl.program_id(1)

        def tail_mask(arr, axis: int):
            """Zero group-rows past K (tail block of the cdiv grid); every
            term below is killed through a masked factor, and int garbage
            can't be NaN, so the masked products are exact zeros."""
            if not has_tail:
                return arr
            gr = (jax.lax.broadcasted_iota(jnp.int32, arr.shape, axis)
                  + kstep * groups)
            return jnp.where(gr * gw < k_total, arr, 0)

        sw_raw, mins_raw = _group_scales(qtype, plane_refs, kc, tn)
        sw = tail_mask(sw_raw, 0)                              # (groups, tn)
        qv = _unpack_values_i8(qtype, plane_refs, kc, tn)      # (tk, tn) i8
        qv3 = qv.reshape(groups, gw, tn)
        idot = jax.lax.dot_general(
            qx_ref[:], qv3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                  # (groups, M, tn)
        sx = tail_mask(sx_ref[:], 0)                           # (groups, M)
        part = jnp.sum(idot.astype(jnp.float32) * sw[:, None, :]
                       * sx[:, :, None], axis=0)               # (M, tn)
        if corr:
            off = -spec.zero * sw
            if spec.has_min:
                off = off + tail_mask(mins_raw, 0)
            g = tail_mask(gsum_ref[:], 0)                      # (groups, M)
            part = part + jax.lax.dot_general(
                g, off, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(kstep == 0)
        def _():
            out_ref[:] = part

        @pl.when(kstep > 0)
        def _():
            out_ref[:] = out_ref[:] + part

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("qtype", "n", "k", "tn", "kc",
                                    "interpret"))
def _qmm_int8_call(x, planes: dict, *, qtype: GGMLType, n: int, k: int,
                   tn: int, kc: int, interpret: bool):
    planes = {nm: (jax.lax.bitcast_convert_type(p, jnp.uint16)
                   if p.dtype == jnp.float16 else p)
              for nm, p in planes.items()}
    spec = SPECS[qtype]
    corr = spec.zero != 0 or spec.has_min
    m_pad = max(8, -(-x.shape[0] // 8) * 8)
    if m_pad != x.shape[0]:
        x = jnp.pad(x.astype(jnp.float32), ((0, m_pad - x.shape[0]), (0, 0)))
    m = m_pad
    qxT, sxT, gsum = _quantize_acts(x, spec.group)
    names = PLANE_ORDER[qtype]
    tk = kc * TK
    groups = tk // spec.group
    n_k = pl.cdiv(k, tk)

    in_specs = [
        pl.BlockSpec((groups, m, spec.group), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((groups, m), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [qxT, sxT]
    if corr:
        in_specs.append(pl.BlockSpec((groups, m), lambda i, j: (j, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(gsum)
    for name in names:
        if name in PLANE_ROWS:
            rows = PLANE_ROWS[name] * kc
        else:  # scales / mins
            rows = groups
        in_specs.append(pl.BlockSpec((rows, tn), lambda i, j: (j, i),
                                     memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((m, tn), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    qbytes = sum(p.size * p.dtype.itemsize for p in planes.values())
    cost = pl.CostEstimate(
        flops=2 * m * k * n,
        bytes_accessed=qbytes + m * k + m * n * 4,
        transcendentals=0,
    )
    kernel = _make_int8_kernel(qtype, tn, kc, k)
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
    )(*inputs, *[planes[nm] for nm in names])


def _make_int8_kernel_inkq(qtype: GGMLType, tn: int, kc: int,
                           k_total: int, m: int):
    """int8 dequant-dot with IN-KERNEL activation quantization.

    The XLA prologue (_quantize_acts) costs ~3 us per qmm call in the
    decode regime (measured, tools/decode_roofline) — transposes + small
    fused kernels whose launch floors rival the whole gemv. Here x
    arrives TRANSPOSED (k, m) so the group split is a pure sublane
    reshape, and quantization (group amax -> scale -> int8 codes) runs on
    the VPU inside the same launch that streams the weights; its cost is
    O(m*tk), ~tn times smaller than the weight unpack it shares the
    kernel with."""
    spec = SPECS[qtype]
    names = PLANE_ORDER[qtype]
    tk = kc * TK
    gw = spec.group
    groups = tk // gw
    g_all = -(-k_total // gw)         # total groups (k padded to tk grid)
    g_pad = pl.cdiv(k_total, tk) * groups
    has_tail = k_total % tk != 0
    corr = spec.zero != 0 or spec.has_min

    def kernel(xt_ref, *refs):
        plane_refs = dict(zip(names, refs[:-1 - (3 if corr else 2)]))
        out_ref = refs[-1 - (3 if corr else 2)]
        qx_scr, sx_scr = refs[-(3 if corr else 2):][:2]
        gs_scr = refs[-1] if corr else None
        tile = pl.program_id(0)
        kstep = pl.program_id(1)

        def tail_mask(arr, axis: int):
            if not has_tail:
                return arr
            gr = (jax.lax.broadcasted_iota(jnp.int32, arr.shape, axis)
                  + kstep * groups)
            return jnp.where(gr * gw < k_total, arr, 0)

        # -- in-kernel activation quant (reference INIT phase,
        #    ggml.c:10867-10886): ONCE per call at the first grid step,
        #    fully vectorized over all k/gw groups into scratch; every
        #    grid step then only reads its (groups, gw, m) slice. Gemv
        #    grid steps are 1-3 us floor-bound — per-step quant ops there
        #    measured an 8% tg256 regression, one-shot scratch does not.
        @pl.when((tile == 0) & (kstep == 0))
        def _quant():
            xall = xt_ref[pl.ds(0, g_all * gw), :]
            xb = xall.reshape(g_all, gw, m)                # (G, gw, m)
            amax = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
            s = amax * jnp.float32(1.0 / 127.0)
            s_safe = jnp.where(s > 0, s, jnp.float32(1.0))
            q = jnp.clip(jnp.round(xb / s_safe), -127, 127)
            qx_scr[pl.ds(0, g_all)] = q.astype(jnp.int8)
            sx_scr[pl.ds(0, g_all)] = s_safe.reshape(g_all, m)
            if corr:
                gs_scr[pl.ds(0, g_all)] = xb.sum(axis=1)
            if g_pad > g_all:                              # tail groups
                qx_scr[pl.ds(g_all, g_pad - g_all)] = jnp.zeros(
                    (g_pad - g_all, gw, m), jnp.int8)
                sx_scr[pl.ds(g_all, g_pad - g_all)] = jnp.zeros(
                    (g_pad - g_all, m), jnp.float32)
                if corr:
                    gs_scr[pl.ds(g_all, g_pad - g_all)] = jnp.zeros(
                        (g_pad - g_all, m), jnp.float32)

        q = qx_scr[pl.ds(kstep * groups, groups)]          # (g, gw, m)
        sw_raw, mins_raw = _group_scales(qtype, plane_refs, kc, tn)
        sw = tail_mask(sw_raw, 0)                          # (g, tn)
        qv = _unpack_values_i8(qtype, plane_refs, kc, tn)      # (tk, tn)
        qv3 = qv.reshape(groups, gw, tn)
        idot = jax.lax.dot_general(
            q, qv3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)              # (g, m, tn)
        sx = sx_scr[pl.ds(kstep * groups, groups)]         # (g, m)
        part = jnp.sum(idot.astype(jnp.float32) * sw[:, None, :]
                       * sx[:, :, None], axis=0)           # (m, tn)
        if corr:
            off = -spec.zero * sw
            if spec.has_min:
                off = off + tail_mask(mins_raw, 0)
            gsum = gs_scr[pl.ds(kstep * groups, groups)]   # (g, m)
            part = part + jax.lax.dot_general(
                gsum, off, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(kstep == 0)
        def _():
            out_ref[:] = part

        @pl.when(kstep > 0)
        def _():
            out_ref[:] = out_ref[:] + part

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("qtype", "n", "k", "tn", "kc",
                                    "interpret"))
def _qmm_int8_call_inkq(x, planes: dict, *, qtype: GGMLType, n: int,
                        k: int, tn: int, kc: int, interpret: bool):
    planes = {nm: (jax.lax.bitcast_convert_type(p, jnp.uint16)
                   if p.dtype == jnp.float16 else p)
              for nm, p in planes.items()}
    spec = SPECS[qtype]
    m_pad = max(8, -(-x.shape[0] // 8) * 8)
    if m_pad != x.shape[0]:
        x = jnp.pad(x.astype(jnp.float32), ((0, m_pad - x.shape[0]), (0, 0)))
    m = m_pad
    xt = x.astype(jnp.float32).T                           # (k, m)
    names = PLANE_ORDER[qtype]
    tk = kc * TK
    groups = tk // spec.group
    n_k = pl.cdiv(k, tk)
    g_pad = n_k * groups
    corr = spec.zero != 0 or spec.has_min

    # x stays fully VMEM-resident (k*m*4 <= ~350KB at decode sizes): the
    # one-shot quant at grid step (0,0) needs every group at once
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    for name in names:
        if name in PLANE_ROWS:
            rows = PLANE_ROWS[name] * kc
        else:  # scales / mins
            rows = groups
        in_specs.append(pl.BlockSpec((rows, tn), lambda i, j: (j, i),
                                     memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((m, tn), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((g_pad, spec.group, m), jnp.int8),
               pltpu.VMEM((g_pad, m), jnp.float32)]
    if corr:
        scratch.append(pltpu.VMEM((g_pad, m), jnp.float32))
    qbytes = sum(p.size * p.dtype.itemsize for p in planes.values())
    cost = pl.CostEstimate(
        flops=2 * m * k * n,
        bytes_accessed=qbytes + m * k * 4 + m * n * 4,
        transcendentals=0,
    )
    kernel = _make_int8_kernel_inkq(qtype, tn, kc, k, m)
    return pl.pallas_call(
        kernel,
        grid=(n // tn, n_k),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # NOT ("parallel", ...): the quant scratch is written at grid
            # step (0,0) and read by every later step, so a megacore
            # split over the N tiles would read uninitialized scratch
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(xt, *[planes[nm] for nm in names])


def _make_kernel(qtype: GGMLType, compute_dtype, tn: int, kc: int,
                 k_total: int):
    spec = SPECS[qtype]
    names = PLANE_ORDER[qtype]
    tk = kc * TK
    groups = tk // spec.group
    # K need not divide tk (cdiv grid): the tail block is masked in-kernel.
    # This matters: flagship shapes like K=11008 have a PRIME 43-chunk
    # count, which forced kc=1 (43 grid steps) before.
    has_tail = k_total % tk != 0

    # "fast" = packed-i32 per-byte unpack (0.5 VPU ops/elem) + single
    # widening convert + one FMA; default for bf16 compute.
    # TPULAMM_I8_UNPACK=1 also routes f32 compute through it (hybrid
    # experiment: packed unpack, f32 FMA+MXU).
    import os
    fast = (compute_dtype == jnp.bfloat16
            or bool(os.environ.get("TPULAMM_I8_UNPACK")))

    def kernel(x_ref, *refs):
        plane_refs = dict(zip(names, refs[:-1]))
        out_ref = refs[-1]
        kstep = pl.program_id(1)

        def tail_mask_groups(arr):
            """Zero scale/min GROUP rows past K (tail block of the cdiv
            grid). Masking the (groups, tn) planes makes the dequantized
            weights exact zeros at ~1/group the cost of masking the full
            (tk, tn) tile — and the unpacked int values plus the decoded
            scales are always finite, so no NaN can leak through the
            zeros. Group rows align with K because k % group == 0."""
            if not has_tail:
                return arr
            g_row = (jax.lax.broadcasted_iota(jnp.int32, (groups, tn), 0)
                     + kstep * groups)
            return jnp.where(g_row * spec.group < k_total, arr, 0)

        sw_raw, mins_raw = _group_scales(qtype, plane_refs, kc, tn)
        if fast:
            # int8-density unpack; single widening convert; fold the constant
            # zero-point into the per-group offset so dequant is one FMA:
            # w = q*s + (m - zero*s)
            vals = _unpack_values_i8(qtype, plane_refs, kc, tn)
            q = vals.astype(compute_dtype).reshape(groups, spec.group, tn)
            # scale planes are fp16-as-u16 (Q2_K: decoded compact planes);
            # fold the offset in f32
            s = tail_mask_groups(sw_raw)
            off = -spec.zero * s
            if spec.has_min:
                off = off + tail_mask_groups(mins_raw)
            w = q * s.astype(compute_dtype)[:, None, :] \
                + off.astype(compute_dtype)[:, None, :]
            w = w.reshape(tk, tn)
        else:
            vals = _unpack_values(qtype, plane_refs, kc, tn, jnp.int32)
            scales = tail_mask_groups(sw_raw)
            w = vals.astype(jnp.float32).reshape(groups, spec.group, tn)
            w = (w - spec.zero) * scales[:, None, :]
            if spec.has_min:
                w = w + tail_mask_groups(mins_raw)[:, None, :]
            w = w.reshape(tk, tn).astype(compute_dtype)

        x = x_ref[:].astype(compute_dtype)                # (M, tk)
        if has_tail:
            # x's K overhang may be NaN (undefined OOB reads): mask the
            # small (M, tk) slab so 0-weight columns stay 0
            kcol = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
                    + kstep * tk)
            x = jnp.where(kcol < k_total, x, 0)
        part = jnp.dot(x, w, preferred_element_type=jnp.float32)

        @pl.when(kstep == 0)
        def _():
            out_ref[:] = part

        @pl.when(kstep > 0)
        def _():
            out_ref[:] = out_ref[:] + part

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("qtype", "n", "k", "tn", "kc",
                                    "compute_dtype", "interpret"))
def _qmm_call(x, planes: dict, *, qtype: GGMLType, n: int, k: int, tn: int,
              kc: int, compute_dtype, interpret: bool):
    # Mosaic has no f16: hand fp16 scale planes to the kernel as raw u16
    # bits (free bitcast; decoded in-kernel by _f16_decode)
    planes = {nm: (jax.lax.bitcast_convert_type(p, jnp.uint16)
                   if p.dtype == jnp.float16 else p)
              for nm, p in planes.items()}
    # pad the batch dim to the sublane quantum inside the jit so a decode
    # step costs a single dispatch
    quantum = 16 if x.dtype == jnp.bfloat16 else 8
    m_pad = max(quantum, -(-x.shape[0] // quantum) * quantum)
    if m_pad != x.shape[0]:
        x = jnp.pad(x, ((0, m_pad - x.shape[0]), (0, 0)))
    m = x.shape[0]
    spec = SPECS[qtype]
    names = PLANE_ORDER[qtype]
    tk = kc * TK
    groups = tk // spec.group
    n_k = pl.cdiv(k, tk)          # tail block masked in-kernel

    in_specs = [pl.BlockSpec((m, tk), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)]
    for name in names:
        if name in PLANE_ROWS:
            rows = PLANE_ROWS[name] * kc
        else:  # scales / mins
            rows = groups
        in_specs.append(pl.BlockSpec((rows, tn), lambda i, j: (j, i),
                                     memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((m, tn), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    qbytes = sum(p.size * p.dtype.itemsize for p in planes.values())
    cost = pl.CostEstimate(
        flops=2 * m * k * n,
        bytes_accessed=qbytes + m * k * x.dtype.itemsize + m * n * 4,
        transcendentals=0,
    )

    kernel = _make_kernel(qtype, compute_dtype, tn, kc, k)
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
               tn: int | None = None, kc: int | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """x: (M, K); qt: mm-layout QTensor (N, K) -> (M, N) f32.

    tn: output tile width; kc: number of 256-element K-chunks per grid step.
    """
    n, k = qt.mm_dims     # plane-derived: local dims inside shard_map
    assert k % TK == 0, f"K={k} must be a multiple of {TK}"
    if n % 128 != 0:
        # hard error (not assert): under python -O a 128-non-multiple N
        # would silently leave remainder output columns unwritten.
        raise ValueError(f"N={n} must be a multiple of 128")
    m = x.shape[0]
    # An explicit f32 request (exactness/KL workflows: imatrix, finetune,
    # --compute-dtype float32) means exact dequant dots — it must also
    # opt the call out of the int8 quantized-activation path below.
    explicit_f32 = jnp.dtype(compute_dtype) == jnp.float32
    if m <= 16:
        # decode (gemv) regime: f32 unpack wins over the bf16 i8-trick path
        # for tiny M, with the same wide tiles as large M. Measured IN-SCAN
        # on a 1.1B Q4_0 model on v5e: 1024/f32 335 tok/s, 512/f32 326,
        # 256/f32 278, 1024/bf16 243 (isolated-dispatch sweeps are
        # transport-dominated and misleading — always tune in-scan).
        # TPULAMM_GEMV_BF16=1 flips this for in-scan re-measurement.
        import os
        compute_dtype = (jnp.bfloat16 if os.environ.get("TPULAMM_GEMV_BF16")
                         else jnp.float32)
    else:
        # matmul regime: f32 compute is the measured default on v5e —
        # the MXU runs bf16 passes on f32 inputs at DEFAULT precision
        # (same arithmetic), while the VPU dequant avoids Mosaic's
        # expensive 16-bit-target converts (i8->bf16 lane packing).
        # bench.py flagship shape: bf16 67.5 -> f32 116.6 TFLOPS.
        # TPULAMM_MM_BF16=1 reverts for A/B.
        import os
        if not os.environ.get("TPULAMM_MM_BF16"):
            compute_dtype = jnp.float32
    quantum = 16 if compute_dtype == jnp.bfloat16 else 8
    m_pad = max(quantum, -(-m // quantum) * quantum)
    wb = 4 if compute_dtype == jnp.float32 else 2

    def vmem_ok(tn_, kc_):
        # keep the dequant intermediates + resident out block + x slab
        # under the 16MB scoped-VMEM stack (the compiler OOMs otherwise).
        # bf16 path: i8 vals (1B) + widened q (2B) + w (2B) = 5B/elem;
        # f32 path: i32 vals + f32 + w = 12B/elem.
        tk = kc_ * TK
        # Mosaic fuses most of the dequant chain, so live VMEM is well
        # under naive op-count estimates: ~5 B/elem for the bf16 path
        # (i8 vals + bf16 q + w) and ~6 B/elem for f32 (w f32 + fused
        # unpack) — calibrated by what actually compiles AND wins on v5e
        # (flagship M=128 Q4_0: tn=2048/kc=2 f32 = 153 TFLOPS).
        per_elem = 5 if wb == 2 else 6
        # out and x slabs are pipeline DOUBLE-BUFFERED (out blocks swap
        # across N tiles, x blocks across K steps) — omitting the 2x let
        # M=2048 prefill ubatches pick tn=1024 and OOM the 16MB scoped
        # VMEM stack at 18.3M (first seen driving n_ubatch=2048 on 7B)
        need = per_elem * tk * tn_ + 2 * m_pad * tn_ * 4 \
            + 2 * m_pad * tk * 4
        return need <= int(12.5 * 2 ** 20)

    gemv = m_pad <= 16
    bits5 = SPECS[qt.qtype].bits == 5

    def divisor_tile(cap: int) -> int:
        """Largest multiple-of-128 divisor of N that is <= cap; non-pow2
        shapes like the 7B gate|up (22016 = 43*512) only tile wide this
        way (tn=5504 measured 542 GB/s int8 / 476 f32 vs 440-496 at
        tn=512 on v5e)."""
        for d in range(cap // 128, 0, -1):
            if n % (d * 128) == 0:
                return d * 128
        raise ValueError(f"N={n} has no multiple-of-128 divisor tile")

    import os
    i8mode = os.environ.get("TPULAMM_INT8_DOT", "1")
    if gemv and i8mode != "0" and not (explicit_f32 and i8mode != "force"):
        # int8 activations + int8xint8 MXU dots with per-group rescale —
        # the reference's vec_dot_type architecture (ggml.c:458-778).
        # DEFAULT for decode: tg256 7B Q4_0 107.9 -> 128.7 t/s (+19%),
        # 1.1B 604.9 -> 683.4 (+13%); quality cost is the reference's own
        # activation-quant class — measured decode-path KL(f32||int8)
        # 0.0058 mean / top-1 95.3% on a trained 30M Q4_0, ~8x below the
        # Q4_0 weight error itself (PERF.md). TPULAMM_INT8_DOT=0 restores
        # the exact-dequant f32 path.
        # Tile rules from the on-chip sweeps: take the widest <=8192
        # divisor tile (non-pow2 allowed: 7B gate|up tn=5504 542 GB/s),
        # K-step sized to tk*tn ~ 4M elements capped at kc=4 (round-4
        # re-sweep on the 7B decode shapes, tools/sweep_decode_shapes:
        # wo 4096x4096 kc=1 24.1us -> kc=4 17.4us (74% of its streaming
        # bound), wqkv 55.1 -> 51.2 (kc=2), gate|up 94.5 -> 84.7,
        # w_down 55.4 -> 50.4; kc=8 regresses everywhere measured, e.g.
        # wo tn=2048/kc=8 23.3us vs kc=4 17.8us — deeper K-steps win by
        # larger per-step DMAs until the two-step pipeline loses its
        # overlap granularity). The target scales down with the batch
        # rows (m_pad > 8 doubles the i32 idot block) to keep the
        # naive VMEM estimate inside the 16MB scoped stack; below
        # tn=1024 the batched depth-32 MXU dots lose to the f32 path
        # (qkv 2560x2048: int8 8.0-12.0us vs f32 6.7us) — fall through.
        tn8 = tn if tn is not None else divisor_tile(8192)
        # "force" drops the width gate (tests exercise small-N shapes)
        min_tn = 128 if i8mode == "force" else 1024
        if tn8 >= min_tn:
            kc8 = kc
            if kc8 is None:
                m_rows = max(8, -(-m // 8) * 8)
                kc_target = max(1, (1 << 22) * 8 // (TK * tn8 * m_rows))
                n_chunks = k // TK
                kc8 = 1
                for cand in (4, 2):
                    if cand <= kc_target and n_chunks % cand == 0:
                        kc8 = cand
                        break
                else:
                    for cand in (4, 2):
                        if cand <= kc_target and n_chunks >= 2 * cand:
                            kc8 = cand
                            break
            if x.dtype not in (jnp.bfloat16, jnp.float32):
                x = x.astype(jnp.float32)
            # in-kernel activation quant: fold the XLA prologue (~3 us
            # per call, tools/decode_roofline) into the Pallas launch.
            # TPULAMM_INT8_INKQ=0 restores the XLA-prologue path for A/B.
            if os.environ.get("TPULAMM_INT8_INKQ", "0") != "0":
                out = _qmm_int8_call_inkq(x, qt.planes, qtype=qt.qtype,
                                          n=n, k=k, tn=tn8, kc=kc8,
                                          interpret=interpret)
            else:
                out = _qmm_int8_call(x, qt.planes, qtype=qt.qtype, n=n,
                                     k=k, tn=tn8, kc=kc8,
                                     interpret=interpret)
            return out[:m]

    if tn is None:
        # widest tile wins at most M — fewer grid steps amortize the
        # ~0.4-0.6us per-step overhead (in-scan sweep on 1.1B Q4_0/v5e:
        # decode tn<=2048 kc<=8 -> 1368 us/step vs tn<=1024 kc<=4 -> 1520;
        # M=128 matmul 58 -> 76 TFLOPS) — but large-M tiles must pass the
        # scoped-VMEM check below or the kernel compiler OOMs.
        # 5-bit formats carry the extra qh plane: measured (flagship M=128
        # q5_1), tn=1024/kc=4 beats tn=2048/kc=2 135.8 vs 106.0 TFLOPS —
        # the narrower tile rebalances VMEM for the deeper K-step.
        cands = ((1024, 2048, 512, 256, 128) if bits5 and not gemv
                 else (2048, 1024, 512, 256, 128))
        for cand in cands:
            if n % cand == 0 and (vmem_ok(cand, 1) or cand == 128):
                tn = cand
                break
        else:
            tn = divisor_tile(2048)
        if gemv and tn < 1024:
            # big non-pow2 matrices tile wide via non-pow2 divisors
            # (measured: 7B gate|up f32 tn=5504/kc=1 106.6us vs
            # tn=512/kc=8 115.2us); small ones (1.1B fused qkv 2560)
            # stay on the narrow-tile path (7.8us vs 8.0).
            wide = divisor_tile(8192)
            if wide >= 4096 and vmem_ok(wide, 1):
                tn = wide
    if kc is None:
        # kc need not divide the chunk count (tail-masked cdiv grid) —
        # prefer the largest kc whose tail waste stays small and that fits
        # VMEM; fewer K-steps amortize the per-grid-step overhead
        import os
        strict = bool(os.environ.get("TPULAMM_KC_STRICT"))  # perf A/B
        if gemv:
            # f32 gemv: deep K-steps win (tn=2048/kc=8 is the measured
            # in-scan default) — but the wide non-pow2 tiles (tn>=4096)
            # only fit VMEM at kc=1
            kc_cands = (8, 4, 2) if tn < 4096 else ()
        else:
            kc_cands = (4, 2)
        kc = 1
        n_chunks = k // TK
        # exact divisors first: tail-masked steps dequant padded K rows for
        # nothing (down-proj 5632: exact kc=2 17.5us vs masked kc=8 19.4us
        # isolated on v5e)
        for cand in kc_cands:
            if n_chunks % cand == 0 and (gemv or vmem_ok(tn, cand)):
                kc = cand
                break
        else:
            for cand in kc_cands:
                if strict:
                    waste_ok = n_chunks % cand == 0
                else:
                    waste_ok = (n_chunks % cand >= max(1, cand // 2)
                                or n_chunks >= 4 * cand)
                if waste_ok and (gemv or vmem_ok(tn, cand)):
                    kc = cand
                    break
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        x = x.astype(jnp.float32)
    out = _qmm_call(x, qt.planes, qtype=qt.qtype, n=n, k=k, tn=tn, kc=kc,
                    compute_dtype=jnp.dtype(compute_dtype),
                    interpret=interpret)
    return out[:m]
