"""Fused flash-attention Pallas kernel over the slot KV cache.

TPU-native replacement for the materialized-scores attention path
(ggml_soft_max_ext + KQ_mask semantics, llama.cpp:8523): instead of
writing the full (B, H, T, S) score/prob tensors to HBM (whose traffic
grows linearly with n_ctx and dominates long-context decode), K/V stream
through VMEM once, scores for one (TG, St) tile live only in registers/
VMEM, and the softmax is computed online (running max/denominator
rescaling, the standard flash recurrence).

Shapes and tricks:
- GQA folding: the G = n_heads/n_kv_heads query heads that share one KV
  head are folded into the query-row axis: q (B, Hkv, T*G, hd). Every row
  of a tile shares the same K/V stream, so the MXU sees (TG, hd)x(hd, St)
  matmuls with no KV duplication.
- The KQ mask is recomputed in-kernel from positions, exactly like the
  engine's einsum path: key cell live (kpos >= 0) and, for causal
  models, kpos <= qpos. Key positions are DATA (context shift/self-extend
  rewrite them) and stream as (1, St) blocks; query positions are affine
  (qpos = q_base[b] + t, t = row//G) which every engine path satisfies
  (prefill/decode/scan positions are n_past + arange; padding rows sit at
  the tail and carry q_len masking). Paths with non-affine positions or
  segment masks (eval_segmented/lookahead) use the einsum fallback.
- Fully-masked rows (padding, empty slots) produce 0 output, not NaN
  (l == 0 guard), matching masked_softmax's all-masked behavior.

The dispatch (flash_eligible + attend) is chosen statically at trace time;
models with ALiBi fall back to the einsum path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(qbase_ref, qlen_ref,            # SMEM scalars (B,)
            q_ref, k_ref, v_ref, kpos_ref,  # VMEM tiles
            *refs,                           # [ks_ref] [vs_ref] out scratch
            scale: float, g: int, tg_t: int, s_t: int, s_total: int,
            causal: bool, compute_dtype, has_ks: bool, has_vs: bool,
            hkv: int):
    refs = list(refs)
    ks_ref = refs.pop(0) if has_ks else None
    vs_ref = refs.pop(0) if has_vs else None
    out_ref, acc_ref, m_ref, l_ref = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)                    # TG tile
    j = pl.program_id(3)                    # S tile (innermost, arbitrary)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(compute_dtype)           # (TGt, hd)
    k = k_ref[0, 0].astype(compute_dtype)           # (St, hd)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale                                    # (TGt, St)
    if has_ks:
        # q8_0 K cache: codes were dotted raw; fold the per-key-row scale
        # into the score columns ((q . k_i8) * ks == q . k_dequant). Tail
        # garbage becomes NaN here and dies in the live-mask where below.
        # Scale planes arrive flattened (B*Hkv, S) and blocked over ALL
        # rows (a (1,1,St) block would break the sublane-divisibility
        # rule); ref-slice this (b, h)'s row like kpos below.
        s = s * ks_ref[pl.ds(b * hkv + h, 1), :]

    # kpos block carries ALL batch rows (a (1, St) block would violate the
    # TPU sublane-divisibility rule for B > 1); ref-slice this b's row
    # (pl.ds — lax.dynamic_slice has no Mosaic lowering here)
    kpos = kpos_ref[pl.ds(b, 1), :].astype(jnp.int32)  # (1, St)
    col = jax.lax.broadcasted_iota(jnp.int32, (tg_t, s_t), 1) + j * s_t
    live = (kpos >= 0) & (col < s_total)             # tail-block guard
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (tg_t, s_t), 0) + i * tg_t
        t = row // g
        qpos = qbase_ref[b] + t
        live = live & (kpos <= qpos) & (t < qlen_ref[b])
    s = jnp.where(live, s, NEG_INF)

    m_prev = m_ref[:, :1]                            # (TGt, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    p = jnp.where(s <= NEG_INF, 0.0, p)              # all-masked rows
    corr = jnp.exp(m_prev - m_new)                   # (TGt, 1)
    l_new = l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0, 0].astype(compute_dtype)            # (St, hd)
    # tail-block guard: OOB-padded V rows are undefined (NaN in interpret
    # mode) and 0 * NaN would poison the matmul — zero them explicitly
    vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + j * s_t
    v = jnp.where(vrow < s_total, v, 0)
    if has_vs:
        # q8_0 V cache: the scale is per key row and S is the contracted
        # axis, so it folds into p ((p * vs) . v_i8 == p . v_dequant) —
        # (TGt, St) multiplies instead of dequantizing the (St, hd) tile.
        # Zero OOB tail scales: p is 0 there but 0 * NaN would poison pv.
        vcol = (jax.lax.broadcasted_iota(jnp.int32, (1, s_t), 1)
                + j * s_t)
        vsv = jnp.where(vcol < s_total,
                        vs_ref[pl.ds(b * hkv + h, 1), :], 0)
        p = p * vsv
    pv = jax.lax.dot_general(p.astype(compute_dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == pl.num_programs(3) - 1)
    def _finish():
        l = l_ref[:, :1]
        out_ref[0, 0] = jnp.where(l > 0, acc_ref[:] / l, 0.0)


@functools.partial(
    jax.jit, static_argnames=("scale", "g", "causal", "interpret"))
def flash_attention(q, k, v, kpos, qbase, qlen, ks=None, vs=None, *,
                    scale: float, g: int,
                    causal: bool = True, interpret: bool = False):
    """q: (B, Hkv, TG, hd) f32; k/v: (B, Hkv, S, hd) (any dtype; cast to
    bf16 in-kernel); kpos: (B, S) int32; qbase/qlen: (B,) int32.
    ks/vs: optional (B, Hkv, S) f32 per-row scales of a q8_0 KV cache
    (runtime/kvcache.py) — folded into scores / probs in-kernel, so
    quantized caches stream 1 byte/elem through flash too.
    Returns (B, Hkv, TG, hd) f32."""
    B, Hkv, TG, hd = q.shape
    S = k.shape[2]
    # tail blocks are allowed (cdiv grids): OOB reads are masked in-kernel
    # by row/col index guards, OOB writes are dropped by pallas
    tg_t = min(256, -(-TG // 8) * 8)
    s_t = min(512, -(-S // 128) * 128)

    grid = (B, Hkv, pl.cdiv(TG, tg_t), pl.cdiv(S, s_t))
    kernel = functools.partial(
        _kernel, scale=scale, g=g, tg_t=tg_t, s_t=s_t, s_total=S,
        causal=causal, compute_dtype=jnp.bfloat16,
        has_ks=ks is not None, has_vs=vs is not None, hkv=Hkv)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # qbase (B,)
        pl.BlockSpec(memory_space=pltpu.SMEM),      # qlen (B,)
        pl.BlockSpec((1, 1, tg_t, hd), lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s_t, hd), lambda b, h, i, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s_t, hd), lambda b, h, i, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, s_t), lambda b, h, i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [qbase, qlen, q, k, v, kpos]
    # scale planes flatten to (B*Hkv, S): the kernel ref-slices one row
    # (a (1,1,St) block would violate Mosaic's sublane-divisibility rule)
    sc_spec = pl.BlockSpec((B * Hkv, s_t), lambda b, h, i, j: (0, j),
                           memory_space=pltpu.VMEM)
    for sc in (ks, vs):
        if sc is not None:
            in_specs.append(sc_spec)
            inputs.append(sc.reshape(B * Hkv, S))

    flops = 4 * B * Hkv * TG * S * hd
    kv_bytes = 2 * B * Hkv * S * hd * k.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tg_t, hd),
                               lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, TG, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tg_t, hd), jnp.float32),
            pltpu.VMEM((tg_t, 128), jnp.float32),
            pltpu.VMEM((tg_t, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=kv_bytes + 2 * q.size * 4,
            transcendentals=B * Hkv * TG * S),
        interpret=interpret,
    )(*inputs)


# -- split-S flash decoding ---------------------------------------------------
#
# The main kernel's decode half is dead weight at T*G small: a 1-query-row
# step issues (8, hd) tiles with one live row across Hkv x S-tile grid
# steps, paying the online-softmax VPU chain + grid-step floor per tiny
# tile (measured 28.3 vs einsum's 130.5 t/s at S=8192 on the MHA 7B —
# PERF.md r4). Flash-decoding (Dao et al.'s split-KV trick) restructures
# the work: S splits into INDEPENDENT chunks, each grid step computes an
# unnormalized partial (acc, m, l) for its chunk with a single local
# softmax (no cross-step carry, so every grid dimension is "parallel" and
# Mosaic pipelines the KV DMA stream freely), and a cheap XLA epilogue
# combines the partials with the standard max/denominator rescale. Chunks
# are large (default 2048 keys) so the per-step floor amortizes over 4x
# the bytes of the main kernel's 512-key tiles.


def _decode_kernel(qbase_ref, qlen_ref, q_ref, k_ref, v_ref, kpos_ref,
                   *refs, scale: float, g: int, tg_p: int, s_t: int,
                   s_total: int, causal: bool, compute_dtype,
                   has_ks: bool, has_vs: bool, hkv: int):
    refs = list(refs)
    ks_ref = refs.pop(0) if has_ks else None
    vs_ref = refs.pop(0) if has_vs else None
    acc_ref, m_ref, l_ref = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    j = pl.program_id(2)                     # S chunk (independent)

    q = q_ref[0, 0].astype(compute_dtype)            # (TGp, hd)
    k = k_ref[0, 0].astype(compute_dtype)            # (St, hd)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if has_ks:
        s = s * ks_ref[pl.ds(b * hkv + h, 1), :]

    kpos = kpos_ref[pl.ds(b, 1), :].astype(jnp.int32)    # (1, St)
    col = jax.lax.broadcasted_iota(jnp.int32, (tg_p, s_t), 1) + j * s_t
    live = (kpos >= 0) & (col < s_total)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (tg_p, s_t), 0)
        t = row // g
        qpos = qbase_ref[b] + t
        live = live & (kpos <= qpos) & (t < qlen_ref[b])
    s = jnp.where(live, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)           # (TGp, 1) local max
    p = jnp.where(s <= NEG_INF, 0.0, jnp.exp(s - m))
    l = jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0, 0].astype(compute_dtype)            # (St, hd)
    vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + j * s_t
    v = jnp.where(vrow < s_total, v, 0)
    if has_vs:
        vcol = (jax.lax.broadcasted_iota(jnp.int32, (1, s_t), 1)
                + j * s_t)
        vsv = jnp.where(vcol < s_total,
                        vs_ref[pl.ds(b * hkv + h, 1), :], 0)
        p = p * vsv
    acc_ref[0, 0, 0] = jax.lax.dot_general(
        p.astype(compute_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[0, 0, 0] = jnp.broadcast_to(m, (tg_p, 128))
    l_ref[0, 0, 0] = jnp.broadcast_to(l, (tg_p, 128))


@functools.partial(
    jax.jit, static_argnames=("scale", "g", "causal", "s_chunk",
                              "interpret"))
def flash_decode(q, k, v, kpos, qbase, qlen, ks=None, vs=None, *,
                 scale: float, g: int, causal: bool = True,
                 s_chunk: int = 2048, interpret: bool = False):
    """Split-S flash decoding (same I/O contract as flash_attention).

    q: (B, Hkv, TG, hd) with TG small (decode); k/v: (B, Hkv, S, hd);
    kpos: (B, S); qbase/qlen: (B,). ks/vs: optional q8_0 per-row scale
    planes, folded in-kernel exactly like the main kernel. Returns
    (B, Hkv, TG, hd) f32 — numerically the same softmax(QK^T)V as
    flash_attention_ref up to reduction order."""
    B, Hkv, TG, hd = q.shape
    S = k.shape[2]
    tg_p = -(-TG // 8) * 8                       # pad query rows to 8
    if tg_p != TG:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tg_p - TG), (0, 0)))
    s_t = min(s_chunk, -(-S // 128) * 128)
    ns = pl.cdiv(S, s_t)

    grid = (B, Hkv, ns)
    kernel = functools.partial(
        _decode_kernel, scale=scale, g=g, tg_p=tg_p, s_t=s_t, s_total=S,
        causal=causal, compute_dtype=jnp.bfloat16,
        has_ks=ks is not None, has_vs=vs is not None, hkv=Hkv)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # qbase (B,)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # qlen (B,)
        pl.BlockSpec((1, 1, tg_p, hd), lambda b, h, j: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s_t, hd), lambda b, h, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s_t, hd), lambda b, h, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, s_t), lambda b, h, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [qbase, qlen, q, k, v, kpos]
    sc_spec = pl.BlockSpec((B * Hkv, s_t), lambda b, h, j: (0, j),
                           memory_space=pltpu.VMEM)
    for sc in (ks, vs):
        if sc is not None:
            in_specs.append(sc_spec)
            inputs.append(sc.reshape(B * Hkv, S))

    out_shapes = [
        jax.ShapeDtypeStruct((B, Hkv, ns, tg_p, hd), jnp.float32),
        jax.ShapeDtypeStruct((B, Hkv, ns, tg_p, 128), jnp.float32),
        jax.ShapeDtypeStruct((B, Hkv, ns, tg_p, 128), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, 1, tg_p, hd), lambda b, h, j: (b, h, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, tg_p, 128),
                     lambda b, h, j: (b, h, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, tg_p, 128),
                     lambda b, h, j: (b, h, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    flops = 4 * B * Hkv * tg_p * S * hd
    kv_bytes = 2 * B * Hkv * S * hd * k.dtype.itemsize
    acc, m, l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=kv_bytes + 2 * q.size * 4,
            transcendentals=B * Hkv * tg_p * S),
        interpret=interpret,
    )(*inputs)

    # cross-chunk combine (XLA epilogue; ns <= a few dozen rows):
    # out = sum_j exp(m_j - m*) acc_j / sum_j exp(m_j - m*) l_j
    m = m[..., 0]                                # (B, Hkv, ns, TGp)
    l = l[..., 0]
    m_g = jnp.max(m, axis=2, keepdims=True)
    w = jnp.exp(m - m_g)                         # fully-masked chunks:
    l_g = jnp.sum(w * l, axis=2)                 # m=NEG_INF, l=0 -> w*l=0
    o = jnp.sum(w[..., None] * acc, axis=2)      # (B, Hkv, TGp, hd)
    o = jnp.where(l_g[..., None] > 0, o / l_g[..., None], 0.0)
    return o[:, :, :TG]


def flash_attention_ref(q, k, v, kpos, qbase, qlen, ks=None, vs=None, *,
                        scale, g, causal=True):
    """jnp reference with identical semantics (golden model for tests)."""
    B, Hkv, TG, hd = q.shape
    S = k.shape[2]
    kf, vf = k.astype(jnp.float32), v.astype(jnp.float32)
    if ks is not None:
        kf = kf * ks.astype(jnp.float32)[:, :, :, None]
    if vs is not None:
        vf = vf * vs.astype(jnp.float32)[:, :, :, None]
    k, v = kf, vf
    s = jnp.einsum("bhrd,bhsd->bhrs", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    live = (kpos >= 0)[:, None, None, :]
    if causal:
        t = jnp.arange(TG) // g
        qpos = qbase[:, None] + t[None, :]              # (B, TG)
        live = live & (kpos[:, None, None, :] <= qpos[:, None, :, None])
        live = live & (t[None, None, :, None] < qlen[:, None, None, None])
    s = jnp.where(live, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(s <= NEG_INF, 0.0, jnp.exp(s - m))
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhrs,bhsd->bhrd", p, v.astype(jnp.float32))
    return jnp.where(l > 0, out / l, 0.0)
