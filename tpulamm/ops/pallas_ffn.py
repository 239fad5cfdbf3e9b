"""Fused FFN Pallas kernel: gate/up matmul + activation + down matmul in
ONE kernel launch.

Decode on a TPU is dominated by per-kernel-call floors (~10 us x 4 qmm
calls x n_layers per token — see PERF.md); this kernel halves the FFN's
share by computing

    out = (act(x @ Wgate.T) * (x @ Wup.T)) @ Wdown.T

with the (m, ffn) intermediate living only in VMEM scratch — one launch,
one floor, no HBM round-trip for the activations.

Phased 1-D grid:
- phase A (j over ffn tiles): dequant a gate tile and the matching up tile
  (two block views into the SAME wgateup_fused planes, the up view at a
  block offset of ffn/tn1 — tn1 is chosen to divide ffn), full-K dot,
  act*mul, store into the mid scratch;
- phase B (k2 over down K-chunks): fused dequant-matmul reading x from the
  scratch, accumulating into the resident out block. Down-weight rows past
  ffn are group-masked to zero and the scratch is zero-initialized, so the
  K overhang contributes exact zeros.

Used for the decode/gemv regime (small m); prefill keeps separate qmm
calls where the floor amortizes. Reference capability: llm_build_ffn
(llama.cpp:5203) — the fusion itself has no reference analogue (ggml
schedules per-op); it exists because the TPU cost model demands it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulamm.gguf.constants import GGMLType
from tpulamm.ops.pallas_qmm import (PLANE_ORDER, PLANE_ROWS, TK,
                                    _group_scales, _unpack_values)
from tpulamm.quant.repack import SPECS


def _dequant_tile(qtype, plane_refs, kc, tn, k_total, kstep):
    """(kc*256, tn) f32 weights from VMEM plane refs; rows past k_total
    are exact zeros (group-granular scale mask)."""
    spec = SPECS[qtype]
    groups = kc * TK // spec.group
    vals = _unpack_values(qtype, plane_refs, kc, tn, jnp.int32)

    def mask(arr):
        if k_total % (kc * TK) == 0:
            return arr
        g_row = (jax.lax.broadcasted_iota(jnp.int32, (groups, tn), 0)
                 + kstep * groups)
        return jnp.where(g_row * spec.group < k_total, arr, 0)

    sw_raw, mins_raw = _group_scales(qtype, plane_refs, kc, tn)
    scales = mask(sw_raw)
    w = vals.astype(jnp.float32).reshape(groups, spec.group, tn)
    w = (w - spec.zero) * scales[:, None, :]
    if spec.has_min:
        w = w + mask(mins_raw)[:, None, :]
    return w.reshape(kc * TK, tn)


def _act_fn(a, act):
    from tpulamm.ops.layers import gelu, silu
    if act == "silu":
        return silu(a)
    if act == "gelu":
        return gelu(a)
    return jnp.maximum(a, 0.0)                           # relu


def _tn1_for(ffn: int) -> int | None:
    """Largest multiple of 128 that divides ffn and is <= 2048."""
    for t in range(2048, 127, -128):
        if ffn % t == 0:
            return t
    return None


@functools.partial(jax.jit, static_argnames=("qtype", "dq_type", "k1",
                                             "ffn", "dim", "act",
                                             "interpret"))
def _ffn_call(x, gu_planes, dn_planes, *, qtype, dq_type, k1, ffn, dim,
              act, interpret):
    # Mosaic has no f16: hand fp16 scale planes to the kernel as raw u16
    # bits (same preamble as _qmm_call)
    def _u16(planes):
        return {nm: (jax.lax.bitcast_convert_type(p, jnp.uint16)
                     if p.dtype == jnp.float16 else p)
                for nm, p in planes.items()}
    gu_planes = _u16(gu_planes)
    dn_planes = _u16(dn_planes)
    m = x.shape[0]
    names_gu = PLANE_ORDER[qtype]
    names_dn = PLANE_ORDER[dq_type]
    spec = SPECS[qtype]
    dspec = SPECS[dq_type]

    tn1 = _tn1_for(ffn)
    a_steps = ffn // tn1
    up_off = a_steps                          # up view starts ffn/tn1 blocks in
    kc2 = min(8, -(-ffn // TK))
    tk2 = kc2 * TK
    b_steps = -(-ffn // tk2)
    mid_cols = b_steps * tk2                  # >= ffn; tail zero-initialized
    tn2 = dim
    grid = (a_steps + b_steps,)

    def gu_spec(name, off_blocks):
        rows = (PLANE_ROWS[name] * (k1 // TK) if name in PLANE_ROWS
                else k1 // spec.group)

        def imap(s):
            return (0, jnp.minimum(s, a_steps - 1) + off_blocks)
        return pl.BlockSpec((rows, tn1), imap, memory_space=pltpu.VMEM)

    def dn_spec(name):
        rows = (PLANE_ROWS[name] * kc2 if name in PLANE_ROWS
                else tk2 // dspec.group)

        def imap(s):
            return (jnp.clip(s - a_steps, 0, b_steps - 1), 0)
        return pl.BlockSpec((rows, tn2), imap, memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((m, k1), lambda s: (0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [gu_spec(n, 0) for n in names_gu]
    in_specs += [gu_spec(n, up_off) for n in names_gu]
    in_specs += [dn_spec(n) for n in names_dn]

    def kernel(x_ref, *refs):
        ng, nd = len(names_gu), len(names_dn)
        gate_refs = dict(zip(names_gu, refs[:ng]))
        up_refs = dict(zip(names_gu, refs[ng:2 * ng]))
        dn_refs = dict(zip(names_dn, refs[2 * ng:2 * ng + nd]))
        out_ref, mid_ref = refs[-2], refs[-1]   # (outputs..., scratch...)
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            mid_ref[:] = jnp.zeros_like(mid_ref)

        @pl.when(step < a_steps)
        def _phase_a():
            j = step
            g = _dequant_tile(qtype, gate_refs, k1 // TK, tn1, k1, 0)
            u = _dequant_tile(qtype, up_refs, k1 // TK, tn1, k1, 0)
            x = x_ref[:]
            mg = jnp.dot(x, g, preferred_element_type=jnp.float32)
            mu = jnp.dot(x, u, preferred_element_type=jnp.float32)
            mid_ref[:, pl.ds(j * tn1, tn1)] = _act_fn(mg, act) * mu

        @pl.when(step >= a_steps)
        def _phase_b():
            k2 = step - a_steps
            w = _dequant_tile(dq_type, dn_refs, kc2, tn2, ffn, k2)
            xm = mid_ref[:, pl.ds(k2 * tk2, tk2)]
            part = jnp.dot(xm, w, preferred_element_type=jnp.float32)

            @pl.when(k2 == 0)
            def _():
                out_ref[:] = part

            @pl.when(k2 > 0)
            def _():
                out_ref[:] = out_ref[:] + part

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, tn2), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, dim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, mid_cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x, *[gu_planes[n] for n in names_gu],
      *[gu_planes[n] for n in names_gu],
      *[dn_planes[n] for n in names_dn])


def ffn_fused(x, gu_qt, down_qt, *, act: str = "silu",
              interpret: bool = False):
    """x (m, dim); gu_qt: fused (2*ffn, dim) mm QTensor (gate then up
    along N); down_qt: (dim, ffn) mm QTensor -> (m, dim) f32."""
    n_gu, k1 = gu_qt.mm_dims
    ffn = n_gu // 2
    dim, k2 = down_qt.mm_dims
    assert k2 == ffn and k1 == dim, (gu_qt.mm_dims, down_qt.mm_dims)
    quantum = 8
    m = x.shape[0]
    m_pad = max(quantum, -(-m // quantum) * quantum)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = _ffn_call(x, gu_qt.planes, down_qt.planes, qtype=gu_qt.qtype,
                    dq_type=down_qt.qtype, k1=k1, ffn=ffn, dim=dim,
                    act=act, interpret=interpret)
    return out[:m]


def ffn_fused_eligible(gu_qt, down_qt, m: int) -> bool:
    """Static dispatch guard: decode-size batch, tileable shapes."""
    from tpulamm.ops.qtensor import QTensor
    if not (isinstance(gu_qt, QTensor) and isinstance(down_qt, QTensor)):
        return False
    if gu_qt.layout != "mm" or down_qt.layout != "mm":
        return False
    n_gu, k1 = gu_qt.mm_dims
    ffn = n_gu // 2
    return (m <= 16 and _tn1_for(ffn) is not None and k1 % TK == 0
            and down_qt.mm_dims[0] % 128 == 0)
