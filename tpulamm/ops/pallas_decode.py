"""Decode megakernel: one Pallas launch per decode step for the WHOLE stack.

Motivation (PERF.md round-2 floor analysis): single-token decode on a
tunneled v5e is dominated by per-kernel-call floors — 4 fused-qmm launches
x n_layers x ~9-10us ~= 0.8ms of the ~1.4ms device step on the 1.1B bench
model. The weights stream at only ~50% of HBM peak because the DMA queue
drains between launches. This kernel runs every transformer layer of a
decode step inside ONE `pallas_call` with a (n_layers, phases) grid, so

- there is exactly one launch floor per step (plus the lm head), and
- Mosaic's grid pipelining double-buffers the next tile's weight DMA
  behind the current tile's compute ACROSS layer boundaries — the
  property whose loss made the earlier fused-FFN kernel slower
  (ops/pallas_ffn.py; see PERF.md "fusion must preserve pipelining").

Phases per layer (grid axis 1, all 'arbitrary'):
  [0, PQ)          rms-norm + fused-QKV matmul, one N-tile per step
  PQ               rope (lane-roll formulation) + attention + KV-row output
  [W0, W0+PW)      attn-output matmul tiles, residual add
  [G0, G0+PG)      ffn-norm + fused gate/up matmul tiles
  [D0, D0+PD)      act*up, down matmul K-chunks, residual add

Weights are the engine's per-layer QTensors stacked along a leading L axis
(ops/qtensor planes; stacking costs one extra HBM copy of the layer
weights, which v5e's 16GB absorbs even at 7B). BlockSpec index maps
hold each input's block until the step before its next use, so a block is
fetched exactly once per layer, one grid step ahead of first use.

Attention reads the (stacked) KV cache for all PREVIOUS tokens and merges
the current token's in-register k/v analytically (two-part softmax: the
cache part is masked exactly like the engine's einsum path — live cells,
kpos <= qpos — and the current token contributes exp(s_cur - m) terms).
The new K/V rows are kernel outputs; the engine scatters them into the
cache afterwards with a single dynamic_update_slice, so the cache layout
and every position-surgery op (kvcache.py) stay untouched.

RoPE without relayouts: for both ggml rotation layouts (NORM = interleaved
pairs, NEOX = split halves; ggml.c rope kernels) the rotation is
    rope(x) = x * cosT + rot(x) * sinT
where rot(x) is a lane roll (+/-1 with pair-parity select for NORM,
+/-n_rot/2 with half select for NEOX) and cosT/sinT are per-lane vectors
with the signs folded in, precomputed per step in XLA (rope_lane_vectors).

Numerics mirror the engine einsum path's rounding points: bf16 residual
stream, bf16 score/prob dots against the bf16 cache, f32 accumulation
everywhere (MXU runs bf16 passes on f32 inputs at DEFAULT precision).

Reference capability: the per-token eval loop llama_decode_internal
(llama.cpp:8770) — the mega-fusion itself has no reference analogue; it
exists because the TPU launch-floor cost model demands it.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulamm.gguf.constants import GGMLType
from tpulamm.ops.pallas_ffn import _act_fn, _dequant_tile
from tpulamm.ops.pallas_qmm import PLANE_ORDER, PLANE_ROWS, TK
from tpulamm.ops.rope import RopeParams, rope_angles
from tpulamm.quant.repack import SPECS

NEG_INF = -1e30
MROWS = 8                      # sublane quantum: batch rows padded to this


def _plane_rows(qtype: GGMLType, name: str, k: int) -> int:
    """Rows of a (rows, N) mm plane covering k contraction elements."""
    if name in PLANE_ROWS:
        return PLANE_ROWS[name] * (k // TK)
    return k // SPECS[qtype].group          # scales / mins


@dataclass(frozen=True)
class MegaSpec:
    """Static geometry of the megakernel (hashable; closed over by jit)."""
    n_layers: int
    dim: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    ffn: int
    nqkv: int                  # (H + 2*Hkv) * hd
    qtypes: tuple              # (qkv, wo, gu, down) GGMLType
    act: str                   # silu | gelu | relu | relu_sqr
    eps: float
    rope_kind: str             # "norm" | "neox" | "none"
    n_rot: int
    # tiling
    tn_qkv: int
    tn_wo: int
    tn_gu: int
    kc_down: int

    @property
    def pq(self) -> int:
        return self.nqkv // self.tn_qkv

    @property
    def pw(self) -> int:
        return self.n_heads * self.head_dim // self.tn_wo

    @property
    def pg(self) -> int:
        return 2 * self.ffn // self.tn_gu

    @property
    def pd(self) -> int:
        return -(-(self.ffn // TK) // self.kc_down)

    @property
    def phases(self) -> int:
        return self.pq + 1 + self.pw + self.pg + self.pd


def _rot_lanes(x: jnp.ndarray, kind: str, hd: int, n_rot: int) -> jnp.ndarray:
    """The rotation companion of rope(x) = x*cosT + rot(x)*sinT on a
    (rows, n_heads*hd) head-concatenated layout. Pure lane rolls — no
    reshape/relayout. Values at lanes >= n_rot within each head are
    multiplied by sinT == 0, so their content is irrelevant."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    width = x.shape[1]
    if kind == "norm":
        # pair (2i, 2i+1): rot[2i] = x[2i+1], rot[2i+1] = x[2i]
        # (pltpu.roll wants non-negative shifts; -s == width - s cyclically)
        return jnp.where(lane % 2 == 0,
                         pltpu.roll(x, width - 1, 1), pltpu.roll(x, 1, 1))
    half = n_rot // 2
    # neox: rot[i] = x[i+half] for i%hd < half else x[i-half]
    return jnp.where(lane % hd < half,
                     pltpu.roll(x, width - half, 1), pltpu.roll(x, half, 1))


def rope_lane_vectors(rope: RopeParams, hd: int, n_heads: int,
                      n_kv_heads: int, pos: jnp.ndarray):
    """Per-lane cos/sin vectors (signs folded) for the in-kernel rope.

    pos: (B,) int32 -> cosq/sinq (B, n_heads*hd), cosk/sink (B, nkv*hd),
    all f32. Lanes >= n_rot within a head carry cos=1, sin=0
    (pass-through, exactly apply_rope's partial-rotation semantics)."""
    B = pos.shape[0]
    cos, sin = rope_angles(rope, pos)            # (B, n_rot/2), mscale folded
    if rope.kind == "norm":
        c = jnp.repeat(cos, 2, axis=-1)                       # c_i, c_i
        s = jnp.stack([-sin, sin], axis=-1).reshape(B, -1)    # -s_i, +s_i
    elif rope.kind == "neox":
        c = jnp.concatenate([cos, cos], axis=-1)
        s = jnp.concatenate([-sin, sin], axis=-1)
    else:                                       # "none": identity
        c = jnp.ones((B, 0), jnp.float32)
        s = jnp.zeros((B, 0), jnp.float32)
    pad = hd - c.shape[-1]
    if pad:
        c = jnp.concatenate([c, jnp.ones((B, pad), jnp.float32)], -1)
        s = jnp.concatenate([s, jnp.zeros((B, pad), jnp.float32)], -1)
    return (jnp.tile(c, (1, n_heads)), jnp.tile(s, (1, n_heads)),
            jnp.tile(c, (1, n_kv_heads)), jnp.tile(s, (1, n_kv_heads)))


def _make_kernel(spec: MegaSpec, B: int, breal: int, S: int,
                 nplanes: tuple):
    L, dim, hd = spec.n_layers, spec.dim, spec.head_dim
    H, Hkv = spec.n_heads, spec.n_kv_heads
    G = H // Hkv
    nq = H * hd
    nkvd = Hkv * hd
    ffn = spec.ffn
    PQ, PW, PG, PD = spec.pq, spec.pw, spec.pg, spec.pd
    AT = PQ
    W0 = PQ + 1
    G0 = W0 + PW
    D0 = G0 + PG
    P = spec.phases
    tkd = spec.kc_down * TK
    scale = 1.0 / math.sqrt(hd)
    qt_qkv, qt_wo, qt_gu, qt_dn = spec.qtypes
    n_qkv, n_wo, n_gu, n_dn = nplanes

    def kernel(qpos_ref, *refs):
        it = iter(refs)

        def take(n):
            return [next(it) for _ in range(n)]

        (x_ref, anorm_ref, fnorm_ref, cosq_ref, sinq_ref, cosk_ref,
         sink_ref, kposT_ref, k_ref, v_ref) = take(10)
        qkv_pl = dict(zip(PLANE_ORDER[qt_qkv], take(n_qkv)))
        wo_pl = dict(zip(PLANE_ORDER[qt_wo], take(n_wo)))
        gu_pl = dict(zip(PLANE_ORDER[qt_gu], take(n_gu)))
        dn_pl = dict(zip(PLANE_ORDER[qt_dn], take(n_dn)))
        (xout_ref, knew_ref, vnew_ref,
         xres_ref, hn_ref, qkv_acc, qkvt_ref, attn_t, ao_ref,
         gu_acc, mid_ref, dacc_ref) = take(12)

        layer = pl.program_id(0)
        p = pl.program_id(1)

        def rms(x, w):
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            y = xf * jax.lax.rsqrt(var + spec.eps)
            return (y * w.astype(jnp.float32)).astype(jnp.bfloat16)

        def sq(d):
            return {k: r[0] for k, r in d.items()}

        # ---- phase A: attn norm + fused QKV tiles --------------------------
        @pl.when(p == 0)
        def _():
            @pl.when(layer == 0)
            def _():
                xres_ref[:] = x_ref[:].astype(jnp.bfloat16)
                mid_ref[:] = jnp.zeros_like(mid_ref)
            hn_ref[:] = rms(xres_ref[:], anorm_ref[0])

        @pl.when(p < PQ)
        def _():
            w = _dequant_tile(qt_qkv, sq(qkv_pl), dim // TK, spec.tn_qkv,
                              dim, 0)
            part = jnp.dot(hn_ref[:].astype(jnp.float32), w,
                           preferred_element_type=jnp.float32)
            qkv_acc[:, pl.ds(p * spec.tn_qkv, spec.tn_qkv)] = part

        # ---- phase B: rope + attention -------------------------------------
        # Transposed orientation: a lanes->sublanes reshape of the head-
        # concatenated q (B, nq) -> (B*H, hd) has no Mosaic lowering, but a
        # 2-D transpose does. Post-rope q/k/v are transposed once to
        # (features, B); per-head extraction is then a plain SUBLANE slice,
        # scores are (S, hd) x (hd, B) MXU dots, and softmax reduces over
        # sublanes. Only lane 0 is meaningful (the kernel serves the
        # single-stream decode scan; breal == 1 enforced by the caller) —
        # pad lanes compute harmless zeros.
        @pl.when(p == AT)
        def _():
            qf = qkv_acc[:, :nq]
            kf = qkv_acc[:, nq:nq + nkvd]
            vf = qkv_acc[:, nq + nkvd:]
            if spec.rope_kind != "none":
                qf = (qf * cosq_ref[:]
                      + _rot_lanes(qf, spec.rope_kind, hd, spec.n_rot)
                      * sinq_ref[:])
                kf = (kf * cosk_ref[:]
                      + _rot_lanes(kf, spec.rope_kind, hd, spec.n_rot)
                      * sink_ref[:])
            knew_ref[0] = kf
            vnew_ref[0] = vf
            # engine-parity rounding: cache rows are bf16, and the einsum
            # path dots bf16 q against them with f32 accumulation
            qkvt_ref[pl.ds(0, nq), :] = qf.T.astype(jnp.bfloat16)
            qkvt_ref[pl.ds(nq, nkvd), :] = kf.T.astype(jnp.bfloat16)
            qkvt_ref[pl.ds(nq + nkvd, nkvd), :] = vf.T.astype(jnp.bfloat16)
            qp = qpos_ref[0]
            live = (kposT_ref[:] >= 0) & (kposT_ref[:] <= qp)   # (S, 1)
            for h in range(H):
                j = h // G
                qh = qkvt_ref[pl.ds(h * hd, hd), :]             # (hd, B)
                kj = k_ref[0, 0, j].astype(jnp.bfloat16)        # (S, hd)
                s = jax.lax.dot_general(
                    kj, qh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = jnp.where(live, s, NEG_INF)                 # (S, B)
                kch = qkvt_ref[pl.ds(nq + j * hd, hd), :]
                sc = jnp.sum(qh.astype(jnp.float32)
                             * kch.astype(jnp.float32),
                             axis=0, keepdims=True) * scale     # (1, B)
                m = jnp.maximum(jnp.max(s, 0, keepdims=True), sc)
                pr = jnp.exp(s - m)
                pr = jnp.where(s <= NEG_INF, 0.0, pr)
                pc = jnp.exp(sc - m)                            # (1, B)
                vj = v_ref[0, 0, j].astype(jnp.bfloat16)
                pv = jax.lax.dot_general(
                    vj, pr.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (hd, B)
                vch = qkvt_ref[pl.ds(nq + nkvd + j * hd, hd), :]
                pv = pv + pc * vch.astype(jnp.float32)
                denom = jnp.sum(pr, 0, keepdims=True) + pc
                attn_t[pl.ds(h * hd, hd), :] = pv / denom
            ao_ref[:] = attn_t[:].T.astype(jnp.bfloat16)        # (B, nq)

        # ---- phase C: attn output projection + residual --------------------
        @pl.when((p >= W0) & (p < G0))
        def _():
            t = p - W0
            w = _dequant_tile(qt_wo, sq(wo_pl), nq // TK, spec.tn_wo, nq, 0)
            part = jnp.dot(ao_ref[:].astype(jnp.float32), w,
                           preferred_element_type=jnp.float32)
            sl = pl.ds(t * spec.tn_wo, spec.tn_wo)
            xres_ref[:, sl] = (xres_ref[:, sl].astype(jnp.float32)
                               + part).astype(jnp.bfloat16)

        # ---- phase D: ffn norm + fused gate/up tiles -----------------------
        @pl.when(p == G0)
        def _():
            hn_ref[:] = rms(xres_ref[:], fnorm_ref[0])

        @pl.when((p >= G0) & (p < D0))
        def _():
            t = p - G0
            w = _dequant_tile(qt_gu, sq(gu_pl), dim // TK, spec.tn_gu, dim, 0)
            part = jnp.dot(hn_ref[:].astype(jnp.float32), w,
                           preferred_element_type=jnp.float32)
            gu_acc[:, pl.ds(t * spec.tn_gu, spec.tn_gu)] = part

        # ---- phase E: activation + down K-chunks + residual ----------------
        @pl.when(p == D0)
        def _():
            mid_ref[:, :ffn] = (_act_fn(gu_acc[:, :ffn], spec.act)
                                * gu_acc[:, ffn:]).astype(jnp.bfloat16)

        @pl.when(p >= D0)
        def _():
            t = p - D0
            w = _dequant_tile(qt_dn, sq(dn_pl), spec.kc_down, dim, ffn, t)
            xm = mid_ref[:, pl.ds(t * tkd, tkd)].astype(jnp.float32)
            part = jnp.dot(xm, w, preferred_element_type=jnp.float32)

            @pl.when(t == 0)
            def _():
                dacc_ref[:] = part

            @pl.when(t > 0)
            def _():
                dacc_ref[:] = dacc_ref[:] + part

            @pl.when(p == P - 1)
            def _():
                xres_ref[:] = (xres_ref[:].astype(jnp.float32)
                               + dacc_ref[:]).astype(jnp.bfloat16)

                @pl.when(layer == L - 1)
                def _():
                    xout_ref[:] = xres_ref[:].astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def mega_decode_layers(spec: MegaSpec, x, qpos, kpos, kstack, vstack,
                       cosq, sinq, cosk, sink, planes: dict,
                       norms: dict, *, interpret: bool = False):
    """One decode step through all layers.

    x: (B, dim) f32 hidden (embedding output); qpos: (B,) i32 positions;
    kpos: (B, S) i32 cache cell positions; kstack/vstack: (L, B, Hkv, S, hd)
    cache; cos*/sin*: rope lane vectors (rope_lane_vectors); planes: dict
    of stacked weight planes (build_mega); norms: stacked (L, dim) f32.

    Returns (x_out (B, dim) f32, k_new (L, B, Hkv*hd) f32, v_new same).
    """
    L, B0 = spec.n_layers, x.shape[0]
    if B0 != 1:
        raise NotImplementedError(
            "megakernel decode serves the single-stream scan (B0 == 1); "
            "batched decode uses the XLA einsum scan")
    S = kstack.shape[3]
    hd, H, Hkv = spec.head_dim, spec.n_heads, spec.n_kv_heads
    dim, ffn, nq = spec.dim, spec.ffn, H * hd
    B = max(MROWS, B0)
    if B != B0:
        # pad only the activation-row operands to the sublane quantum; the
        # KV cache and kpos stay at B0 rows (the kernel indexes them per
        # real batch row) so cache HBM traffic is not multiplied by B/B0
        padr = ((0, B - B0), (0, 0))
        x = jnp.pad(x, padr)
        cosq, sinq = jnp.pad(cosq, padr), jnp.pad(sinq, padr)
        cosk, sink = jnp.pad(cosk, padr), jnp.pad(sink, padr)
        qpos = jnp.pad(qpos, (0, B - B0), constant_values=-1)

    PQ, PW, PG, PD = spec.pq, spec.pw, spec.pg, spec.pd
    AT, W0 = PQ, PQ + 1
    G0, D0 = W0 + PW, W0 + PW + PG
    P = spec.phases
    qt_qkv, qt_wo, qt_gu, qt_dn = spec.qtypes

    def hold(imap_seen_from):
        """index map: advance at phase start, hold previous layer's last
        block before it (so each block is fetched exactly one step before
        first use, spreading the layer-boundary DMA burst)."""
        p0, ntiles = imap_seen_from

        def imap(layer, p):
            sel = p >= p0
            lsel = jnp.where(sel, layer, jnp.maximum(layer - 1, 0))
            t = jnp.where(sel, jnp.clip(p - p0, 0, ntiles - 1), ntiles - 1)
            return lsel, t
        return imap

    in_specs = [
        pl.BlockSpec((B, dim), lambda l, p: (0, 0)),              # x
        # norms are stacked (L, 1, dim) so the (1, 1, dim) block satisfies
        # Mosaic's trailing-dims rule (block == array on the last two dims)
        pl.BlockSpec((1, 1, dim), lambda l, p: (l, 0, 0)),        # attn_norm
        pl.BlockSpec((1, 1, dim), lambda l, p: (l, 0, 0)),        # ffn_norm
        pl.BlockSpec((B, nq), lambda l, p: (0, 0)),               # cosq
        pl.BlockSpec((B, nq), lambda l, p: (0, 0)),               # sinq
        pl.BlockSpec((B, Hkv * hd), lambda l, p: (0, 0)),         # cosk
        pl.BlockSpec((B, Hkv * hd), lambda l, p: (0, 0)),         # sink
        pl.BlockSpec((S, B0), lambda l, p: (0, 0)),               # kpos^T
        pl.BlockSpec((1, B0, Hkv, S, hd),                         # K
                     lambda l, p: (jnp.where(p >= AT, l,
                                             jnp.maximum(l - 1, 0)),
                                   0, 0, 0, 0)),
        pl.BlockSpec((1, B0, Hkv, S, hd),                         # V
                     lambda l, p: (jnp.where(p >= AT, l,
                                             jnp.maximum(l - 1, 0)),
                                   0, 0, 0, 0)),
    ]
    operands = [x, norms["attn_norm"], norms["ffn_norm"],
                cosq, sinq, cosk, sink, kpos.T, kstack, vstack]

    def add_planes(prefix, qt, k_of, n_of, tn, imap):
        for name in PLANE_ORDER[qt]:
            arr = planes[f"{prefix}_{name}"]
            rows = _plane_rows(qt, name, k_of)
            in_specs.append(pl.BlockSpec((1, rows, tn), imap))
            operands.append(arr)

    def nmap(p0, ntiles):
        im = hold((p0, ntiles))

        def imap(layer, p):
            lsel, t = im(layer, p)
            return lsel, 0, t
        return imap

    def kmap(p0, ntiles):
        im = hold((p0, ntiles))

        def imap(layer, p):
            lsel, t = im(layer, p)
            return lsel, t, 0
        return imap

    add_planes("qkv", qt_qkv, dim, spec.nqkv, spec.tn_qkv, nmap(0, PQ))
    add_planes("wo", qt_wo, nq, dim, spec.tn_wo, nmap(W0, PW))
    add_planes("gu", qt_gu, dim, 2 * ffn, spec.tn_gu, nmap(G0, PG))
    # down: K-chunked (rows axis), full-N blocks
    for name in PLANE_ORDER[qt_dn]:
        arr = planes[f"dn_{name}"]
        rows_blk = (PLANE_ROWS[name] * spec.kc_down if name in PLANE_ROWS
                    else spec.kc_down * TK // SPECS[qt_dn].group)
        in_specs.append(pl.BlockSpec((1, rows_blk, dim), kmap(D0, PD)))
        operands.append(arr)

    nplanes = tuple(len(PLANE_ORDER[q]) for q in spec.qtypes)
    kernel = _make_kernel(spec, B, B0, S, nplanes)

    ffn_pad = PD * spec.kc_down * TK
    wbytes = sum(int(a.size) * a.dtype.itemsize
                 for k, a in planes.items())
    kvbytes = 2 * L * B0 * Hkv * S * hd * kstack.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid=(L, P),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs,
        out_specs=[
            pl.BlockSpec((B, dim), lambda l, p: (0, 0)),
            pl.BlockSpec((1, B, Hkv * hd), lambda l, p: (l, 0, 0)),
            pl.BlockSpec((1, B, Hkv * hd), lambda l, p: (l, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, dim), jnp.float32),
            jax.ShapeDtypeStruct((L, B, Hkv * hd), jnp.float32),
            jax.ShapeDtypeStruct((L, B, Hkv * hd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, dim), jnp.bfloat16),        # x_res
            pltpu.VMEM((B, dim), jnp.bfloat16),        # hn
            pltpu.VMEM((B, spec.nqkv), jnp.float32),   # qkv_acc
            pltpu.VMEM((spec.nqkv, B), jnp.bfloat16),  # q/k/v transposed
            pltpu.VMEM((nq, B), jnp.float32),          # attn out (transposed)
            pltpu.VMEM((B, nq), jnp.bfloat16),         # attn out (lanes)
            pltpu.VMEM((B, 2 * ffn), jnp.float32),     # gate/up acc
            pltpu.VMEM((B, ffn_pad), jnp.bfloat16),    # mid
            pltpu.VMEM((B, dim), jnp.float32),         # down acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (dim * spec.nqkv + nq * dim + dim * 2 * ffn
                           + ffn * dim) * L,
            bytes_accessed=wbytes + kvbytes,
            transcendentals=B * H * S * L,
        ),
        interpret=interpret,
    )(qpos, *operands)
    x_out, k_new, v_new = out
    return x_out[:B0], k_new[:, :B0], v_new[:, :B0]


# --------------------------------------------------------------------------
# builder: engine params -> stacked megakernel operands
# --------------------------------------------------------------------------

@dataclass
class MegaModel:
    spec: MegaSpec
    planes: dict               # stacked (L, ...) weight planes
    norms: dict                # attn_norm / ffn_norm (L, dim) f32
    rope: RopeParams


def _uniform_qt(layers, key):
    qts = {lyr[key].qtype for lyr in layers}
    return qts.pop() if len(qts) == 1 else None


def _pick_tn(n: int, bytes_per_col: int, cap: int) -> int | None:
    for tn in range(n, 127, -128):
        if n % tn == 0 and tn * bytes_per_col <= cap:
            return tn
    return None


def _col_bytes(qt: GGMLType, k: int, planes: dict, prefix: str) -> int:
    return sum(_plane_rows(qt, nm, k)
               * planes[f"{prefix}_{nm}"].dtype.itemsize
               for nm in PLANE_ORDER[qt])


def build_mega(params: dict, cfg, n_ctx_cache: int,
               kv_itemsize: int = 2, kv_rows: int = MROWS) -> MegaModel | None:
    """Stack per-layer weights for the megakernel; None if ineligible.

    Eligibility = the llama-family topology the kernel implements: rms
    pre-norm, fused QKV / gate-up QTensors, no biases, no MoE/ALiBi/
    qk-norm/parallel-residual, rope norm/neox/none, causal, and shapes
    that tile under the VMEM budget.
    """
    layers = params.get("layers", [])
    if not layers:
        return None
    if (cfg.norm_type != "rms" or cfg.post_norm or cfg.parallel_residual
            or cfg.qk_norm or cfg.n_expert > 0 or cfg.pos_emb
            or cfg.tok_norm or not cfg.causal or cfg.max_alibi_bias > 0
            or cfg.clamp_kqv > 0 or cfg.res_scale != 1.0
            or cfg.rope.kind not in ("norm", "neox", "none")):
        return None
    from tpulamm.ops.qtensor import QTensor
    need = ("wqkv_fused", "wo", "wgateup_fused", "w_down", "attn_norm",
            "ffn_norm")
    for lyr in layers:
        for k in need:
            if lyr.get(k) is None:
                return None
        for k in ("wqkv_fused", "wo", "wgateup_fused", "w_down"):
            w = lyr[k]
            if not (isinstance(w, QTensor) and w.layout == "mm"):
                return None
        if any(lyr.get(b) is not None
               for b in ("bqkv_fused", "bo", "b_down", "b_gate", "b_up",
                         "ffn_act_scales", "attn_norm_2")):
            return None
    qts = tuple(_uniform_qt(layers, k)
                for k in ("wqkv_fused", "wo", "wgateup_fused", "w_down"))
    if any(q is None for q in qts):
        return None
    hd = cfg.head_dim
    H, Hkv, dim = cfg.n_heads, cfg.n_kv_heads, cfg.dim
    nqkv = (H + 2 * Hkv) * hd
    nq = H * hd
    ffn = cfg.ffn_dim
    l0 = layers[0]
    if (l0["wqkv_fused"].mm_dims != (nqkv, dim)
            or l0["wo"].mm_dims != (dim, nq)
            or l0["wgateup_fused"].mm_dims != (2 * ffn, dim)
            or l0["w_down"].mm_dims != (dim, ffn)):
        return None
    if dim % TK or nq % TK or ffn % TK or cfg.rope.n_rot % 2:
        return None

    planes = {}
    for prefix, key in (("qkv", "wqkv_fused"), ("wo", "wo"),
                        ("gu", "wgateup_fused"), ("dn", "w_down")):
        for nm in PLANE_ORDER[layers[0][key].qtype]:
            planes[f"{prefix}_{nm}"] = jnp.stack(
                [lyr[key].planes[nm] for lyr in layers])
    norms = {
        "attn_norm": jnp.stack([lyr["attn_norm"] for lyr in layers]
                               ).astype(jnp.float32)[:, None, :],
        "ffn_norm": jnp.stack([lyr["ffn_norm"] for lyr in layers]
                              ).astype(jnp.float32)[:, None, :],
    }

    # tile under the VMEM budget: every input block is double-buffered, so
    # 2 * (sum of block bytes) + scratch must fit in ~14.5MB scoped VMEM
    kv_block = kv_rows * Hkv * n_ctx_cache * hd * kv_itemsize
    cb = {p: _col_bytes(q, k, planes, p)
          for p, q, k in (("qkv", qts[0], dim), ("wo", qts[1], nq),
                          ("gu", qts[2], dim))}
    dn_chunk_bytes = sum(
        (PLANE_ROWS[nm] if nm in PLANE_ROWS
         else TK // SPECS[qts[3]].group)
        * planes[f"dn_{nm}"].dtype.itemsize for nm in PLANE_ORDER[qts[3]]
    ) * dim
    for cap in (14 << 17, 10 << 17, 6 << 17, 3 << 17):   # 1.75MB .. 0.38MB
        tn_qkv = _pick_tn(nqkv, cb["qkv"], cap)
        tn_wo = _pick_tn(dim, cb["wo"], cap)
        tn_gu = _pick_tn(2 * ffn, cb["gu"], cap)
        kc_down = max(1, min(8, cap // max(dn_chunk_bytes, 1),
                             ffn // TK))
        if not (tn_qkv and tn_wo and tn_gu):
            continue
        blocks = (tn_qkv * cb["qkv"] + tn_wo * cb["wo"] + tn_gu * cb["gu"]
                  + kc_down * dn_chunk_bytes + 2 * kv_block
                  + MROWS * (n_ctx_cache + 2 * nq + 2 * Hkv * hd) * 4)
        # row-major scratches cost MROWS rows x feature lanes; the two
        # TRANSPOSED scratches (qkvt, attn_t) are lane-padded to 128
        scratch = (MROWS * (2 * dim * 2 + nqkv * 4 + nq * 2
                            + 2 * ffn * 4 + ffn * 2 + dim * 4)
                   + nqkv * 128 * 2 + nq * 128 * 4)
        if 2 * blocks + scratch <= int(14.5 * 2 ** 20):
            break
    else:
        return None

    spec = MegaSpec(
        n_layers=len(layers), dim=dim, n_heads=H, n_kv_heads=Hkv,
        head_dim=hd, ffn=ffn, nqkv=nqkv, qtypes=qts, act=cfg.ffn_act,
        eps=cfg.norm_eps, rope_kind=cfg.rope.kind, n_rot=cfg.rope.n_rot,
        tn_qkv=tn_qkv, tn_wo=tn_wo, tn_gu=tn_gu, kc_down=kc_down)
    return MegaModel(spec=spec, planes=planes, norms=norms, rope=cfg.rope)
