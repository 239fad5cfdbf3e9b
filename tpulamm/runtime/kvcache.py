"""KV cache: preallocated per-slot tensors with position metadata.

TPU-native redesign of the reference's ring-buffer cell cache
(llama_kv_cache, llama.cpp:1830-1874 and ops :2099-2535): instead of a shared
cell pool with per-cell seq_id sets, each sequence owns a slot (batch row) of
a statically-shaped (L, B, S, H_kv, D) tensor pair, and per-cell positions
live in a (B, S) int32 array (-1 = empty). The attention mask is derived from
positions exactly like the reference's KQ_mask (llama_set_inputs,
llama.cpp:8523), so position-surgery features (context shift, self-extend)
work the same way:

- seq_rm   -> invalidate positions in a range             (llama.cpp:2321)
- seq_cp   -> copy a slot's cells to another slot          (llama.cpp:2381)
- seq_add  -> shift positions + re-rotate cached K (the reference's K-shift
              graph, build_k_shift llama.cpp:5549)         (llama.cpp:2444)
- seq_div  -> integer-divide positions + re-rotate K (self-extend)
                                                            (llama.cpp:2489)
- defrag   -> compact live cells to the front of the slot   (llama.cpp:2535)

All ops are jit-compatible (static shapes, masked updates).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

from tpulamm.ops.rope import RopeParams, apply_rope


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    # k/v are PER-LAYER lists of (B, H_kv, S, D) arrays (roped keys/values).
    # A stacked (L, B, ...) tensor forces XLA to materialize the whole
    # cache on every per-layer scatter inside jit/scan; separate buffers
    # keep each layer's update in place (measured: decode tok/s stops
    # degrading with n_ctx). The reference's kv_self.k_l/v_l are per-layer
    # tensors for the same reason (llama.cpp:1841). Head-major (H before S)
    # is the canonical attention layout: the decode einsums consume each
    # head's (S, D) plane contiguously, so no per-step relayout copies
    # (S-major cost a measured ~650us/step = 27% at 22 layers on v5e).
    k: list            # L x (B, H_kv, S, D)
    v: list            # L x (B, H_kv, S, D)
    pos: jax.Array          # (B, S) int32, -1 = empty cell
    seg: jax.Array = None   # (B, S) int32 packed segment range lo|hi<<16;
    #                         0 = main sequence (visible to every query).
    #                         Non-zero segments implement the reference's
    #                         multi-seq_id batch masks (lookahead decoding).
    # Quantized caches (the reference's cache_type_k/v = q8_0,
    # llama.cpp:1841 type_k/type_v + common.cpp kv_cache_type_from_str):
    # k/v hold int8 codes and ks/vs hold per-(b, h, s)-row f32 scales
    # (one scale per head_dim row — coarser than ggml's 32-elem q8_0
    # blocks, but the row is only 64-256 wide and the scale plane stays
    # a cheap (B, H, S) tensor the attention einsums fold in for free).
    # None = that tensor is a float cache.
    ks: list | None = None  # L x (B, H_kv, S) f32 per-row K scales
    vs: list | None = None  # L x (B, H_kv, S) f32 per-row V scales

    def __post_init__(self):
        if self.seg is None:
            self.seg = jnp.zeros_like(self.pos)

    def tree_flatten(self):
        ks = tuple(self.ks) if self.ks is not None else None
        vs = tuple(self.vs) if self.vs is not None else None
        return (tuple(self.k), tuple(self.v), self.pos, self.seg,
                ks, vs), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        # no validation/normalization here: transforms (shard_map, jit)
        # unflatten with placeholder children (None, tracers, specs)
        k, v, pos, seg, ks, vs = children
        obj = object.__new__(cls)
        obj.k, obj.v, obj.pos, obj.seg = list(k), list(v), pos, seg
        obj.ks = list(ks) if ks is not None else None
        obj.vs = list(vs) if vs is not None else None
        return obj

    # -- construction -------------------------------------------------------
    @staticmethod
    def create(n_layers: int, n_slots: int, n_ctx: int, n_kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16, dtype_v=None,
               qtype_k: str | None = None,
               qtype_v: str | None = None) -> "KVCache":
        for qt in (qtype_k, qtype_v):
            if qt not in (None, "q8_0"):
                raise ValueError(f"unsupported KV cache quant type {qt!r} "
                                 "(supported: q8_0)")
        shape = (n_slots, n_kv_heads, n_ctx, head_dim)
        sshape = (n_slots, n_kv_heads, n_ctx)

        def bufs(q, dt):
            dt = jnp.int8 if q else dt
            return [jnp.zeros(shape, dt) for _ in range(n_layers)]

        def scales(q):
            return ([jnp.ones(sshape, jnp.float32) for _ in range(n_layers)]
                    if q else None)

        return KVCache(
            k=bufs(qtype_k, dtype),
            v=bufs(qtype_v, dtype_v if dtype_v is not None else dtype),
            pos=jnp.full((n_slots, n_ctx), -1, jnp.int32),
            seg=jnp.zeros((n_slots, n_ctx), jnp.int32),
            ks=scales(qtype_k), vs=scales(qtype_v),
        )

    @property
    def n_ctx(self) -> int:
        return self.k[0].shape[2]

    @property
    def n_slots(self) -> int:
        return self.k[0].shape[0]

    @property
    def n_layers(self) -> int:
        return len(self.k)

    @property
    def dtype(self):
        return self.k[0].dtype

    @property
    def quantized(self) -> bool:
        return self.ks is not None or self.vs is not None

    # -- queries -------------------------------------------------------------
    def used(self) -> jnp.ndarray:
        """(B,) number of live cells per slot."""
        return jnp.sum(self.pos >= 0, axis=-1).astype(jnp.int32)

    def max_pos(self) -> jnp.ndarray:
        """(B,) maximum live position per slot (-1 if empty)."""
        return jnp.max(self.pos, axis=-1)


# CLI-exposed cache storage types (-ctk/-ctv); the single source the CLIs
# (cli/main.py, cli/bench.py, server/server.py) and Engine share
KV_CACHE_TYPES = ("float32", "bfloat16", "float16", "q8_0")


def q8_quantize(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) absmax int8 quantization.

    x: (..., D) float -> (codes int8 (..., D), scales f32 (...,)).
    Matches ggml's quantize_row_q8_0 recipe (absmax/127) at row
    granularity instead of 32-element blocks.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _range_mask(pos: jnp.ndarray, slot: int | jnp.ndarray,
                p0: int | jnp.ndarray, p1: int | jnp.ndarray) -> jnp.ndarray:
    """(B, S) bool: cells of `slot` whose position is in [p0, p1)."""
    n_slots = pos.shape[0]
    slot_mask = jnp.arange(n_slots)[:, None] == slot
    in_range = (pos >= p0) & (pos < p1) & (pos >= 0)
    return slot_mask & in_range


def seq_rm(cache: KVCache, slot, p0=0, p1=jnp.iinfo(jnp.int32).max) -> KVCache:
    m = _range_mask(cache.pos, slot, p0, p1)
    return replace(cache, pos=jnp.where(m, -1, cache.pos))


def clear(cache: KVCache) -> KVCache:
    return replace(cache, pos=jnp.full_like(cache.pos, -1))


def seq_cp(cache: KVCache, src: int, dst: int) -> KVCache:
    def cp(bufs):
        return (None if bufs is None
                else [b.at[dst].set(b[src]) for b in bufs])
    pos = cache.pos.at[dst].set(cache.pos[src])
    seg = cache.seg.at[dst].set(cache.seg[src])
    return KVCache(k=cp(cache.k), v=cp(cache.v), pos=pos, seg=seg,
                   ks=cp(cache.ks), vs=cp(cache.vs))


def seq_keep(cache: KVCache, slot: int) -> KVCache:
    """Invalidate every slot except `slot` (llama_kv_cache_seq_keep)."""
    keep = jnp.arange(cache.n_slots)[:, None] == slot
    return replace(cache, pos=jnp.where(keep, cache.pos, -1))


def seq_add(cache: KVCache, slot, p0, p1, delta: int,
            rope: RopeParams) -> KVCache:
    """Shift positions in [p0,p1) by delta; re-rope cached K accordingly.

    Equivalent to llama_kv_cache_seq_add + the deferred K-shift graph
    (llama.cpp:2444-2487, :5549, applied at :9289). Cells whose new position
    falls below 0 are removed, as in the reference.
    """
    m = _range_mask(cache.pos, slot, p0, p1)
    new_pos = jnp.where(m, cache.pos + delta, cache.pos)
    k, ks = _apply_pos_change(cache, m, new_pos, rope)
    new_pos = jnp.where(new_pos < 0, -1, new_pos)
    return KVCache(k=k, v=cache.v, pos=new_pos, seg=cache.seg,
                   ks=ks, vs=cache.vs)


def seq_div(cache: KVCache, slot, p0, p1, d: int, rope: RopeParams) -> KVCache:
    """Divide positions in [p0,p1) by d (self-extend grouped attention,
    llama.cpp:2489-2522) and re-rope cached K."""
    m = _range_mask(cache.pos, slot, p0, p1)
    new_pos = jnp.where(m, cache.pos // d, cache.pos)
    k, ks = _apply_pos_change(cache, m, new_pos, rope)
    return KVCache(k=k, v=cache.v, pos=new_pos, seg=cache.seg,
                   ks=ks, vs=cache.vs)


def _apply_pos_change(cache: KVCache, mask: jnp.ndarray,
                      new_pos: jnp.ndarray, rope: RopeParams):
    delta = jnp.where(mask, new_pos - cache.pos, 0)        # (B, S)

    # rope by delta composes with the stored rotation; delta==0 is identity.
    # apply_rope wants (..., S, H, D): transpose around it (surgery ops run
    # once per shift, not per decode step — the relayout cost is fine here)
    def rot(kl):
        r = apply_rope(kl.transpose(0, 2, 1, 3), delta, rope)
        return r.transpose(0, 2, 1, 3)
    if cache.ks is None:
        return [jnp.where(mask[:, None, :, None], rot(kl), kl)
                for kl in cache.k], None
    # quantized K: dequant -> re-rope -> requant. Untouched rows keep their
    # exact stored codes/scales (the where masks are row-granular, matching
    # the per-row scale plane), so only shifted cells lose any precision.
    k_new, ks_new = [], []
    for kl, sl in zip(cache.k, cache.ks):
        kf = kl.astype(jnp.float32) * sl[..., None]
        q, s = q8_quantize(rot(kf))
        k_new.append(jnp.where(mask[:, None, :, None], q, kl))
        ks_new.append(jnp.where(mask[:, None, :], s, sl))
    return k_new, ks_new


def defrag(cache: KVCache) -> KVCache:
    """Compact live cells to the front of each slot, preserving order
    (llama_kv_cache_defrag_internal, llama.cpp:9071 — ours is a gather)."""
    s = cache.n_ctx
    live = cache.pos >= 0                                   # (B, S)
    # stable order: live cells first, keeping relative order
    order = jnp.argsort(jnp.where(live, jnp.arange(s)[None, :], s + jnp.arange(s)[None, :]), axis=-1)
    pos = jnp.take_along_axis(jnp.where(live, cache.pos, -1), order, axis=-1)
    seg = jnp.take_along_axis(cache.seg, order, axis=-1)
    idx = order[:, None, :, None]
    k = [jnp.take_along_axis(kl, idx, axis=2) for kl in cache.k]
    v = [jnp.take_along_axis(vl, idx, axis=2) for vl in cache.v]
    sidx = order[:, None, :]
    ks = (None if cache.ks is None else
          [jnp.take_along_axis(sl, sidx, axis=2) for sl in cache.ks])
    vs = (None if cache.vs is None else
          [jnp.take_along_axis(sl, sidx, axis=2) for sl in cache.vs])
    return KVCache(k=k, v=v, pos=pos, seg=seg, ks=ks, vs=vs)


def write_kv(cache: KVCache, layer: int, k_new: jnp.ndarray,
             v_new: jnp.ndarray, slots: jnp.ndarray,
             cells: jnp.ndarray, positions: jnp.ndarray,
             segs: jnp.ndarray | None = None,
             prefer_dus: bool = False) -> KVCache:
    """Store roped K / V for a ubatch (llm_build_kv_store equivalent).

    k_new/v_new: (B, T, H_kv, D); slots: (B,) slot ids, or None when the
    batch covers every slot in order (slots == arange(B) == n_slots) —
    the identity case every decode path hits; cells: (B, T) cell
    indices to write; positions: (B, T) token positions (-1 entries are
    padding and are skipped via position -1 == empty).
    """
    B, T = k_new.shape[0], k_new.shape[1]
    H = k_new.shape[2]
    kT = k_new.transpose(0, 2, 1, 3)                      # (B, H, T, D)
    vT = v_new.transpose(0, 2, 1, 3)
    k = list(cache.k)
    v = list(cache.v)
    ks = None if cache.ks is None else list(cache.ks)
    vs = None if cache.vs is None else list(cache.vs)

    # T==1 decode hot path: per-row dynamic_update_slice instead of an
    # advanced-index scatter. XLA materializes a FULL K/V copy when a
    # scatter result feeds a pallas custom call (measured: 782 vs 141 us
    # per layer at S=8192 — the whole flash-decode win drowned in copies;
    # the einsum path fuses the scatter and never paid). Padding rows
    # target the trash cell (cells == n_ctx), which a 1-token update fits
    # exactly (cache S = n_ctx + 1) — no OOB clamping can clobber live
    # cells. B is a static bound (<= n_slots); cap the unrolled row loop
    # at 16 to keep the op count sane on wide serving engines.
    # prefer_dus: the consumer is the flash-decode pallas kernel, which
    # pays a full per-layer K/V copy if the write is a scatter; the
    # einsum path prefers the fused scatter (DUS costs it ~200 MB peak
    # at tight configs). TPULAMM_KV_SCATTER=1 forces scatter for A/B.
    import os
    use_dus = (prefer_dus and slots is None and T == 1 and B <= 16
               and not os.environ.get("TPULAMM_KV_SCATTER"))

    def dus_rows(buf, upd):
        """upd (B, H, 1, D) or (B, H, 1) -> in-place row updates."""
        for b in range(B):
            start = (b, 0, cells[b, 0]) + (0,) * (buf.ndim - 3)
            buf = jax.lax.dynamic_update_slice(buf, upd[b:b + 1], start)
        return buf

    def store(buf, upd):
        if use_dus:
            return dus_rows(buf, upd)
        sl = (jnp.arange(B, dtype=jnp.int32) if slots is None else slots)
        b3 = sl[:, None, None]                   # (B, 1, 1)
        h3 = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        c3 = cells[:, None, :]                   # (B, 1, T)
        return buf.at[b3, h3, c3].set(upd)

    if ks is not None:
        qk, sk = q8_quantize(kT)
        k[layer] = store(k[layer], qk)
        ks[layer] = store(ks[layer], sk)
    else:
        k[layer] = store(k[layer], kT.astype(k[layer].dtype))
    if vs is not None:
        qv, sv = q8_quantize(vT)
        v[layer] = store(v[layer], qv)
        vs[layer] = store(vs[layer], sv)
    else:
        v[layer] = store(v[layer], vT.astype(v[layer].dtype))
    if layer != 0:
        pos, seg = cache.pos, cache.seg
    else:
        segv = segs if segs is not None else jnp.zeros_like(positions)
        if use_dus:
            pos, seg = cache.pos, cache.seg
            for b in range(B):
                st = (b, cells[b, 0])
                pos = jax.lax.dynamic_update_slice(
                    pos, positions[b:b + 1], st)
                seg = jax.lax.dynamic_update_slice(seg, segv[b:b + 1], st)
        else:
            sl = (jnp.arange(B, dtype=jnp.int32) if slots is None
                  else slots)
            b_idx = sl[:, None]
            pos = cache.pos.at[b_idx, cells].set(positions)
            seg = cache.seg.at[b_idx, cells].set(segv)
    return KVCache(k=k, v=v, pos=pos, seg=seg, ks=ks, vs=vs)
