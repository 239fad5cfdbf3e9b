"""Generic transformer forward covering every reference architecture.

One feature-flagged functional forward replaces the reference's 23 per-arch
graph builders (llm_build_context::build_*, llama.cpp:5708-8308). The
structural axes, each mirrored from the reference:

- pre-norm (llama & co) / post-norm (build_bert :6445) / parallel residual
  (build_falcon :6040, build_phi2 :7208, build_plamo :7331)
- RMSNorm vs LayerNorm with optional biases (llm_build_norm :5178)
- separate or fused QKV (fused weights are split into wq/wk/wv at load time —
  block-quant rows are independent, so the split is bit-exact)
- optional q/k per-head layernorm (build_persimmon :6205)
- RoPE norm/neox/none with partial n_rot pass-through (ggml_rope_custom)
- ALiBi position bias (ggml_soft_max_ext alibi slopes, ggml.c:12283-12298)
- fused-qkv clamping (build_mpt :6804, f_clamp_kqv)
- FFN: silu/gelu/relu², gated (PAR) or plain (SEQ), optional biases and
  mpt act scales (llm_build_ffn :5203-5288)
- MoE top-k expert mixing (build_llama MoE branch :5797-5858)
- learned position embeddings (build_gpt2 :7441), token-type embedding and
  embedding layernorm (build_bert :6472-6482), embedding/residual/logit
  scaling (build_minicpm :7844-7948, build_gemma :7971)
- mean/cls pooling for embedding models (build_bert :6633-6652)

Weights are QTensors (packed quantized planes); projections go through
qmatmul (fused dequant+matmul Pallas kernel). jax.jit traces once per (B, T)
shape; XLA owns scheduling/fusion (no ggml graph executor analogue).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from tpulamm.models.config import ModelConfig
from tpulamm.ops.layers import layer_norm, masked_softmax, rms_norm
from tpulamm.ops.qmatmul import dense_matmul, qmatmul
from tpulamm.ops.qtensor import QTensor, gather_dequant_rows
from tpulamm.ops.rope import apply_rope
from tpulamm.runtime.kvcache import KVCache, write_kv

Params = dict[str, Any]


def _proj(x: jnp.ndarray, w, cfg: ModelConfig, bias=None) -> jnp.ndarray:
    if isinstance(w, QTensor):
        y = qmatmul(x, w, compute_dtype=cfg.cdtype)
    else:
        y = dense_matmul(x, w)
    if bias is not None:
        y = (y + bias.astype(jnp.float32)).astype(y.dtype)
    return y


def _proj_row(x: jnp.ndarray, w, cfg: ModelConfig, bias=None,
              mode: str = "none") -> jnp.ndarray:
    """Row-parallel projection (input features sharded on tp): each shard
    computes a partial product over its K-slice; psum over the tp axis
    completes the contraction (megatron attn-output/ffn-down pattern).
    The (replicated) bias is added once, after the reduction.

    mode "gather" covers weights the layout left replicated (their K
    doesn't split at quant-chunk granularity) while the upstream col
    weight WAS sharded: the feature-local activation is all-gathered
    instead (see ModelConfig.row_attn/row_ffn/row_moe)."""
    if cfg.tp_axis is None or mode == "none":
        return _proj(x, w, cfg, bias)
    if mode == "gather":
        x = jax.lax.all_gather(x, cfg.tp_axis, axis=-1, tiled=True)
        y = _proj(x, w, cfg)
    else:
        y = _proj(x, w, cfg)
        y = jax.lax.psum(y, cfg.tp_axis)
    if bias is not None:
        y = (y + bias.astype(jnp.float32)).astype(y.dtype)
    return y


def _norm(x: jnp.ndarray, p: Params, name: str, cfg: ModelConfig) -> jnp.ndarray:
    """llm_build_norm (llama.cpp:5178): RMS or LN with optional bias."""
    w = p[name]
    b = p.get(name + "_b")
    if cfg.norm_type == "rms":
        return rms_norm(x, w, cfg.norm_eps)
    return layer_norm(x, w, b, cfg.norm_eps)


def _act(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    from tpulamm.ops.layers import gelu, silu
    if kind == "silu":
        return silu(x)
    if kind == "gelu":
        return gelu(x)           # ggml_gelu: tanh-approximated
    if kind == "relu":
        return jnp.maximum(x, 0)
    if kind == "relu_sqr":
        r = jnp.maximum(x, 0)
        return r * r
    raise ValueError(kind)


def alibi_slopes(n_heads: int, max_bias: float) -> jnp.ndarray:
    """Per-head ALiBi slopes, exactly ggml_compute_forward_soft_max_f32
    (ggml.c:12283-12298)."""
    n_head_log2 = 1 << int(math.floor(math.log2(n_heads)))
    m0 = 2.0 ** (-max_bias / n_head_log2)
    m1 = 2.0 ** (-(max_bias / 2.0) / n_head_log2)
    h = jnp.arange(n_heads, dtype=jnp.float32)
    return jnp.where(h < n_head_log2,
                     m0 ** (h + 1.0),
                     m1 ** (2.0 * (h - n_head_log2) + 1.0))


def embed(params: Params, cfg: ModelConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    emb = params["tok_emb"]
    if isinstance(emb, QTensor):
        h = gather_dequant_rows(emb, tokens, dtype=cfg.cdtype)
    else:
        h = emb[tokens].astype(cfg.cdtype)
    return h


def attention(layer: Params, cfg: ModelConfig, h: jnp.ndarray,
              positions: jnp.ndarray, cache: KVCache, layer_idx: int,
              slots: jnp.ndarray, cells: jnp.ndarray,
              segs: jnp.ndarray | None = None,
              kv_span: int | None = None) -> tuple:
    B, T, _ = h.shape
    hd = cfg.head_dim

    if layer.get("wqkv_fused") is not None:
        # one fused kernel launch (engine optimization pass; bias folded)
        qkv = _proj(h, layer["wqkv_fused"], cfg, layer.get("bqkv_fused"))
        nq = cfg.n_heads * hd
        nkv = cfg.n_kv_heads * hd
        q, k, v = (qkv[..., :nq], qkv[..., nq:nq + nkv],
                   qkv[..., nq + nkv:])
    else:
        q = _proj(h, layer["wq"], cfg, layer.get("bq"))
        k = _proj(h, layer["wk"], cfg, layer.get("bk"))
        v = _proj(h, layer["wv"], cfg, layer.get("bv"))
    if cfg.clamp_kqv > 0.0:
        q = jnp.clip(q, -cfg.clamp_kqv, cfg.clamp_kqv)
        k = jnp.clip(k, -cfg.clamp_kqv, cfg.clamp_kqv)
        v = jnp.clip(v, -cfg.clamp_kqv, cfg.clamp_kqv)
    q = q.reshape(B, T, cfg.n_heads, hd)
    k = k.reshape(B, T, cfg.n_kv_heads, hd)
    v = v.reshape(B, T, cfg.n_kv_heads, hd)

    if cfg.qk_norm:
        # per-head layernorm over head_dim (build_persimmon, llama.cpp:6240)
        q = layer_norm(q, layer["attn_q_norm"], layer.get("attn_q_norm_b"),
                       cfg.norm_eps)
        k = layer_norm(k, layer["attn_k_norm"], layer.get("attn_k_norm_b"),
                       cfg.norm_eps)

    q = apply_rope(q, positions, cfg.rope)
    k = apply_rope(k, positions, cfg.rope)

    # flash-decode dispatch must be DECIDED BEFORE the KV write: the
    # split-S kernel needs the write to be a dynamic_update_slice (a
    # scatter feeding the pallas custom call makes XLA materialize a
    # full K/V copy per layer — measured 782 vs 141 us at S=8192), while
    # the einsum path prefers the fused scatter (the DUS form costs it
    # ~200 MB of extra peak liveness at tight 8k configs). The einsum/
    # flash choice below re-derives the same predicate.
    import os as _os
    _group = cfg.n_heads // cfg.n_kv_heads
    _S_pre = cache.k[layer_idx].shape[2]
    if kv_span is not None and kv_span < _S_pre:
        _S_pre = kv_span
    _fd_env = _os.environ.get("TPULAMM_FLASH_DECODE", "")
    _small_q = T * _group < 64
    _fd_auto = (jax.default_backend() == "tpu" and _small_q
                and (_S_pre >= 8192
                     or (_S_pre >= 6144 and T * _group >= 8))
                and _fd_env != "0")
    if _fd_env == "1" and _small_q:
        _fd_auto = True
    _fd_on = (_small_q and _fd_env != "0"
              and segs is None and cfg.max_alibi_bias == 0.0
              and hd in (64, 128, 256)
              and (cfg.flash_attn if cfg.flash_attn is not None
                   else _fd_auto))

    cache = write_kv(cache, layer_idx, k, v, slots, cells, positions, segs,
                     prefer_dus=_fd_on)

    def crow(arr):
        """slots=None batch contract: the batch covers the FIRST B cache
        rows in order. B < n_slots is active-slot compaction (the engine
        runs the scan at a power-of-two bucket covering the live slots):
        a STATIC prefix slice — fusible, so attention streams only B
        rows' KV instead of every allocated slot's (the serving
        B-dimension tax; write_kv writes rows arange(B) to match)."""
        return arr if arr.shape[0] == B else arr[:B]

    if slots is None:
        # batch covers the first B slots in order: identity / static
        # prefix slice — never a gather, which would copy every layer's
        # full KV buffer each step (measured ~8us/layer/step on v5e)
        kc, vc = crow(cache.k[layer_idx]), crow(cache.v[layer_idx])
    else:
        kc = cache.k[layer_idx][slots]                 # (B, Hkv, S, D)
        vc = cache.v[layer_idx][slots]
    # static attention span (engine-computed bucket covering every
    # occupied cell + this call's writes): attention streams only
    # span cells instead of the whole allocated cache — decode on a
    # large-n_ctx engine with a short live context otherwise pays the
    # full-cache KV read every step (the write above targets the FULL
    # cache; only the read view narrows)
    if kv_span is not None and kv_span < cache.k[layer_idx].shape[2]:
        kc = kc[:, :, :kv_span]
        vc = vc[:, :, :kv_span]
    group = cfg.n_heads // cfg.n_kv_heads

    qg = q.reshape(B, T, cfg.n_kv_heads, group, hd)

    # fused flash-attention kernel (ops/flash_attention.py) whenever the
    # KQ mask is expressible in-kernel: live + causal masks from positions
    # (segment masks and ALiBi use the einsum path). Query positions are
    # affine (engine contract: n_past + arange, pads at the tail) — the
    # kernel reconstructs them from base + row index.
    #
    # Auto dispatch is WORKLOAD-shaped (measured on v5e, 1.1B Q4_0):
    # prefill (large T) amortizes the ~10us kernel-call floor and skips
    # the (B,H,G,T,S) score materialization — but that only pays once the
    # scores are big (pp512 at S=513: einsum 11.8k vs flash 11.2k t/s;
    # at S=2049 the einsum would round-trip ~134MB of scores per layer).
    # Single-token decode pays the floor per layer per step, and the
    # XLA-fused einsum wins until the KV span is long (tg256: einsum 441
    # vs flash 376 t/s at S=2049 — crossover around S~6k).
    S_cache = kc.shape[2]          # span-aware: the real workload size
    # Decode (small T*G) uses the SPLIT-S kernel (flash_decode):
    # independent KV chunks with an XLA max/denominator combine, so the
    # per-chunk grid steps are all-parallel and 4x fatter than the main
    # kernel's sequential 512-key tiles — the main kernel's decode half
    # measured 28.3 vs einsum's 130.5 t/s at S=8192 on the MHA 7B
    # (PERF.md r4) because a 1-row query paid the online-softmax chain
    # per tiny tile. TPULAMM_FLASH_DECODE=0 keeps decode off flash
    # entirely; =1 forces split-S decode at any S (A/B).
    import os
    fd_env = _fd_env
    small_q = _small_q                           # decode-regime rows
    # _fd_on was decided BEFORE write_kv (the DUS-vs-scatter choice
    # depends on it); prefill keeps its own thresholds
    auto = _fd_on or (jax.default_backend() == "tpu" and (
        (T >= 64 and S_cache >= 1024)
        or (S_cache >= 6144 and T * group >= 8)))
    # quantized (q8_0) caches work on BOTH paths: einsum folds the per-row
    # scales into the score/prob tensors; the flash kernel folds them
    # in-kernel (ks into score columns, vs into p) — either way the cache
    # streams 1 byte/elem (the long-context regime q8_0 exists for).
    use_flash = (segs is None and cfg.max_alibi_bias == 0.0
                 and hd in (64, 128, 256)
                 and (cfg.flash_attn if cfg.flash_attn is not None
                      else auto))
    if use_flash:
        from tpulamm.ops.flash_attention import (flash_attention,
                                                 flash_decode)
        kpos = crow(cache.pos) if slots is None else cache.pos[slots]
        kpos = kpos[:, :S_cache]
        qf = qg.transpose(0, 2, 1, 3, 4).reshape(
            B, cfg.n_kv_heads, T * group, hd)
        qbase = positions[:, 0]
        qlen = jnp.sum(positions >= 0, axis=1).astype(jnp.int32)

        def scp(planes):
            if planes is None:
                return None
            sc = (crow(planes[layer_idx]) if slots is None
                  else planes[layer_idx][slots])
            return sc[:, :, :S_cache]
        use_fd = _fd_on or (small_q and fd_env != "0")
        kw = {}
        if use_fd:
            # chunk scales with the span: 2048 at 8k (75.5 t/s), 4096 at
            # 16k (45.9 -> 51.5 measured) — fewer, fatter chunks amortize
            # the per-chunk floor as S grows
            kw["s_chunk"] = int(os.environ.get(
                "TPULAMM_FD_CHUNK", 4096 if S_cache > 8192 else 2048))
        attn_fn = flash_decode if use_fd else flash_attention
        o = attn_fn(qf, kc, vc, kpos, qbase, qlen,
                    scp(cache.ks), scp(cache.vs),
                    scale=float(1.0 / math.sqrt(hd)), g=group,
                    causal=cfg.causal,
                    interpret=jax.default_backend() != "tpu", **kw)
        o = o.reshape(B, cfg.n_kv_heads, T, group, hd) \
             .transpose(0, 2, 1, 3, 4)
        o = o.reshape(B, T, cfg.n_heads * hd).astype(cfg.cdtype)
        return _proj_row(o, layer["wo"], cfg, layer.get("bo"),
                         cfg.row_attn), cache

    # scores: (B, Hkv, G, T, S); cache is head-major so each head's (S, D)
    # plane streams contiguously into the dot — no relayout copies.
    # bf16 caches feed the MXU directly (f32 accumulation): upcasting K/V
    # to f32 first would materialize full-cache copies every step (the MXU
    # runs bf16 passes on f32 inputs at DEFAULT precision anyway, so the
    # upcast bought no accuracy); f32 caches keep the exact path.
    # (CPU XLA has no BF16xBF16=F32 dot thunk — TPU only)
    on_tpu = jax.default_backend() == "tpu"
    qk_dt = (kc.dtype if (on_tpu and kc.dtype == jnp.bfloat16)
             else jnp.float32)
    if cache.ks is not None:
        # q8_0 K: dot the int8 codes (converted in the dot operand stream —
        # HBM still reads 1 byte/elem), then fold the per-(b,h,s) row scale
        # into the score plane: (q . k_i8) * ks == q . k_dequant
        qk_dt = jnp.float32
    scores = jnp.einsum("bthgd,bhsd->bhgts", qg.astype(qk_dt),
                        kc.astype(qk_dt),
                        preferred_element_type=jnp.float32)
    if cache.ks is not None:
        ksc = (crow(cache.ks[layer_idx]) if slots is None
               else cache.ks[layer_idx][slots])[:, :, :S_cache]  # (B,Hkv,S)
        scores = scores * ksc[:, :, None, None, :]
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(hd)))

    kpos = (crow(cache.pos) if slots is None
            else cache.pos[slots])[:, :S_cache]
    if cfg.max_alibi_bias > 0.0:
        # ggml_soft_max_ext ALiBi: scores += slope[h] * key_pos. Slopes
        # depend on the GLOBAL head index: under tp, slice this shard's
        # contiguous head block out of the global slope table.
        slopes = alibi_slopes(cfg.n_heads * cfg.tp, cfg.max_alibi_bias)
        if cfg.tp_axis is not None:
            off = jax.lax.axis_index(cfg.tp_axis) * cfg.n_heads
            slopes = jax.lax.dynamic_slice(slopes, (off,), (cfg.n_heads,))
        slopes = slopes.reshape(1, cfg.n_kv_heads, group, 1, 1)
        scores = scores + slopes * kpos[:, None, None, None, :].astype(jnp.float32)

    # KQ_mask (llama_set_inputs, llama.cpp:8523): key cell live; causal archs
    # additionally require key pos <= query pos
    live = kpos[:, None, :] >= 0
    if cfg.causal:
        mask = live & (kpos[:, None, :] <= positions[:, :, None])
    else:
        mask = jnp.broadcast_to(live, (B, T, kpos.shape[-1]))
    if segs is not None:
        # segment visibility (multi-seq_id batch masks, lookahead decoding):
        # key seg 0 = main sequence, visible to all; otherwise the query's
        # segment id must fall in the key's packed [lo, hi] range
        kseg = (crow(cache.seg) if slots is None
                else cache.seg[slots])[:, :S_cache]       # (B, S)
        klo = kseg & 0xFFFF
        khi = kseg >> 16
        qid = (segs & 0xFFFF)[:, :, None]              # (B, T, 1)
        seg_ok = (klo[:, None, :] == 0) | \
            ((klo[:, None, :] <= qid) & (qid <= khi[:, None, :]))
        mask = mask & seg_ok
    mask = mask[:, None, None, :, :]                   # (B, 1, 1, T, S)

    probs = masked_softmax(scores, mask)
    pv_dt = (vc.dtype if (on_tpu and vc.dtype == jnp.bfloat16)
             else jnp.float32)
    if cache.vs is not None:
        # q8_0 V: scale is per key row and s is the contracted axis, so it
        # folds into probs (tiny (B,H,G,T,S) tensor) instead of dequantizing
        # the full cache: (probs * vs) . v_i8 == probs . v_dequant
        vsc = (crow(cache.vs[layer_idx]) if slots is None
               else cache.vs[layer_idx][slots])[:, :, :S_cache]  # (B,Hkv,S)
        probs = probs * vsc[:, :, None, None, :]
        pv_dt = jnp.float32
    out = jnp.einsum("bhgts,bhsd->bthgd", probs.astype(pv_dt),
                     vc.astype(pv_dt), preferred_element_type=jnp.float32)
    out = out.reshape(B, T, cfg.n_heads * hd).astype(cfg.cdtype)
    return _proj_row(out, layer["wo"], cfg, layer.get("bo"),
                     cfg.row_attn), cache


def ffn(layer: Params, cfg: ModelConfig, h: jnp.ndarray) -> jnp.ndarray:
    """llm_build_ffn (llama.cpp:5203): gated (PAR) when ffn_gate exists."""
    if layer.get("wgateup_fused") is not None:
        B, T, dim = h.shape
        import os
        if (os.environ.get("TPULAMM_FUSED_FFN")
                and jax.default_backend() == "tpu"
                and isinstance(layer["w_down"], QTensor)):
            # single-launch FFN kernel — measured SLOWER in-scan on v5e
            # (tg256 562.8 vs 607.8): the saved call floor is outweighed
            # by the unfused path's better cross-step DMA pipelining.
            # Kept opt-in for future hardware (see PERF.md policy table).
            from tpulamm.ops.pallas_ffn import (ffn_fused,
                                                ffn_fused_eligible)
            if ffn_fused_eligible(layer["wgateup_fused"], layer["w_down"],
                                  B * T) and cfg.ffn_act in ("silu",
                                                             "gelu"):
                y = ffn_fused(h.reshape(B * T, dim),
                              layer["wgateup_fused"], layer["w_down"],
                              act=cfg.ffn_act)
                if layer.get("b_down") is not None:
                    y = y + layer["b_down"].astype(jnp.float32)
                return y.reshape(B, T, dim)
        gu = _proj(h, layer["wgateup_fused"], cfg)
        half = gu.shape[-1] // 2
        gate, up = gu[..., :half], gu[..., half:]
        mid = (_act(gate.astype(jnp.float32), cfg.ffn_act)
               * up.astype(jnp.float32))
        return _proj_row(mid.astype(cfg.cdtype), layer["w_down"], cfg,
                         layer.get("b_down"), cfg.row_ffn)
    up = _proj(h, layer["w_up"], cfg, layer.get("b_up"))
    if layer.get("w_gate") is not None:
        gate = _proj(h, layer["w_gate"], cfg, layer.get("b_gate"))
        mid = (_act(gate.astype(jnp.float32), cfg.ffn_act)
               * up.astype(jnp.float32))
    else:
        mid = _act(up.astype(jnp.float32), cfg.ffn_act)
        if layer.get("ffn_act_scales") is not None:    # mpt (llm_build_ffn :5260)
            mid = mid / layer["ffn_act_scales"].astype(jnp.float32)
    return _proj_row(mid.astype(cfg.cdtype), layer["w_down"], cfg,
                     layer.get("b_down"), cfg.row_ffn)


def moe_ffn(layer: Params, cfg: ModelConfig, h: jnp.ndarray) -> jnp.ndarray:
    """MoE branch of build_llama (llama.cpp:5797-5858).

    TPU-native formulation: instead of ggml_mul_mat_id's per-expert row
    gather, compute each expert densely and combine with the (mostly zero)
    routing weights — jit-static, MXU-friendly; E is small (8 for mixtral).
    """
    router = _proj(h, layer["ffn_gate_inp"], cfg)          # (B, T, E)
    probs = jnp.asarray(jnp.exp(router - jnp.max(router, -1, keepdims=True)),
                        jnp.float32)
    probs = probs / probs.sum(-1, keepdims=True)
    topv, topi = jax.lax.top_k(probs, cfg.n_expert_used)
    topv = topv / topv.sum(-1, keepdims=True)              # renormalize
    # dense (B, T, E) weights with zeros off the top-k
    onehot = jnp.sum(jnp.eye(cfg.n_expert, dtype=jnp.float32)[topi]
                     * topv[..., None], axis=-2)
    out = None
    for e in range(cfg.n_expert):
        gate = _proj(h, layer["ffn_gate_exp"][e], cfg)
        up = _proj(h, layer["ffn_up_exp"][e], cfg)
        mid = (_act(gate.astype(jnp.float32), cfg.ffn_act)
               * up.astype(jnp.float32)).astype(cfg.cdtype)
        if cfg.row_moe == "gather":
            # replicated down weight, feature-local mid: per-expert gather
            ex = _proj_row(mid, layer["ffn_down_exp"][e], cfg,
                           mode="gather").astype(jnp.float32)
        else:
            ex = _proj(mid, layer["ffn_down_exp"][e], cfg) \
                .astype(jnp.float32)
        ex = ex * onehot[..., e:e + 1]
        out = ex if out is None else out + ex
    if cfg.row_moe == "psum":
        # psum is linear and the routing weights are shard-invariant: ONE
        # collective completes all E partial contractions
        out = jax.lax.psum(out, cfg.tp_axis)
    return out.astype(cfg.cdtype)


def _layer_ffn(layer: Params, cfg: ModelConfig, h: jnp.ndarray) -> jnp.ndarray:
    if layer.get("ffn_gate_inp") is not None and cfg.n_expert > 0:
        return moe_ffn(layer, cfg, h)
    return ffn(layer, cfg, h)


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: jnp.ndarray, cache: KVCache, slots: jnp.ndarray,
            cells: jnp.ndarray, segs: jnp.ndarray | None = None,
            embeds: jnp.ndarray | None = None,
            kv_span: int | None = None) -> tuple[jnp.ndarray, KVCache]:
    """tokens/positions/cells: (B, T); slots: (B,) -> (logits f32, cache).

    For embedding archs (bert) with no lm head, returns final hidden states
    (B, T, dim) instead of logits; pooling is a separate host-side step
    (runtime.embedding) as in the reference's pooling graphs.

    embeds (B, T, dim), when given, replaces the token-embedding lookup —
    the reference's llama_batch.embd input path (llama.cpp:8530-8537), used
    by llava to splice projected image embeddings into the stream.
    """
    h = embeds.astype(cfg.cdtype) if embeds is not None \
        else embed(params, cfg, tokens)
    if cfg.emb_scale != 1.0:
        h = (h.astype(jnp.float32) * cfg.emb_scale).astype(cfg.cdtype)
    if cfg.pos_emb:
        # pad rows carry position -1; clamp (they are masked downstream)
        p = jnp.maximum(positions, 0)
        h = h + params["pos_emb"][p].astype(cfg.cdtype)
    if params.get("type_emb") is not None:
        # token types hardcoded to zero "Sentence A" (build_bert :6475)
        h = h + params["type_emb"][0].astype(cfg.cdtype)
    if cfg.tok_norm:
        h = _norm(h, params, "tok_norm", cfg)

    for il, layer in enumerate(params["layers"]):
        if cfg.post_norm:
            # bert topology: x -> attn -> +res -> LN -> ffn -> +res -> LN
            attn_out, cache = attention(layer, cfg, h, positions, cache, il,
                                        slots, cells, segs, kv_span)
            h = _norm((h + attn_out).astype(cfg.cdtype), layer,
                      "attn_out_norm", cfg)
            h = _norm((h + _layer_ffn(layer, cfg, h)).astype(cfg.cdtype),
                      layer, "layer_out_norm", cfg)
        elif cfg.parallel_residual:
            hn = _norm(h, layer, "attn_norm", cfg)
            # falcon-40B feeds attention from a second norm (build_falcon :6055)
            ha = (_norm(h, layer, "attn_norm_2", cfg)
                  if layer.get("attn_norm_2") is not None else hn)
            attn_out, cache = attention(layer, cfg, ha, positions, cache, il,
                                        slots, cells, segs, kv_span)
            # gptneox feeds the FFN from its own norm of the SAME input
            # (HF post_attention_layernorm(x) in the parallel formula);
            # falcon/phi2/plamo/gptj share the attention norm
            hf = (_norm(h, layer, "ffn_norm", cfg)
                  if layer.get("ffn_norm") is not None else hn)
            ffn_out = _layer_ffn(layer, cfg, hf)
            h = (h + attn_out + ffn_out).astype(cfg.cdtype)
        else:
            hn = _norm(h, layer, "attn_norm", cfg)
            attn_out, cache = attention(layer, cfg, hn, positions, cache, il,
                                        slots, cells, segs, kv_span)
            if cfg.res_scale != 1.0:
                attn_out = attn_out * cfg.res_scale
            h = (h + attn_out).astype(cfg.cdtype)
            hn = _norm(h, layer, "ffn_norm", cfg)
            ffn_out = _layer_ffn(layer, cfg, hn)
            if cfg.res_scale != 1.0:
                ffn_out = ffn_out * cfg.res_scale
            h = (h + ffn_out).astype(cfg.cdtype)

    if params.get("out_norm") is not None:
        h = _norm(h, params, "out_norm", cfg)
    if params.get("output") is None:
        return h.astype(jnp.float32), cache            # embedding model
    if cfg.logit_scale != 1.0:
        h = (h.astype(jnp.float32) * cfg.logit_scale).astype(cfg.cdtype)
    logits = _proj(h, params["output"], cfg, params.get("output_b"))
    if cfg.head_sharded:
        # vocab-sharded lm head: contiguous shards concatenate back in
        # vocab order (tile padding sits at the end, i.e. in the last shard)
        logits = jax.lax.all_gather(logits, cfg.tp_axis, axis=-1, tiled=True)
    if logits.shape[-1] != cfg.vocab_size:
        # head was tile-padded (engine optimization pass); padded columns
        # are exact zeros — slice them off
        logits = logits[..., : cfg.vocab_size]
    return logits.astype(jnp.float32), cache
