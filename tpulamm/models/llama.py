"""LLaMA-family forward pass (functional, jit-friendly).

Semantics mirror build_llama (llama.cpp:5708-5882): RMSNorm -> {Q,K,V}
projections -> NORM RoPE on Q,K -> KV store -> masked softmax attention
(scale 1/sqrt(head_dim)) -> output proj -> residual; RMSNorm -> SwiGLU FFN
(silu(gate) * up -> down) -> residual; final RMSNorm -> lm_head.

The weights are QTensors (packed quantized planes); every projection goes
through qmatmul (fused dequant+matmul). The ggml graph/scheduler layer has no
analogue here: jax.jit traces this function once per (B, T) shape and XLA
owns scheduling/fusion.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from tpulamm.models.config import ModelConfig
from tpulamm.ops.layers import masked_softmax, rms_norm, silu
from tpulamm.ops.qmatmul import dense_matmul, qmatmul
from tpulamm.ops.qtensor import QTensor, gather_dequant_rows
from tpulamm.ops.rope import apply_rope
from tpulamm.runtime.kvcache import KVCache, write_kv

Params = dict[str, Any]


def _proj(x: jnp.ndarray, w, cfg: ModelConfig) -> jnp.ndarray:
    if isinstance(w, QTensor):
        return qmatmul(x, w, compute_dtype=cfg.cdtype)
    return dense_matmul(x, w)


def embed(params: Params, cfg: ModelConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    emb = params["tok_emb"]
    if isinstance(emb, QTensor):
        h = gather_dequant_rows(emb, tokens, dtype=cfg.cdtype)
    else:
        h = emb[tokens].astype(cfg.cdtype)
    return h


def attention(layer: Params, cfg: ModelConfig, h: jnp.ndarray,
              positions: jnp.ndarray, cache: KVCache, layer_idx: int,
              slots: jnp.ndarray, cells: jnp.ndarray) -> tuple:
    B, T, _ = h.shape
    hd = cfg.head_dim

    q = _proj(h, layer["wq"], cfg).reshape(B, T, cfg.n_heads, hd)
    k = _proj(h, layer["wk"], cfg).reshape(B, T, cfg.n_kv_heads, hd)
    v = _proj(h, layer["wv"], cfg).reshape(B, T, cfg.n_kv_heads, hd)

    q = apply_rope(q, positions, cfg.rope)
    k = apply_rope(k, positions, cfg.rope)

    cache = write_kv(cache, layer_idx, k, v, slots, cells, positions)

    kc = cache.k[layer_idx, slots]                     # (B, S, Hkv, D)
    vc = cache.v[layer_idx, slots]
    S = kc.shape[1]
    group = cfg.n_heads // cfg.n_kv_heads

    qg = q.reshape(B, T, cfg.n_kv_heads, group, hd)
    # scores: (B, Hkv, G, T, S)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg.astype(jnp.float32),
                        kc.astype(jnp.float32))
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(hd)))

    # KQ_mask (llama_set_inputs, llama.cpp:8523): key cell is live and its
    # position does not exceed the query position
    kpos = cache.pos[slots]                            # (B, S)
    mask = (kpos[:, None, :] >= 0) & (kpos[:, None, :] <= positions[:, :, None])
    mask = mask[:, None, None, :, :]                   # (B, 1, 1, T, S)

    probs = masked_softmax(scores, mask)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, vc.astype(jnp.float32))
    out = out.reshape(B, T, cfg.n_heads * hd).astype(cfg.cdtype)
    return _proj(out, layer["wo"], cfg), cache


def ffn(layer: Params, cfg: ModelConfig, h: jnp.ndarray) -> jnp.ndarray:
    gate = _proj(h, layer["w_gate"], cfg)
    up = _proj(h, layer["w_up"], cfg)
    return _proj((silu(gate) * up).astype(cfg.cdtype), layer["w_down"], cfg)


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: jnp.ndarray, cache: KVCache, slots: jnp.ndarray,
            cells: jnp.ndarray) -> tuple[jnp.ndarray, KVCache]:
    """tokens/positions/cells: (B, T); slots: (B,) -> (logits f32, cache)."""
    h = embed(params, cfg, tokens)

    for il, layer in enumerate(params["layers"]):
        hn = rms_norm(h, layer["attn_norm"], cfg.norm_eps)
        attn_out, cache = attention(layer, cfg, hn, positions, cache, il,
                                    slots, cells)
        h = (h + attn_out).astype(cfg.cdtype)
        hn = rms_norm(h, layer["ffn_norm"], cfg.norm_eps)
        h = (h + ffn(layer, cfg, hn)).astype(cfg.cdtype)

    h = rms_norm(h, params["out_norm"], cfg.norm_eps)
    logits = _proj(h, params["output"], cfg)
    return logits.astype(jnp.float32), cache
