"""Differentiable causal-LM forward + initialization for training.

Training-side counterpart of the reference's CPU training stack: ggml
autograd (ggml_build_backward_expand, ggml.h:1956), gradient checkpointing
(ggml.h:1992) and examples/train-text-from-scratch/ (926 LoC, llama-arch
init + AdamW loop). TPU-native: the forward is a pure jax function over a
dense-params pytree in the SAME layout the inference loader produces, so a
trained checkpoint saves straight to GGUF and runs in the decode engine;
jax.grad replaces ggml's reverse graph; jax.checkpoint replaces
ggml_build_backward_gradient_checkpointing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpulamm.models.config import ModelConfig
from tpulamm.ops.layers import rms_norm, silu
from tpulamm.ops.rope import apply_rope


def init_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    """Random-init llama-arch params (train-text-from-scratch
    init_model/randomize_model semantics: normal(0, 1/sqrt(dim)))."""
    rng = np.random.default_rng(seed)

    def w(n, k):
        return jnp.asarray(rng.normal(0, 1.0 / np.sqrt(k), (n, k)), dtype)

    kvd = cfg.n_kv_heads * cfg.head_dim
    params = {
        "tok_emb": w(cfg.vocab_size, cfg.dim),
        "out_norm": jnp.ones((cfg.dim,), dtype),
        "output": w(cfg.vocab_size, cfg.dim),
        "layers": [
            {
                "attn_norm": jnp.ones((cfg.dim,), dtype),
                "ffn_norm": jnp.ones((cfg.dim,), dtype),
                "wq": w(cfg.n_heads * cfg.head_dim, cfg.dim),
                "wk": w(kvd, cfg.dim),
                "wv": w(kvd, cfg.dim),
                "wo": w(cfg.dim, cfg.n_heads * cfg.head_dim),
                "w_gate": w(cfg.ffn_dim, cfg.dim),
                "w_up": w(cfg.ffn_dim, cfg.dim),
                "w_down": w(cfg.dim, cfg.ffn_dim),
            }
            for _ in range(cfg.n_layers)
        ],
    }
    return params


def _layer_fwd(layer: dict, cfg: ModelConfig, h: jnp.ndarray,
               positions: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    B, T, _ = h.shape
    hd = cfg.head_dim
    hn = rms_norm(h, layer["attn_norm"], cfg.norm_eps)
    q = (hn @ layer["wq"].T).reshape(B, T, cfg.n_heads, hd)
    k = (hn @ layer["wk"].T).reshape(B, T, cfg.n_kv_heads, hd)
    v = (hn @ layer["wv"].T).reshape(B, T, cfg.n_kv_heads, hd)
    q = apply_rope(q, positions, cfg.rope)
    k = apply_rope(k, positions, cfg.rope)
    group = cfg.n_heads // cfg.n_kv_heads
    qg = q.reshape(B, T, cfg.n_kv_heads, group, hd)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k) / jnp.sqrt(
        jnp.asarray(hd, h.dtype))
    scores = jnp.where(mask, scores, jnp.asarray(-1e30, h.dtype))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(h.dtype)
    attn = jnp.einsum("bhgts,bshd->bthgd", probs, v)
    attn = attn.reshape(B, T, cfg.n_heads * hd)
    h = h + attn @ layer["wo"].T
    hn = rms_norm(h, layer["ffn_norm"], cfg.norm_eps)
    gate = hn @ layer["w_gate"].T
    up = hn @ layer["w_up"].T
    return h + (silu(gate) * up) @ layer["w_down"].T


def forward_train(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
                  remat: bool = False) -> jnp.ndarray:
    """tokens (B, T) -> logits (B, T, vocab); full causal attention.

    remat=True rematerializes each layer in the backward pass
    (jax.checkpoint — the ggml grad-checkpointing analogue)."""
    B, T = tokens.shape
    h = params["tok_emb"][tokens]
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    mask = jnp.tril(jnp.ones((T, T), bool))[None, None, None, :, :]
    layer_fn = partial(_layer_fwd, cfg=cfg)
    if remat:
        layer_fn = jax.checkpoint(layer_fn,
                                  static_argnums=())  # params differ per call
    for layer in params["layers"]:
        h = layer_fn(layer, h=h, positions=positions, mask=mask)
    h = rms_norm(h, params["out_norm"], cfg.norm_eps)
    return (h @ params["output"].T).astype(jnp.float32)


def causal_lm_loss(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
                   remat: bool = False) -> jnp.ndarray:
    """Next-token cross-entropy (ggml_cross_entropy_loss equivalent)."""
    logits = forward_train(params, cfg, tokens, remat=remat)
    targets = tokens[:, 1:]
    lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    return jnp.mean(nll)


def save_params_gguf(params: dict, cfg: ModelConfig, path: str,
                     vocab: dict | None = None) -> None:
    """Write trained params as a llama-arch GGUF the engine can load."""
    from tpulamm.gguf.writer import GGUFWriter
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "llama")
    w.add_kv("general.name", "tpulamm-trained")
    w.add_kv("llama.context_length", cfg.n_ctx_train)
    w.add_kv("llama.embedding_length", cfg.dim)
    w.add_kv("llama.block_count", cfg.n_layers)
    w.add_kv("llama.feed_forward_length", cfg.ffn_dim)
    w.add_kv("llama.rope.dimension_count", cfg.rope.n_rot)
    w.add_kv("llama.attention.head_count", cfg.n_heads)
    w.add_kv("llama.attention.head_count_kv", cfg.n_kv_heads)
    w.add_kv("llama.attention.layer_norm_rms_epsilon", cfg.norm_eps)
    w.add_kv("llama.rope.freq_base", cfg.rope.freq_base)
    w.add_kv("llama.vocab_size", cfg.vocab_size)
    if vocab:
        w.add_kv("tokenizer.ggml.model", vocab.get("model", "llama"))
        w.add_kv("tokenizer.ggml.tokens", list(vocab["tokens"]))
        w.add_kv("tokenizer.ggml.scores",
                 np.asarray(vocab.get("scores",
                                      [0.0] * len(vocab["tokens"])),
                            np.float32))
        w.add_kv("tokenizer.ggml.token_type",
                 np.asarray(vocab.get("token_type",
                                      [1] * len(vocab["tokens"])), np.int32))
    names = {"tok_emb": "token_embd.weight", "out_norm": "output_norm.weight",
             "output": "output.weight"}
    for key, name in names.items():
        w.add_tensor(name, np.asarray(params[key], np.float32))
    lnames = {"attn_norm": "attn_norm", "wq": "attn_q", "wk": "attn_k",
              "wv": "attn_v", "wo": "attn_output", "ffn_norm": "ffn_norm",
              "w_gate": "ffn_gate", "w_up": "ffn_up", "w_down": "ffn_down"}
    for i, layer in enumerate(params["layers"]):
        for key, name in lnames.items():
            w.add_tensor(f"blk.{i}.{name}.weight",
                         np.asarray(layer[key], np.float32))
    w.write()
