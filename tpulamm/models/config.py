"""Model hyperparameters from GGUF metadata.

Parity with llm_load_hparams (llama.cpp:3262-3640): per-arch KV keys with the
same defaults. Arch-prefixed keys ("llama.embedding_length", ...) follow the
gguf-py constants.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from tpulamm.ops.rope import RopeParams


@dataclass
class ModelConfig:
    arch: str = "llama"
    vocab_size: int = 32000
    dim: int = 2048                 # n_embd
    n_layers: int = 22
    n_heads: int = 32
    n_kv_heads: int = 4
    ffn_dim: int = 5632
    n_ctx_train: int = 2048
    norm_eps: float = 1e-5
    rope: RopeParams = field(default_factory=lambda: RopeParams(n_rot=64))
    tie_embeddings: bool = False
    # compute policy
    compute_dtype: str = "bfloat16"
    # MoE (mixtral-style, llama.cpp:5797)
    n_expert: int = 0
    n_expert_used: int = 0

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)


def _get(md: dict, key: str, default=None, required=False):
    if key in md:
        return md[key]
    if required:
        raise KeyError(f"GGUF metadata missing required key {key}")
    return default


def config_from_metadata(md: dict) -> ModelConfig:
    arch = _get(md, "general.architecture", required=True)
    p = arch  # key prefix
    dim = int(_get(md, f"{p}.embedding_length", required=True))
    n_heads = int(_get(md, f"{p}.attention.head_count", required=True))
    n_kv = int(_get(md, f"{p}.attention.head_count_kv", n_heads))
    n_layers = int(_get(md, f"{p}.block_count", required=True))
    head_dim = dim // n_heads
    n_rot = int(_get(md, f"{p}.rope.dimension_count", head_dim))
    n_ctx_train = int(_get(md, f"{p}.context_length", 2048))

    # rope scaling (llm_load_hparams rope section)
    scaling_type = _get(md, f"{p}.rope.scaling.type", "linear")
    factor = float(_get(md, f"{p}.rope.scaling.factor",
                        _get(md, f"{p}.rope.scale_linear", 1.0)))
    freq_scale = 1.0 / factor if factor not in (0.0, 1.0) else 1.0
    ext_factor = 0.0
    if scaling_type == "yarn":
        ext_factor = 1.0
    n_orig_ctx = int(_get(md, f"{p}.rope.scaling.original_context_length",
                          n_ctx_train))

    rope_kind = "norm"
    if arch in ("falcon", "qwen", "qwen2", "stablelm", "phi2", "gptneox",
                "gemma", "starcoder2", "nomic-bert"):
        rope_kind = "neox"
    if arch in ("gpt2", "gptj", "mpt", "bloom", "refact", "bert", "mamba"):
        rope_kind = "none"

    vocab = _get(md, f"{p}.vocab_size")
    if vocab is None:
        toks = _get(md, "tokenizer.ggml.tokens")
        vocab = len(toks) if toks is not None else 32000

    return ModelConfig(
        arch=arch,
        vocab_size=int(vocab),
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=n_kv,
        ffn_dim=int(_get(md, f"{p}.feed_forward_length", 4 * dim)),
        n_ctx_train=n_ctx_train,
        norm_eps=float(_get(md, f"{p}.attention.layer_norm_rms_epsilon",
                            _get(md, f"{p}.attention.layer_norm_epsilon",
                                 1e-5))),
        rope=RopeParams(
            n_rot=n_rot,
            kind=rope_kind,
            freq_base=float(_get(md, f"{p}.rope.freq_base", 10000.0)),
            freq_scale=freq_scale,
            ext_factor=ext_factor,
            n_orig_ctx=n_orig_ctx,
        ),
        n_expert=int(_get(md, f"{p}.expert_count", 0)),
        n_expert_used=int(_get(md, f"{p}.expert_used_count", 0)),
    )
