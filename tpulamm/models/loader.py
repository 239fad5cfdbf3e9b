"""GGUF model loader -> (ModelConfig, params pytree).

Parity with llama_model_load stages (llama.cpp:5017): arch + hparams from
metadata (llm_load_hparams :3262), vocab left in metadata for the tokenizer
(llm_load_vocab :3642), tensors mapped by the same name templates as
llm_load_tensors (:3992) — token_embd / blk.N.{attn_norm,attn_q,attn_k,
attn_v,attn_output,ffn_norm,ffn_gate,ffn_down,ffn_up} / output_norm / output.

Instead of mmap-backed views executed in place, quantized tensors are
repacked once into TPU planes (quant/repack.py) and uploaded to device HBM.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpulamm.gguf.constants import GGMLType
from tpulamm.gguf.reader import GGUFReader, GGUFTensorInfo
from tpulamm.models.config import ModelConfig, config_from_metadata
from tpulamm.ops.qtensor import QTensor
from tpulamm.quant.repack import SPECS

log = logging.getLogger("tpulamm.loader")


def _dense(info: GGUFTensorInfo, dtype) -> jax.Array:
    return jnp.asarray(info.to_f32(), dtype=dtype)


def _load_matmul_weight(info: GGUFTensorInfo, cfg: ModelConfig):
    """A weight used as x @ W.T: quantized -> mm QTensor, else dense array."""
    n, k = info.shape
    if info.ggml_type in SPECS and k % 256 == 0:
        return QTensor.from_gguf_raw(np.asarray(info.data), info.ggml_type,
                                     (n, k), layout="mm")
    if info.ggml_type in (GGMLType.F32,):
        return _dense(info, jnp.float32)
    if info.ggml_type in SPECS:
        log.warning("tensor %s: K=%d not 256-aligned; storing dense", info.name, k)
    return _dense(info, cfg.cdtype)


def _load_embedding(info: GGUFTensorInfo, cfg: ModelConfig):
    n, k = info.shape
    if info.ggml_type in SPECS:
        return QTensor.from_gguf_raw(np.asarray(info.data), info.ggml_type,
                                     (n, k), layout="rows")
    if info.ggml_type == GGMLType.F32:
        return _dense(info, jnp.float32)
    return _dense(info, cfg.cdtype)


def load_model(path: str, *, compute_dtype: str | None = None
               ) -> tuple[ModelConfig, dict[str, Any], dict]:
    """Returns (config, params, metadata). metadata retains tokenizer KVs."""
    reader = GGUFReader(path)
    cfg = config_from_metadata(reader.metadata)
    if compute_dtype:
        cfg.compute_dtype = compute_dtype
    if cfg.arch not in ("llama",):
        raise NotImplementedError(f"architecture {cfg.arch!r} not yet supported")

    t = reader.tensors

    def get(name: str) -> GGUFTensorInfo:
        if name not in t:
            raise KeyError(f"model tensor missing: {name}")
        return t[name]

    params: dict[str, Any] = {}
    params["tok_emb"] = _load_embedding(get("token_embd.weight"), cfg)
    params["out_norm"] = _dense(get("output_norm.weight"), jnp.float32)
    if "output.weight" in t:
        params["output"] = _load_matmul_weight(get("output.weight"), cfg)
    else:
        # tied embeddings (llm_load_tensors falls back to token_embd)
        cfg.tie_embeddings = True
        emb = get("token_embd.weight")
        if emb.ggml_type in SPECS and emb.shape[1] % 256 == 0:
            params["output"] = QTensor.from_gguf_raw(
                np.asarray(emb.data), emb.ggml_type, emb.shape, layout="mm")
        else:
            params["output"] = _dense(emb, cfg.cdtype)

    layers = []
    for i in range(cfg.n_layers):
        pre = f"blk.{i}."
        layers.append({
            "attn_norm": _dense(get(pre + "attn_norm.weight"), jnp.float32),
            "wq": _load_matmul_weight(get(pre + "attn_q.weight"), cfg),
            "wk": _load_matmul_weight(get(pre + "attn_k.weight"), cfg),
            "wv": _load_matmul_weight(get(pre + "attn_v.weight"), cfg),
            "wo": _load_matmul_weight(get(pre + "attn_output.weight"), cfg),
            "ffn_norm": _dense(get(pre + "ffn_norm.weight"), jnp.float32),
            "w_gate": _load_matmul_weight(get(pre + "ffn_gate.weight"), cfg),
            "w_up": _load_matmul_weight(get(pre + "ffn_up.weight"), cfg),
            "w_down": _load_matmul_weight(get(pre + "ffn_down.weight"), cfg),
        })
    params["layers"] = layers

    md = dict(reader.metadata)
    reader.close()
    return cfg, params, md
