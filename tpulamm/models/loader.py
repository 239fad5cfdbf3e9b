"""GGUF model loader -> (ModelConfig, params pytree) for every reference arch.

Parity with llm_load_model stages (llama.cpp:5017): arch + hparams from
metadata (llm_load_hparams :3262), vocab left in metadata for the tokenizer
(llm_load_vocab :3642), tensors mapped by the same per-arch name templates as
llm_load_tensors (:3992) via the LLM_TENSOR_NAMES table (llama.cpp:425-868).

TPU-native divergences from the reference:
- quantized tensors are repacked once into TPU planes (quant/repack.py) and
  uploaded to device HBM instead of mmap-executed in place;
- fused attn_qkv weights are split into wq/wk/wv rows at load time — every
  row of a block-quantized tensor is independently coded, so the split is
  bit-exact (persimmon's per-head-interleaved qkv included);
- optional tensors (biases, second norms, MoE router/experts, q/k norms)
  are probed by name; the generic forward uses whatever is present, which
  mirrors the reference's `required=false` create_tensor calls.
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


def _mm_from_rows(raw_rows: np.ndarray, ggml_type: GGMLType,
                  shape: tuple[int, int], cfg: ModelConfig):
    n, k = shape
    # the fused Pallas kernel tiles K in 256-blocks and N in 128-lanes;
    # off-size tensors (tiny test vocabs) fall back to dense
    if ggml_type in SPECS and k % 256 == 0 and n % 128 == 0:
        return QTensor.from_gguf_raw(raw_rows, ggml_type, (n, k), layout="mm")
    from tpulamm.quant.formats import dequantize
    w = dequantize(raw_rows, ggml_type, k).reshape(n, k)
    dt = jnp.float32 if ggml_type == GGMLType.F32 else cfg.cdtype
    if ggml_type in SPECS:
        log.warning("quant tensor (N=%d, K=%d) not tile-aligned; "
                    "storing dense", n, k)
    return jnp.asarray(w, dtype=dt)


def _load_matmul_weight(info: GGUFTensorInfo, cfg: ModelConfig):
    """A weight used as x @ W.T: quantized -> mm QTensor, else dense array."""
    n, k = info.shape[-2], info.shape[-1]
    return _mm_from_rows(info.as_rows(), info.ggml_type, (n, k), cfg)


def _load_embedding(info: GGUFTensorInfo, cfg: ModelConfig):
    n, k = info.shape
    if info.ggml_type in SPECS:
        return QTensor.from_gguf_raw(np.asarray(info.data), info.ggml_type,
                                     (n, k), layout="rows")
    if info.ggml_type == GGMLType.F32:
        return _dense(info, jnp.float32)
    return _dense(info, cfg.cdtype)


class _TensorMap:
    """Name-probing access over the GGUF tensor table."""

    def __init__(self, tensors: dict[str, GGUFTensorInfo], cfg: ModelConfig):
        self.t = tensors
        self.cfg = cfg

    def has(self, name: str) -> bool:
        return name + ".weight" in self.t

    def req(self, name: str) -> GGUFTensorInfo:
        key = name + ".weight"
        if key not in self.t:
            raise KeyError(f"model tensor missing: {key}")
        return self.t[key]

    def mm(self, out: dict, pkey: str, name: str, required=False):
        """matmul weight + optional bias -> out[pkey], out['b'+...]"""
        key = name + ".weight"
        if key not in self.t:
            if required:
                raise KeyError(f"model tensor missing: {key}")
            return
        out[pkey] = _load_matmul_weight(self.t[key], self.cfg)
        bkey = name + ".bias"
        if bkey in self.t:
            out[_bias_key(pkey)] = _dense(self.t[bkey], jnp.float32)

    def norm(self, out: dict, pkey: str, name: str, required=False):
        key = name + ".weight"
        if key not in self.t:
            if required:
                raise KeyError(f"model tensor missing: {key}")
            return
        out[pkey] = _dense(self.t[key], jnp.float32)
        bkey = name + ".bias"
        if bkey in self.t:
            out[pkey + "_b"] = _dense(self.t[bkey], jnp.float32)


def _bias_key(pkey: str) -> str:
    return {"wq": "bq", "wk": "bk", "wv": "bv", "wo": "bo",
            "w_gate": "b_gate", "w_up": "b_up", "w_down": "b_down",
            "output": "output_b"}.get(pkey, pkey + "_b")


def _split_qkv(info: GGUFTensorInfo, cfg: ModelConfig):
    """Split a fused attn_qkv weight into (wq, wk, wv) by rows, bit-exact.

    Standard layout (falcon/gpt2/starcoder/bloom/mpt/qwen/phi2/codeshell/
    nomic-bert; build_* slice contiguous q|k|v): rows
    [0, H*D) | [H*D, H*D+Hkv*D) | [..., +Hkv*D).
    Persimmon interleaves per head: (head, [q|k|v], head_dim) rows
    (build_persimmon llama.cpp:6225-6232 reshape (hd, 3, n_head)).
    """
    hd, H, Hkv, dim = (cfg.head_dim, cfg.n_heads, cfg.n_kv_heads, cfg.dim)
    rows = info.as_rows()
    n_rows = rows.shape[0]
    if cfg.qk_norm and cfg.arch == "persimmon":
        idx = np.arange(n_rows).reshape(H, 3, hd)
        qi, ki, vi = idx[:, 0].ravel(), idx[:, 1].ravel(), idx[:, 2].ravel()
    else:
        assert n_rows == (H + 2 * Hkv) * hd, \
            f"attn_qkv rows {n_rows} != (H+2Hkv)*hd {(H + 2 * Hkv) * hd}"
        qi = np.arange(0, H * hd)
        ki = np.arange(H * hd, (H + Hkv) * hd)
        vi = np.arange((H + Hkv) * hd, (H + 2 * Hkv) * hd)
    parts = []
    for sel in (qi, ki, vi):
        parts.append(_mm_from_rows(np.ascontiguousarray(rows[sel]),
                                   info.ggml_type, (len(sel), dim), cfg))
    return parts, (qi, ki, vi)


def _layer_params(tm: _TensorMap, cfg: ModelConfig, i: int) -> dict[str, Any]:
    pre = f"blk.{i}."
    out: dict[str, Any] = {}
    tm.norm(out, "attn_norm", pre + "attn_norm")
    tm.norm(out, "attn_norm_2", pre + "attn_norm_2")
    tm.norm(out, "attn_q_norm", pre + "attn_q_norm")
    tm.norm(out, "attn_k_norm", pre + "attn_k_norm")
    tm.norm(out, "attn_out_norm", pre + "attn_output_norm")
    tm.norm(out, "layer_out_norm", pre + "layer_output_norm")
    tm.norm(out, "ffn_norm", pre + "ffn_norm")

    if cfg.arch == "mamba":
        tm.mm(out, "ssm_in", pre + "ssm_in", required=True)
        tm.mm(out, "ssm_x", pre + "ssm_x", required=True)
        tm.mm(out, "ssm_dt", pre + "ssm_dt", required=True)
        tm.mm(out, "ssm_out", pre + "ssm_out", required=True)
        out["ssm_conv1d"] = _dense(tm.req(pre + "ssm_conv1d"), jnp.float32)
        if pre + "ssm_conv1d.bias" in tm.t:
            out["ssm_conv1d_b"] = _dense(tm.t[pre + "ssm_conv1d.bias"],
                                         jnp.float32)
        if pre + "ssm_dt.bias" in tm.t:
            out["ssm_dt_b"] = _dense(tm.t[pre + "ssm_dt.bias"], jnp.float32)
        out["ssm_a"] = _dense(tm.req(pre + "ssm_a"), jnp.float32)
        out["ssm_d"] = _dense(tm.req(pre + "ssm_d"), jnp.float32)
        return out

    if tm.has(pre + "attn_qkv"):
        (out["wq"], out["wk"], out["wv"]), (qi, ki, vi) = \
            _split_qkv(tm.req(pre + "attn_qkv"), cfg)
        bkey = pre + "attn_qkv.bias"
        if bkey in tm.t:
            b = np.asarray(tm.t[bkey].to_f32())
            out["bq"] = jnp.asarray(b[qi])
            out["bk"] = jnp.asarray(b[ki])
            out["bv"] = jnp.asarray(b[vi])
    else:
        tm.mm(out, "wq", pre + "attn_q", required=True)
        tm.mm(out, "wk", pre + "attn_k", required=True)
        tm.mm(out, "wv", pre + "attn_v", required=True)
    tm.mm(out, "wo", pre + "attn_output", required=True)

    if cfg.n_expert > 0 and tm.has(pre + "ffn_gate_inp"):
        # MoE (build_llama :5797): router + per-expert gate/down/up
        out["ffn_gate_inp"] = _load_matmul_weight(
            tm.req(pre + "ffn_gate_inp"), cfg)
        for part in ("gate", "down", "up"):
            out[f"ffn_{part}_exp"] = [
                _load_matmul_weight(tm.req(f"{pre}ffn_{part}.{e}"), cfg)
                for e in range(cfg.n_expert)]
    else:
        tm.mm(out, "w_gate", pre + "ffn_gate")
        tm.mm(out, "w_up", pre + "ffn_up", required=True)
        tm.mm(out, "w_down", pre + "ffn_down", required=True)
        akey = pre + "ffn.act.scales"
        if akey in tm.t:  # mpt LLM_TENSOR_FFN_ACT (llama.cpp:543)
            out["ffn_act_scales"] = _dense(tm.t[akey], jnp.float32)
    return out


def parse_kv_override(s: str) -> tuple[str, Any]:
    """Parse a --override-kv item 'key=type:value' (llama_model_kv_override
    format, common.cpp): types int, float, bool, str."""
    key, _, tv = s.partition("=")
    typ, _, val = tv.partition(":")
    if not key or not typ or val == "":
        raise ValueError(f"bad --override-kv {s!r}; want KEY=TYPE:VALUE")
    cast = {"int": int, "float": float, "str": str,
            "bool": lambda v: v.lower() in ("1", "true", "yes")}.get(typ)
    if cast is None:
        raise ValueError(f"bad --override-kv type {typ!r} "
                         "(int|float|bool|str)")
    return key, cast(val)


def load_model(path: str, *, compute_dtype: str | None = None,
               kv_overrides: dict[str, Any] | None = None, abort=None
               ) -> tuple[ModelConfig, dict[str, Any], dict]:
    """Returns (config, params, metadata). metadata retains tokenizer KVs.

    kv_overrides: GGUF metadata overrides applied before hparam parsing
    (llama_model_kv_override, llama.cpp:2755 / --override-kv).
    abort: optional callback () -> bool checked between layer loads —
    True cancels the load (llama.cpp progress_callback returning false /
    test-model-load-cancel.cpp parity)."""
    reader = GGUFReader(path)
    if kv_overrides:
        reader.metadata.update(kv_overrides)
    cfg = config_from_metadata(reader.metadata)
    if compute_dtype:
        cfg.compute_dtype = compute_dtype

    tm = _TensorMap(reader.tensors, cfg)
    params: dict[str, Any] = {}
    params["tok_emb"] = _load_embedding(tm.req("token_embd"), cfg)
    tm.norm(params, "tok_norm", "token_embd_norm")
    tm.norm(params, "out_norm", "output_norm")
    if "token_types.weight" in tm.t:
        params["type_emb"] = _dense(tm.t["token_types.weight"], cfg.cdtype)
    if "position_embd.weight" in tm.t:
        params["pos_emb"] = _dense(tm.t["position_embd.weight"], cfg.cdtype)

    if tm.has("output"):
        tm.mm(params, "output", "output", required=True)
    elif cfg.arch in ("bert", "nomic-bert"):
        pass  # embedding model: no lm head
    else:
        # tied embeddings (llm_load_tensors falls back to token_embd,
        # e.g. llama.cpp:158-162, :454, :801, :841)
        cfg.tie_embeddings = True
        emb = tm.req("token_embd")
        params["output"] = _mm_from_rows(emb.as_rows(), emb.ggml_type,
                                         (emb.shape[0], emb.shape[1]), cfg)

    params["layers"] = []
    for i in range(cfg.n_layers):
        if abort is not None and abort():
            reader.close()
            from tpulamm.runtime.engine import AbortError
            raise AbortError(f"model load cancelled at layer {i}")
        params["layers"].append(_layer_params(tm, cfg, i))

    md = dict(reader.metadata)
    reader.close()
    return cfg, params, md
