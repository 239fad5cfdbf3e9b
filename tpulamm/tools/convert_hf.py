"""HF LLaMA checkpoint -> GGUF converter.

Capability parity with the reference's convert.py (llama.cpp-b2430/convert.py,
1486 LoC): maps HF tensor names to GGUF names, applies the rope permutation
that converts HF's half-split rotary layout to ggml's interleaved NORM layout,
writes hparams + tokenizer metadata, and optionally quantizes weights.

The permutation (convert.py `permute`): rows of q/k projections are grouped
per head as (head, 2, hd/2) and transposed to (head, hd/2, 2), so that
consecutive-pair rotation on the converted weights equals HF's rotate-half.
"""

from __future__ import annotations

import numpy as np

from tpulamm.gguf.constants import GGMLType
from tpulamm.gguf.writer import GGUFWriter
from tpulamm.quant.formats import quantize

# tensors quantized when a quant type is requested; norms stay f32
# (same policy as llama_model_quantize_internal's defaults for 1d tensors)
_QUANTIZABLE_SUFFIXES = (
    "attn_q.weight", "attn_k.weight", "attn_v.weight", "attn_output.weight",
    "ffn_gate.weight", "ffn_up.weight", "ffn_down.weight",
    "token_embd.weight", "output.weight",
)


def permute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    out_dim = w.shape[0]
    return (w.reshape(n_head, 2, out_dim // n_head // 2, *w.shape[1:])
             .swapaxes(1, 2).reshape(w.shape))


def hf_name_map(n_layers: int) -> dict[str, tuple[str, str | None]]:
    """HF name -> (gguf name, special handling tag)."""
    m = {
        "model.embed_tokens.weight": ("token_embd.weight", None),
        "model.norm.weight": ("output_norm.weight", None),
        "lm_head.weight": ("output.weight", None),
    }
    for i in range(n_layers):
        h = f"model.layers.{i}."
        g = f"blk.{i}."
        m[h + "input_layernorm.weight"] = (g + "attn_norm.weight", None)
        m[h + "self_attn.q_proj.weight"] = (g + "attn_q.weight", "permute_q")
        m[h + "self_attn.k_proj.weight"] = (g + "attn_k.weight", "permute_k")
        m[h + "self_attn.v_proj.weight"] = (g + "attn_v.weight", None)
        m[h + "self_attn.o_proj.weight"] = (g + "attn_output.weight", None)
        m[h + "post_attention_layernorm.weight"] = (g + "ffn_norm.weight", None)
        m[h + "mlp.gate_proj.weight"] = (g + "ffn_gate.weight", None)
        m[h + "mlp.up_proj.weight"] = (g + "ffn_up.weight", None)
        m[h + "mlp.down_proj.weight"] = (g + "ffn_down.weight", None)
    return m


def convert_hf_llama(state_dict: dict, hf_config, out_path: str,
                     qtype: GGMLType = GGMLType.F32,
                     vocab: dict | None = None) -> None:
    """state_dict: name -> numpy f32 array (call .numpy() on torch tensors).

    hf_config needs: num_hidden_layers, hidden_size, num_attention_heads,
    num_key_value_heads, intermediate_size, rms_norm_eps, rope_theta,
    max_position_embeddings, vocab_size.

    vocab (optional): {"tokens": [...], "scores": [...], "token_type": [...],
    "model": "llama", "bos": id, "eos": id} for tokenizer metadata.
    """
    c = hf_config
    n_layers = int(c.num_hidden_layers)
    n_head = int(c.num_attention_heads)
    n_kv = int(getattr(c, "num_key_value_heads", n_head) or n_head)
    head_dim = int(c.hidden_size) // n_head

    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", "llama")
    w.add_kv("general.name", getattr(c, "name_or_path", "") or "converted")
    w.add_kv("llama.context_length", int(getattr(c, "max_position_embeddings", 2048)))
    w.add_kv("llama.embedding_length", int(c.hidden_size))
    w.add_kv("llama.block_count", n_layers)
    w.add_kv("llama.feed_forward_length", int(c.intermediate_size))
    w.add_kv("llama.rope.dimension_count", head_dim)
    w.add_kv("llama.attention.head_count", n_head)
    w.add_kv("llama.attention.head_count_kv", n_kv)
    w.add_kv("llama.attention.layer_norm_rms_epsilon",
             float(getattr(c, "rms_norm_eps", 1e-5)))
    w.add_kv("llama.rope.freq_base", float(getattr(c, "rope_theta", 10000.0)))
    w.add_kv("llama.vocab_size", int(c.vocab_size))

    if vocab:
        w.add_kv("tokenizer.ggml.model", vocab.get("model", "llama"))
        w.add_kv("tokenizer.ggml.tokens", list(vocab["tokens"]))
        w.add_kv("tokenizer.ggml.scores",
                 np.asarray(vocab["scores"], np.float32))
        w.add_kv("tokenizer.ggml.token_type",
                 np.asarray(vocab["token_type"], np.int32))
        if "bos" in vocab:
            w.add_kv("tokenizer.ggml.bos_token_id", int(vocab["bos"]))
        if "eos" in vocab:
            w.add_kv("tokenizer.ggml.eos_token_id", int(vocab["eos"]))

    name_map = hf_name_map(n_layers)
    for hf_name, arr in state_dict.items():
        if hf_name not in name_map:
            continue
        gguf_name, tag = name_map[hf_name]
        x = np.asarray(arr, dtype=np.float32)
        if tag == "permute_q":
            x = permute_rope(x, n_head)
        elif tag == "permute_k":
            x = permute_rope(x, n_kv)
        tq = qtype
        if not gguf_name.endswith(_QUANTIZABLE_SUFFIXES) or x.ndim == 1:
            tq = GGMLType.F32
        if tq != GGMLType.F32:
            from tpulamm.gguf.constants import GGML_TYPE_SIZES
            bs = GGML_TYPE_SIZES[tq][0]
            if x.shape[-1] % bs != 0:
                tq = GGMLType.F32  # dims not blockable stay dense
        if tq == GGMLType.F32:
            w.add_tensor(gguf_name, x)
        else:
            raw = quantize(x, tq)
            w.add_tensor(gguf_name, raw, shape=x.shape, ggml_type=tq)
    w.write()
