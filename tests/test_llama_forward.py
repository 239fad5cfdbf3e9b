"""End-to-end model parity: our GGUF pipeline vs HF transformers golden logits.

Builds a tiny random HF LlamaForCausalLM, converts it to GGUF (F32 and Q8_0),
loads through our loader and compares forward logits. This is the analogue of
the reference's end-to-end correctness strategy (SURVEY.md §4.1): correctness
through the whole stack rather than per-op unit tests.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("transformers")
import torch
from transformers import LlamaConfig as HFLlamaConfig
from transformers import LlamaForCausalLM

from tpulamm.gguf.constants import GGMLType
from tpulamm.models.llama import forward
from tpulamm.models.loader import load_model
from tpulamm.runtime.kvcache import KVCache
from tpulamm.tools.convert_hf import convert_hf_llama

DIM, LAYERS, HEADS, KV_HEADS, FFN, VOCAB = 256, 2, 4, 2, 512, 512


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=DIM, intermediate_size=FFN,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS, max_position_embeddings=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def hf_logits(hf_model):
    tokens = np.array([[1, 5, 42, 7, 99, 3, 250, 17, 8]], dtype=np.int64)
    with torch.no_grad():
        out = hf_model(torch.from_numpy(tokens)).logits.float().numpy()
    return tokens, out


def _to_gguf(hf_model, path, qtype):
    sd = {k: v.float().numpy() for k, v in hf_model.state_dict().items()}
    if "lm_head.weight" not in sd:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    convert_hf_llama(sd, hf_model.config, path, qtype=qtype)


def _run_ours(path, tokens, compute_dtype="float32"):
    cfg, params, _ = load_model(path, compute_dtype=compute_dtype)
    B, T = tokens.shape
    cache = KVCache.create(cfg.n_layers, B, 16, cfg.n_kv_heads, cfg.head_dim,
                           dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    cells = positions
    slots = jnp.arange(B, dtype=jnp.int32)
    logits, cache = forward(params, cfg, jnp.asarray(tokens, jnp.int32),
                            positions, cache, slots, cells)
    return cfg, params, np.asarray(logits), cache


def test_f32_parity(hf_model, hf_logits, tmp_path):
    tokens, ref = hf_logits
    path = str(tmp_path / "tiny_f32.gguf")
    _to_gguf(hf_model, path, GGMLType.F32)
    _, _, ours, _ = _run_ours(path, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_q8_parity(hf_model, hf_logits, tmp_path):
    tokens, ref = hf_logits
    path = str(tmp_path / "tiny_q8.gguf")
    _to_gguf(hf_model, path, GGMLType.Q8_0)
    _, _, ours, _ = _run_ours(path, tokens)
    # 8-bit weights: logits drift but ordering must agree nearly everywhere
    np.testing.assert_allclose(ours, ref, atol=0.35, rtol=0.1)
    agree = (ours.argmax(-1) == ref.argmax(-1)).mean()
    assert agree >= 0.8


def test_q4_runs(hf_model, hf_logits, tmp_path):
    tokens, ref = hf_logits
    path = str(tmp_path / "tiny_q4.gguf")
    _to_gguf(hf_model, path, GGMLType.Q4_0)
    _, _, ours, _ = _run_ours(path, tokens)
    assert np.isfinite(ours).all()
    # correlation should remain high even at 4 bits
    # (4-bit quantization of a *random* tiny model is the worst case; real
    # trained weights fare far better — the ppl harness covers that)
    c = np.corrcoef(ours.reshape(-1), ref.reshape(-1))[0, 1]
    assert c > 0.95


def test_incremental_decode_matches_prefill(hf_model, tmp_path):
    """decode one token at a time == full prefill logits (KV cache correct)."""
    path = str(tmp_path / "tiny_inc.gguf")
    _to_gguf(hf_model, path, GGMLType.F32)
    tokens = np.array([[1, 5, 42, 7, 99]], dtype=np.int32)
    cfg, params, full_logits, _ = _run_ours(path, tokens)

    cache = KVCache.create(cfg.n_layers, 1, 16, cfg.n_kv_heads, cfg.head_dim,
                           dtype=jnp.float32)
    slots = jnp.arange(1, dtype=jnp.int32)
    step_logits = []
    for t in range(tokens.shape[1]):
        tok = jnp.asarray(tokens[:, t:t + 1], jnp.int32)
        pos = jnp.full((1, 1), t, jnp.int32)
        lg, cache = forward(params, cfg, tok, pos, cache, slots, pos)
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, full_logits, rtol=2e-4, atol=2e-4)
