"""Chat templates, sentence embeddings, classifier-free guidance.

Mirrors tests/test-chat-template.cpp (template renders), examples/embedding
(pooled hidden states) and llama_sample_apply_guidance semantics.
"""

import numpy as np
import pytest

import torch
import transformers

pytest.importorskip("transformers")

from tpulamm.gguf.constants import GGMLType  # noqa: E402
from tpulamm.runtime.chat import apply_chat_template  # noqa: E402
from tpulamm.runtime.engine import Engine  # noqa: E402
from tpulamm.runtime.sampling import apply_guidance  # noqa: E402
from tpulamm.tools.convert_hf import convert_hf  # noqa: E402

MSGS = [
    {"role": "system", "content": "You are a helpful assistant"},
    {"role": "user", "content": "Hello"},
    {"role": "assistant", "content": "Hi there"},
    {"role": "user", "content": "Who are you"},
]


def test_chatml_template():
    out = apply_chat_template("chatml", MSGS)
    assert out == (
        "<|im_start|>system\nYou are a helpful assistant<|im_end|>\n"
        "<|im_start|>user\nHello<|im_end|>\n"
        "<|im_start|>assistant\nHi there<|im_end|>\n"
        "<|im_start|>user\nWho are you<|im_end|>\n"
        "<|im_start|>assistant\n")


def test_llama2_template_with_sys():
    # jinja containing <<SYS>> -> system block supported
    tmpl = "{% if ... %}<<SYS>>[INST]..."
    out = apply_chat_template(tmpl, MSGS)
    assert out.startswith("[INST] <<SYS>>\nYou are a helpful assistant\n"
                          "<</SYS>>\n\nHello [/INST]")
    assert "Hi there</s>" in out
    assert out.endswith("[INST] Who are you [/INST]")


def test_llama2_template_without_sys():
    out = apply_chat_template("llama2", MSGS)
    assert out.startswith("[INST] You are a helpful assistant\nHello [/INST]")


def test_zephyr_template():
    out = apply_chat_template("zephyr", MSGS)
    assert "<|user|>\nHello<|endoftext|>\n" in out
    assert out.endswith("<|assistant|>\n")


def test_gemma_template():
    out = apply_chat_template("gemma", MSGS)
    # system merged into first user turn; assistant renamed model
    assert out.startswith("<start_of_turn>user\n"
                          "You are a helpful assistant\n\nHello<end_of_turn>\n")
    assert "<start_of_turn>model\nHi there<end_of_turn>\n" in out
    assert out.endswith("<start_of_turn>model\n")


def test_monarch_template():
    out = apply_chat_template("monarch", MSGS)
    assert out.startswith("system\nYou are a helpful assistant</s>\n")
    assert "<s>user\nHello</s>\n" in out
    assert out.endswith("<s>assistant\n")


def test_unknown_template_falls_back_to_chatml():
    out = apply_chat_template("{{ some totally custom jinja }}", MSGS)
    assert out.startswith("<|im_start|>system\n")


# -- embeddings ---------------------------------------------------------------

@pytest.fixture(scope="module")
def llama_path(tmp_path_factory):
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128))
    m.eval()
    path = str(tmp_path_factory.mktemp("emb") / "m.gguf")
    convert_hf(m, path, qtype=GGMLType.F32)
    return path


def test_embed_shapes_and_pooling(llama_path):
    eng = Engine(llama_path, n_ctx=64)
    e_last = eng.embed([1, 5, 9, 20], pooling="last")
    e_mean = eng.embed([1, 5, 9, 20], pooling="mean")
    e_cls = eng.embed([1, 5, 9, 20], pooling="cls")
    assert e_last.shape == (128,) and np.isfinite(e_last).all()
    assert not np.allclose(e_last, e_mean)
    assert not np.allclose(e_cls, e_last)
    # deterministic
    np.testing.assert_allclose(eng.embed([1, 5, 9, 20], pooling="mean"),
                               e_mean, rtol=1e-6)
    # different inputs -> different embeddings
    assert not np.allclose(eng.embed([4, 4, 4, 4], pooling="mean"), e_mean)


def test_bert_embed_matches_hf(tmp_path):
    """bert + mean pooling through Engine.embed vs HF mean-pooled hidden."""
    torch.manual_seed(0)
    m = transformers.BertModel(transformers.BertConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, hidden_act="gelu_new",
        max_position_embeddings=64), add_pooling_layer=False)
    m.eval()
    path = str(tmp_path / "bert.gguf")
    convert_hf(m, path, qtype=GGMLType.F32)
    toks = [3, 17, 40, 99, 7]
    with torch.no_grad():
        hf = m(torch.tensor([toks])).last_hidden_state[0].numpy()
    eng = Engine(path, n_ctx=32, compute_dtype="float32")
    ours = eng.embed(toks, pooling="mean")
    np.testing.assert_allclose(ours, hf.mean(0), rtol=3e-4, atol=3e-4)


# -- classifier-free guidance -------------------------------------------------

def test_apply_guidance_formula():
    l = np.array([1.0, 2.0, 3.0], np.float32)
    g = np.array([3.0, 2.0, 1.0], np.float32)
    out1 = apply_guidance(l, g, 1.0)

    def logsm(x):
        m = x.max()
        return x - m - np.log(np.exp(x - m).sum())
    np.testing.assert_allclose(out1, logsm(g) + (logsm(l) - logsm(g)),
                               rtol=1e-6)
    out2 = apply_guidance(l, g, 2.0)
    np.testing.assert_allclose(out2, 2 * (logsm(l) - logsm(g)) + logsm(g),
                               rtol=1e-6)


def test_cfg_generation(llama_path):
    from tpulamm.runtime.sampling import SamplingParams
    eng = Engine(llama_path, n_ctx=64, n_slots=2)
    plain, _ = eng.generate([1, 5, 9], n_predict=10,
                            sampling=SamplingParams(temp=0.0),
                            stop_on_eos=False)
    eng2 = Engine(llama_path, n_ctx=64, n_slots=2)
    guided, _ = eng2.generate([1, 5, 9], n_predict=10,
                              sampling=SamplingParams(temp=0.0),
                              stop_on_eos=False,
                              cfg_negative_prompt=[2, 2, 2],
                              cfg_scale=4.0)
    assert len(guided) == 10
    assert guided != plain         # guidance must steer the output
    # scale 1.0 disables guidance entirely
    eng3 = Engine(llama_path, n_ctx=64, n_slots=2)
    same, _ = eng3.generate([1, 5, 9], n_predict=10,
                            sampling=SamplingParams(temp=0.0),
                            stop_on_eos=False,
                            cfg_negative_prompt=[2, 2, 2], cfg_scale=1.0)
    assert same == plain
