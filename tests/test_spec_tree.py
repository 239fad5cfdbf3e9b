"""Draft-tree speculative decoding correctness (speculative.cpp
n_seq_dft/p_split parity).

The invariant: with greedy sampling, tree-speculative output is IDENTICAL
to plain autoregressive greedy decoding — branches only change wall-clock.
The tree attention mask (laminar segment ranges over node-indexed cells)
and the path consolidation are both exercised by continuing to decode
PLAIN tokens after the speculative call and checking logits parity.
"""

import numpy as np
import pytest

import torch
import transformers

pytest.importorskip("transformers")

from tpulamm.gguf.constants import GGMLType  # noqa: E402
from tpulamm.runtime.engine import Engine  # noqa: E402
from tpulamm.runtime.spec_tree import generate_speculative_tree  # noqa: E402
from tpulamm.tools.convert_hf import convert_hf  # noqa: E402


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256))
    m.eval()
    path = str(tmp_path_factory.mktemp("spectree") / "m.gguf")
    convert_hf(m, path, qtype=GGMLType.F32)
    return path


@pytest.fixture(scope="module")
def draft_path(tmp_path_factory):
    torch.manual_seed(7)
    m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256))
    m.eval()
    path = str(tmp_path_factory.mktemp("spectree") / "d.gguf")
    convert_hf(m, path, qtype=GGMLType.F32)
    return path


PROMPT = [1, 17, 42, 5, 99]


def _plain_greedy(model_path, n):
    eng = Engine(model_path, n_ctx=256)
    toks, _ = eng.generate_fast(PROMPT, n_predict=n, temp=0.0,
                                stop_on_eos=False)
    return toks


def test_tree_matches_greedy_self_draft(model_path):
    """Target as its own draft: high acceptance, exercises deep accepts."""
    plain = _plain_greedy(model_path, 24)
    target = Engine(model_path, n_ctx=256)
    draft = Engine(model_path, n_ctx=256)
    out, _, stats = generate_speculative_tree(
        target, draft, PROMPT, n_predict=24, n_draft=6, n_seq_dft=3,
        p_split=0.1, stop_on_eos=False)
    assert out == plain
    assert stats.n_target_steps < 24          # speculation actually engaged
    assert stats.n_drafted > 0


def test_tree_matches_greedy_real_draft(model_path, draft_path):
    """Different (adversarial-ish) draft: exercises rejects + forks."""
    plain = _plain_greedy(model_path, 24)
    target = Engine(model_path, n_ctx=256)
    draft = Engine(draft_path, n_ctx=256)
    out, _, stats = generate_speculative_tree(
        target, draft, PROMPT, n_predict=24, n_draft=6, n_seq_dft=4,
        p_split=0.02, stop_on_eos=False)      # low p_split => many forks
    assert out == plain


def test_tree_kv_state_consistent_after(model_path):
    """After the speculative call the engine continues decoding with a KV
    identical to plain decoding's (consolidation correctness). Post-call
    contract (same as the chain fast path): KV holds out[:n_past-start0]."""
    target = Engine(model_path, n_ctx=256)
    draft = Engine(model_path, n_ctx=256)
    out, _, _ = generate_speculative_tree(
        target, draft, PROMPT, n_predict=12, n_draft=5, n_seq_dft=3,
        stop_on_eos=False)

    m = int(target.n_past[0]) - len(PROMPT)
    assert 0 < m <= len(out)
    # evaluate whatever suffix is not yet in the KV, then one probe token
    if m < len(out):
        target.eval_tokens(0, out[m:])
    lg_spec = target.decode_one(0, 7)

    ref = Engine(model_path, n_ctx=256)
    ref.reset_slot(0)
    ref.prefill(0, PROMPT + out)
    lg_ref = ref.decode_one(0, 7)
    np.testing.assert_allclose(np.asarray(lg_spec), np.asarray(lg_ref),
                               rtol=2e-4, atol=2e-4)


def test_tree_rejects_bad_engines(model_path):
    target = Engine(model_path, n_ctx=64, n_slots=2)
    draft = Engine(model_path, n_ctx=64)
    with pytest.raises(ValueError):
        generate_speculative_tree(target, draft, PROMPT, n_seq_dft=2)
    t1 = Engine(model_path, n_ctx=64)
    with pytest.raises(ValueError):
        generate_speculative_tree(t1, draft, PROMPT, n_seq_dft=1)
