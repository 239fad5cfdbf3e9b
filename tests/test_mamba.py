"""Mamba SSM parity vs HF transformers + recurrent decode engine behavior.

Covers build_mamba parity (llama.cpp:7980-8308): conv state carry, selective
scan (softplus-inside semantics of ggml_ssm_scan), state-not-KV decode, and
prefill==incremental-decode equivalence of the recurrent state.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("transformers")
import torch  # noqa: E402
import transformers  # noqa: E402

from tpulamm.gguf.constants import GGMLType  # noqa: E402
from tpulamm.models.loader import load_model  # noqa: E402
from tpulamm.models.mamba import MambaState, forward  # noqa: E402
from tpulamm.tools.convert_hf import convert_hf  # noqa: E402

TOKENS = np.array([[1, 5, 42, 7, 99, 3, 200, 17]], dtype=np.int64)


@pytest.fixture(scope="module")
def mamba_gguf(tmp_path_factory):
    torch.manual_seed(0)
    m = transformers.MambaForCausalLM(transformers.MambaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        state_size=8, conv_kernel=4, expand=2, time_step_rank=8,
        use_cache=False))
    m.eval()
    path = str(tmp_path_factory.mktemp("mamba") / "m.gguf")
    convert_hf(m, path, qtype=GGMLType.F32)
    with torch.no_grad():
        ref = m(torch.from_numpy(TOKENS)).logits.float().numpy()
    return path, ref


def _ours(path, tokens, state=None, pos0=0):
    cfg, params, _ = load_model(path, compute_dtype="float32")
    B, T = tokens.shape
    if state is None:
        state = MambaState.create(cfg, B)
    positions = pos0 + jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    slots = jnp.arange(B, dtype=jnp.int32)
    logits, state = forward(params, cfg, jnp.asarray(tokens, jnp.int32),
                            positions, state, slots)
    return np.asarray(logits), state


def test_mamba_hf_parity(mamba_gguf):
    path, ref = mamba_gguf
    ours, _ = _ours(path, TOKENS)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_mamba_incremental_matches_prefill(mamba_gguf):
    """Feeding tokens one at a time through the carried state must equal the
    full-sequence scan (state correctness across steps)."""
    path, _ = mamba_gguf
    full, _ = _ours(path, TOKENS)
    cfg, params, _ = load_model(path, compute_dtype="float32")
    state = MambaState.create(cfg, 1)
    outs = []
    for t in range(TOKENS.shape[1]):
        lg, state = forward(params, cfg,
                            jnp.asarray(TOKENS[:, t:t + 1], jnp.int32),
                            jnp.full((1, 1), t, jnp.int32), state,
                            jnp.zeros((1,), jnp.int32))
        outs.append(np.asarray(lg)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), full, rtol=2e-4, atol=2e-4)


def test_mamba_padding_does_not_touch_state(mamba_gguf):
    """Padding rows (position -1) must leave the recurrent state unchanged."""
    path, _ = mamba_gguf
    cfg, params, _ = load_model(path, compute_dtype="float32")
    state = MambaState.create(cfg, 1)
    toks = jnp.asarray(TOKENS[:, :4], jnp.int32)
    pos = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    _, s_ref = forward(params, cfg, toks, pos, state,
                       jnp.zeros((1,), jnp.int32))
    # same tokens + 4 garbage pads at position -1
    toks_p = jnp.concatenate([toks, jnp.full((1, 4), 123, jnp.int32)], 1)
    pos_p = jnp.concatenate([pos, jnp.full((1, 4), -1, jnp.int32)], 1)
    _, s_pad = forward(params, cfg, toks_p, pos_p,
                       MambaState.create(cfg, 1), jnp.zeros((1,), jnp.int32))
    np.testing.assert_allclose(np.asarray(s_pad.ssm), np.asarray(s_ref.ssm),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_pad.conv), np.asarray(s_ref.conv),
                               rtol=1e-5, atol=1e-6)


def test_mamba_engine_generate(mamba_gguf, tmp_path):
    """The decode engine drives mamba end-to-end (recurrent state path)."""
    from tpulamm.runtime.engine import Engine
    from tpulamm.runtime.sampling import SamplingParams
    path, _ = mamba_gguf
    eng = Engine(path, n_ctx=64)
    ids, _ = eng.generate([1, 5, 42], n_predict=8,
                          sampling=SamplingParams(temp=0.0), stop_on_eos=False)
    assert len(ids) == 8
    # greedy decode is deterministic given the state
    eng.reset_slot(0)
    ids2, _ = eng.generate([1, 5, 42], n_predict=8,
                           sampling=SamplingParams(temp=0.0),
                           stop_on_eos=False)
    assert ids == ids2


def test_mamba_embeddings(mamba_gguf):
    """llama_get_embeddings works for recurrent models too: the headless
    forward returns final hidden states and Engine.embed pools them."""
    from tpulamm.runtime.engine import Engine
    path, _ = mamba_gguf
    eng = Engine(path, n_ctx=64)
    v = eng.embed([3, 10, 20, 30], pooling="mean")
    assert v.shape == (eng.cfg.dim,)
    assert np.isfinite(v).all()
    v2 = eng.embed([3, 10, 20, 30], pooling="last")
    assert v2.shape == (eng.cfg.dim,)
    assert not np.allclose(v, v2)
