"""Speculative / prompt-lookup decoding correctness.

The invariant (same as the reference's speculative example): with greedy
sampling, speculative output is IDENTICAL to plain autoregressive decoding —
acceptance only changes wall-clock, never the text. Using the target as its
own draft forces a 100% acceptance rate, exercising the full accept path;
an adversarial draft exercises rejection + KV rollback.
"""

import numpy as np
import pytest

import torch
import transformers

pytest.importorskip("transformers")

from tpulamm.gguf.constants import GGMLType  # noqa: E402
from tpulamm.runtime.engine import Engine  # noqa: E402
from tpulamm.runtime.sampling import SamplingParams  # noqa: E402
from tpulamm.runtime.speculative import (find_ngram_draft,  # noqa: E402
                                         generate_prompt_lookup,
                                         generate_speculative)
from tpulamm.tools.convert_hf import convert_hf  # noqa: E402

GREEDY = dict(sampling=SamplingParams(temp=0.0), stop_on_eos=False)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256))
    m.eval()
    path = str(tmp_path_factory.mktemp("spec") / "m.gguf")
    convert_hf(m, path, qtype=GGMLType.F32)
    return path


PROMPT = [1, 17, 42, 5, 99]


def test_speculative_matches_greedy(model_path):
    eng = Engine(model_path, n_ctx=256)
    plain, _ = eng.generate(PROMPT, n_predict=24, **GREEDY)

    target = Engine(model_path, n_ctx=256)
    draft = Engine(model_path, n_ctx=256)
    spec, _, stats = generate_speculative(target, draft, PROMPT,
                                          n_predict=24, n_draft=4, **GREEDY)
    assert spec == plain
    # identical target/draft => most greedy drafts accepted. Not exactly
    # all: the draft proposes via T=1 steps while the target verifies a
    # padded chunk, and a random tiny model's near-tie logits can argmax
    # differently across XLA shapes (same effect exists in the reference
    # between batched and single eval). Real trained models are far less
    # tie-dense.
    assert stats.accept_rate > 0.5
    # fewer target steps than tokens (that's the point)
    assert stats.n_target_steps < len(spec)


def test_speculative_with_bad_draft(model_path, tmp_path):
    """A different draft model: rejections + KV rollback still yield the
    exact greedy output."""
    torch.manual_seed(123)   # different weights -> drafts often rejected
    m2 = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256))
    m2.eval()
    dpath = str(tmp_path / "draft.gguf")
    convert_hf(m2, dpath, qtype=GGMLType.F32)

    eng = Engine(model_path, n_ctx=256)
    plain, _ = eng.generate(PROMPT, n_predict=20, **GREEDY)

    target = Engine(model_path, n_ctx=256)
    draft = Engine(dpath, n_ctx=256)
    spec, _, stats = generate_speculative(target, draft, PROMPT,
                                          n_predict=20, n_draft=4, **GREEDY)
    assert spec == plain
    assert stats.n_drafted > 0


def test_prompt_lookup_matches_greedy(model_path):
    eng = Engine(model_path, n_ctx=256)
    # repetitive prompt so n-gram lookup finds drafts
    prompt = [7, 8, 9, 10, 7, 8, 9, 10, 7, 8]
    plain, _ = eng.generate(prompt, n_predict=20, **GREEDY)

    eng2 = Engine(model_path, n_ctx=256)
    spec, _, stats = generate_prompt_lookup(eng2, prompt, n_predict=20,
                                            n_draft=4, **GREEDY)
    assert spec == plain
    assert stats.n_drafted > 0   # the repeats must produce proposals


def test_find_ngram_draft():
    h = [1, 2, 3, 4, 9, 1, 2, 3]
    # most recent trigram [1,2,3] matched at start; continuation [4, 9]
    assert find_ngram_draft(h, 2, ngram_min=1, ngram_max=3) == [4, 9]
    assert find_ngram_draft([5, 6, 7], 3) == []      # no repeat -> no draft
    # prefers longest n-gram: [2,3] repeat vs [3] repeat
    h2 = [3, 8, 2, 3, 5, 2, 3]
    assert find_ngram_draft(h2, 1, ngram_min=1, ngram_max=4) == [5]


def test_rollback_restores_state(model_path):
    """eval_tokens + rollback must leave decode identical to never having
    speculated (KV cell hygiene)."""
    eng = Engine(model_path, n_ctx=256)
    eng.prefill(0, PROMPT)
    base = int(eng.n_past[0])
    ref_logits = eng.decode_one(0, 11)
    eng.rollback(0, base)
    # speculate garbage, roll back, then take the same step
    eng.eval_tokens(0, [11, 23, 54, 200])
    eng.rollback(0, base)
    logits2 = eng.decode_one(0, 11)
    np.testing.assert_allclose(logits2, ref_logits, rtol=1e-5, atol=1e-5)


def test_segmented_eval_mask(model_path):
    """Segment ranges gate attention: a probe token in segment A must see
    main-sequence keys but not segment-B keys at lower positions."""
    import jax.numpy as jnp
    eng = Engine(model_path, n_ctx=64, compute_dtype="float32")
    eng.prefill(0, PROMPT)
    n = int(eng.n_past[0])

    def pack(lo, hi):
        return lo | (hi << 16)

    # two parallel branch tokens at the same positions, different segments,
    # then a probe in each segment one position later
    toks = np.array([11, 23, 40, 40], np.int32)
    poss = np.array([n, n, n + 1, n + 1], np.int32)
    segs = np.array([pack(1, 1), pack(2, 2), pack(1, 1), pack(2, 2)],
                    np.int32)
    logits = eng.eval_segmented(0, toks, poss, segs)
    # identical probe token, same position, different branch history (11 vs
    # 23) -> different logits; same-branch pairs must differ too
    assert not np.allclose(logits[2], logits[3], atol=1e-5)
    eng.rollback(0, n)

    # control: identical branch histories -> identical probe logits
    toks2 = np.array([11, 11, 40, 40], np.int32)
    logits2 = eng.eval_segmented(0, toks2, poss, segs)
    np.testing.assert_allclose(logits2[2], logits2[3], rtol=1e-5, atol=1e-5)
    eng.rollback(0, n)


def test_lookahead_matches_greedy(model_path):
    from tpulamm.runtime.lookahead import generate_lookahead
    eng = Engine(model_path, n_ctx=128)
    plain, _ = eng.generate(PROMPT, n_predict=20, **GREEDY)

    eng2 = Engine(model_path, n_ctx=128)
    la, _, stats = generate_lookahead(eng2, PROMPT, n_predict=20,
                                      sampling=SamplingParams(temp=0.0),
                                      W=4, N=3, G=4, stop_on_eos=False)
    assert la == plain
    assert stats.n_target_steps > 0


# -- on-device speculative decoding (whole loop in one lax.while_loop) --------
#
# Baseline is generate_fast (the T=1 on-device scan). The shared model_path
# fixture is too tie-dense for cross-shape argmax stability (its greedy
# chain already differs between generate() and decode_one()), so these
# tests sharpen the lm head 3x: top-1 margins then dominate the ~1e-6
# reduction-order noise between the T=1 and T=k+1 verify shapes.


@pytest.fixture(scope="module")
def sharp_model_path(tmp_path_factory):
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256))
    m.eval()
    with torch.no_grad():
        m.lm_head.weight *= 3.0
    path = str(tmp_path_factory.mktemp("spec_sharp") / "m.gguf")
    convert_hf(m, path, qtype=GGMLType.F32)
    return path


def test_ondevice_spec_matches_greedy(sharp_model_path):
    """Greedy on-device speculation emits exactly the plain-greedy tokens;
    self-draft forces the full-acceptance path."""
    from tpulamm.runtime.speculative import generate_speculative_fast
    eng = Engine(sharp_model_path, n_ctx=256)
    plain, _ = eng.generate_fast(PROMPT, n_predict=24, temp=0.0,
                                 stop_on_eos=False)

    target = Engine(sharp_model_path, n_ctx=256)
    draft = Engine(sharp_model_path, n_ctx=256)
    spec, _, stats = generate_speculative_fast(
        target, draft, PROMPT, n_predict=24, n_draft=4, temp=0.0,
        stop_on_eos=False)
    assert spec == plain
    assert stats.accept_rate > 0.5
    assert stats.n_target_steps < len(spec)


def test_ondevice_spec_bad_draft(sharp_model_path, tmp_path):
    """Adversarial draft: rejections still yield the exact greedy output,
    and the engines are left continuable (state contract)."""
    from tpulamm.runtime.speculative import generate_speculative_fast
    torch.manual_seed(321)
    m2 = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256))
    m2.eval()
    dpath = str(tmp_path / "draft.gguf")
    convert_hf(m2, dpath, qtype=GGMLType.F32)

    eng = Engine(sharp_model_path, n_ctx=256)
    plain, _ = eng.generate_fast(PROMPT, n_predict=40, temp=0.0,
                                 stop_on_eos=False)

    target = Engine(sharp_model_path, n_ctx=256)
    draft = Engine(dpath, n_ctx=256)
    spec, _, stats = generate_speculative_fast(
        target, draft, PROMPT, n_predict=40, n_draft=4, temp=0.0,
        stop_on_eos=False)
    assert spec == plain
    assert stats.n_drafted > 0
    assert stats.accept_rate < 1.0   # a random draft must miss sometimes
    # state contract: KV holds exactly the returned tokens; cell table is
    # contiguous (rejected cells were rolled back)
    held = int(target.n_past[0]) - len(PROMPT)
    assert held in (len(spec), len(spec) - 1)
    np.testing.assert_array_equal(
        target.cell_pos[0, :int(target.n_past[0])],
        np.arange(int(target.n_past[0])))


def test_ondevice_spec_multi_block(sharp_model_path, monkeypatch):
    """n_predict above one scan bucket: the host block loop continues the
    generation across scan calls without dropping or duplicating tokens."""
    from tpulamm.runtime.speculative import generate_speculative_fast
    eng = Engine(sharp_model_path, n_ctx=256)
    plain, _ = eng.generate_fast(PROMPT, n_predict=40, temp=0.0,
                                 stop_on_eos=False)

    target = Engine(sharp_model_path, n_ctx=256)
    draft = Engine(sharp_model_path, n_ctx=256)
    # a tiny bucket caps each scan at 8 verify steps (<= 24 tokens at
    # n_draft=2), forcing at least two scan invocations for 40 tokens
    monkeypatch.setattr(Engine, "DECODE_BUCKETS", (8,))
    spec, _, _ = generate_speculative_fast(
        target, draft, PROMPT, n_predict=40, n_draft=2, temp=0.0,
        stop_on_eos=False)
    assert spec == plain


def test_ondevice_lookup_matches_greedy(sharp_model_path):
    """On-device n-gram lookup speculation: exact greedy parity (any
    proposal source), and a repetitive prompt must yield acceptances."""
    from tpulamm.runtime.speculative import generate_prompt_lookup_fast
    prompt = [7, 8, 9, 10, 7, 8, 9, 10, 7, 8]
    eng = Engine(sharp_model_path, n_ctx=256)
    plain, _ = eng.generate_fast(prompt, n_predict=24, temp=0.0,
                                 stop_on_eos=False)

    eng2 = Engine(sharp_model_path, n_ctx=256)
    spec, _, stats = generate_prompt_lookup_fast(
        eng2, prompt, n_predict=24, n_draft=4, temp=0.0, stop_on_eos=False)
    assert spec == plain
    assert stats.n_drafted > 0
    # greedy decode of a tiny model falls into a repeating cycle quickly;
    # the n-gram proposer must then accept at a healthy rate
    assert stats.n_accepted > 0
    np.testing.assert_array_equal(
        eng2.cell_pos[0, :int(eng2.n_past[0])],
        np.arange(int(eng2.n_past[0])))


def test_ondevice_lookup_no_repeats(sharp_model_path):
    """A repeat-free prompt: proposals are rejected, output still exact."""
    from tpulamm.runtime.speculative import generate_prompt_lookup_fast
    eng = Engine(sharp_model_path, n_ctx=256)
    plain, _ = eng.generate_fast(PROMPT, n_predict=16, temp=0.0,
                                 stop_on_eos=False)
    eng2 = Engine(sharp_model_path, n_ctx=256)
    spec, _, _ = generate_prompt_lookup_fast(
        eng2, PROMPT, n_predict=16, n_draft=4, temp=0.0, stop_on_eos=False)
    assert spec == plain


# -- stochastic speculative sampling (speculative.cpp:245-295 parity) ---------
#
# The acceptance rule (draft samples d ~ q; accept iff u <= p(d)/q(d);
# resample the first rejection from normalize(max(p-q,0))) must emit tokens
# distributed EXACTLY as plain target sampling, for ANY draft distribution.
# These tests verify the theorem empirically at the rule level (vectorized,
# tight tolerance) and end-to-end through the on-device scan.


def test_stochastic_rule_distribution_parity():
    """Rule-level: the marginal of the first emitted token equals the
    target distribution p for an arbitrary (mismatched) draft q."""
    import jax
    import jax.numpy as jnp

    from tpulamm.runtime.speculative import (_dense_dist, _dist_sample,
                                             _stochastic_accept)
    V, k = 16, 3
    rng = np.random.default_rng(0)
    lg_t = jnp.asarray(rng.normal(size=(k + 1, V)) * 1.5, jnp.float32)
    lg_d = jnp.asarray(rng.normal(size=(k, V)) * 1.5, jnp.float32)
    temp, top_k = jnp.float32(1.0), 0

    pt = jax.vmap(lambda l: _dense_dist(l, temp, top_k))(lg_t)
    qd = jax.vmap(lambda l: _dense_dist(l, temp, top_k))(lg_d)

    @jax.jit
    def one_trial(key):
        key, dk = jax.random.split(key)
        draft_toks = jax.vmap(_dist_sample)(qd, jax.random.split(dk, k))
        n_acc, nxt, _ = _stochastic_accept(pt, qd, draft_toks, key)
        first = jnp.where(n_acc == 0, nxt, draft_toks[0])
        return first, n_acc

    N = 40000
    firsts, n_accs = jax.vmap(one_trial)(
        jax.vmap(jax.random.PRNGKey)(jnp.arange(N)))
    emp = np.bincount(np.asarray(firsts), minlength=V) / N
    tv = 0.5 * np.abs(emp - np.asarray(pt[0])).sum()
    # sqrt(V/N) ~ 0.02 sampling noise at N=40k; 0.02 tolerance rejects
    # any systematic bias (token-match emission here measures tv ~ 0.1+)
    assert tv < 0.02, f"TV(emitted, target) = {tv:.4f}"
    # both accept and reject paths must actually run
    n_accs = np.asarray(n_accs)
    assert (n_accs == 0).any() and (n_accs > 0).any()


def test_stochastic_rule_identical_dists_accept_all():
    """p == q => acceptance probability is exactly 1 (u <= p/q = 1 always);
    token-match would accept only with probability sum p^2 < 1."""
    import jax
    import jax.numpy as jnp

    from tpulamm.runtime.speculative import (_dense_dist, _dist_sample,
                                             _stochastic_accept)
    V, k = 16, 4
    rng = np.random.default_rng(1)
    lg = jnp.asarray(rng.normal(size=(k + 1, V)) * 1.5, jnp.float32)
    temp, top_k = jnp.float32(0.8), 0
    pt = jax.vmap(lambda l: _dense_dist(l, temp, top_k))(lg)
    qd = pt[:k]

    @jax.jit
    def one_trial(key):
        key, dk = jax.random.split(key)
        draft_toks = jax.vmap(_dist_sample)(qd, jax.random.split(dk, k))
        n_acc, _, _ = _stochastic_accept(pt, qd, draft_toks, key)
        return n_acc

    n_accs = np.asarray(jax.vmap(one_trial)(
        jax.vmap(jax.random.PRNGKey)(jnp.arange(2000))))
    assert (n_accs == k).all()


def test_stochastic_rule_point_mass_draft():
    """q = point mass at d (the lookup-tier regime): acceptance must be
    p(d), rejection must resample p excluding d — i.e. exactly what the
    token-match rule does for deterministic drafts."""
    import jax
    import jax.numpy as jnp

    from tpulamm.runtime.speculative import _stochastic_accept
    V = 8
    p = np.asarray([.3, .2, .15, .1, .1, .08, .05, .02], np.float32)
    d = 1
    pt = jnp.asarray(np.stack([p, p]), jnp.float32)          # k=1
    qd = jnp.zeros((1, V), jnp.float32).at[0, d].set(1.0)
    toks = jnp.asarray([d], jnp.int32)

    @jax.jit
    def one_trial(key):
        n_acc, nxt, _ = _stochastic_accept(pt, qd, toks, key)
        return n_acc, nxt

    N = 40000
    n_accs, nxts = jax.vmap(one_trial)(
        jax.vmap(jax.random.PRNGKey)(jnp.arange(N)))
    n_accs, nxts = np.asarray(n_accs), np.asarray(nxts)
    acc_rate = (n_accs == 1).mean()
    assert abs(acc_rate - p[d]) < 0.01
    rej = nxts[n_accs == 0]
    res = p.copy()
    res[d] = 0.0
    res /= res.sum()
    emp = np.bincount(rej, minlength=V) / max(len(rej), 1)
    assert 0.5 * np.abs(emp - res).sum() < 0.02
    assert (rej != d).all()


def test_ondevice_spec_stochastic_self_draft(sharp_model_path):
    """End-to-end through the scan: self-draft at temp>0 must accept
    ~always under stochastic acceptance (p == q up to float noise) —
    the sharpest possible detector of a mis-wired ratio. Token-match
    (TPULAMM_SPEC_TOKEN_MATCH=1) accepts far less on the same pair."""
    from tpulamm.runtime.speculative import generate_speculative_fast
    target = Engine(sharp_model_path, n_ctx=256)
    draft = Engine(sharp_model_path, n_ctx=256)
    out, _, stats = generate_speculative_fast(
        target, draft, PROMPT, n_predict=32, n_draft=4, temp=0.9,
        top_k=0, seed=7, stop_on_eos=False)
    assert len(out) == 32
    assert stats.accept_rate > 0.9, stats
    # engines continuable: contiguous cells, n_past consistent
    np.testing.assert_array_equal(
        target.cell_pos[0, :int(target.n_past[0])],
        np.arange(int(target.n_past[0])))


def test_ondevice_spec_stochastic_bad_draft(sharp_model_path, tmp_path,
                                            monkeypatch):
    """Mismatched draft at temp>0: rejections exercise the residual
    resample; output must stay plausible (drawn from the target's top-k
    support) and the run must out-accept the token-match rule on the
    same pair/seed."""
    import os
    from tpulamm.runtime.speculative import generate_speculative_fast
    torch.manual_seed(321)
    m2 = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256))
    m2.eval()
    dpath = str(tmp_path / "draft.gguf")
    convert_hf(m2, dpath, qtype=GGMLType.F32)

    target = Engine(sharp_model_path, n_ctx=256)
    draft = Engine(dpath, n_ctx=256)
    out, _, stats = generate_speculative_fast(
        target, draft, PROMPT, n_predict=40, n_draft=4, temp=0.8,
        top_k=40, seed=3, stop_on_eos=False)
    assert len(out) == 40
    assert 0.0 < stats.accept_rate < 1.0

    # token-match A/B on the identical pair: stochastic must accept more
    monkeypatch.setenv("TPULAMM_SPEC_TOKEN_MATCH", "1")
    target2 = Engine(sharp_model_path, n_ctx=256)
    draft2 = Engine(dpath, n_ctx=256)
    _, _, stats_tm = generate_speculative_fast(
        target2, draft2, PROMPT, n_predict=40, n_draft=4, temp=0.8,
        top_k=40, seed=3, stop_on_eos=False)
    assert stats.accept_rate >= stats_tm.accept_rate
