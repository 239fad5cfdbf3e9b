"""On-device sampler chain vs the host sampler (runtime/sampling.py).

The device chain (ops/device_sampling.py) must reproduce the host
sampler's semantics: identical greedy-after-penalties tokens, identical
filter keep-sets for the default queue, and — end-to-end — identical
greedy decode through Engine.decode_batch_sampled vs the per-token host
loop, which is what the server's second-tier fast path relies on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpulamm.ops.device_sampling import (K_CHAIN, W_RING, SampParams,
                                         build_counts, fast_chain_eligible,
                                         filter_candidates,
                                         params_from_samplers, push_token,
                                         ring_from_prev, sample_chain)
from tpulamm.runtime import sampling as hs
from tpulamm.runtime.sampling import Sampler, SamplingParams

V = 400


def _sp(n, **kw):
    """Neutral SampParams for n slots, with overrides (scalars broadcast)."""
    base = dict(temp=np.zeros(n, np.float32),
                top_k=np.full(n, K_CHAIN, np.int32),
                top_p=np.ones(n, np.float32),
                min_p=np.zeros(n, np.float32),
                tfs_z=np.ones(n, np.float32),
                typical_p=np.ones(n, np.float32),
                pen_repeat=np.ones(n, np.float32),
                pen_freq=np.zeros(n, np.float32),
                pen_present=np.zeros(n, np.float32),
                last_n=np.full(n, W_RING, np.int32),
                penalize_nl=np.ones(n, bool),
                ignore_eos=np.zeros(n, bool))
    for k, v in kw.items():
        base[k] = np.full(n, v, base[k].dtype)
    return SampParams(**{k: jnp.asarray(v) for k, v in base.items()})


def _host_queue(logits, p: SamplingParams):
    lg = np.asarray(logits, np.float32).copy()
    lg = hs.top_k(lg, p.top_k)
    lg = hs.tail_free(lg, p.tfs_z)
    lg = hs.typical(lg, p.typical_p)
    lg = hs.top_p(lg, p.top_p)
    lg = hs.min_p(lg, p.min_p)
    return lg


@pytest.mark.parametrize("kw,host_kw", [
    ({"top_k": 40}, dict(top_k=40)),
    ({"top_k": 40, "top_p": 0.9}, dict(top_k=40, top_p=0.9)),
    ({"top_k": 64, "min_p": 0.05}, dict(top_k=64, min_p=0.05)),
    ({"top_k": 80, "tfs_z": 0.95}, dict(top_k=80, tfs_z=0.95)),
    ({"top_k": 80, "typical_p": 0.9}, dict(top_k=80, typical_p=0.9)),
    ({"top_k": 40, "top_p": 0.8, "min_p": 0.02, "tfs_z": 0.97,
      "typical_p": 0.95},
     dict(top_k=40, top_p=0.8, min_p=0.02, tfs_z=0.97, typical_p=0.95)),
])
def test_filter_keep_sets_match_host(kw, host_kw):
    """The surviving-token set after the device queue == host queue."""
    rng = np.random.default_rng(0)
    lg = rng.normal(0, 3, (3, V)).astype(np.float32)
    sp = _sp(3, **kw)
    kv, ki = jax.jit(filter_candidates)(jnp.asarray(lg), sp)
    kv, ki = np.asarray(kv), np.asarray(ki)
    defaults = dict(tfs_z=1.0, typical_p=1.0, top_p=1.0, min_p=0.0)
    params = SamplingParams(**{**defaults, **host_kw})
    for b in range(3):
        dev_keep = set(ki[b][kv[b] > -1e29].tolist())
        host_lg = _host_queue(lg[b], params)
        host_keep = set(np.flatnonzero(np.isfinite(host_lg)).tolist())
        assert dev_keep == host_keep, (kw, b)


def test_greedy_penalties_match_host_sampler():
    """temp=0 + penalties: device token == host Sampler.sample exactly."""
    rng = np.random.default_rng(1)
    lg = rng.normal(0, 2, (2, V)).astype(np.float32)
    prevs = {0: [5, 5, 5, 9, 13, 13], 1: [7] * 10 + [2]}
    p0 = SamplingParams(temp=0.0, penalty_repeat=1.4, penalty_freq=0.2,
                        penalty_present=0.3, penalty_last_n=4)
    p1 = SamplingParams(temp=0.0, penalty_repeat=1.1, penalty_freq=0.0,
                        penalty_present=0.0, penalty_last_n=64,
                        penalize_nl=False, ignore_eos=True)
    samplers = {}
    for i, p in enumerate((p0, p1)):
        s = Sampler(p, V, eos_id=2, nl_id=13)
        for t in prevs[i]:
            s.accept(t)
        samplers[i] = s

    sp = params_from_samplers(samplers, 2)
    ring, wr = ring_from_prev({i: s.prev for i, s in samplers.items()}, 2)
    sp = jax.tree_util.tree_map(jnp.asarray, sp)
    counts = build_counts(jnp.asarray(ring), jnp.int32(wr), sp.last_n, V)
    _, nxt = sample_chain(jnp.asarray(lg), jax.random.PRNGKey(0), sp,
                          counts, 13, 2, jnp.ones(2, bool))
    for b in (0, 1):
        assert int(nxt[b]) == samplers[b].sample(lg[b]), b


def test_push_token_window_eviction():
    """counts track exactly the newest last_n fed tokens per slot."""
    ring, wr = ring_from_prev({0: [3, 4, 3], 1: [9]}, 2)
    last_n = jnp.asarray([2, W_RING], jnp.int32)
    ring, wr = jnp.asarray(ring), jnp.int32(wr)
    counts = build_counts(ring, wr, last_n, 16)
    # slot0 window=2 -> {4,3}; slot1 -> {9}
    assert counts[0, 3] == 1 and counts[0, 4] == 1 and counts[0].sum() == 2
    assert counts[1, 9] == 1 and counts[1].sum() == 1
    active = jnp.ones(2, bool)
    ring, wr, counts = push_token(ring, wr, counts, last_n,
                                  jnp.asarray([7, 9], jnp.int32), active)
    # slot0: {3,7} (4 evicted); slot1: {9:2}
    assert counts[0, 3] == 1 and counts[0, 7] == 1 and counts[0, 4] == 0
    assert counts[1, 9] == 2
    ring, wr, counts = push_token(ring, wr, counts, last_n,
                                  jnp.asarray([7, 9], jnp.int32), active)
    assert counts[0, 7] == 2 and counts[0, 3] == 0 and counts[0].sum() == 2
    assert counts[1, 9] == 3


def test_fast_chain_eligible_gate():
    assert fast_chain_eligible(SamplingParams())          # defaults qualify
    assert fast_chain_eligible(SamplingParams(temp=0.0, penalty_repeat=1.3))
    assert not fast_chain_eligible(SamplingParams(mirostat=2))
    assert not fast_chain_eligible(SamplingParams(logit_bias={3: 1.0}))
    assert not fast_chain_eligible(SamplingParams(samplers_sequence="tk"))
    assert not fast_chain_eligible(SamplingParams(dynatemp_range=0.5))
    assert not fast_chain_eligible(SamplingParams(top_k=K_CHAIN + 1))
    assert not fast_chain_eligible(
        SamplingParams(penalty_last_n=W_RING + 1))
    assert fast_chain_eligible(SamplingParams(top_k=0, temp=0.0))


def test_engine_sampled_block_matches_host_loop(tmp_path):
    """decode_batch_sampled greedy+penalties == per-token host loop."""
    pytest.importorskip("transformers")
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    from tests.test_engine import VOCAB, make_vocab_md
    from tpulamm.gguf.constants import GGMLType
    from tpulamm.runtime.engine import Engine
    from tpulamm.tools.convert_hf import convert_hf_llama

    torch.manual_seed(11)
    cfg = HFLlamaConfig(vocab_size=VOCAB, hidden_size=128,
                        intermediate_size=256, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=128, rms_norm_eps=1e-5,
                        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path / "m.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q8_0,
                     vocab=make_vocab_md())

    prompts = {0: [1, 5, 9, 5, 9], 1: [1, 30, 31, 32]}
    pp = {0: SamplingParams(temp=0.0, penalty_repeat=1.5, penalty_freq=0.3,
                            penalty_last_n=8),
          1: SamplingParams(temp=0.0, penalty_repeat=1.2,
                            penalty_present=0.5, penalty_last_n=64)}
    N = 12

    def mk(slot_count=2):
        eng = Engine(path, n_ctx=64, n_slots=slot_count,
                     compute_dtype="float32")
        samplers, carry = {}, {}
        for i, toks in prompts.items():
            s = Sampler(pp[i], eng.cfg.vocab_size, eos_id=2)
            for t in toks:
                s.accept(t, apply_grammar=False)
            lg = eng.prefill(i, toks)
            tok = s.sample(lg)
            s.accept(tok)
            samplers[i], carry[i] = s, tok
        return eng, samplers, carry

    # host reference: per-token decode_batch + host Sampler
    eng_h, smp_h, carry_h = mk()
    host_out = {0: [carry_h[0]], 1: [carry_h[1]]}
    cur = dict(carry_h)
    for _ in range(N):
        lgs = eng_h.decode_batch(cur)
        for i, lg in lgs.items():
            t = smp_h[i].sample(lg)
            smp_h[i].accept(t)
            host_out[i].append(t)
            cur[i] = t

    # device: one sampled block
    eng_d, smp_d, carry_d = mk()
    assert carry_d == carry_h
    blocks = eng_d.decode_batch_sampled(carry_d, N, smp_d, seed=3)
    for i in (0, 1):
        assert blocks[i] == host_out[i][1:], i
    # n_past advanced and cells stay contiguous (fast-path invariant)
    for i in (0, 1):
        n = int(eng_d.n_past[i])
        assert n == len(prompts[i]) + N   # carry fed as the first step
        np.testing.assert_array_equal(eng_d.cell_pos[i, :n], np.arange(n))


def test_host_penalty_last_n_negative_means_all():
    """penalty_last_n=-1 = whole context (common.cpp maps -1 to n_ctx);
    the old prev[-(-1):] slice silently dropped the oldest token."""
    rng = np.random.default_rng(3)
    lg = rng.normal(0, 2, V).astype(np.float32)
    prev = [5, 6, 7]
    a = Sampler(SamplingParams(temp=0.0, penalty_repeat=2.0,
                               penalty_last_n=-1), V, eos_id=2)
    b = Sampler(SamplingParams(temp=0.0, penalty_repeat=2.0,
                               penalty_last_n=3), V, eos_id=2)
    for t in prev:
        a.accept(t)
        b.accept(t)
    # make token 5 (the OLDEST) the greedy winner unless penalized
    lg[5] = lg.max() + 0.5
    assert a.sample(lg) == b.sample(lg)     # -1 penalizes token 5 too
