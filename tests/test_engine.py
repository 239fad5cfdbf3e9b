"""Engine integration tests: generation loop, KV management, context shift.

Uses a tiny converted HF model (same fixture approach as test_llama_forward).
"""

import numpy as np
import pytest

pytest.importorskip("transformers")
import torch
from transformers import LlamaConfig as HFLlamaConfig
from transformers import LlamaForCausalLM

from tpulamm.gguf.constants import GGMLType
from tpulamm.runtime.engine import Engine
from tpulamm.runtime.sampling import Sampler, SamplingParams
from tpulamm.tools.convert_hf import convert_hf_llama
from tpulamm.tokenizer.spm import TOKEN_TYPE_BYTE, TOKEN_TYPE_CONTROL, TOKEN_TYPE_NORMAL

VOCAB = 512


def make_vocab_md():
    tokens = ["<unk>", "<s>", "</s>"]
    ttypes = [2, TOKEN_TYPE_CONTROL, TOKEN_TYPE_CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        ttypes.append(TOKEN_TYPE_BYTE)
        scores.append(0.0)
    words = ["▁the", "▁cat", "▁sat", "▁on", "▁mat", "at", "he", "▁a", "▁",
             "t", "h", "e", "c", "s", "o", "n", "m", "a"]
    for i, w in enumerate(words):
        tokens.append(w)
        ttypes.append(TOKEN_TYPE_NORMAL)
        scores.append(-float(i + 1))
    while len(tokens) < VOCAB:
        tokens.append(f"<extra_{len(tokens)}>")
        ttypes.append(TOKEN_TYPE_NORMAL)
        scores.append(-1000.0)
    return {"tokens": tokens, "scores": scores, "token_type": ttypes,
            "model": "llama", "bos": 1, "eos": 2}


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    torch.manual_seed(1)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q8_0,
                     vocab=make_vocab_md())
    return path


def test_generate_greedy(model_path):
    eng = Engine(model_path, n_ctx=64)
    ids, text = eng.generate("the cat", n_predict=8,
                             sampling=SamplingParams(temp=0.0),
                             stop_on_eos=False)
    assert len(ids) == 8
    assert all(0 <= t < VOCAB for t in ids)


def test_generate_deterministic_with_seed(model_path):
    eng = Engine(model_path, n_ctx=64)
    s = SamplingParams(temp=0.8, seed=42)
    ids1, _ = eng.generate("the cat", n_predict=6, sampling=s,
                           stop_on_eos=False)
    eng.reset_slot(0)
    ids2, _ = eng.generate("the cat", n_predict=6,
                           sampling=SamplingParams(temp=0.8, seed=42),
                           stop_on_eos=False)
    assert ids1 == ids2


def test_context_shift(model_path):
    eng = Engine(model_path, n_ctx=16)
    ids, _ = eng.generate("the cat sat on", n_predict=24,
                          sampling=SamplingParams(temp=0.0),
                          stop_on_eos=False)
    # generation continues past the context limit via context shifting
    assert len(ids) == 24
    assert (eng.cell_pos[0] >= 0).sum() <= 16


def test_self_extend(model_path):
    eng = Engine(model_path, n_ctx=32, grp_attn_n=2, grp_attn_w=8)
    ids, _ = eng.generate("the cat", n_predict=16,
                          sampling=SamplingParams(temp=0.0),
                          stop_on_eos=False)
    assert len(ids) == 16


def test_prefill_matches_decode(model_path):
    """Greedy continuation is identical whether the prompt was prefilled in
    one ubatch or in several (ubatch splitting correctness)."""
    eng1 = Engine(model_path, n_ctx=64, n_ubatch=512)
    eng2 = Engine(model_path, n_ctx=64, n_ubatch=4)
    p = "the cat sat on the mat"
    ids1, _ = eng1.generate(p, n_predict=6, sampling=SamplingParams(temp=0.0),
                            stop_on_eos=False)
    ids2, _ = eng2.generate(p, n_predict=6, sampling=SamplingParams(temp=0.0),
                            stop_on_eos=False)
    assert ids1 == ids2


def test_sampling_functions():
    from tpulamm.runtime import sampling as S
    logits = np.array([1.0, 3.0, 2.0, -1.0, 0.5], np.float32)
    assert np.isneginf(S.top_k(logits, 2)[[0, 3, 4]]).all()
    tp = S.top_p(logits, 0.6)
    assert np.isfinite(tp[1])
    mp = S.min_p(logits, 0.5)
    assert np.isfinite(mp[1]) and np.isneginf(mp[3])
    pen = S.apply_penalties(logits, [1, 1, 2], 1.5, 0.1, 0.1)
    assert pen[1] < logits[1] and pen[2] < logits[2] and pen[0] == logits[0]
    # mirostat smoke
    smp = Sampler(SamplingParams(mirostat=2, seed=7), 5)
    toks = [smp.sample(logits) for _ in range(8)]
    assert all(0 <= t < 5 for t in toks)
    smp1 = Sampler(SamplingParams(mirostat=1, seed=7), 5)
    toks = [smp1.sample(logits) for _ in range(8)]
    assert all(0 <= t < 5 for t in toks)


def test_generate_fast_matches_host_loop(model_path):
    """On-device lax.scan decode == host-loop greedy decode."""
    from tpulamm.runtime.engine import Engine
    from tpulamm.runtime.sampling import SamplingParams
    eng = Engine(model_path, n_ctx=64)
    plain, _ = eng.generate([1, 9, 33], n_predict=12,
                            sampling=SamplingParams(temp=0.0,
                                                    penalty_repeat=1.0),
                            stop_on_eos=False)
    eng2 = Engine(model_path, n_ctx=64)
    fast, _ = eng2.generate_fast([1, 9, 33], n_predict=12, temp=0.0,
                                 stop_on_eos=False)
    assert fast == plain
    # and the engine state stays usable for a follow-up host-loop decode
    nxt = eng2.decode_one(0, fast[-1])
    assert nxt.shape[-1] == eng2.cfg.vocab_size


def test_fused_projections_match_unfused(model_path):
    """Engine QKV/gate-up fusion must not change logits vs direct forward."""
    import jax.numpy as jnp
    from tpulamm.models.loader import load_model
    from tpulamm.models.transformer import forward
    from tpulamm.runtime.engine import Engine
    from tpulamm.runtime.kvcache import KVCache

    eng = Engine(model_path, n_ctx=32, compute_dtype="float32",
                 kv_dtype=jnp.float32)
    assert any("wqkv_fused" in l for l in eng.params["layers"])
    fused_logits = eng.prefill(0, [1, 5, 9, 20])

    cfg, params, _ = load_model(model_path, compute_dtype="float32")
    cache = KVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                           cfg.head_dim, dtype=jnp.float32)
    toks = jnp.asarray([[1, 5, 9, 20]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    logits, _ = forward(params, cfg, toks, pos, cache,
                        jnp.zeros((1,), jnp.int32), pos)
    import numpy as np
    np.testing.assert_allclose(fused_logits, np.asarray(logits)[0, -1],
                               rtol=2e-4, atol=2e-4)


def test_decode_batch_fast_matches_host(model_path):
    """Multi-slot scan block == per-token host decode_batch (greedy)."""
    import numpy as np
    from tpulamm.runtime.engine import Engine
    eng = Engine(model_path, n_ctx=64, n_slots=3)
    eng.prefill(0, [1, 9, 33])
    eng.prefill(1, [4, 7])
    cur = {0: 11, 1: 25}
    ref = {0: [], 1: []}
    for _ in range(6):
        logits = eng.decode_batch(cur)
        cur = {s: int(np.argmax(lg)) for s, lg in logits.items()}
        for s in cur:
            ref[s].append(cur[s])

    eng2 = Engine(model_path, n_ctx=64, n_slots=3)
    eng2.prefill(0, [1, 9, 33])
    eng2.prefill(1, [4, 7])
    fast = eng2.decode_batch_fast({0: 11, 1: 25}, 6)
    assert fast[0] == ref[0] and fast[1] == ref[1]
    # mirrors advanced consistently: a follow-up host step works
    nxt = eng2.decode_batch({0: fast[0][-1], 1: fast[1][-1]})
    assert set(nxt) == {0, 1}


def test_decode_batch_fast_guards(model_path):
    import pytest as _pytest
    from tpulamm.runtime.engine import Engine
    eng = Engine(model_path, n_ctx=16, n_slots=2)
    eng.prefill(0, [1, 9])
    with _pytest.raises(ValueError):
        eng.decode_batch_fast({0: 3}, 30)     # would overflow n_ctx
    # non-contiguous cells after surgery -> refuse
    eng.seq_rm(0, 0, 1)
    with _pytest.raises(ValueError):
        eng.decode_batch_fast({0: 3}, 2)


def test_self_extend_positions_match_reference(model_path):
    """The grouped-attention shift recurrence must track main.cpp:575-598
    exactly (ib = (ga_n*ga_i)/ga_w; n_past -= bd per shift)."""
    ga_n, ga_w = 2, 8
    eng = Engine(model_path, n_ctx=32, grp_attn_n=ga_n, grp_attn_w=ga_w)
    eng.prefill(0, [1, 300, 301, 302])

    def oracle(n_past, ga_i):
        while n_past >= ga_i + ga_w:
            ib = (ga_n * ga_i) // ga_w
            bd = (ga_w // ga_n) * (ga_n - 1)
            n_past -= bd
            ga_i += ga_w // ga_n
        return n_past, ga_i

    n_past, ga_i = 4, 0
    for step in range(24):
        n_past, ga_i = oracle(n_past, ga_i)
        eng.decode_one(0, 300 + step % 8)
        n_past += 1
        assert int(eng.n_past[0]) == n_past, (step, int(eng.n_past[0]), n_past)
        assert int(eng.ga_i[0]) == ga_i, (step, int(eng.ga_i[0]), ga_i)
    # the compressed window must stay bounded (never hit "KV cache full")
    assert int(eng.n_past[0]) < eng.n_ctx


def test_kv_span_parity(model_path, monkeypatch):
    """Bucketed attention spans (Engine._kv_span) are a pure read
    optimization: logits and generations are identical with spans
    disabled, across prefill, batched decode, and the decode scan."""
    p0, p1 = [1, 5, 9, 4], [1, 30, 31]

    def drive():
        eng = Engine(model_path, n_ctx=512, n_slots=2)
        logs = [eng.prefill(0, p0), eng.prefill(1, p1)]
        cur = {0: int(np.argmax(logs[0])), 1: 7}
        for _ in range(4):
            lg = eng.decode_batch(cur)
            logs.extend(lg[i] for i in sorted(lg))
            cur = {i: int(np.argmax(lg[i])) for i in lg}
        eng.reset_slot(0)
        out, _ = eng.generate_fast(p0, n_predict=20, temp=0.0,
                                   stop_on_eos=False, slot=0)
        return eng, logs, out

    eng_a, logs_a, out_a = drive()
    assert eng_a._kv_span(1) is not None          # spans actually engage
    monkeypatch.setenv("TPULAMM_NO_KV_SPAN", "1")
    eng_b, logs_b, out_b = drive()
    assert eng_b._kv_span(1) is None
    for a, b in zip(logs_a, logs_b):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert out_a == out_b


def test_kv_span_covers_cells_after_position_surgery(model_path):
    """Self-extend's seq_div shrinks POSITIONS while cells stay put; the
    span must track the occupied cell extent, not the max position
    (review finding: under-spanning silently dropped live KV)."""
    eng = Engine(model_path, n_ctx=1024)
    eng.prefill(0, list(range(1, 301)))
    assert eng._kv_span(1) == 512
    eng.seq_div(0, 0, 300, 4)        # grp-attn compression: pos 0..74
    assert int(eng.cell_pos[0].max()) <= 75   # positions shrank...
    span = eng._kv_span(1)
    assert span is None or span >= 512        # ...but the span did not


def test_b_rows_compaction_parity(model_path, monkeypatch):
    """Active-slot compaction (_b_rows): a batched step over the
    power-of-two row prefix covering the active slots produces results
    identical to the full-width batch (idle high slots' KV untouched)."""
    import numpy as np
    from tpulamm.runtime.engine import Engine

    def drive(eng):
        eng.prefill(0, [1, 9, 33])
        eng.prefill(1, [4, 7])
        eng.prefill(5, [2, 8, 14])          # occupied slot OUTSIDE the
        out = eng.decode_batch_fast({0: 11, 1: 25}, 6)   # active bucket
        lg = eng.decode_batch({0: out[0][-1], 1: out[1][-1]})
        # slot 5 decodes fine afterwards (its KV was never clobbered)
        lg5 = eng.decode_batch({5: 3})
        return out, {s: int(np.argmax(v)) for s, v in lg.items()}, \
            int(np.argmax(lg5[5]))

    eng = Engine(model_path, n_ctx=64, n_slots=8)
    assert eng._b_rows({0: 1, 1: 1}) == 2
    assert eng._b_rows({0: 1, 5: 1}) == None or eng._b_rows({0: 1, 5: 1}) == 8
    got = drive(eng)

    monkeypatch.setenv("TPULAMM_NO_B_ROWS", "1")
    ref = drive(Engine(model_path, n_ctx=64, n_slots=8))
    assert got == ref


def test_b_rows_guard_catches_broken_bucket(model_path, monkeypatch):
    """Adversarial scheduler drift: a bucket that does NOT cover every
    active slot id must fail loudly at the step call site (silently wrong
    rows were the hazard — the step only reads/writes the first b rows)."""
    eng = Engine(model_path, n_ctx=64, n_slots=8)
    eng.prefill(0, [1, 9])
    eng.prefill(5, [2, 8])
    monkeypatch.setattr(Engine, "_b_rows", lambda self, ids: 2)  # broken
    with pytest.raises(AssertionError, match="outside compaction bucket"):
        eng.decode_batch({0: 3, 5: 4})
    with pytest.raises(AssertionError, match="outside compaction bucket"):
        eng.decode_batch_fast({0: 3, 5: 4}, 6)


def test_move_slot_renumber_parity(model_path):
    """Engine.move_slot relocates a slot's KV + host state: decode after
    migration matches decode of the same history on the target slot."""
    toks = [1, 9, 33, 4]
    eng = Engine(model_path, n_ctx=64, n_slots=8)
    eng.prefill(6, toks)
    ref = Engine(model_path, n_ctx=64, n_slots=8)
    ref.prefill(0, toks)
    eng.move_slot(6, 0)
    assert int(eng.n_past[6]) == 0 and int(eng.n_past[0]) == len(toks)
    a = eng.decode_batch({0: 11})[0]
    b = ref.decode_batch({0: 11})[0]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_server_compacts_high_slot(model_path):
    """Scheduler._compact_slots migrates a lone high busy slot down so the
    compaction bucket shrinks; without migration a straggler on slot 7
    keeps every step at full batch width for its whole request."""
    from tpulamm.server.server import Scheduler
    eng = Engine(model_path, n_ctx=64, n_slots=8)
    sched = Scheduler(eng, 8)          # not started: drive methods directly
    eng.prefill(7, [1, 9, 33])

    class _Req:                        # only .req-ness is consulted
        pass

    sched.slots[7].req = _Req()
    sched.slots[7].hist = [1, 9, 33]
    sched.slots[7].next_tok = 5
    sched._compact_slots()
    assert sched.slots[0].req is not None and sched.slots[7].req is None
    assert sched.slots[0].hist == [1, 9, 33]
    assert int(eng.n_past[0]) == 3 and int(eng.n_past[7]) == 0
    assert eng._b_rows([0]) == 1
