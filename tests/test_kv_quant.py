"""Quantized (q8_0) KV cache: parity vs float cache + surgery ops.

The reference supports cache_type_k/v (-ctk/-ctv, common.cpp
kv_cache_type_from_str; llama.cpp:1841 type_k/type_v). Ours stores int8
codes + per-(b, h, s) row scales; attention folds the scales into the
score/prob planes (models/transformer.py), so the cache is never
dequantized wholesale.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("transformers")
import torch  # noqa: E402
from transformers import LlamaConfig as HFLlamaConfig  # noqa: E402
from transformers import LlamaForCausalLM  # noqa: E402

from tpulamm.gguf.constants import GGMLType  # noqa: E402
from tpulamm.runtime.engine import Engine  # noqa: E402
from tpulamm.runtime.kvcache import KVCache, q8_quantize  # noqa: E402
from tpulamm.runtime.sampling import SamplingParams  # noqa: E402
from tpulamm.tools.convert_hf import convert_hf_llama  # noqa: E402

VOCAB = 512


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    torch.manual_seed(3)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.F32)
    return path


def test_q8_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 7, 64)).astype(np.float32))
    q, s = q8_quantize(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 7)
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(deq - x))
    assert err.max() <= np.asarray(s).max() * 0.5 + 1e-7


def test_q8_zero_row_safe():
    q, s = q8_quantize(jnp.zeros((1, 4, 32)))
    assert np.all(np.asarray(q) == 0) and np.all(np.isfinite(np.asarray(s)))


def _logits(path, kv_dtype, kv_dtype_v=None, prompt=(1, 5, 42, 7, 99)):
    eng = Engine(path, n_ctx=64, kv_dtype=kv_dtype, kv_dtype_v=kv_dtype_v)
    ids, _ = eng.generate(list(prompt), n_predict=6,
                          sampling=SamplingParams(temp=0.0),
                          stop_on_eos=False)
    return ids, eng


def test_q8_cache_close_to_f32(model_path):
    """Greedy decode through a q8_0 cache tracks the f32-cache decode."""
    ids_ref, _ = _logits(model_path, jnp.float32)
    ids_q, eng = _logits(model_path, "q8_0")
    assert eng.cache.k[0].dtype == jnp.int8
    assert eng.cache.v[0].dtype == jnp.int8
    assert eng.cache.ks is not None and eng.cache.vs is not None
    # 8-bit KV on a 2-layer model: greedy paths agree
    assert ids_q == ids_ref


def test_q8_k_only(model_path):
    """-ctk q8_0 -ctv float32: mixed cache types (reference allows
    independent cache_type_k/cache_type_v)."""
    ids_ref, _ = _logits(model_path, jnp.float32)
    ids_q, eng = _logits(model_path, "q8_0", kv_dtype_v=jnp.float32)
    assert eng.cache.k[0].dtype == jnp.int8
    assert eng.cache.v[0].dtype == jnp.float32
    assert eng.cache.ks is not None and eng.cache.vs is None
    assert ids_q == ids_ref


def test_q8_logits_error_small(model_path):
    """Per-token logits from a q8_0 cache stay close to the f32 cache."""
    eng_f = Engine(model_path, n_ctx=64, kv_dtype=jnp.float32)
    eng_q = Engine(model_path, n_ctx=64, kv_dtype="q8_0")
    toks = [1, 5, 42, 7, 99, 3, 200, 17]
    lf = eng_f.eval_tokens(0, toks)
    lq = eng_q.eval_tokens(0, toks)
    ref = np.asarray(lf, np.float32)
    err = np.abs(np.asarray(lq, np.float32) - ref)
    scale = max(1.0, np.abs(ref).max())
    assert err.max() / scale < 0.05


def test_q8_context_shift_and_selfextend(model_path):
    """seq_add / seq_div re-rope quantized K via dequant->rope->requant."""
    from tpulamm.runtime import kvcache as kvc
    eng = Engine(model_path, n_ctx=32, kv_dtype="q8_0")
    eng.generate([1, 5, 42, 7], n_predict=4,
                 sampling=SamplingParams(temp=0.0), stop_on_eos=False)
    cache = eng.cache
    before = np.asarray(cache.k[0].astype(jnp.float32)
                        * cache.ks[0][..., None])
    shifted = kvc.seq_add(cache, 0, 2, 100, -2, eng.cfg.rope)
    after = np.asarray(shifted.k[0].astype(jnp.float32)
                       * shifted.ks[0][..., None])
    pos = np.asarray(cache.pos[0])
    untouched = (pos >= 0) & (pos < 2)
    moved = pos >= 2
    # untouched rows keep their exact codes; moved rows changed (re-roped)
    assert np.array_equal(before[0][:, untouched], after[0][:, untouched])
    assert not np.allclose(before[0][:, moved], after[0][:, moved])
    # V untouched by K-shift
    assert np.array_equal(np.asarray(shifted.v[0]), np.asarray(cache.v[0]))
    div = kvc.seq_div(cache, 0, 0, 100, 2, eng.cfg.rope)
    assert np.asarray(div.pos[0]).max() == pos.max() // 2


def test_q8_defrag_and_seq_cp(model_path):
    from tpulamm.runtime import kvcache as kvc
    eng = Engine(model_path, n_ctx=32, n_slots=2, kv_dtype="q8_0")
    eng.generate([1, 5, 42, 7, 9], n_predict=2,
                 sampling=SamplingParams(temp=0.0), stop_on_eos=False,
                 slot=0)
    cache = kvc.seq_rm(eng.cache, 0, 1, 3)     # punch a hole
    d = kvc.defrag(cache)
    live_before = np.sort(np.asarray(cache.pos[0])[np.asarray(cache.pos[0]) >= 0])
    live_after = np.asarray(d.pos[0])
    n_live = len(live_before)
    assert np.array_equal(live_after[:n_live], live_before)
    assert np.all(live_after[n_live:] == -1)
    # dequantized content of live cells is preserved under the gather
    def deq(c, row):
        return np.asarray(c.k[0].astype(jnp.float32)
                          * c.ks[0][..., None])[0][:, row]
    src_rows = np.where(np.asarray(cache.pos[0]) >= 0)[0]
    for i, r in enumerate(sorted(src_rows,
                                 key=lambda r: np.asarray(cache.pos[0])[r])):
        assert np.array_equal(deq(cache, r), deq(d, i))
    cp = kvc.seq_cp(d, 0, 1)
    assert np.array_equal(np.asarray(cp.ks[0][1]), np.asarray(cp.ks[0][0]))
    assert np.array_equal(np.asarray(cp.k[0][1]), np.asarray(cp.k[0][0]))


def test_q8_session_roundtrip(model_path, tmp_path):
    from tpulamm.runtime.session import load_session, save_session
    eng = Engine(model_path, n_ctx=32, kv_dtype="q8_0")
    ids, _ = eng.generate([1, 5, 42], n_predict=4,
                          sampling=SamplingParams(temp=0.0),
                          stop_on_eos=False)
    p = str(tmp_path / "s.bin")
    save_session(p, eng, tokens=[1, 5, 42] + ids)
    eng2 = Engine(model_path, n_ctx=32, kv_dtype="q8_0")
    toks = load_session(p, eng2)
    assert toks == [1, 5, 42] + ids
    assert eng2.cache.k[0].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(eng2.cache.ks[0]),
                                  np.asarray(eng.cache.ks[0]))
    np.testing.assert_array_equal(np.asarray(eng2.cache.k[0]),
                                  np.asarray(eng.cache.k[0]))


def test_q8_bad_type_rejected():
    with pytest.raises(ValueError, match="unsupported KV cache quant"):
        KVCache.create(1, 1, 8, 2, 64, qtype_k="q4_0")


def test_q8_mesh_tp(model_path):
    """q8_0 cache under tensor parallelism: scale planes shard over the
    head axis (parallel/mesh.py cache_pspecs) and decode matches 1-device."""
    ids_ref, _ = _logits(model_path, "q8_0")
    eng = Engine(model_path, n_ctx=64, kv_dtype="q8_0", tp=2)
    ids, _ = eng.generate([1, 5, 42, 7, 99], n_predict=6,
                          sampling=SamplingParams(temp=0.0),
                          stop_on_eos=False)
    assert ids == ids_ref


def test_cache_query_methods_exist():
    """used()/max_pos() are public query API (regression: a module-level
    helper insertion once swallowed them out of the class body)."""
    c = KVCache.create(1, 2, 8, 2, 64)
    assert np.array_equal(np.asarray(c.used()), [0, 0])
    assert np.array_equal(np.asarray(c.max_pos()), [-1, -1])


def test_q8_flash_attn_parity(model_path):
    """flash + q8_0 KV (the long-context configuration): greedy decode
    must match the einsum path's scale-folded attention."""
    eng_e = Engine(model_path, n_ctx=64, kv_dtype="q8_0", flash_attn=False)
    ids_ref, _ = eng_e.generate([1, 5, 42, 7, 99], n_predict=8,
                                sampling=SamplingParams(temp=0.0),
                                stop_on_eos=False)
    eng_f = Engine(model_path, n_ctx=64, kv_dtype="q8_0", flash_attn=True)
    ids, _ = eng_f.generate([1, 5, 42, 7, 99], n_predict=8,
                            sampling=SamplingParams(temp=0.0),
                            stop_on_eos=False)
    assert ids == ids_ref


def test_session_kv_layout_mismatch_rejected(model_path, tmp_path):
    """A session saved with one -ctk/-ctv layout must not silently override
    the engine's configured cache types on load."""
    from tpulamm.runtime.session import load_session, save_session
    eng = Engine(model_path, n_ctx=32, kv_dtype=jnp.bfloat16)
    eng.generate([1, 5], n_predict=2, sampling=SamplingParams(temp=0.0),
                 stop_on_eos=False)
    p = str(tmp_path / "s.bin")
    save_session(p, eng, tokens=[1, 5])
    eng_q = Engine(model_path, n_ctx=32, kv_dtype="q8_0")
    with pytest.raises(ValueError, match="session KV layout"):
        load_session(p, eng_q)
