"""Decode megakernel vs the engine forward path (interpret mode).

Golden test: one decode step through mega_decode_layers must match
models.transformer.forward (einsum attention, per-projection qmm) on the
same KV cache, within bf16-stream tolerances. Covers both rope layouts,
GQA and MHA, partial rotation, and several quant formats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpulamm.gguf.constants import GGMLType
from tpulamm.models.config import ModelConfig
from tpulamm.models.transformer import forward
from tpulamm.ops.pallas_decode import (build_mega, mega_decode_layers,
                                       rope_lane_vectors)
from tpulamm.ops.qtensor import QTensor
from tpulamm.ops.rope import RopeParams
from tpulamm.runtime.kvcache import KVCache


def make_model(rng, *, qt=GGMLType.Q4_0, dim=256, n_layers=2, H=4, Hkv=2,
               ffn=512, vocab=128, rope_kind="norm", n_rot=None):
    hd = dim // H
    cfg = ModelConfig(
        arch="llama", vocab_size=vocab, dim=dim, n_layers=n_layers,
        n_heads=H, n_kv_heads=Hkv, ffn_dim=ffn,
        rope=RopeParams(n_rot=n_rot or hd, kind=rope_kind),
        compute_dtype="bfloat16")

    def q(shape):
        w = rng.standard_normal(shape, dtype=np.float32) * 0.05
        return QTensor.from_float(w, qt)

    layers = []
    for _ in range(n_layers):
        wq, wk, wv = q((H * hd, dim)), q((Hkv * hd, dim)), q((Hkv * hd, dim))
        gate, up = q((ffn, dim)), q((ffn, dim))
        layers.append(dict(
            wqkv_fused=QTensor.concat_n([wq, wk, wv]),
            wo=q((dim, H * hd)),
            wgateup_fused=QTensor.concat_n([gate, up]),
            w_down=q((dim, ffn)),
            attn_norm=jnp.asarray(
                1.0 + 0.1 * rng.standard_normal(dim, dtype=np.float32)),
            ffn_norm=jnp.asarray(
                1.0 + 0.1 * rng.standard_normal(dim, dtype=np.float32)),
        ))
    params = dict(
        tok_emb=jnp.asarray(
            rng.standard_normal((vocab, dim), dtype=np.float32) * 0.05),
        out_norm=jnp.asarray(
            1.0 + 0.1 * rng.standard_normal(dim, dtype=np.float32)),
        output=q((vocab, dim)) if vocab % 128 == 0 else None,
        layers=layers,
    )
    return cfg, params


def run_both(cfg, params, seed=0, n_prefill=5):
    """Prefill via forward(), then one decode step both ways."""
    rng = np.random.default_rng(seed)
    S = 32
    cache = KVCache.create(cfg.n_layers, 1, S, cfg.n_kv_heads, cfg.head_dim)
    toks = rng.integers(0, cfg.vocab_size, size=n_prefill + 1)
    tok_p = jnp.asarray(toks[:n_prefill], jnp.int32)[None]
    pos_p = jnp.arange(n_prefill, dtype=jnp.int32)[None]
    _, cache = forward(params, cfg, tok_p, pos_p, cache, None, pos_p)

    tok = jnp.asarray(toks[n_prefill:], jnp.int32)[None]    # (1, 1)
    pos = jnp.full((1, 1), n_prefill, jnp.int32)

    # reference: engine einsum path
    import copy
    cache_ref = KVCache(k=[jnp.copy(a) for a in cache.k],
                        v=[jnp.copy(a) for a in cache.v],
                        pos=jnp.copy(cache.pos), seg=jnp.copy(cache.seg))
    logits_ref, cache_ref = forward(params, cfg, tok, pos, cache_ref,
                                    None, pos)

    # megakernel path
    mega = build_mega(params, cfg, S)
    assert mega is not None
    from tpulamm.models.transformer import embed
    x = embed(params, cfg, tok)[:, 0].astype(jnp.float32)   # (1, dim)
    qpos = pos[:, 0]
    cosq, sinq, cosk, sink = rope_lane_vectors(
        mega.rope, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads, qpos)
    kst = jnp.stack(cache.k)
    vst = jnp.stack(cache.v)
    x_out, k_new, v_new = mega_decode_layers(
        mega.spec, x, qpos, cache.pos, kst, vst,
        cosq, sinq, cosk, sink, mega.planes, mega.norms, interpret=True)
    return (logits_ref, cache_ref, x_out, k_new, v_new, params, cfg,
            n_prefill)


def check_parity(res):
    (logits_ref, cache_ref, x_out, k_new, v_new, params, cfg,
     cell) = res
    # logits from the mega hidden state, same tail ops as forward()
    from tpulamm.ops.layers import rms_norm
    from tpulamm.ops.qmatmul import qmatmul
    h = rms_norm(x_out.astype(jnp.bfloat16)[None], params["out_norm"],
                 cfg.norm_eps)
    logits = qmatmul(h[0], params["output"],
                     compute_dtype=cfg.cdtype)[None]
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(logits_ref), atol=0.06, rtol=0.05)
    # new KV rows vs what forward() wrote into the cache at `cell`
    for layer in range(cfg.n_layers):
        k_want = np.asarray(
            cache_ref.k[layer][0, :, cell, :], np.float32)  # (Hkv, hd)
        v_want = np.asarray(cache_ref.v[layer][0, :, cell, :], np.float32)
        k_got = np.asarray(k_new[layer, 0]).reshape(cfg.n_kv_heads, -1)
        v_got = np.asarray(v_new[layer, 0]).reshape(cfg.n_kv_heads, -1)
        np.testing.assert_allclose(k_got, k_want, atol=0.03, rtol=0.03)
        np.testing.assert_allclose(v_got, v_want, atol=0.03, rtol=0.03)


@pytest.mark.parametrize("rope_kind", ["norm", "neox"])
def test_mega_parity_rope(rope_kind):
    rng = np.random.default_rng(7)
    cfg, params = make_model(rng, rope_kind=rope_kind)
    check_parity(run_both(cfg, params))


@pytest.mark.parametrize("qt", [GGMLType.Q8_0, GGMLType.Q4_1])
def test_mega_parity_formats(qt):
    rng = np.random.default_rng(11)
    cfg, params = make_model(rng, qt=qt)
    check_parity(run_both(cfg, params))


def test_mega_parity_mha_partial_rot():
    rng = np.random.default_rng(13)
    cfg, params = make_model(rng, H=4, Hkv=4, rope_kind="neox", n_rot=32)
    check_parity(run_both(cfg, params))


# -- engine integration (loader + fusion + metadata rope + scan) -----------

@pytest.fixture(scope="module")
def engine_model_path(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from tpulamm.tools.convert_hf import convert_hf_llama
    from tests.test_engine import make_vocab_md
    torch.manual_seed(3)
    hf = transformers.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = transformers.LlamaForCausalLM(hf).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("mega") / "tiny_q4.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q4_0,
                     vocab=make_vocab_md())
    return path


def test_mega_engine_step_parity(engine_model_path, monkeypatch):
    """One decode step through engine-built params: mega vs einsum path."""
    monkeypatch.setenv("TPULAMM_MEGAKERNEL", "1")
    from tpulamm.runtime.engine import Engine
    eng = Engine(engine_model_path, n_ctx=32)
    assert eng.mega is not None
    toks = [1, 5, 9, 300, 301]
    eng.reset_slot(0)
    logits = eng.prefill(0, toks)
    tok = int(np.argmax(logits))
    p = int(eng.n_past[0])
    cfg, params, cache = eng.cfg, eng.params, eng.cache

    cache_ref = KVCache(k=[jnp.copy(a) for a in cache.k],
                        v=[jnp.copy(a) for a in cache.v],
                        pos=jnp.copy(cache.pos), seg=jnp.copy(cache.seg))
    tokj = jnp.full((1, 1), tok, jnp.int32)
    posj = jnp.full((1, 1), p, jnp.int32)
    logits_ref, _ = forward(params, cfg, tokj, posj, cache_ref, None, posj)

    from tpulamm.models.transformer import _proj, embed
    from tpulamm.ops.layers import rms_norm
    x = embed(params, cfg, tokj)[:, 0].astype(jnp.float32)
    qpos = posj[:, 0]
    cosq, sinq, cosk, sink = rope_lane_vectors(
        eng.mega.rope, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads, qpos)
    x_out, _, _ = mega_decode_layers(
        eng.mega.spec, x, qpos, cache.pos, jnp.stack(cache.k),
        jnp.stack(cache.v), cosq, sinq, cosk, sink,
        eng.mega.planes, eng.mega.norms, interpret=True)
    h = rms_norm(x_out.astype(cfg.cdtype), params["out_norm"], cfg.norm_eps)
    logits_mega = _proj(h, params["output"], cfg)[None, :, :cfg.vocab_size]
    np.testing.assert_allclose(np.asarray(logits_mega),
                               np.asarray(logits_ref), atol=0.06, rtol=0.05)


def test_mega_generate_fast_scan(engine_model_path, monkeypatch):
    """generate_fast routes through the mega scan and stays consistent
    (host mirrors, KV writes, rollback contract)."""
    monkeypatch.setenv("TPULAMM_MEGAKERNEL", "1")
    from tpulamm.runtime.engine import Engine
    eng = Engine(engine_model_path, n_ctx=64)
    assert eng.mega is not None
    out, _ = eng.generate_fast([1, 5, 9], n_predict=6, stop_on_eos=False)
    assert len(out) == 6
    assert hasattr(eng, "_decode_scan")
    # KV state matches host mirror: positions written for generated cells
    n = int(eng.n_past[0])
    pos_row = np.asarray(eng.cache.pos[0, :n])
    assert (pos_row == np.arange(n)).all()
    # continuing from the same slot works (cache layout intact)
    out2, _ = eng.generate_fast([1, 5, 9, 2, 2], n_predict=4,
                                stop_on_eos=False)
    assert len(out2) == 4


def test_mega_ineligible():
    rng = np.random.default_rng(17)
    cfg, params = make_model(rng)
    cfg.qk_norm = True
    assert build_mega(params, cfg, 32) is None
    cfg.qk_norm = False
    del params["layers"][0]["wqkv_fused"]
    assert build_mega(params, cfg, 32) is None
