"""Flash-attention kernel vs golden einsum reference (interpret mode on
CPU; the on-TPU exactness test lives in the perf harness)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulamm.ops.flash_attention import (flash_attention,
                                         flash_attention_ref)


def _mk(B=2, Hkv=2, T=8, G=4, S=160, hd=64, seed=0, shift=False):
    rng = np.random.default_rng(seed)
    TG = T * G
    q = jnp.asarray(rng.normal(size=(B, Hkv, TG, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, hd)), jnp.float32)
    # cache positions: first `used` cells live at positions 0..used-1,
    # rest empty; optionally with holes + shifted values (post-surgery)
    kpos = np.full((B, S), -1, np.int32)
    for b in range(B):
        used = 24 + 8 * b
        kpos[b, :used] = np.arange(used)
        if shift:
            kpos[b, 5:9] = -1                      # seq_rm hole
            kpos[b, 12:used] -= 3                  # seq_add shift
    qbase = np.asarray([24 + 8 * b for b in range(B)], np.int32)
    qlen = np.full((B,), T, np.int32)
    return q, k, v, jnp.asarray(kpos), jnp.asarray(qbase), jnp.asarray(qlen)


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("causal", [True, False])
def test_flash_matches_reference(causal, shift):
    q, k, v, kpos, qbase, qlen = _mk(shift=shift)
    args = dict(scale=0.125, g=4, causal=causal)
    ref = flash_attention_ref(q, k, v, kpos, qbase, qlen, **args)
    got = flash_attention(q, k, v, kpos, qbase, qlen, interpret=True,
                          **args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shift", [False, True])
def test_flash_q8_scales_match_reference(shift):
    """q8_0 KV cache path: int8 codes + per-row scales folded in-kernel
    (ks into score columns, vs into p) must match the dequantized golden
    reference."""
    q, k, v, kpos, qbase, qlen = _mk(shift=shift)
    rng = np.random.default_rng(7)
    B, Hkv, S, hd = k.shape
    k8 = jnp.asarray(rng.integers(-127, 128, size=k.shape), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, size=v.shape), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, size=(B, Hkv, S)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, size=(B, Hkv, S)),
                     jnp.float32)
    args = dict(scale=0.125, g=4, causal=True)
    ref = flash_attention_ref(q, k8, v8, kpos, qbase, qlen, ks, vs, **args)
    got = flash_attention(q, k8, v8, kpos, qbase, qlen, ks, vs,
                          interpret=True, **args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_decode_shape_and_padding():
    """T=1 decode with one inactive slot (qlen=0) -> exact zeros."""
    q, k, v, kpos, qbase, qlen = _mk(B=2, T=1, G=8, S=96)
    qlen = jnp.asarray([1, 0], jnp.int32)     # slot 1 inactive
    got = flash_attention(q, k, v, kpos, qbase, qlen, scale=0.125, g=8,
                          interpret=True)
    ref = flash_attention_ref(q, k, v, kpos, qbase, qlen, scale=0.125, g=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert np.all(np.asarray(got)[1] == 0.0)


def test_flash_odd_context_tail():
    """S not a multiple of the tile (n_ctx+1 trash cell) is masked."""
    q, k, v, kpos, qbase, qlen = _mk(S=161)
    ref = flash_attention_ref(q, k, v, kpos, qbase, qlen, scale=0.125, g=4)
    got = flash_attention(q, k, v, kpos, qbase, qlen, scale=0.125, g=4,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_matches_model_forward():
    """End-to-end: the transformer forward with the flash path must match
    the einsum path — prefill with tail padding, then a decode step."""
    from dataclasses import replace

    import __graft_entry__ as ge
    from tpulamm.models.llama import forward
    from tpulamm.runtime.kvcache import KVCache

    cfg, params = ge._tiny_model(dim=256, n_layers=2, n_heads=8,
                                 n_kv_heads=4, ffn=512, vocab=512)
    cfg = replace(cfg, compute_dtype="float32")
    cfgf = replace(cfg, flash_attn=True)
    B, T, S = 2, 16, 65                    # odd S = n_ctx + trash cell
    tok = np.asarray(np.arange(B * T).reshape(B, T) % 512, np.int32)
    pos = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T)).copy()
    pos[1, 12:] = -1                       # tail padding on slot 1
    cel = np.where(pos >= 0, pos, S - 1)
    outs = {}
    for name, c in (("einsum", cfg), ("flash", cfgf)):
        cache = KVCache.create(c.n_layers, B, S, c.n_kv_heads, c.head_dim)
        lg, cache = forward(params, c, jnp.asarray(tok), jnp.asarray(pos),
                            cache, None, jnp.asarray(cel))
        # decode step
        dt = np.asarray([[7], [9]], np.int32)
        dpos = np.asarray([[T], [12]], np.int32)
        lg2, _ = forward(params, c, jnp.asarray(dt), jnp.asarray(dpos),
                         cache, None, jnp.asarray(dpos))
        outs[name] = (np.asarray(lg[0, :]), np.asarray(lg[1, :12]),
                      np.asarray(lg2))
    for a, b in zip(outs["einsum"], outs["flash"]):
        np.testing.assert_allclose(b, a, rtol=3e-2, atol=3e-2)


# -- split-S flash decoding (ops/flash_attention.flash_decode) ---------------


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("causal", [True, False])
def test_flash_decode_matches_reference(causal, shift):
    """Independent-chunk partials + XLA max/denominator combine must equal
    the golden softmax for the 1-query-row decode shape, including
    post-surgery position holes/shifts."""
    from tpulamm.ops.flash_attention import flash_decode
    q, k, v, kpos, qbase, qlen = _mk(T=1, G=1, S=416, shift=shift)
    qlen = jnp.ones_like(qlen)
    args = dict(scale=0.125, g=1, causal=causal)
    ref = flash_attention_ref(q, k, v, kpos, qbase, qlen, **args)
    # s_chunk 128 forces several chunks (416 -> 4, with a masked tail)
    got = flash_decode(q, k, v, kpos, qbase, qlen, s_chunk=128,
                       interpret=True, **args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_decode_gqa_and_q8():
    """GQA decode rows (T=1, G=8) + q8_0 scale folds through the split-S
    path."""
    from tpulamm.ops.flash_attention import flash_decode
    q, k, v, kpos, qbase, qlen = _mk(T=1, G=8, S=384)
    qlen = jnp.ones_like(qlen)
    rng = np.random.default_rng(7)
    B, Hkv, S, hd = k.shape
    k8 = jnp.asarray(rng.integers(-127, 128, size=k.shape), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, size=v.shape), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, size=(B, Hkv, S)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, size=(B, Hkv, S)),
                     jnp.float32)
    args = dict(scale=0.125, g=8, causal=True)
    ref = flash_attention_ref(q, k8, v8, kpos, qbase, qlen, ks, vs, **args)
    got = flash_decode(q, k8, v8, kpos, qbase, qlen, ks, vs, s_chunk=128,
                       interpret=True, **args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_decode_empty_rows():
    """A batch row with zero live cells must produce 0 output, not NaN."""
    from tpulamm.ops.flash_attention import flash_decode
    q, k, v, kpos, qbase, qlen = _mk(T=1, G=1, S=256)
    qlen = jnp.ones_like(qlen)
    kpos = kpos.at[1].set(-1)                        # row 1 fully dead
    got = flash_decode(q, k, v, kpos, qbase, qlen, s_chunk=128,
                       interpret=True, scale=0.125, g=1, causal=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_array_equal(np.asarray(got[1]), 0.0)
