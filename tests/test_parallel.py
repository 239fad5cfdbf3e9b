"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4.4 strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpulamm.models.llama import forward
from tpulamm.parallel.mesh import (make_mesh, shard_cache, shard_inputs,
                                   shard_llama_params)
from tpulamm.runtime.kvcache import KVCache


@pytest.fixture(scope="module")
def tiny():
    import __graft_entry__ as ge
    return ge._tiny_model(dim=512, n_heads=8, n_kv_heads=4, ffn=1024)


def _forward_once(cfg, params, cache, B=4, T=8):
    tokens = jnp.zeros((B, T), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    slots = jnp.arange(B, dtype=jnp.int32)
    logits, _ = forward(params, cfg, tokens, positions, cache, slots,
                        positions)
    return np.asarray(logits)


def test_sharded_matches_single(tiny):
    cfg, params = tiny
    B, S = 4, 32
    cache = KVCache.create(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim)
    ref = _forward_once(cfg, params, cache, B=B)

    mesh = make_mesh(2, 4)
    with mesh:
        sp = shard_llama_params(params, mesh)
        sc = shard_cache(
            KVCache.create(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim),
            mesh)
        got = _forward_once(cfg, sp, sc, B=B)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
