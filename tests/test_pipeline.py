"""Pipeline-parallel (GPipe over "pp") training vs the single-device loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpulamm.models.config import ModelConfig
from tpulamm.ops.rope import RopeParams
from tpulamm.parallel.pipeline import (make_pipeline_loss, make_pp_mesh,
                                       pipeline_specs, stack_layer_params)
from tpulamm.train.model import causal_lm_loss, init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(vocab_size=128, dim=64, n_layers=4, n_heads=4,
                      n_kv_heads=2, ffn_dim=128,
                      rope=RopeParams(n_rot=16))
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    M, mb, T = 4, 2, 16
    tokens = jnp.asarray(rng.integers(0, 128, (M, mb, T + 1)), jnp.int32)
    return cfg, params, tokens


@pytest.mark.parametrize("n_pp", [2, 4])
def test_pipeline_loss_matches_single(setup, n_pp):
    cfg, params, tokens = setup
    ref = float(causal_lm_loss(
        params, cfg, tokens.reshape(-1, tokens.shape[-1])))

    mesh = make_pp_mesh(n_pp)
    stacked = stack_layer_params(params)
    loss_fn = make_pipeline_loss(cfg, mesh, n_micro=tokens.shape[0])
    got = float(loss_fn(stacked, tokens))
    assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)


def test_pipeline_grads_match_single(setup):
    cfg, params, tokens = setup
    flat = tokens.reshape(-1, tokens.shape[-1])
    ref_grads = jax.grad(lambda p: causal_lm_loss(p, cfg, flat))(params)
    ref_stacked = stack_layer_params(ref_grads)

    mesh = make_pp_mesh(4)
    stacked = stack_layer_params(params)
    loss_fn = make_pipeline_loss(cfg, mesh, n_micro=tokens.shape[0])
    got = jax.grad(loss_fn)(stacked, tokens)

    for key in ("tok_emb", "output", "out_norm"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref_stacked[key]),
                                   rtol=2e-3, atol=2e-5)
    for name, g in got["layers"].items():
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ref_stacked["layers"][name]),
            rtol=2e-3, atol=2e-5, err_msg=name)


def test_pipeline_train_step_decreases_loss(setup):
    import optax

    from tpulamm.parallel.pipeline import train_step_pp
    cfg, params, tokens = setup
    mesh = make_pp_mesh(2)
    stacked = stack_layer_params(params)
    opt = optax.adamw(1e-2)
    state = opt.init(stacked)
    loss_fn = make_pipeline_loss(cfg, mesh, n_micro=tokens.shape[0])
    l0 = float(loss_fn(stacked, tokens))
    for _ in range(3):
        stacked, state, loss = train_step_pp(cfg, mesh, stacked, opt,
                                             state, tokens,
                                             n_micro=tokens.shape[0])
    assert float(loss_fn(stacked, tokens)) < l0
