"""Analogues of vendored test-grad0.cpp (autograd vs finite differences)
and test-rope.cpp (rotation composition — the property the KV cache's
position surgery K re-rotation depends on)."""

import numpy as np

import jax
import jax.numpy as jnp

from tpulamm.models.config import ModelConfig
from tpulamm.ops.rope import RopeParams, apply_rope
from tpulamm.train.model import causal_lm_loss, init_params


def test_grad_matches_finite_differences():
    """jax.grad of the causal-LM loss vs central finite differences on a
    sample of parameters (test-grad0.cpp's FD contract)."""
    cfg = ModelConfig(vocab_size=64, dim=32, n_layers=1, n_heads=2,
                      n_kv_heads=2, ffn_dim=64, rope=RopeParams(n_rot=16))
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 64, (2, 9)), jnp.int32)

    loss_fn = lambda p: causal_lm_loss(p, cfg, tokens)  # noqa: E731
    grads = jax.grad(loss_fn)(params)

    eps = 1e-3
    for path, arr in (("tok_emb", params["tok_emb"]),
                      ("wq", params["layers"][0]["wq"]),
                      ("w_down", params["layers"][0]["w_down"]),
                      ("out_norm", params["out_norm"])):
        a = np.asarray(arr)
        g = np.asarray(grads[path] if path in ("tok_emb", "out_norm")
                       else grads["layers"][0][path])
        flat_idx = rng.choice(a.size, size=5, replace=False)
        for fi in flat_idx:
            idx = np.unravel_index(fi, a.shape)
            for sign, store in ((+1, "hi"), (-1, "lo")):
                pert = a.copy()
                pert[idx] += sign * eps
                pp = jax.tree_util.tree_map(lambda x: x, params)
                if path in ("tok_emb", "out_norm"):
                    pp = {**params, path: jnp.asarray(pert)}
                else:
                    lyr = {**params["layers"][0], path: jnp.asarray(pert)}
                    pp = {**params, "layers": [lyr]}
                if sign > 0:
                    hi = float(loss_fn(pp))
                else:
                    lo = float(loss_fn(pp))
            fd = (hi - lo) / (2 * eps)
            assert abs(fd - g[idx]) < 2e-2 * max(1.0, abs(fd)), \
                (path, idx, fd, float(g[idx]))


def test_rope_composition():
    """rope(rope(x, p1), p2) == rope(x, p1 + p2) — the composition the
    seq_add/seq_div K-shift machinery relies on (test-rope.cpp)."""
    rng = np.random.default_rng(1)
    for mode in ("norm", "neox"):
        rope = RopeParams(n_rot=32, kind=mode)
        x = jnp.asarray(rng.normal(size=(1, 6, 4, 32)), jnp.float32)
        p1 = jnp.asarray(rng.integers(0, 50, (1, 6)), jnp.int32)
        p2 = jnp.asarray(rng.integers(0, 50, (1, 6)), jnp.int32)
        once = apply_rope(x, p1 + p2, rope)
        twice = apply_rope(apply_rope(x, p1, rope), p2, rope)
        np.testing.assert_allclose(np.asarray(twice), np.asarray(once),
                                   rtol=2e-4, atol=2e-4)
        # delta 0 is the identity (surgery no-op cells)
        ident = apply_rope(x, jnp.zeros_like(p1), rope)
        np.testing.assert_allclose(np.asarray(ident), np.asarray(x),
                                   rtol=1e-6, atol=1e-6)


def test_yarn_matches_ggml_reference():
    """rope_angles vs a direct scalar port of ggml.c rope_yarn
    (:12737-12791): ramp compares the pair index against the corr dims
    directly, corr dims clamped to [0, n_dims-1]."""
    import math

    n_rot, base = 128, 10000.0
    p = RopeParams(n_rot=n_rot, kind="neox", freq_base=base,
                   freq_scale=0.25, ext_factor=1.0, attn_factor=1.0,
                   beta_fast=32.0, beta_slow=1.0, n_orig_ctx=4096)

    def corr_dim(n_rot_beta):
        return (n_rot * math.log(4096 / (n_rot_beta * 2 * math.pi))
                / (2 * math.log(base)))

    lo = max(0.0, math.floor(corr_dim(32.0)))
    hi = min(n_rot - 1.0, math.ceil(corr_dim(1.0)))

    pos = 777.0
    want_cos, want_sin = [], []
    mscale = 1.0 + 0.1 * math.log(1.0 / 0.25)
    for i0 in range(0, n_rot, 2):
        theta_extrap = pos * base ** (-i0 / n_rot)
        y = (i0 / 2 - lo) / max(0.001, hi - lo)
        ramp = (1 - min(1.0, max(0.0, y))) * 1.0     # * ext_factor
        theta_interp = 0.25 * theta_extrap
        theta = theta_interp * (1 - ramp) + theta_extrap * ramp
        want_cos.append(math.cos(theta) * mscale)
        want_sin.append(math.sin(theta) * mscale)

    from tpulamm.ops.rope import rope_angles
    cos, sin = rope_angles(p, jnp.asarray([pos], jnp.float32))
    np.testing.assert_allclose(np.asarray(cos)[0], want_cos, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin)[0], want_sin, rtol=1e-4,
                               atol=1e-5)
