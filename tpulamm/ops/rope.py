"""Rotary position embeddings, ggml-compatible.

Implements the two rotation layouts of ggml_rope_custom (ggml.c rope kernels):
- NORM ("normal"): rotates consecutive pairs (x[2i], x[2i+1]) — used by the
  LLaMA family (llama.cpp:13133-13141); GGUF checkpoints are permuted for it.
- NEOX: rotates pairs split by half (x[i], x[i+n_rot/2]) — falcon/qwen/etc.

Also implements linear frequency scaling (freq_scale) and YaRN
(ext_factor/attn_factor/beta_fast/beta_slow), matching rope_yarn() semantics
in ggml.c so long-context behavior is equivalent.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class RopeParams:
    n_rot: int
    kind: str = "norm"            # "norm" | "neox" | "none"
    freq_base: float = 10000.0
    freq_scale: float = 1.0       # linear scaling (1/factor)
    ext_factor: float = 0.0       # YaRN extrapolation mix factor
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    n_orig_ctx: int = 0           # original training context for YaRN


def _yarn_corr_dim(n_dims: int, n_orig_ctx: int, n_rot: float,
                   base: float) -> float:
    # inverse of theta wavelength reaching n_rot rotations at n_orig_ctx
    return (n_dims * math.log(n_orig_ctx / (n_rot * 2 * math.pi))
            / (2 * math.log(base)))


def _yarn_ramp(lo: float, hi: float, i: jnp.ndarray) -> jnp.ndarray:
    y = (i - lo) / max(0.001, hi - lo)
    return 1.0 - jnp.clip(y, 0.0, 1.0)


def rope_angles(params: RopeParams, pos: jnp.ndarray) -> tuple:
    """pos (...,) -> (cos, sin) of shape (..., n_rot/2), plus mscale applied."""
    half = params.n_rot // 2
    dim_i = jnp.arange(half, dtype=jnp.float32)          # pair index
    inv_freq = params.freq_base ** (-2.0 * dim_i / params.n_rot)
    theta_extrap = pos[..., None].astype(jnp.float32) * inv_freq
    mscale = params.attn_factor
    if params.ext_factor != 0.0 and params.n_orig_ctx > 0:
        # YaRN (rope_yarn in ggml.c): interpolate between scaled and
        # unscaled ("extrapolated") angles with a per-dim ramp
        lo = math.floor(_yarn_corr_dim(params.n_rot, params.n_orig_ctx,
                                       params.beta_fast, params.freq_base))
        hi = math.ceil(_yarn_corr_dim(params.n_rot, params.n_orig_ctx,
                                      params.beta_slow, params.freq_base))
        lo, hi = max(lo, 0), min(hi, params.n_rot - 1)
        # rope_yarn_ramp compares i0/2 (the pair index, which dim_i
        # already is) against the corr dims DIRECTLY (ggml.c:12737-12740)
        ramp = _yarn_ramp(lo, hi, dim_i) * params.ext_factor
        theta_interp = params.freq_scale * theta_extrap
        theta = theta_interp * (1 - ramp) + theta_extrap * ramp
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / params.freq_scale))
    else:
        theta = params.freq_scale * theta_extrap
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def apply_rope(x: jnp.ndarray, pos: jnp.ndarray, params: RopeParams) -> jnp.ndarray:
    """x: (..., T, H, D); pos: (..., T) int32. Rotates the first n_rot dims."""
    if params.kind == "none":
        return x
    d = x.shape[-1]
    n_rot = params.n_rot
    cos, sin = rope_angles(params, pos)                  # (..., T, n_rot/2)
    cos = cos[..., None, :]                              # broadcast over heads
    sin = sin[..., None, :]
    xr = x[..., :n_rot]
    dtype = x.dtype
    if params.kind == "norm":
        xe = xr[..., 0::2].astype(jnp.float32)
        xo = xr[..., 1::2].astype(jnp.float32)
        re = xe * cos - xo * sin
        ro = xe * sin + xo * cos
        rot = jnp.stack([re, ro], axis=-1).reshape(xr.shape)
    elif params.kind == "neox":
        h = n_rot // 2
        x1 = xr[..., :h].astype(jnp.float32)
        x2 = xr[..., h:].astype(jnp.float32)
        rot = jnp.concatenate([x1 * cos - x2 * sin,
                               x1 * sin + x2 * cos], axis=-1)
    else:
        raise ValueError(params.kind)
    rot = rot.astype(dtype)
    if n_rot == d:
        return rot
    return jnp.concatenate([rot, x[..., n_rot:]], axis=-1)
