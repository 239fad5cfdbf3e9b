"""Mamba (selective state-space) forward — build_mamba parity, TPU-native.

Mirrors build_mamba (llama.cpp:7980-8308) and the custom ops it relies on:
- ggml_ssm_conv: depthwise causal conv1d over [conv_state | x]
  (ggml.c ssm_conv kernel), carrying the last d_conv-1 columns as state
- ggml_ssm_scan (ggml.c:ggml_compute_forward_ssm_scan_f32): per-channel
  selective scan with softplus(dt) applied inside the op,
  state = state * exp(dt*A) + B * (x*dt);  y = state . C
then y = (y + D*x) * silu(z), out = ssm_out @ y (build_mamba :8100-8124).

The reference abuses its KV cache to store conv/ssm states per sequence
(llama.cpp:8032-8046); here the recurrent state is an explicit pytree with
one slot per sequence, donated through jit so decode updates in place. The
time recurrence runs under lax.scan (compiler-friendly; no data-dependent
Python control flow). Padding tokens (position < 0) leave the state
untouched, which replaces the reference's state_mask/state_seq machinery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from tpulamm.models.config import ModelConfig
from tpulamm.models.transformer import _norm, _proj, embed
from tpulamm.ops.layers import silu

Params = dict[str, Any]


@jax.tree_util.register_pytree_node_class
@dataclass
class MambaState:
    """Recurrent state: conv tail + SSM state per (layer, slot)."""

    conv: jax.Array   # (L, B, d_inner, d_conv-1) f32
    ssm: jax.Array    # (L, B, d_inner, d_state) f32

    def tree_flatten(self):
        return (self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def create(cfg: ModelConfig, n_slots: int) -> "MambaState":
        return MambaState(
            conv=jnp.zeros((cfg.n_layers, n_slots, cfg.ssm_d_inner,
                            cfg.ssm_d_conv - 1), jnp.float32),
            ssm=jnp.zeros((cfg.n_layers, n_slots, cfg.ssm_d_inner,
                           cfg.ssm_d_state), jnp.float32),
        )

    def reset_slot(self, slot: int) -> "MambaState":
        return MambaState(conv=self.conv.at[:, slot].set(0.0),
                          ssm=self.ssm.at[:, slot].set(0.0))


def _conv1d(x: jnp.ndarray, conv_state: jnp.ndarray, w: jnp.ndarray,
            valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depthwise causal conv (ggml_ssm_conv equivalent).

    x: (B, T, C) f32; conv_state: (B, C, d_conv-1); w: (C, d_conv);
    valid: (B, T) 1.0 for real tokens, 0.0 for padding.
    Returns (y (B, T, C), new_conv_state). Padding columns are replaced by a
    replay of the previous state so they do not pollute the carried tail.
    """
    B, T, C = x.shape
    dconv = w.shape[-1]
    xt = jnp.swapaxes(x, 1, 2)                      # (B, C, T)
    # padded timeline: [state | x] — but masked tokens must not shift the
    # tail. Build the effective timeline via a scan over time.
    def step(carry, inp):
        tail, = carry                               # (B, C, d_conv-1)
        xc, v = inp                                 # (B, C), (B, 1)
        window = jnp.concatenate([tail, xc[..., None]], axis=-1)  # (B,C,dconv)
        y = jnp.sum(window * w[None], axis=-1)      # (B, C)
        new_tail = jnp.where(v[..., None] > 0, window[..., 1:], tail)
        return (new_tail,), y

    xs = (jnp.moveaxis(xt, 2, 0), jnp.moveaxis(valid, 1, 0)[..., None])
    (new_state,), ys = jax.lax.scan(step, (conv_state,), xs)
    return jnp.moveaxis(ys, 0, 1), new_state        # (B, T, C)


def _ssm_scan(x: jnp.ndarray, dt: jnp.ndarray, A: jnp.ndarray,
              Bm: jnp.ndarray, Cm: jnp.ndarray, state: jnp.ndarray,
              valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Selective scan (ggml_ssm_scan semantics, softplus inside).

    x/dt: (B, T, d_inner); A: (d_inner, d_state); Bm/Cm: (B, T, d_state);
    state: (B, d_inner, d_state); valid: (B, T).
    """
    dt_sp = jnp.where(dt <= 20.0, jnp.log1p(jnp.exp(dt)), dt)
    dt_sp = dt_sp * valid[..., None]                 # masked tokens: dt=0
    dA = jnp.exp(dt_sp[..., None] * A[None, None])   # (B, T, di, ds)
    dBx = (dt_sp * x)[..., None] * Bm[:, :, None, :]  # (B, T, di, ds)

    def step(s, inp):
        dA_t, dBx_t, C_t = inp
        s = s * dA_t + dBx_t                         # (B, di, ds)
        y = jnp.einsum("bds,bs->bd", s, C_t)
        return s, y

    xs = (jnp.moveaxis(dA, 1, 0), jnp.moveaxis(dBx, 1, 0),
          jnp.moveaxis(Cm, 1, 0))
    new_state, ys = jax.lax.scan(step, state, xs)
    return jnp.moveaxis(ys, 0, 1), new_state         # (B, T, d_inner)


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: jnp.ndarray, state: MambaState,
            slots: jnp.ndarray, cells: jnp.ndarray = None,
            segs: jnp.ndarray | None = None,
            kv_span: int | None = None   # interface parity; no KV cache
            ) -> tuple[jnp.ndarray, MambaState]:
    """tokens/positions: (B, T); slots: (B,) or None (= arange(B), the
    all-slots-in-order decode case) -> (logits f32, state).

    Signature-compatible with transformer.forward (cells/segs ignored —
    a recurrent state has no attention mask) so the decode engine can
    drive either family.
    """
    del cells, segs
    B, T = tokens.shape
    if slots is None:
        slots = jnp.arange(B, dtype=jnp.int32)
    valid = (positions >= 0).astype(jnp.float32)
    h = embed(params, cfg, tokens).astype(jnp.float32)

    new_conv, new_ssm = [], []
    for il, layer in enumerate(params["layers"]):
        hn = _norm(h, layer, "attn_norm", cfg).astype(jnp.float32)
        xz = _proj(hn, layer["ssm_in"], cfg).astype(jnp.float32)
        x, z = jnp.split(xz, 2, axis=-1)             # (B, T, d_inner)

        conv_s = state.conv[il, slots]
        x, conv_s = _conv1d(x, conv_s, layer["ssm_conv1d"], valid)
        if layer.get("ssm_conv1d_b") is not None:
            x = x + layer["ssm_conv1d_b"]
        x = silu(x)

        x_db = _proj(x, layer["ssm_x"], cfg).astype(jnp.float32)
        dt = x_db[..., :cfg.ssm_dt_rank]
        Bm = x_db[..., cfg.ssm_dt_rank:cfg.ssm_dt_rank + cfg.ssm_d_state]
        Cm = x_db[..., cfg.ssm_dt_rank + cfg.ssm_d_state:]
        dt = _proj(dt, layer["ssm_dt"], cfg).astype(jnp.float32)
        if layer.get("ssm_dt_b") is not None:
            dt = dt + layer["ssm_dt_b"]

        ssm_s = state.ssm[il, slots]
        y, ssm_s = _ssm_scan(x, dt, layer["ssm_a"], Bm, Cm, ssm_s, valid)
        y = y + x * layer["ssm_d"]
        y = y * silu(z)
        out = _proj(y, layer["ssm_out"], cfg).astype(jnp.float32)
        h = h + out
        new_conv.append(conv_s)
        new_ssm.append(ssm_s)

    # scatter updated slot states back (donated buffers: in-place in HBM)
    conv = state.conv.at[:, slots].set(jnp.stack(new_conv))
    ssm = state.ssm.at[:, slots].set(jnp.stack(new_ssm))

    h = _norm(h, params, "out_norm", cfg)
    if params.get("output") is None:
        # headless: final hidden states (llama_get_embeddings path)
        return h.astype(jnp.float32), MambaState(conv=conv, ssm=ssm)
    logits = _proj(h.astype(cfg.cdtype), params["output"], cfg)
    if logits.shape[-1] != cfg.vocab_size:
        logits = logits[..., : cfg.vocab_size]   # tile-padded head
    return logits.astype(jnp.float32), MambaState(conv=conv, ssm=ssm)
