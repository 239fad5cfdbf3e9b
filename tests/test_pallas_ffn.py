"""Fused-FFN kernel vs the unfused reference path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulamm.gguf.constants import GGMLType
from tpulamm.ops.pallas_ffn import ffn_fused, ffn_fused_eligible
from tpulamm.ops.qtensor import QTensor, dequant_mm


def _mk(dim=256, ffn=2816, qtype=GGMLType.Q4_0, seed=0):
    """ffn=2816 exercises both tails: tn1=1408 (2 phase-A steps) and a
    down-K overhang (2816 % 2048 = 768 at kc=8)."""
    rng = np.random.default_rng(seed)
    gate = (rng.normal(size=(ffn, dim)) * 0.5).astype(np.float32)
    up = (rng.normal(size=(ffn, dim)) * 0.5).astype(np.float32)
    down = (rng.normal(size=(dim, ffn)) * 0.5).astype(np.float32)
    gq = QTensor.from_float(gate, qtype)
    uq = QTensor.from_float(up, qtype)
    dq = QTensor.from_float(down, qtype)
    gu = QTensor.concat_n([gq, uq])
    return gu, dq, (gq, uq)


def _ref(x, gq, uq, dq, act="silu"):
    g = np.asarray(x @ np.asarray(dequant_mm(gq, jnp.float32)))
    u = np.asarray(x @ np.asarray(dequant_mm(uq, jnp.float32)))
    if act == "silu":
        a = g / (1.0 + np.exp(-g))
    else:
        a = 0.5 * g * (1.0 + np.tanh(0.7978845608028654
                                     * (g + 0.044715 * g ** 3)))
    mid = a * u
    return mid @ np.asarray(dequant_mm(dq, jnp.float32))


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q8_0,
                                   GGMLType.Q5_1])
def test_ffn_fused_matches_reference(qtype):
    gu, dq, (gq, uq) = _mk(qtype=qtype)
    x = np.random.default_rng(1).normal(size=(4, 256)).astype(np.float32)
    want = _ref(x, gq, uq, dq)
    got = np.asarray(ffn_fused(jnp.asarray(x), gu, dq, interpret=True))
    nmse = ((got - want) ** 2).mean() / (want ** 2).mean()
    assert np.isfinite(got).all()
    assert nmse < 1e-9, nmse


def test_ffn_fused_gelu_and_flagship_shape():
    # 1.1B flagship ffn=5632 (tn1=1408, down tail at kc=8)
    gu, dq, (gq, uq) = _mk(dim=256, ffn=5632, seed=3)
    x = np.random.default_rng(2).normal(size=(8, 256)).astype(np.float32)
    want = _ref(x, gq, uq, dq, act="gelu")
    got = np.asarray(ffn_fused(jnp.asarray(x), gu, dq, act="gelu",
                               interpret=True))
    nmse = ((got - want) ** 2).mean() / (want ** 2).mean()
    assert nmse < 1e-9, nmse


def test_eligibility_guard():
    gu, dq, _ = _mk()
    assert ffn_fused_eligible(gu, dq, 8)
    assert not ffn_fused_eligible(gu, dq, 64)     # matmul regime
    assert not ffn_fused_eligible(None, dq, 8)
