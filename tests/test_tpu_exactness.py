"""On-hardware exactness: the Mosaic fast-unpack path vs the golden model.

Interpret-mode tests (test_pallas_qmm.py) validate the kernel logic, but
interpret-mode bitcasts need not match Mosaic's real sublane packing — this
suite runs the actual compiled kernels on the TPU and checks every format's
fast (bf16/i8) and f32 unpack paths against dequantize-then-dot.

Run:  TPULAMM_TEST_TPU=1 python -m pytest tests/test_tpu_exactness.py -q
(skipped automatically on the CPU test mesh).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpulamm.gguf.constants import GGMLType
from tpulamm.ops.pallas_qmm import qmm_pallas
from tpulamm.ops.qtensor import QTensor, dequant_mm
from tpulamm.quant import formats

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="on-hardware suite (TPULAMM_TEST_TPU=1)")

QTYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
          GGMLType.Q8_0, GGMLType.Q2_K]


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda q: q.name)
@pytest.mark.parametrize("m", [4, 128], ids=["gemv", "mm"])
def test_fast_unpack_exact_on_tpu(qtype, m):
    rng = np.random.default_rng(int(qtype))
    n, k = 256, 1280                   # 5 chunks: also covers the kc tail
    w = (rng.normal(size=(n, k)) * 0.7).astype(np.float32)
    raw = formats.quantize(w, qtype)
    qt = QTensor.from_gguf_raw(raw, qtype, (n, k), layout="mm")
    x = rng.normal(size=(m, k)).astype(np.float32)

    expect = np.asarray(x @ np.asarray(dequant_mm(qt, jnp.float32)))

    # a mispacked sublane bitcast would produce garbage (NMSE ~ 1); the
    # bounds below only allow MXU rounding (TPU f32 matmul runs bf16
    # passes at DEFAULT precision, so even the f32 path is ~1e-5)
    got32 = np.asarray(qmm_pallas(jnp.asarray(x), qt,
                                  compute_dtype=jnp.float32))
    nmse32 = ((got32 - expect) ** 2).mean() / (expect ** 2).mean()
    assert nmse32 < 3e-5, f"f32 path NMSE {nmse32}"

    # fast path (packed-i32 byte tricks + u16 fp16-scale decode)
    got16 = np.asarray(qmm_pallas(jnp.asarray(x), qt,
                                  compute_dtype=jnp.bfloat16))
    nmse16 = ((got16 - expect) ** 2).mean() / (expect ** 2).mean()
    assert nmse16 < 1e-3, f"bf16 path NMSE {nmse16}"


def test_flash_attention_exact_on_tpu():
    from tpulamm.ops.flash_attention import (flash_attention,
                                             flash_attention_ref)
    rng = np.random.default_rng(0)
    B, Hkv, T, G, S, hd = 2, 2, 4, 4, 257, 64
    q = jnp.asarray(rng.normal(size=(B, Hkv, T * G, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, hd)), jnp.float32)
    kpos = np.full((B, S), -1, np.int32)
    kpos[0, :40] = np.arange(40)
    kpos[1, :24] = np.arange(24)
    kpos[1, 5:9] = -1                      # surgery hole
    qbase = jnp.asarray([40, 24], jnp.int32)
    qlen = jnp.asarray([T, T], jnp.int32)
    args = dict(scale=0.125, g=G)
    ref = flash_attention_ref(q, k, v, jnp.asarray(kpos), qbase, qlen,
                              **args)
    got = flash_attention(q, k, v, jnp.asarray(kpos), qbase, qlen, **args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_attention_q8_scales_exact_on_tpu():
    """flash + q8_0 KV (in-kernel scale folds): the interpret-mode parity
    test can't catch Mosaic block-shape constraints (a (1,1,St) scale
    block DID lower in interpret and failed on hardware) — this is the
    real-chip gate."""
    from tpulamm.ops.flash_attention import (flash_attention,
                                             flash_attention_ref)
    rng = np.random.default_rng(3)
    B, Hkv, T, G, S, hd = 2, 2, 4, 4, 257, 64
    q = jnp.asarray(rng.normal(size=(B, Hkv, T * G, hd)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, size=(B, Hkv, S, hd)),
                     jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, size=(B, Hkv, S, hd)),
                     jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, size=(B, Hkv, S)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, size=(B, Hkv, S)),
                     jnp.float32)
    kpos = np.full((B, S), -1, np.int32)
    kpos[0, :40] = np.arange(40)
    kpos[1, :24] = np.arange(24)
    qbase = jnp.asarray([40, 24], jnp.int32)
    qlen = jnp.asarray([T, T], jnp.int32)
    args = dict(scale=0.125, g=G)
    ref = flash_attention_ref(q, k8, v8, jnp.asarray(kpos), qbase, qlen,
                              ks, vs, **args)
    got = flash_attention(q, k8, v8, jnp.asarray(kpos), qbase, qlen,
                          ks, vs, **args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_decode_shape_8k_exact_on_tpu():
    """flash at the LONG-CONTEXT decode shape (TG=1 MHA row, S=8192):
    NMSE gate vs the golden reference, bf16 and q8_0 caches — separates
    kernel bugs from the reduction-order token divergence a greedy run
    on a random-weight model shows at this scale."""
    from tpulamm.ops.flash_attention import (flash_attention,
                                             flash_attention_ref)
    rng = np.random.default_rng(0)
    B, Hkv, TG, hd, S = 1, 8, 1, 128, 8192
    q = jnp.asarray(rng.normal(size=(B, Hkv, TG, hd)), jnp.float32)
    kpos = np.full((B, S), -1, np.int32)
    kpos[0, :S - 7] = np.arange(S - 7)
    qbase = jnp.asarray([S - 7], jnp.int32)
    qlen = jnp.asarray([1], jnp.int32)
    args = dict(scale=float(1 / np.sqrt(hd)), g=1)

    def nmse(got, ref):
        got, ref = np.asarray(got, np.float64), np.asarray(ref, np.float64)
        return ((got - ref) ** 2).sum() / max(1e-12, (ref ** 2).sum())

    k = jnp.asarray(rng.normal(size=(B, Hkv, S, hd)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, hd)) * 0.3, jnp.bfloat16)
    ref = flash_attention_ref(q, k, v, jnp.asarray(kpos), qbase, qlen,
                              **args)
    got = flash_attention(q, k, v, jnp.asarray(kpos), qbase, qlen, **args)
    assert nmse(got, ref) < 1e-4

    ks = jnp.asarray(rng.uniform(0.005, 0.02, size=(B, Hkv, S)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, size=(B, Hkv, S)),
                     jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, size=(B, Hkv, S, hd)),
                     jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, size=(B, Hkv, S, hd)),
                     jnp.int8)
    ref = flash_attention_ref(q, k8, v8, jnp.asarray(kpos), qbase, qlen,
                              ks, vs, **args)
    got = flash_attention(q, k8, v8, jnp.asarray(kpos), qbase, qlen,
                          ks, vs, **args)
    assert nmse(got, ref) < 1e-4


@pytest.mark.parametrize("qtype", QTYPES, ids=lambda q: q.name)
def test_int8_dot_exact_on_tpu(qtype, monkeypatch):
    """int8-activation MXU path vs a numpy integer simulation of the same
    math (per-group symmetric int8 quant -> integer dots -> f32 rescale +
    exact-gsum correction). Bounds allow only f32 summation-order noise."""
    monkeypatch.setenv("TPULAMM_INT8_DOT", "force")
    from tpulamm.quant.repack import SPECS
    rng = np.random.default_rng(int(qtype) + 7)
    n, k, m = 256, 1280, 4
    w = (rng.normal(size=(n, k)) * 0.7).astype(np.float32)
    raw = formats.quantize(w, qtype)
    qt = QTensor.from_gguf_raw(raw, qtype, (n, k), layout="mm")
    x = rng.normal(size=(m, k)).astype(np.float32)

    spec = SPECS[qtype]
    ga = spec.group
    g = k // ga
    xg = x.reshape(m, g, ga)
    amax = np.abs(xg).max(-1)
    s = (amax / 127.0).astype(np.float32)
    s = np.where(s > 0, s, np.float32(1.0))
    qx = np.clip(np.round(xg / s[..., None]), -127, 127).astype(np.int64)
    gsum = xg.sum(-1, dtype=np.float64)

    wd = np.asarray(dequant_mm(qt, jnp.float32)).T        # (N, K)
    from tpulamm.ops.qtensor import mm_scale_planes
    sw_j, mins_j = mm_scale_planes(qt.planes, qtype)
    sw = np.asarray(sw_j, np.float64)                     # (K/ga, N)
    mins = (np.asarray(mins_j, np.float64) if mins_j is not None
            else np.zeros_like(sw))
    # UNSIGNED integer codes from the dequantized weights (the kernel dots
    # raw codes and folds zero/min into the exact-gsum correction term)
    off = mins - spec.zero * sw                           # (g, N)
    qv = spec.zero + np.rint(
        (wd.T.reshape(g, ga, n) - mins[:, None, :])
        / np.where(sw == 0, 1, sw)[:, None, :]).astype(np.int64)
    idot = np.einsum("mgk,gkn->gmn", qx, qv)              # (g, m, n)
    expect = (idot * sw[:, None, :] * s.T[:, :, None]).sum(0) \
        + gsum @ off

    got = np.asarray(qmm_pallas(jnp.asarray(x), qt))[:m]
    nmse = ((got - expect) ** 2).mean() / (expect ** 2).mean()
    # 1e-4: the min-formats' f32 correction dot carries slightly more
    # summation-order noise vs the f64 sim (measured 3.7-4.1e-5)
    assert nmse < 1e-4, f"{qtype.name} int8 path NMSE vs int-sim {nmse}"
