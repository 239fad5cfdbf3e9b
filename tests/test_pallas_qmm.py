"""Pallas fused dequant-matmul vs the jnp golden model (interpret mode on CPU).

Analogue of test-backend-ops.cpp: each backend op is compared against the
reference implementation on random tensors with an NMSE-style budget.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulamm.gguf.constants import GGMLType
from tpulamm.ops.pallas_qmm import qmm_pallas
from tpulamm.ops.qtensor import QTensor, dequant_mm
from tpulamm.quant import formats

QTYPES = {
    "q4_0": GGMLType.Q4_0,
    "q4_1": GGMLType.Q4_1,
    "q5_0": GGMLType.Q5_0,
    "q5_1": GGMLType.Q5_1,
    "q8_0": GGMLType.Q8_0,
    "q2_k": GGMLType.Q2_K,
}

N, K, M = 256, 512, 5


def test_pallas_matches_ref(dtype, rng):
    if dtype == "f32":
        pytest.skip("dense matmul handled by XLA directly")
    qtype = QTYPES[dtype]
    w = (rng.normal(size=(N, K)) * 0.7).astype(np.float32)
    raw = formats.quantize(w, qtype)
    qt = QTensor.from_gguf_raw(raw, qtype, (N, K), layout="mm")
    x = rng.normal(size=(M, K)).astype(np.float32)

    expect = np.asarray(x @ np.asarray(dequant_mm(qt, jnp.float32)))
    got = np.asarray(qmm_pallas(jnp.asarray(x), qt,
                                compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, expect, rtol=1e-5,
                               atol=1e-5 * np.abs(expect).max())

    got_bf16 = np.asarray(qmm_pallas(jnp.asarray(x), qt,
                                     compute_dtype=jnp.bfloat16,
                                     interpret=True))
    nmse = np.mean((got_bf16 - expect) ** 2) / np.mean(expect ** 2)
    assert nmse < 1e-4, f"{dtype} bf16 nmse {nmse}"


def test_pallas_tn128(rng):
    qtype = GGMLType.Q4_0
    n = 128
    w = rng.normal(size=(n, K)).astype(np.float32)
    raw = formats.quantize(w, qtype)
    qt = QTensor.from_gguf_raw(raw, qtype, (n, K), layout="mm")
    x = rng.normal(size=(1, K)).astype(np.float32)
    expect = np.asarray(x @ np.asarray(dequant_mm(qt, jnp.float32)))
    got = np.asarray(qmm_pallas(jnp.asarray(x), qt, compute_dtype=jnp.float32,
                                interpret=True))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-4)


def test_pad_n_zero_columns(rng):
    """pad_n rows dequantize to exact 0 for every format (tile-padded lm
    head: forward slices logits back to vocab_size)."""
    import jax.numpy as jnp
    n, n_pad = 256, 384
    for qtype in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                  GGMLType.Q5_1, GGMLType.Q8_0, GGMLType.Q2_K):
        w = rng.normal(size=(n, K)).astype(np.float32)
        raw = formats.quantize(w, qtype)
        qt = QTensor.from_gguf_raw(raw, qtype, (n, K), layout="mm")
        qp = qt.pad_n(n_pad)
        assert qp.shape == (n_pad, K)
        x = rng.normal(size=(2, K)).astype(np.float32)
        got = np.asarray(qmm_pallas(jnp.asarray(x), qp,
                                    compute_dtype=jnp.float32,
                                    interpret=True))
        ref = np.asarray(qmm_pallas(jnp.asarray(x), qt,
                                    compute_dtype=jnp.float32,
                                    interpret=True))
        np.testing.assert_array_equal(got[:, n:], 0.0)
        np.testing.assert_allclose(got[:, :n], ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("kc", [2, 4])
@pytest.mark.parametrize("cdt", [jnp.float32, jnp.bfloat16])
def test_pallas_kc_tail_masking(rng, kc, cdt):
    """K chunk count not divisible by kc (e.g. the flagship K=11008 has a
    PRIME 43-chunk count): the cdiv grid's tail block must be masked."""
    n, k = 256, 256 * 5                     # 5 chunks: tail for kc=2 and 4
    w = (rng.normal(size=(n, k)) * 0.7).astype(np.float32)
    raw = formats.quantize(w, GGMLType.Q4_0)
    qt = QTensor.from_gguf_raw(raw, GGMLType.Q4_0, (n, k), layout="mm")
    x = rng.normal(size=(24, k)).astype(np.float32)
    expect = np.asarray(x @ np.asarray(dequant_mm(qt, jnp.float32)))
    got = np.asarray(qmm_pallas(jnp.asarray(x), qt, compute_dtype=cdt,
                                kc=kc, interpret=True))
    nmse = ((got - expect) ** 2).mean() / (expect ** 2).mean()
    assert np.isfinite(got).all()
    assert nmse < (1e-9 if cdt == jnp.float32 else 1e-4), nmse


@pytest.mark.parametrize("kc", [1, 2, 4])
def test_int8_dot_path(dtype, rng, monkeypatch, kc):
    """int8-activation MXU path (TPULAMM_INT8_DOT): error must stay within
    the reference's Q8-activation dot budget (test-quantize-fns.cpp:22
    dot tolerance 0.02 — ours is per-group symmetric int8 like
    quantize_row_q8_0, ggml-quants.c:1182)."""
    if dtype == "f32":
        pytest.skip("dense matmul handled by XLA directly")
    monkeypatch.setenv("TPULAMM_INT8_DOT", "force")
    qtype = QTYPES[dtype]
    n, k = 256, 256 * 5                     # kc tail coverage at kc=2,4
    w = (rng.normal(size=(n, k)) * 0.7).astype(np.float32)
    raw = formats.quantize(w, qtype)
    qt = QTensor.from_gguf_raw(raw, qtype, (n, k), layout="mm")
    x = rng.normal(size=(3, k)).astype(np.float32)
    expect = np.asarray(x @ np.asarray(dequant_mm(qt, jnp.float32)))
    got = np.asarray(qmm_pallas(jnp.asarray(x), qt, kc=kc,
                                interpret=True))[:3]
    assert np.isfinite(got).all()
    nmse = ((got - expect) ** 2).mean() / (expect ** 2).mean()
    assert nmse < 1e-3, f"{dtype} int8 nmse {nmse}"
    # exact-dequant golden: int8 activation quantization error only
    rel = np.abs(got - expect).max() / np.abs(expect).max()
    assert rel < 0.05, f"{dtype} int8 maxrel {rel}"
