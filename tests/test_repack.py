"""Repacked TPU planes must dequantize identically to the GGUF bytes."""

import numpy as np
import pytest

from tpulamm.gguf.constants import GGMLType
from tpulamm.ops.qmatmul import qmatmul
from tpulamm.ops.qtensor import QTensor, dequant_mm, gather_dequant_rows
from tpulamm.quant import formats

QTYPES = {
    "q4_0": GGMLType.Q4_0,
    "q4_1": GGMLType.Q4_1,
    "q5_0": GGMLType.Q5_0,
    "q5_1": GGMLType.Q5_1,
    "q8_0": GGMLType.Q8_0,
    "q2_k": GGMLType.Q2_K,
}

N, K = 64, 512


@pytest.fixture
def weight(rng):
    return (rng.normal(size=(N, K)) * 2).astype(np.float32)


def test_mm_roundtrip(dtype, weight, rng):
    if dtype == "f32":
        pytest.skip("dense format, no repack")
    qtype = QTYPES[dtype]
    raw = formats.quantize(weight, qtype)
    ref = formats.dequantize(raw, qtype, K)          # (N, K) exact dequant
    qt = QTensor.from_gguf_raw(raw, qtype, (N, K), layout="mm")
    got = np.asarray(dequant_mm(qt))                 # (K, N)
    np.testing.assert_allclose(got.T, ref, rtol=1e-6, atol=1e-6)


def test_rows_roundtrip(dtype, weight, rng):
    if dtype == "f32":
        pytest.skip("dense format, no repack")
    qtype = QTYPES[dtype]
    raw = formats.quantize(weight, qtype)
    ref = formats.dequantize(raw, qtype, K)
    qt = QTensor.from_gguf_raw(raw, qtype, (N, K), layout="rows")
    idx = rng.integers(0, N, size=(3, 5))
    got = np.asarray(gather_dequant_rows(qt, idx))
    np.testing.assert_allclose(got, ref[idx], rtol=1e-6, atol=1e-6)


def test_qmatmul_ref(dtype, weight, rng):
    if dtype == "f32":
        pytest.skip("dense path covered elsewhere")
    qtype = QTYPES[dtype]
    raw = formats.quantize(weight, qtype)
    ref_w = formats.dequantize(raw, qtype, K)
    qt = QTensor.from_gguf_raw(raw, qtype, (N, K), layout="mm")
    x = rng.normal(size=(4, K)).astype(np.float32)
    out = np.asarray(qmatmul(x, qt, impl="ref"))
    expect = x @ ref_w.T
    # bf16 compute: ~0.4% relative error budget
    np.testing.assert_allclose(out, expect, rtol=2e-2, atol=2e-2 * np.abs(expect).max())
    out32 = np.asarray(qmatmul(x, qt, impl="ref", compute_dtype=np.float32))
    np.testing.assert_allclose(out32, expect, rtol=1e-5, atol=1e-5 * np.abs(expect).max())
