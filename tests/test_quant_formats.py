"""Quant codec tests mirroring llama.cpp-b2430/tests/test-quantize-fns.cpp.

Same synthetic data (0.1 + 2cos(i+offset)), same error metric (sqrt(sse)/n),
same thresholds: total quantization error <= 0.002 (2-bit <= 0.0075), dot
product error <= 0.02.
"""

import numpy as np
import pytest

from tpulamm.gguf.constants import GGMLType
from tpulamm.quant import formats

TEST_SIZE = 32 * 128
MAX_TOTAL_ERROR = 0.002
MAX_TOTAL_ERROR_2BITS = 0.0075
MAX_DOT_ERROR = 0.02

DTYPE_MAP = {
    "f32": GGMLType.F32,
    "q2_k": GGMLType.Q2_K,
    "q4_0": GGMLType.Q4_0,
    "q4_1": GGMLType.Q4_1,
    "q5_0": GGMLType.Q5_0,
    "q5_1": GGMLType.Q5_1,
    "q8_0": GGMLType.Q8_0,
}


def generate_data(offset: float, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float32)
    return (0.1 + 2 * np.cos(i + np.float32(offset))).astype(np.float32)


def array_rmse(a: np.ndarray, b: np.ndarray) -> float:
    # reference metric: sqrtf(sum of squared diff) / n  (test-quantize-fns.cpp:35-42)
    return float(np.sqrt(np.sum((a.astype(np.float64) - b) ** 2)) / a.size)


def test_roundtrip_error(dtype):
    qtype = DTYPE_MAP[dtype]
    data = generate_data(0.0, TEST_SIZE)
    raw = formats.quantize(data, qtype)
    out = formats.dequantize(raw, qtype, TEST_SIZE)
    err = array_rmse(data, out)
    budget = MAX_TOTAL_ERROR_2BITS if dtype == "q2_k" else MAX_TOTAL_ERROR
    assert err <= budget, f"{dtype}: roundtrip rmse {err} > {budget}"


def test_dot_product_error(dtype):
    qtype = DTYPE_MAP[dtype]
    a = generate_data(0.0, TEST_SIZE)
    b = generate_data(1.0, TEST_SIZE)
    raw = formats.quantize(a, qtype)
    deq = formats.dequantize(raw, qtype, TEST_SIZE)
    # our engine's activation path is bf16/f32 (SURVEY.md §7.1), so the dot is
    # dequant(w)·x; the reference additionally quantizes activations to Q8 —
    # our error is strictly smaller, same budget applies
    dot = float(np.dot(deq.astype(np.float64), b.astype(np.float64)))
    dot_ref = float(np.dot(a.astype(np.float64), b.astype(np.float64)))
    err = abs(dot - dot_ref) / TEST_SIZE
    assert err <= MAX_DOT_ERROR, f"{dtype}: dot error {err} > {MAX_DOT_ERROR}"


def test_idempotent_requantize(dtype):
    """quantize(dequantize(quantize(x))) must equal quantize-once bytes for
    the linear formats (stability of the RTN rules)."""
    if dtype in ("q2_k",):  # iterative search, not expected idempotent
        pytest.skip("K-quant search is not idempotent by construction")
    qtype = DTYPE_MAP[dtype]
    data = generate_data(0.5, TEST_SIZE)
    raw1 = formats.quantize(data, qtype)
    deq = formats.dequantize(raw1, qtype, TEST_SIZE)
    raw2 = formats.quantize(deq, qtype)
    deq2 = formats.dequantize(raw2, qtype, TEST_SIZE)
    # dequantized values must be (nearly) fixed-point
    assert array_rmse(deq, deq2) <= 1e-4


@pytest.mark.parametrize("qt", [GGMLType.Q8_1, GGMLType.Q8_K])
def test_activation_formats_roundtrip(qt):
    data = generate_data(0.25, TEST_SIZE)
    raw = formats.quantize(data, qt)
    out = formats.dequantize(raw, qt, TEST_SIZE)
    assert array_rmse(data, out) <= MAX_TOTAL_ERROR


def test_q8_1_sum_field():
    data = generate_data(0.25, 64)
    raw = formats.quantize(data, GGMLType.Q8_1).reshape(2, 36)
    d = raw[:, 0:2].copy().view(np.float16).astype(np.float32)[:, 0]
    s = raw[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    qs = raw[:, 4:36].view(np.int8).astype(np.int32).sum(axis=1)
    np.testing.assert_allclose(s, (qs * d.astype(np.float64)).astype(np.float32),
                               rtol=1e-2)


def test_q8_k_bsums():
    data = generate_data(0.25, 512)
    raw = formats.quantize(data, GGMLType.Q8_K).reshape(2, 292)
    qs = raw[:, 4:260].view(np.int8).astype(np.int32).reshape(2, 16, 16)
    bsums = raw[:, 260:292].copy().view("<i2").astype(np.int32).reshape(2, 16)
    np.testing.assert_array_equal(bsums, qs.sum(axis=-1))


def test_known_q4_0_block():
    """Hand-checked block: max-|.| element sets d = max/-8."""
    x = np.zeros(32, dtype=np.float32)
    x[3] = -4.0   # absmax, signed value -4 -> d = 0.5
    x[10] = 2.0
    raw = formats.quantize(x, GGMLType.Q4_0)
    d = raw[0:2].copy().view(np.float16)[0]
    assert d == np.float16(0.5)
    out = formats.dequantize(raw, GGMLType.Q4_0, 32)
    assert out[3] == -4.0
    assert out[10] == 2.0
    assert abs(out[0]) <= 0.25  # zero maps to q=8 -> 0.0
    assert out[0] == 0.0


def test_q5_0_fifth_bit_roundtrip(rng):
    x = rng.normal(size=(8, 32)).astype(np.float32) * 10
    raw = formats.quantize(x, GGMLType.Q5_0)
    out = formats.dequantize(raw, GGMLType.Q5_0, 32)
    # 5-bit grid: nearest-rounding error is d/2, except the clamped negative
    # extreme (MIN(31, ...)) which can be off by a full step
    d = raw.reshape(8, 22)[:, 0:2].copy().view(np.float16).astype(np.float32)
    assert np.all(np.abs(out - x) <= np.abs(d) + 1e-6)


def test_q2_k_structure(rng):
    x = rng.normal(size=(2, 256)).astype(np.float32)
    raw = formats.quantize(x, GGMLType.Q2_K)
    assert raw.shape == (2, 84)
    out = formats.dequantize(raw, GGMLType.Q2_K, 256)
    assert out.shape == (2, 256)
    # decode matches manual per-element formula
    blk = raw[0]
    scales = blk[0:16]
    d = blk[80:82].copy().view(np.float16).astype(np.float32)[0]
    dmin = blk[82:84].copy().view(np.float16).astype(np.float32)[0]
    e = 37  # half 0, r 37, shift 2, byte 5, scale idx 3... compute generically
    half, r = divmod(e, 128)
    byte = blk[16 + 32 * half + r % 32]
    crumb = (byte >> (2 * (r // 32))) & 3
    sc = scales[8 * half + 2 * (r // 32) + (r % 32) // 16]
    expect = d * (sc & 0xF) * crumb - dmin * (sc >> 4)
    np.testing.assert_allclose(out[0, e], expect, rtol=1e-6)
