"""Native C++ codec must be bit-identical to the numpy reference codecs."""

import numpy as np
import pytest

from tpulamm.gguf.constants import GGMLType
from tpulamm.quant import formats, native, repack

QTYPES = {
    "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1,
    "q5_0": GGMLType.Q5_0, "q5_1": GGMLType.Q5_1,
    "q8_0": GGMLType.Q8_0, "q2_k": GGMLType.Q2_K,
}


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native library unavailable (build failed?)")
    return l


def _data(rng, shape):
    x = rng.normal(size=shape).astype(np.float32) * 1.7
    x[0, :32] = 0.0          # all-zero block edge case
    x[1, :16] = 2.5          # constant block edge case
    return x


def test_quantize_bit_exact(dtype, lib, rng):
    if dtype == "f32":
        pytest.skip("dense")
    qt = QTYPES[dtype]
    x = _data(rng, (8, 512))
    ref = formats.QUANTIZERS[qt](x)
    got = native.quantize(x, qt)
    np.testing.assert_array_equal(got, ref)


def test_dequantize_bit_exact(dtype, lib, rng):
    if dtype == "f32":
        pytest.skip("dense")
    qt = QTYPES[dtype]
    raw = formats.QUANTIZERS[qt](_data(rng, (8, 512)))
    ref = formats.DEQUANTIZERS[qt](raw, 512)
    got = native.dequantize(raw, qt, 512)
    np.testing.assert_array_equal(got, ref)


def test_repack_bit_exact(dtype, lib, rng):
    if dtype == "f32":
        pytest.skip("dense")
    qt = QTYPES[dtype]
    raw = formats.QUANTIZERS[qt](_data(rng, (8, 512)))
    for layout, fallback in (("mm", repack.repack_mm),
                             ("rows", repack.repack_rows)):
        import tpulamm.quant.native as nat
        if dtype == "q2_k" and layout == "mm":
            # compact-scale contract: repack_mm COMPOSES the native q2
            # plane with numpy-derived compact scd/dm planes — compare
            # the full composed output with and without the native lib
            got = repack.repack_mm(raw, qt, 512)
        else:
            got = native.repack(raw, qt, 512, layout)
            assert got is not None
        # numpy path (native disabled inside by monkeypatched call order):
        # rebuild via the pure-python implementation
        saved, nat._LIB = nat._LIB, None
        try:
            ref = fallback(raw, qt, 512)
        finally:
            nat._LIB = saved
        assert set(got) == set(ref)
        for name in ref:
            np.testing.assert_array_equal(got[name], ref[name],
                                          err_msg=f"{dtype} {layout} {name}")


def test_q8_1_q8_k_bit_exact(lib, rng):
    x = _data(rng, (4, 512))
    for qt in (GGMLType.Q8_1, GGMLType.Q8_K):
        ref = formats.QUANTIZERS[qt](x)
        got = native.quantize(x, qt)
        np.testing.assert_array_equal(got, ref, err_msg=str(qt))
        np.testing.assert_array_equal(native.dequantize(ref, qt, 512),
                                      formats.DEQUANTIZERS[qt](ref, 512))
