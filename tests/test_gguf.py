"""GGUF writer/reader roundtrip tests (format per ggml.c:20545-20588)."""

import numpy as np

from tpulamm.gguf.constants import GGMLType
from tpulamm.gguf.reader import GGUFReader
from tpulamm.gguf.writer import GGUFWriter
from tpulamm.quant import formats


def test_roundtrip(tmp_path, rng):
    path = str(tmp_path / "t.gguf")
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "llama")
    w.add_kv("general.name", "unit-test")
    w.add_kv("llama.block_count", 2)
    w.add_kv("llama.rope.freq_base", 10000.0)
    w.add_kv("tokenizer.ggml.tokens", ["<s>", "</s>", "hello"])
    w.add_kv("tokenizer.ggml.scores", np.array([0.0, -1.0, -2.0], np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array([3, 3, 1], np.int32))
    w.add_kv("some.bool", True)
    w.add_kv("some.neg", -7)

    a = rng.normal(size=(4, 64)).astype(np.float32)
    b = rng.normal(size=(8, 32)).astype(np.float32)
    w.add_tensor("a.weight", a)
    qraw = formats.quantize(b, GGMLType.Q4_0)
    w.add_tensor("b.weight", qraw, shape=b.shape, ggml_type=GGMLType.Q4_0)
    w.add_tensor("c.weight", a.astype(np.float16))
    w.write()

    r = GGUFReader(path)
    assert r.version == 3
    assert r.metadata["general.architecture"] == "llama"
    assert r.metadata["llama.block_count"] == 2
    assert abs(r.metadata["llama.rope.freq_base"] - 10000.0) < 1e-6
    assert list(r.metadata["tokenizer.ggml.tokens"]) == ["<s>", "</s>", "hello"]
    np.testing.assert_array_equal(r.metadata["tokenizer.ggml.token_type"],
                                  [3, 3, 1])
    assert r.metadata["some.bool"] is True
    assert r.metadata["some.neg"] == -7

    ta = r.tensors["a.weight"]
    assert ta.ggml_type == GGMLType.F32
    assert ta.shape == (4, 64)
    np.testing.assert_array_equal(ta.to_f32(), a)

    tb = r.tensors["b.weight"]
    assert tb.ggml_type == GGMLType.Q4_0
    assert tb.shape == (8, 32)
    np.testing.assert_array_equal(tb.data, qraw.reshape(-1))
    np.testing.assert_allclose(tb.to_f32(),
                               formats.dequantize(qraw, GGMLType.Q4_0, 32))

    tc = r.tensors["c.weight"]
    assert tc.ggml_type == GGMLType.F16
    np.testing.assert_allclose(tc.to_f32(), a, atol=2e-3, rtol=1e-2)
    r.close()


def test_alignment(tmp_path):
    path = str(tmp_path / "t.gguf")
    w = GGUFWriter(path, alignment=64)
    w.add_kv("general.alignment", 64)
    x = np.arange(33 * 32, dtype=np.float32).reshape(33, 32)
    w.add_tensor("x", x)
    w.add_tensor("y", x + 1)
    w.write()
    r = GGUFReader(path)
    assert r.alignment == 64
    assert r.data_offset % 64 == 0
    assert r.tensors["y"].offset % 64 == 0
    np.testing.assert_array_equal(r.tensors["y"].to_f32(), x + 1)
    r.close()
