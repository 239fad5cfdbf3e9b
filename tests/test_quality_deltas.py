"""Per-format quality-delta gate (BASELINE ppl criterion).

Trains a tiny llama on local prose for a few hundred steps (CPU-fast),
quantizes it to every format, and asserts the quality ordering/magnitudes
match the reference's published behavior (quantize.cpp:19-49): Q8_0 is
near-lossless, 5-bit beats 4-bit beats Q2_K, and top-1 agreement stays
high for >=4-bit formats. The full-size table ships in PERF.md
(tools/quality_table.py)."""

import numpy as np
import pytest

from tpulamm.tools.quality_table import (build_corpus, quality_table,
                                         train_model)


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    corpus = build_corpus(1_500_000)
    assert len(corpus) > 500_000, "corpus too small"
    path = str(tmp_path_factory.mktemp("q") / "tiny_f32.gguf")
    train_model(path, dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
                ffn=256, seq_len=128, n_steps=300, batch_size=8,
                corpus=corpus, log=lambda *a: None)
    rows = quality_table(path, corpus=corpus, n_ctx=128, n_chunks=4,
                         log=lambda *a: None)
    return {r["format"]: r for r in rows}


def test_model_learned_something(table):
    # byte-level uniform ppl would be 256; any learning puts it far below
    assert table["F32"]["ppl"] < 30


def test_q8_near_lossless(table):
    assert abs(table["Q8_0"]["dppl"]) < 0.05 * table["F32"]["ppl"]
    assert table["Q8_0"]["kl"] < 0.01
    assert table["Q8_0"]["top1_agree"] > 0.97


def test_format_ordering(table):
    """KL from F32 grows as precision drops (reference Δppl ordering)."""
    kl = {f: table[f]["kl"] for f in table}
    assert kl["Q8_0"] <= kl["Q5_0"] * 1.5 + 1e-4
    assert max(kl["Q5_0"], kl["Q5_1"]) < max(kl["Q4_0"], kl["Q4_1"]) * 1.5
    assert kl["Q2_K"] > max(kl["Q4_0"], kl["Q4_1"])   # 2-bit is worst


def test_magnitudes_sane(table):
    for fmt in ("Q4_0", "Q4_1", "Q5_0", "Q5_1"):
        # 4/5-bit quantization must not destroy the model
        assert table[fmt]["dppl"] < 0.5 * table["F32"]["ppl"]
        assert table[fmt]["top1_agree"] > 0.75
