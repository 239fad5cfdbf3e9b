"""Tool-layer tests: weighted (imatrix) quantization, imatrix collection,
bench CLI, quantize-stats CLI, and the perplexity extras (hellaswag /
winogrande / multiple-choice / KL-divergence).
"""

import json

import numpy as np
import pytest

pytest.importorskip("transformers")
import torch  # noqa: E402
import transformers  # noqa: E402

from tpulamm.gguf.constants import GGMLType  # noqa: E402
from tpulamm.quant.formats import dequantize, quantize  # noqa: E402
from tpulamm.quant.weighted import (quantize_q4_0_weighted,  # noqa: E402
                                    quantize_weighted)
from tpulamm.runtime.engine import Engine  # noqa: E402
from tpulamm.tools.convert_hf import convert_hf  # noqa: E402

from tests.test_engine import make_vocab_md  # noqa: E402


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    torch.manual_seed(1)
    m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128))
    m.eval()
    path = str(tmp_path_factory.mktemp("tools") / "m.gguf")
    convert_hf(m, path, qtype=GGMLType.F32, vocab=make_vocab_md())
    return path


# -- weighted quantization ----------------------------------------------------

def test_weighted_q4_0_reduces_weighted_error():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 256)).astype(np.float32)
    qw = rng.uniform(0.01, 10.0, size=256).astype(np.float32)

    raw_plain = quantize(x, GGMLType.Q4_0)
    raw_w = quantize_q4_0_weighted(x, qw)
    y_plain = dequantize(raw_plain, GGMLType.Q4_0, 256).reshape(x.shape)
    y_w = dequantize(raw_w, GGMLType.Q4_0, 256).reshape(x.shape)

    we_plain = np.sum(qw * (y_plain - x) ** 2)
    we_w = np.sum(qw * (y_w - x) ** 2)
    assert we_w < we_plain          # importance-weighted error improves
    # and the bytes remain a valid Q4_0 stream (decoded above without error)
    assert raw_w.shape == raw_plain.shape


def test_weighted_q5_0_valid_and_better():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 128)).astype(np.float32)
    qw = np.ones(128, np.float32)
    raw = quantize_weighted(x, GGMLType.Q5_0, qw)
    y = dequantize(raw, GGMLType.Q5_0, 128).reshape(x.shape)
    # even with uniform importance the scale search beats plain RTN in MSE
    y0 = dequantize(quantize(x, GGMLType.Q5_0), GGMLType.Q5_0,
                    128).reshape(x.shape)
    assert np.mean((y - x) ** 2) <= np.mean((y0 - x) ** 2) * 1.001


def test_weighted_fallback_for_unsupported():
    x = np.random.default_rng(2).normal(size=(4, 64)).astype(np.float32)
    raw = quantize_weighted(x, GGMLType.Q8_0, np.ones(64, np.float32))
    np.testing.assert_array_equal(raw, quantize(x, GGMLType.Q8_0))


# -- imatrix ------------------------------------------------------------------

def test_imatrix_collect_and_quantize(model_path, tmp_path):
    from tpulamm.models.loader import load_model
    from tpulamm.tools.imatrix import (collect_imatrix, densify_params,
                                       load_imatrix)

    cfg, params, _ = load_model(model_path, compute_dtype="float32")
    dense = densify_params(params)
    rng = np.random.default_rng(0)
    chunks = [rng.integers(3, 500, 32) for _ in range(3)]
    col = collect_imatrix(dense, cfg, chunks)
    assert "blk.0.attn_q.weight" in col.sums
    assert "blk.1.ffn_down.weight" in col.sums
    assert "output.weight" in col.sums
    im_path = str(tmp_path / "im.npz")
    col.save(im_path)
    loaded = load_imatrix(im_path)
    assert (loaded["blk.0.attn_q.weight"] > 0).all()
    assert loaded["blk.0.ffn_down.weight"].shape == (cfg.ffn_dim,)

    # quantize with the imatrix and make sure the model still works
    from tpulamm.cli.quantize import quantize_file
    out = str(tmp_path / "q4_im.gguf")
    quantize_file(model_path, out, GGMLType.Q4_0, verbose=False,
                  imatrix=im_path)
    eng = Engine(out, n_ctx=32)
    ids, _ = eng.generate([1, 5, 9], n_predict=3, stop_on_eos=False)
    assert len(ids) == 3


# -- bench / quantize-stats CLIs ---------------------------------------------

def test_bench_cli(model_path, capsys):
    from tpulamm.cli.bench import main
    main(["-m", model_path, "-p", "16", "-n", "4", "-r", "1", "-c", "64",
          "-o", "json"])
    rows = json.loads(capsys.readouterr().out)
    tests = {r["test"]: r["t/s"] for r in rows}
    assert "pp16" in tests and "tg4" in tests
    assert all(v > 0 for v in tests.values())


def test_batched_bench_cli(model_path, capsys):
    from tpulamm.cli.bench import main
    main(["-m", model_path, "--batched", "-p", "8", "-n", "4", "-pl", "2",
          "-c", "64", "-o", "json"])
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["pl"] == 2 and rows[0]["tg_ts"] > 0


def test_quantize_stats_cli(model_path, capsys):
    from tpulamm.cli.quantize_stats import main
    main(["-m", model_path, "-t", "q4_0", "-l", "blk.0.attn_q"])
    out = capsys.readouterr().out
    assert "Q4_0" in out and "rmse" in out


# -- perplexity extras ---------------------------------------------------------

def _engine(model_path):
    return Engine(model_path, n_ctx=96, compute_dtype="float32")


def test_hellaswag_and_choice_modes(model_path, tmp_path):
    from tpulamm.cli.perplexity import run_hellaswag, run_multiple_choice
    hs = tmp_path / "hs.jsonl"
    hs.write_text("\n".join(json.dumps(t) for t in [
        {"ctx": "the cat", "endings": ["sat down", "flew away",
                                       "sang opera", "ran off"], "label": 0},
        {"ctx": "a dog", "endings": ["barked", "quacked"], "label": 0},
    ]))
    eng = _engine(model_path)
    res = run_hellaswag(eng, str(hs))
    assert res["total"] == 2 and 0.0 <= res["acc"] <= 1.0

    mc = tmp_path / "mc.jsonl"
    mc.write_text(json.dumps({"question": "the sky is",
                              "choices": ["blue", "loud"], "label": 0}))
    res = run_multiple_choice(eng, str(mc))
    assert res["total"] == 1


def test_winogrande_mode(model_path, tmp_path):
    from tpulamm.cli.perplexity import run_winogrande
    wg = tmp_path / "wg.jsonl"
    wg.write_text(json.dumps({
        "sentence": "the trophy does not fit in the case because _ is big",
        "option1": "the trophy", "option2": "the case", "answer": "1"}))
    eng = _engine(model_path)
    res = run_winogrande(eng, str(wg))
    assert res["total"] == 1


def test_kl_divergence_self_is_zero(model_path, tmp_path):
    from tpulamm.cli.perplexity import kl_divergence, save_logits
    eng = _engine(model_path)
    text = "the cat sat on the mat and the dog sat on the log " * 12
    base = str(tmp_path / "base.npz")
    save_logits(eng, text, base, n_ctx=64, max_chunks=2)
    res = kl_divergence(eng, base)
    assert res["kl_mean"] < 1e-3           # fp16 storage noise only
    # fp16-stored logprobs can flip argmax on a random model's near-ties
    assert res["top1_agree"] > 0.95

    # a quantized model must show positive KL
    from tpulamm.cli.quantize import quantize_file
    qpath = str(tmp_path / "q4.gguf")
    quantize_file(model_path, qpath, GGMLType.Q4_0, verbose=False)
    eng_q = Engine(qpath, n_ctx=96, compute_dtype="float32")
    res_q = kl_divergence(eng_q, base)
    assert res_q["kl_mean"] > res["kl_mean"]


def test_grammar_files_parse_and_accept():
    """Shipped grammars/*.gbnf parse and accept representative strings."""
    import pathlib
    from tpulamm.grammar.engine import Grammar
    root = pathlib.Path(__file__).resolve().parents[1] / "grammars"
    gjson = Grammar.from_gbnf((root / "json.gbnf").read_text())
    for ch in '{"a": [1, -2.5e3, "x"], "b": {"c": null}}':
        gjson.accept_token(ch.encode())
    assert gjson.can_stop()
    garith = Grammar.from_gbnf((root / "arithmetic.gbnf").read_text())
    for ch in "x1+2*(y-3)=42\n":
        garith.accept_token(ch.encode())
    assert garith.can_stop()
    glist = Grammar.from_gbnf((root / "list.gbnf").read_text())
    for ch in "- one\n- two\n":
        glist.accept_token(ch.encode())
    assert glist.can_stop()


def test_override_kv_and_tokenize_dump(model_path, capsys):
    from tpulamm.models.loader import load_model, parse_kv_override
    key, val = parse_kv_override("llama.rope.freq_base=float:123.0")
    cfg, _, _ = load_model(model_path, kv_overrides={key: val})
    assert cfg.rope.freq_base == 123.0
    import pytest
    with pytest.raises(ValueError):
        parse_kv_override("novalue")
    with pytest.raises(ValueError):
        parse_kv_override("k=badtype:1")

    from tpulamm.cli.gguf_dump import main as dump_main
    dump_main([model_path, "--no-tensors"])
    out = capsys.readouterr().out
    assert "general.architecture" in out and "GGUF v" in out

    from tpulamm.cli.tokenize import main as tok_main
    tok_main(["-m", model_path, "-p", "the cat", "--ids"])
    ids = capsys.readouterr().out.split()
    assert all(t.isdigit() for t in ids) and len(ids) > 2


def test_fetch_weights_offline_and_urls():
    """Weights fetcher: HF URL construction + clear offline failure."""
    import pytest as _pytest

    from tpulamm.tools.fetch_weights import download, hf_url
    assert hf_url("org/repo", "model.gguf") == \
        "https://huggingface.co/org/repo/resolve/main/model.gguf?download=true"
    with _pytest.raises(SystemExit, match="cannot reach"):
        download("https://invalid.invalid/x.gguf",
                 "tmp_verify/nope.gguf", quiet=True)


def test_process_escapes_utf8_safe():
    from tpulamm.cli.main import _process_escapes
    assert _process_escapes("a\\nb\\tc") == "a\nb\tc"
    assert _process_escapes("café 日本\\n") == "café 日本\n"
    assert _process_escapes("\\x41\\x00") == "A\x00"
    assert _process_escapes("trailing\\") == "trailing\\"
