"""File-logging layer tests (reference: common/log.h, llama_log_set)."""

import os

from tpulamm.utils import log as L


def setup_function(_):
    # reset module state between tests
    L.close_file()
    L.set_callback(None)
    L._disabled = False


def test_log_file_and_tee(tmp_path, capsys):
    path = str(tmp_path / "run.log")
    L.open_file(path)
    L.log("file-only line")
    L.log_tee("tee line")
    L.close_file()
    text = open(path).read()
    assert "file-only line" in text and "tee line" in text
    assert "tee line" in capsys.readouterr().err
    # file-only line must NOT hit stderr
    L.open_file(path, append=True)
    L.log("second")
    L.close_file()
    assert open(path).read().count("tee line") == 1


def test_callback_routes_everything(tmp_path):
    got = []
    L.set_callback(lambda lvl, txt: got.append((lvl, txt)))
    L.log("a")
    L.log_tee("b", level="warn")
    L.set_callback(None)
    assert got == [("info", "a"), ("warn", "b")]


def test_disable(tmp_path):
    path = str(tmp_path / "x.log")
    L.open_file(path)
    L.disable()
    L.log("nope")
    assert open(path).read() == ""
    L._disabled = False


def test_setup_from_args(tmp_path):
    class A:
        log_file = str(tmp_path / "cli.log")
        log_enable = False
        log_append = False
        log_disable = False
    L.setup(A(), "main")
    L.log("hello")
    L.close_file()
    assert "hello" in open(A.log_file).read()


def test_dump_yaml_roundtrip(tmp_path):
    rec = {"model": "m.gguf", "n": 3, "ok": True, "f": 1.5,
           "tricky": "a: b #x", "items": [1, "two"]}
    path = L.dump_yaml(str(tmp_path), "main", rec)
    text = open(path).read()
    assert "model: m.gguf" in text
    assert "n: 3" in text and "ok: true" in text
    assert '"a: b #x"' in text
    assert "- two" in text


def test_timings_record():
    from tpulamm.runtime.engine import Timings
    t = Timings(t_load=0.5, t_prefill=2.0, n_prefill=100,
                t_eval=1.0, n_eval=50)
    r = L.timings_record(t)
    assert r["t_load_ms"] == 500.0
    assert r["prompt_tokens_per_s"] == 50.0
    assert r["eval_tokens_per_s"] == 50.0
