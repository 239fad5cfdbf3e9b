"""YAML preset runner tests (reference: scripts/run-with-preset.py)."""

from tpulamm.tools import preset


def test_props_to_argv():
    argv = preset.props_to_argv(
        {"n-predict": 8, "escape": True, "mlock": False,
         "reverse-prompt": ["a", "b"], "temp": 0.5})
    assert argv == ["--n-predict", "8", "--escape",
                    "--reverse-prompt", "a", "--reverse-prompt", "b",
                    "--temp", "0.5"]


def test_preset_runs_tool(tmp_path, monkeypatch, capsys):
    y = tmp_path / "p.yaml"
    y.write_text("tool: bench\nmodel: missing.gguf\n")
    # bench errors cleanly on a missing model -> SystemExit(2) via argparse
    import pytest
    with pytest.raises(SystemExit):
        preset.main([str(y)])
    err = capsys.readouterr().err
    assert "tpulamm.cli.bench" in err
    assert "--model missing.gguf" in err


def test_cli_overrides_beat_presets(tmp_path, capsys):
    y = tmp_path / "p.yaml"
    y.write_text("tool: bench\nmodel: a.gguf\nn_prompt: 16\n")
    import pytest
    with pytest.raises(SystemExit):
        preset.main([str(y), "--model", "b.gguf"])
    err = capsys.readouterr().err
    # the preset's model is dropped; the CLI's wins; underscore name mapped
    assert "--model b.gguf" in err and "a.gguf" not in err
    assert "--n-prompt 16" in err


def test_unknown_tool(tmp_path, capsys):
    y = tmp_path / "p.yaml"
    y.write_text("tool: nope\n")
    assert preset.main([str(y)]) == 1
    assert "unknown tool" in capsys.readouterr().err


def test_later_file_overrides(tmp_path, capsys):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text("tool: bench\nmodel: a.gguf\n")
    b.write_text("model: b.gguf\n")
    import pytest
    with pytest.raises(SystemExit):
        preset.main([str(a), str(b)])
    assert "--model b.gguf" in capsys.readouterr().err
