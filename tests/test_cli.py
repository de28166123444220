"""CLI surface tests (run/ls/show/add/rm/version) — driven through
``main()`` with a real config dir, mirroring /root/reference/bin.js."""

import json

import pytest

from gasket_spark.pipeline.cli import main


@pytest.fixture()
def config_dir(tmp_path, monkeypatch):
    (tmp_path / "gasket.json").write_text(json.dumps(
        {"main": ["echo hello world", "tr a-z A-Z"],
         "other": ["echo hi"]}))
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_version(capsys):
    assert main(["version"]) == 0
    from gasket_spark import __version__
    assert capsys.readouterr().out.strip() == __version__


def test_help(capsys):
    assert main(["help"]) == 0
    assert "run" in capsys.readouterr().out


def test_completion(capsys):
    assert main(["completion"]) == 0
    out = capsys.readouterr().out
    assert "complete -F" in out and "gasket-spark" in out


def test_ls(config_dir, capsys):
    assert main(["ls"]) == 0
    assert capsys.readouterr().out.split() == ["main", "other"]


def test_show(config_dir, capsys):
    assert main(["show", "main"]) == 0
    out = capsys.readouterr().out
    assert "echo hello world | tr a-z A-Z" in out


def test_add_rm_persist(config_dir, capsys):
    assert main(["add", "third", "wc", "-l"]) == 0
    data = json.loads((config_dir / "gasket.json").read_text())
    assert data["third"] == ["wc -l"]
    assert main(["rm", "third"]) == 0
    data = json.loads((config_dir / "gasket.json").read_text())
    assert "third" not in data


def test_run_default_main(config_dir, capsys, spark):
    assert main(["run"]) == 0
    assert capsys.readouterr().out.strip() == "HELLO WORLD"


def test_run_missing_warns(config_dir, capsys, spark):
    assert main(["run", "nope"]) == 0
    assert "warning" in capsys.readouterr().err


def test_error_exit_code_2(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)  # no config anywhere
    assert main(["ls"]) == 2
    assert "error:" in capsys.readouterr().err
