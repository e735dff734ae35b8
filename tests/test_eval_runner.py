"""Unit tests for the evaluation matrix runner's TSV merge semantics."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_runner():
    spec = importlib.util.spec_from_file_location(
        "eval_runner", os.path.join(REPO, "evaluation", "runner.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_matrix_merge_replaces_in_place(tmp_path, monkeypatch):
    runner = _load_runner()
    out = tmp_path / "results.tsv"
    out.write_text(
        "name\tm\n"
        "a\t1.0\n"
        "b\t2.0\n"
        "a\t1.5\n"  # stale duplicate from the old blind-append mode
    )
    monkeypatch.setattr(runner, "run_config", lambda args: {"m": 9.0})
    runner.run_matrix({"a": ["--x"], "c": ["--y"]}, ["m"], str(out), append=True)

    lines = out.read_text().splitlines()
    assert lines[0] == "name\tm"
    # a refreshed in place (once), its stale duplicate dropped, b kept,
    # c appended
    assert lines[1:] == ["a\t9.0", "b\t2.0", "c\t9.0"]


def test_run_matrix_fresh_write(tmp_path, monkeypatch):
    runner = _load_runner()
    out = tmp_path / "results.tsv"
    monkeypatch.setattr(runner, "run_config", lambda args: {"m": 3.0})
    runner.run_matrix({"a": []}, ["m"], str(out), append=False)
    assert out.read_text().splitlines() == ["name\tm", "a\t3.0"]
