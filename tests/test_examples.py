"""Smoke coverage for the shipped examples: they are user-facing entry
points into the library API, so package drift must not silently break
them (multihost_sweep needs a multi-process launch and is exercised by
tests/test_multihost.py's equivalent code path instead)."""

import pathlib
import runpy
import sys

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _run(name, monkeypatch, capsys):
    path = str(EXAMPLES / name)
    monkeypatch.setattr(sys, "argv", [path])
    runpy.run_path(path, run_name="__main__")
    return capsys.readouterr().out


def test_absorption_map_example(monkeypatch, capsys):
    out = _run("absorption_map.py", monkeypatch, capsys)
    rows = [l for l in out.splitlines() if l and not l.startswith("#")]
    assert len(rows) == 14                 # 7 E_dc rows x (A + <v_dr>)
    vals = [float(v) for v in rows[0].split()]
    assert len(vals) == 5 and all(abs(v) < 1.0 for v in vals)


def test_relaxation_repl_example(monkeypatch, capsys):
    out = _run("relaxation_repl.py", monkeypatch, capsys)
    # four display-4 observable lines: initial run + 3 mutations
    data = [l for l in out.splitlines()
            if l and not l.startswith("#") and not l.startswith("E_")]
    assert len([l for l in data if len(l.split()) == 13]) == 4
