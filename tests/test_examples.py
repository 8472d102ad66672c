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


def test_plot_absorption_map(monkeypatch, capsys, tmp_path):
    """The heatmap renderer parses absorption_map.py output and writes a
    figure (the paper-scale artifact pipeline)."""
    txt = tmp_path / "map.txt"
    txt.write_text(
        "# 6 points x 100 steps on 1 device(s) [stack engine]\n"
        "# absorption A(E_dc, omega):\n"
        "# rows: E_dc = 0 1\n"
        "# cols: omega = 6 10 14\n"
        " 1.0e-2 -2.0e-2  3.0e-2\n"
        " 4.0e-2  5.0e-2 -6.0e-2\n"
        "# <v_dr>/v_p:\n"
        " 0.0e+0  1.0e-1  2.0e-1\n"
        " 3.0e-1  4.0e-1  5.0e-1\n")
    png = tmp_path / "map.png"
    path = str(EXAMPLES / "plot_absorption_map.py")
    monkeypatch.setattr(sys, "argv", [path, str(txt), str(png)])
    runpy.run_path(path, run_name="__main__")
    assert png.stat().st_size > 1000
    import importlib.util
    spec = importlib.util.spec_from_file_location("pam", path)
    pam = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pam)
    e_dc, omega, A, v = pam.parse(str(txt))
    assert A.shape == (2, 3) and v.shape == (2, 3)
    assert A[0, 1] == -2.0e-2 and v[1, 2] == 0.5


def test_relaxation_repl_example(monkeypatch, capsys):
    out = _run("relaxation_repl.py", monkeypatch, capsys)
    # four display-4 observable lines: initial run + 3 mutations
    data = [l for l in out.splitlines()
            if l and not l.startswith("#") and not l.startswith("E_")]
    assert len([l for l in data if len(l.split()) == 13]) == 4
