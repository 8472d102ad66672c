"""Interactive sweep refinement (`slb2d-sweep ... read-from=stdin`) — the
sweep analogue of the reference's stdin parameter server
(src/boltzmann_cli.c:71-91) — and the module-level compile cache that makes
same-shape refinement grids re-run without an XLA recompile."""

import io

import numpy as np

from slb2d_tpu import config as cfgmod
from slb2d_tpu import sweep_cli
from slb2d_tpu.parallel.sweep import ParameterSweep, _run_sweep

ARGS = ["E_dc=1.0", "E_omega=2.0", "omega=10.0", "mu=1.0", "alpha=0.9495",
        "n-harmonics=8", "PhiYmin=-10.0", "PhiYmax=10.0", "B=0.1",
        "t-max=0.3", "g-grid=24", "dt=0.001", "quiet=1"]


def _rows(text):
    return [np.array(l.split(), float) for l in text.splitlines()
            if l and not l.startswith("#")]


def test_sweep_repl_refinement(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr("sys.stdin", io.StringIO(
        "\n"                                   # blank line: keep reading
        "sweep:bogus=1,2\n"                    # malformed spec: re-read
        "sweep:E_dc=0.5,1.5,3 omega=12.0\n"    # refinement + scalar override
        "exit\n"))
    rc = sweep_cli.main(
        ARGS + ["o=out.txt", "read-from=stdin", "sweep:E_dc=0.5;1.0"])
    assert rc == 0
    text = (tmp_path / "out.txt").read_text()
    assert text.count("#E_dc") == 2            # one header per grid
    rows = _rows(text)
    assert len(rows) == 2 + 3

    # first grid: the argv sweep at the base omega
    np.testing.assert_allclose([r[0] for r in rows[:2]], [0.5, 1.0])
    assert all(r[2] == 10.0 for r in rows[:2])
    # refined grid: new E_dc axis, overridden omega
    np.testing.assert_allclose([r[0] for r in rows[2:]], [0.5, 1.0, 1.5])
    assert all(r[2] == 12.0 for r in rows[2:])

    # refined rows equal a direct ParameterSweep at the overridden omega
    cfg = cfgmod.parse_cmd(["display=4"] + ARGS).replace(omega=12.0)
    res = ParameterSweep(cfg, {"E_dc": np.linspace(0.5, 1.5, 3)}).run()
    for i in range(3):
        direct = [res[k][i] for k in (
            "v_dr_av", "v_y_av", "m_over_m_x_av", "A", "Asin",
            "v_dr_inst", "v_y_inst", "m_over_m_x_inst", "norm")]
        np.testing.assert_allclose(rows[2 + i][6:], direct, rtol=1e-12,
                                   err_msg=f"refined point {i}")


def test_sweep_repl_bogus_axis_name_survives(tmp_path, monkeypatch, capsys):
    """An unsweepable axis name on a refinement line (ParameterSweep raises
    ValueError) is reported and the session continues to the next line."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr("sys.stdin", io.StringIO(
        "sweep:dt=0.001;0.002\n"               # valid spec, unsweepable name
        "sweep:E_dc=0.25;0.75\n"
        "exit\n"))
    rc = sweep_cli.main(
        ARGS + ["o=o.txt", "read-from=stdin", "sweep:E_dc=0.5;1.0"])
    assert rc == 0
    assert "cannot sweep over" in capsys.readouterr().err
    text = (tmp_path / "o.txt").read_text()
    assert text.count("#E_dc") == 2            # first grid + the good line
    rows = _rows(text)
    np.testing.assert_allclose([r[0] for r in rows],
                               [0.5, 1.0, 0.25, 0.75])


def test_sweep_repl_rejected_lines_apply_nothing(tmp_path, monkeypatch,
                                                 capsys):
    """A rejected refinement line must not leak its overrides into later
    grids, and invalid values (t-max<=0) or non-whitelisted keys (dtype)
    must reject the whole line."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr("sys.stdin", io.StringIO(
        "omega=12.0\n"                          # no sweep axes: rejected —
                                                #  omega must NOT stick
        "sweep:E_dc=0.5;1.0 t-max=-5\n"         # invalid config: rejected
        "sweep:E_dc=0.5;1.0 dtype=f64\n"        # non-overridable key
        "sweep:E_dc=0.25;0.75\n"                # good line, base omega
        "exit\n"))
    rc = sweep_cli.main(
        ARGS + ["o=o.txt", "read-from=stdin", "sweep:E_dc=0.5;1.0"])
    assert rc == 0
    err = capsys.readouterr().err
    assert err.count("rejected line") == 3
    rows = _rows((tmp_path / "o.txt").read_text())
    assert len(rows) == 4                       # only the two good grids
    assert all(r[2] == 10.0 for r in rows)      # omega=12 never applied
    # and none of the accepted rows are the all-zero garbage a negative
    # averaging window would produce
    assert all(np.any(r[6:] != 0) for r in rows)


def test_sweep_repl_malformed_numeric_spec_survives(tmp_path, monkeypatch,
                                                    capsys):
    """A sweep spec with an unparseable number (float()/int() ValueError)
    is rejected like a wrong-token-count spec — the refinement session
    survives instead of crashing with a traceback (ADVICE round 2)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr("sys.stdin", io.StringIO(
        "sweep:E_dc=0,1,x\n"                   # int('x') — bad count token
        "sweep:E_dc=0.5;abc\n"                 # float('abc') — bad value
        "sweep:E_dc=0.25;0.75\n"               # good line
        "exit\n"))
    rc = sweep_cli.main(
        ARGS + ["o=o.txt", "read-from=stdin", "sweep:E_dc=0.5;1.0"])
    assert rc == 0
    assert capsys.readouterr().err.count("bad sweep spec") == 2
    rows = _rows((tmp_path / "o.txt").read_text())
    np.testing.assert_allclose([r[0] for r in rows],
                               [0.5, 1.0, 0.25, 0.75])


def test_sweep_cli_malformed_numeric_argv_is_clean(capsys):
    """The non-interactive path prints the clean ERROR line and exits 1 on
    an unparseable numeric spec (no raw ValueError traceback)."""
    rc = sweep_cli.main(ARGS + ["sweep:E_dc=0,1,x"])
    assert rc == 1
    assert "bad sweep spec" in capsys.readouterr().err


def test_sweep_cli_first_grid_error_is_clean(tmp_path, monkeypatch,
                                             capsys):
    """An unsweepable axis in the argv grid exits 1 with an ERROR line,
    not a traceback."""
    monkeypatch.chdir(tmp_path)
    rc = sweep_cli.main(ARGS + ["o=o.txt", "sweep:dt=0.001;0.002"])
    assert rc == 1
    assert "cannot sweep over" in capsys.readouterr().err


def test_sweep_compile_cache_shared_across_grids():
    """Two same-shape sweeps (different values) share one compiled
    executable: the refinement loop's warm path."""
    cfg = cfgmod.parse_cmd(["display=4"] + ARGS)
    _run_sweep.clear_cache()       # earlier tests may have warmed shapes
    ParameterSweep(cfg, {"E_dc": np.array([0.5, 1.0, 2.0])}).run()
    n0 = _run_sweep._cache_size()
    ParameterSweep(cfg, {"E_dc": np.array([0.7, 0.9, 1.1])}).run()
    assert _run_sweep._cache_size() == n0      # cache hit, no recompile
    # a different batch size is a genuinely new program
    ParameterSweep(cfg, {"E_dc": np.array([0.7, 0.9])}).run()
    assert _run_sweep._cache_size() == n0 + 1
