"""Parallel layer: vmapped/sharded sweeps and halo-sharded spatial runs on
the 8-virtual-device CPU mesh (SURVEY.md §4: sweep of size k must equal k
independent runs; sharded-M runs must equal single-device runs)."""

import io

import jax
import numpy as np
import pytest

from slb2d_tpu.config import SimConfig
from slb2d_tpu.models.superlattice import SuperlatticeModel
from slb2d_tpu.ops import stencil
from slb2d_tpu.parallel import ParameterSweep, make_mesh, make_spatial_runner
from slb2d_tpu.runtime.loop import Simulation
from slb2d_tpu.runtime.schedule import count_steps

BASE = dict(display=4, E_dc=1.0, E_omega=2.0, omega=10.0, mu=1.0,
            alpha=0.9495, n_harmonics=8, phi_y_min=-10.0, phi_y_max=10.0,
            B=0.1, t_start=0.3, g_grid=24, dt=1e-3, quiet=True)


def single_run_display4(tmp_path, monkeypatch, **over):
    cfg = SimConfig(**{**BASE, **over, "out_file": "single.txt"})
    monkeypatch.chdir(tmp_path)
    sim = Simulation(cfg)
    sim.run()
    with open(tmp_path / "single.txt") as fh:
        line = [l for l in fh if not l.startswith("#")][0]
    v = np.array(line.split(), float)
    # columns: E_dc E_om om mu v_dr A norm v_y m_x <v_dr> <v_y> <m_x> Asin
    return dict(v_dr_inst=v[4], A=v[5], norm=v[6], v_y_inst=v[7],
                m_over_m_x_inst=v[8], v_dr_av=v[9], v_y_av=v[10],
                m_over_m_x_av=v[11], Asin=v[12])


def test_sweep_equals_independent_runs(tmp_path, monkeypatch):
    e_dcs = [0.5, 1.0, 2.0]
    cfg = SimConfig(**BASE)
    sweep = ParameterSweep(cfg, {"E_dc": np.array(e_dcs)})
    res = sweep.run()
    for i, e in enumerate(e_dcs):
        ref = single_run_display4(tmp_path, monkeypatch, E_dc=e)
        for key in ("v_dr_inst", "v_y_inst", "m_over_m_x_inst", "norm",
                    "v_dr_av", "v_y_av", "m_over_m_x_av", "A", "Asin"):
            np.testing.assert_allclose(
                res[key][i], ref[key], rtol=5e-5, atol=1e-7,
                err_msg=f"{key} at E_dc={e}")


def test_sweep_mixed_params_with_omega(tmp_path, monkeypatch):
    """omega varies -> per-point averaging windows and step counts."""
    cfg = SimConfig(**BASE)
    sweep = ParameterSweep(cfg, {"omega": np.array([8.0, 10.0, 12.0]),
                                 "B": np.array([0.1, 0.2, 0.0])})
    res = sweep.run()
    for i, (om, b) in enumerate([(8.0, 0.1), (10.0, 0.2), (12.0, 0.0)]):
        ref = single_run_display4(tmp_path, monkeypatch, omega=om, B=b)
        for key in ("v_dr_inst", "norm", "v_dr_av", "A"):
            np.testing.assert_allclose(
                res[key][i], ref[key], rtol=5e-5, atol=1e-7,
                err_msg=f"{key} at omega={om} B={b}")


def test_sweep_mu_alpha_rebuilds_a0(tmp_path, monkeypatch):
    cfg = SimConfig(**BASE)
    sweep = ParameterSweep(cfg, {"mu": np.array([0.8, 1.2])})
    res = sweep.run()
    for i, mu in enumerate([0.8, 1.2]):
        ref = single_run_display4(tmp_path, monkeypatch, mu=mu)
        np.testing.assert_allclose(res["norm"][i], ref["norm"],
                                   rtol=5e-5, atol=1e-7)
        np.testing.assert_allclose(res["v_dr_av"][i], ref["v_dr_av"],
                                   rtol=5e-5, atol=1e-7)


def test_sweep_sharded_over_mesh_matches_unsharded():
    cfg = SimConfig(**BASE)
    mesh = make_mesh((8,), ("sweep",))
    e_dcs = np.linspace(0.25, 2.0, 8)
    plain = ParameterSweep(cfg, {"E_dc": e_dcs}).run()
    sharded = ParameterSweep(cfg, {"E_dc": e_dcs}, mesh=mesh).run()
    for key in plain:
        np.testing.assert_allclose(sharded[key], plain[key], rtol=1e-6,
                                   atol=1e-9, err_msg=key)


def test_sweep_combined_space_mesh_matches_plain():
    """Combined 2-D sweep x space ParameterSweep (points parallel over
    "sweep", each point's phi_y grid halo-sharded over "space") equals the
    unsharded sweep to f64 machine precision."""
    cfg = SimConfig(**{**BASE, "dtype": "f64"})
    e_dcs = np.linspace(0.25, 2.0, 4)
    plain = ParameterSweep(cfg, {"E_dc": e_dcs}).run()
    mesh = make_mesh((2, 4), ("sweep", "space"))
    comb = ParameterSweep(cfg, {"E_dc": e_dcs}, mesh=mesh,
                          space_axis="space").run()
    for key in plain:
        np.testing.assert_allclose(comb[key], plain[key], rtol=1e-12,
                                   atol=1e-14, err_msg=key)


@pytest.mark.parametrize("seed", range(3))
def test_sweep_fuzz_random_axes_vs_single_runs(seed, tmp_path, monkeypatch):
    """Randomized sweep axes (two of the six sweepables, random values)
    must match per-point standalone display-4 runs — the generalization
    of the hand-picked cases above, covering mixed axis combinations
    (varying omega -> per-point windows; varying mu/alpha -> per-point
    a0) the fixed tests do not."""
    from slb2d_tpu.parallel.sweep import SWEEPABLE

    rng = np.random.default_rng(seed)
    ranges = dict(E_dc=(-2.0, 3.0), E_omega=(0.5, 3.0), omega=(8.0, 15.0),
                  mu=(0.5, 2.0), alpha=(0.5, 1.2), B=(-0.3, 0.3))
    names = list(rng.choice(SWEEPABLE, size=2, replace=False))
    B = 2
    params = {k: rng.uniform(*ranges[k], size=B) for k in names}

    cfg = SimConfig(**BASE)
    res = ParameterSweep(cfg, params).run()
    for i in range(B):
        over = {k: float(v[i]) for k, v in params.items()}
        ref = single_run_display4(tmp_path, monkeypatch, **over)
        for key in ("v_dr_inst", "v_y_inst", "m_over_m_x_inst", "norm",
                    "v_dr_av", "v_y_av", "m_over_m_x_av", "A", "Asin"):
            np.testing.assert_allclose(
                res[key][i], ref[key], rtol=5e-5, atol=2e-6,
                err_msg=f"seed={seed} {key} at {over}")


def test_sweep_reports_diverged_points(capsys):
    """A numerically unstable point is flagged on stderr with its index
    and parameter values; stable points in the same batch still produce
    finite results (the sweep analogue of the single-run NaN guard)."""
    cfg = SimConfig(**{**BASE, "phi_y_min": -1.0, "phi_y_max": 1.0,
                       "g_grid": 200, "dt": 0.01, "t_start": 0.5,
                       "omega": 10.0, "quiet": False})
    res = ParameterSweep(cfg, {"B": np.array([0.1, 500.0])}).run()
    err = capsys.readouterr().err
    assert "non-finite" in err and "indices [1]" in err
    assert np.isfinite(res["norm"][0]) and not np.isfinite(res["norm"][1])


def test_sweep_checkpoint_resume_equals_uninterrupted(tmp_path):
    """A sweep checkpointed mid-run and resumed must finish with the same
    results as one uninterrupted run (same scan body per step, so f32
    trajectories agree exactly)."""
    cfg = SimConfig(**BASE)
    e_dcs = np.linspace(0.25, 2.0, 3)
    plain = ParameterSweep(cfg, {"E_dc": e_dcs}).run()

    ck = str(tmp_path / "sweep_ck.npz")
    sw = ParameterSweep(cfg, {"E_dc": e_dcs})
    half = sw.n_steps // 2
    # phase 1: run to the mid-point checkpoint, then abandon
    sw.run(checkpoint=ck, checkpoint_every=half)
    # load the MID-run snapshot (the final overwrite has done == n_steps,
    # so re-save a fresh interrupted run instead: run only `half` steps)
    sw2 = ParameterSweep(cfg, {"E_dc": e_dcs})
    st = sw2._initial_states()
    import jax.numpy as jnp
    cap = {k: jnp.zeros((sw2.B,), sw2.base.np_dtype)
           for k in sw2._CAP_KEYS}
    from slb2d_tpu.parallel.sweep import _run_sweep
    st, cap = _run_sweep(sw2.consts, st, cap, dict(
        w_d4=jnp.asarray(sw2.base.w_d4),
        w_d4_phi=jnp.asarray(sw2.base.w_d4_phi),
        w_norm=jnp.asarray(sw2.base.w_norm)),
        in_axes=sw2.in_axes, n_steps=half, unroll=1)
    sw2._save_checkpoint(ck, st, cap, half)

    resumed = ParameterSweep(cfg, {"E_dc": e_dcs}).run(resume=ck)
    for key in plain:
        np.testing.assert_allclose(resumed[key], plain[key], rtol=2e-6,
                                   atol=1e-9, err_msg=key)


def test_sweep_checkpoint_grid_mismatch_rejected(tmp_path):
    cfg = SimConfig(**BASE)
    ck = str(tmp_path / "ck.npz")
    e = np.array([0.5, 1.0])
    ParameterSweep(cfg, {"E_dc": e, "mu": np.array([0.8, 1.2])}).run(
        checkpoint=ck)
    # different values on a shared axis
    with pytest.raises(ValueError, match="different grid"):
        ParameterSweep(cfg, {"E_dc": np.array([0.5, 1.5]),
                             "mu": np.array([0.8, 1.2])}).run(resume=ck)
    # a swept axis dropped entirely (same B, same E_dc values)
    with pytest.raises(ValueError, match="swept axes"):
        ParameterSweep(cfg, {"E_dc": e}).run(resume=ck)

    ck2 = str(tmp_path / "ck2.npz")
    ParameterSweep(cfg, {"E_dc": e}).run(checkpoint=ck2)
    # a non-swept scalar changed between write and resume
    with pytest.raises(ValueError, match="E_omega"):
        ParameterSweep(cfg.replace(E_omega=2.5), {"E_dc": e}).run(
            resume=ck2)
    # cross-precision resume
    with pytest.raises(ValueError, match="dtype"):
        ParameterSweep(cfg.replace(dtype="f64"), {"E_dc": e}).run(
            resume=ck2)


def test_sweep_cli_shards_flag(tmp_path, monkeypatch):
    """slb2d-sweep shards=K runs the combined mesh from the command line
    and agrees with the unsharded CLI run."""
    from slb2d_tpu import sweep_cli

    args = ["E_dc=1.0", "E_omega=2.0", "omega=10.0", "mu=1.0",
            "alpha=0.9495", "n-harmonics=8", "PhiYmin=-10.0",
            "PhiYmax=10.0", "B=0.1", "t-max=0.3", "g-grid=24", "dt=0.001",
            "quiet=1", "dtype=f64", "sweep:E_dc=0.25,2.0,4"]
    monkeypatch.chdir(tmp_path)
    assert sweep_cli.main(args + ["o=plain.txt"]) == 0
    assert sweep_cli.main(args + ["o=sharded.txt", "shards=2"]) == 0

    def rows(name):
        return np.array([l.split() for l in open(tmp_path / name)
                         if not l.startswith("#")], float)

    np.testing.assert_allclose(rows("sharded.txt"), rows("plain.txt"),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("n_shards,dtype", [(2, "f32"), (4, "f32"),
                                            (2, "f64"), (4, "f64")])
def test_spatial_sharding_matches_single_device(n_shards, dtype):
    # g_grid=253 -> MS=256 -> MP=256, divisible by 2 and 4.
    # f32: sharded vs unsharded HLO fuse differently -> ~1 ulp/step noise.
    # f64: 1e-12 tolerance — a halo/mask bug would be O(1e-2).
    cfg = SimConfig(**{**BASE, "g_grid": 253, "dtype": dtype})
    model = SuperlatticeModel(cfg)
    assert model.MP % n_shards == 0
    c = stencil.consts_from_model(model)
    state0 = stencil.bootstrap_state(c, model)

    n_steps = 50
    step = stencil.make_step_fn(c, av_enabled=True, exact_trig=False)
    ref = jax.jit(lambda s: jax.lax.scan(step, s, None, length=n_steps)[0])(
        state0)

    mesh = make_mesh((n_shards,), ("space",))
    runner = make_spatial_runner(c, model, mesh, axis="space")
    sh = runner(stencil.bootstrap_state(c, model), n_steps)

    tol = dict(rtol=1e-3, atol=1e-5) if dtype == "f32" else \
        dict(rtol=1e-12, atol=1e-14)
    for field in ("a", "b", "a_hs", "b_hs"):
        np.testing.assert_allclose(
            np.asarray(getattr(sh, field)), np.asarray(getattr(ref, field)),
            err_msg=field, **tol)
    np.testing.assert_allclose(np.asarray(sh.av), np.asarray(ref.av), **tol)
    np.testing.assert_array_equal(np.asarray(sh.hs_edge_a),
                                  np.asarray(ref.hs_edge_a))
