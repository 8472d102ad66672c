"""Sublane-stacked sweep megakernel (ops/sweep_stack.py) vs the vmapped
XLA sweep engine.

impl=pallas forces the stacked engine off-TPU (interpreter mode), so
these run on the CPU backend; geometry covers ragged point-group padding
(B not a multiple of G), per-point E_omega gating including a dc-only
point (egate column), and stacked a0 (mu swept)."""

import numpy as np
import pytest

from slb2d_tpu.config import SimConfig
from slb2d_tpu.parallel.sweep import ParameterSweep

CFG = dict(display=4, E_dc=1.0, E_omega=2.0, omega=10.0, mu=1.0,
           alpha=0.9495, n_harmonics=8, phi_y_min=-10.0, phi_y_max=10.0,
           B=0.1, t_start=0.2, g_grid=24, dt=1e-3, quiet=True)

PARAMS = {"E_dc": np.linspace(0.3, 2.0, 6),
          "E_omega": np.array([2.0, 2.0, 0.0, 1.5, 2.0, 2.0]),
          "mu": np.array([1.0, 1.2, 1.0, 0.8, 1.0, 1.1])}

OBS = ("v_dr_av", "v_y_av", "m_over_m_x_av", "A", "Asin",
       "v_dr_inst", "v_y_inst", "m_over_m_x_inst", "norm", "av_count")


def run_sweep(impl, g_points=None, **kw):
    cfg = SimConfig(**CFG, impl=impl)
    sw = ParameterSweep(cfg, PARAMS)
    if g_points is not None and sw._use_stack_engine():
        from slb2d_tpu.ops.sweep_stack import SweepStackRunner
        sw._stack_runner = SweepStackRunner(sw, g_points=g_points)
    res = sw.run(**kw)
    return sw, res


def test_stack_engine_matches_xla_sweep():
    sw_x, ref = run_sweep("xla")
    sw_s, res = run_sweep("pallas", g_points=4)   # 6 points -> ragged 8
    assert sw_s._use_stack_engine() and not sw_x._use_stack_engine()
    for k in OBS:
        np.testing.assert_allclose(
            np.asarray(res[k]), np.asarray(ref[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)
    # the dc-only point's averages stay exactly zero (egate)
    np.testing.assert_array_equal(np.asarray(res["av_count"])[2], 0.0)
    np.testing.assert_array_equal(np.asarray(res["v_dr_av"])[2], 0.0)


import jax


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU invariant (tests force the CPU "
                           "backend; set SLB2D_TPU_TESTS=1 to enable)")
def test_stack_engine_matches_xla_on_tpu():
    """Compiled Mosaic lowering of the stacked sweep kernel vs the
    vmapped XLA sweep on the real chip (production group geometry)."""
    sw_x, ref = run_sweep("xla")
    sw_s, res = run_sweep("pallas")            # auto group size
    for k in OBS:
        np.testing.assert_allclose(
            np.asarray(res[k]), np.asarray(ref[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


def test_stack_engine_checkpoint_resume(tmp_path):
    """Mid-run checkpoint under the stacked engine, resumed by BOTH
    engines: the sweep checkpoint format is engine-independent."""
    _, full = run_sweep("pallas", g_points=4)
    ck = str(tmp_path / "ck.npz")

    class Stop(Exception):
        pass

    cfg = SimConfig(**CFG, impl="pallas")
    sw = ParameterSweep(cfg, PARAMS)
    orig = ParameterSweep._save_checkpoint
    calls = []

    def save_once(self, path, states, cap, done):
        orig(self, path, states, cap, done)
        calls.append(done)
        if done < self.n_steps:
            raise Stop

    ParameterSweep._save_checkpoint = save_once
    try:
        with pytest.raises(Stop):
            sw.run(checkpoint=ck, checkpoint_every=200)
    finally:
        ParameterSweep._save_checkpoint = orig
    assert calls and calls[0] == 200

    for impl in ("pallas", "xla"):
        cfg2 = SimConfig(**CFG, impl=impl)
        sw2 = ParameterSweep(cfg2, PARAMS)
        res = sw2.run(resume=ck)
        for k in OBS:
            np.testing.assert_allclose(
                np.asarray(res[k]), np.asarray(full[k]),
                rtol=2e-4, atol=2e-5, err_msg=f"{impl}:{k}")


def test_stack_engine_capture_state():
    """frames-dir capture: final (a, b) via the stacked engine equal the
    XLA engine's rolled loop-exit capture."""
    sw_x, res_x = run_sweep("xla", capture_state=True)
    sw_s, res_s = run_sweep("pallas", g_points=4, capture_state=True)
    ax, bx = sw_x.final_ab
    as_, bs = sw_s.final_ab
    np.testing.assert_allclose(as_, ax, rtol=1e-4, atol=5e-6)
    np.testing.assert_allclose(bs, bx, rtol=1e-4, atol=5e-6)


def test_stack_engine_compile_shared_across_grids():
    """Two same-shape grids (different values) share one jitted advance
    (the interactive-refinement warm path): _stack_run is lru_cached on
    geometry and constants are args, not closures."""
    from slb2d_tpu.ops.sweep_stack import SweepStackRunner

    cfg = SimConfig(**CFG, impl="pallas")
    r1 = SweepStackRunner(ParameterSweep(
        cfg, {"E_dc": np.linspace(0.1, 1.0, 6)}), g_points=4)
    r2 = SweepStackRunner(ParameterSweep(
        cfg, {"E_dc": np.linspace(1.5, 2.5, 6)}), g_points=4)
    assert r1._jit_run is r2._jit_run
    if hasattr(r1._jit_run, "_cache_size"):
        before = r1._jit_run._cache_size()
        sw = ParameterSweep(cfg, {"E_dc": np.linspace(0.1, 1.0, 6)})
        sw._stack_runner = r1
        sw.run()
        mid = r1._jit_run._cache_size()
        sw2 = ParameterSweep(cfg, {"E_dc": np.linspace(1.5, 2.5, 6)})
        sw2._stack_runner = r2
        sw2.run()
        assert r2._jit_run._cache_size() == mid   # no new executable


def test_stack_engine_on_sweep_mesh():
    """The stacked engine sharded over a pure "sweep" mesh (BASELINE #5
    on the fast engine): row-stacked arrays shard at point boundaries,
    each device walks its own VMEM-resident groups.  Results must match
    the meshless stacked run and the vmapped mesh run."""
    from slb2d_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((2,), ("sweep",))
    cfg = SimConfig(**CFG, impl="pallas")
    sw = ParameterSweep(cfg, PARAMS, mesh=mesh)
    assert sw._use_stack_engine()
    res = sw.run()
    assert sw._stack_runner.mesh is mesh
    assert sw._stack_runner.Bp % (2 * sw._stack_runner.G) == 0

    _, ref = run_sweep("pallas", g_points=4)          # meshless stacked
    sw_x = ParameterSweep(SimConfig(**CFG, impl="xla"), PARAMS, mesh=mesh)
    ref_x = sw_x.run()                                # vmapped on mesh
    for k in OBS:
        np.testing.assert_allclose(np.asarray(res[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
        np.testing.assert_allclose(np.asarray(res[k]),
                                   np.asarray(ref_x[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_stack_engine_eligibility():
    cfg = SimConfig(**CFG, impl="pallas")
    assert ParameterSweep(cfg, PARAMS)._use_stack_engine()
    # omega swept: eligible (per-omega kernel mode) — EXCEPT with
    # capture_state, whose per-point (a,b) freeze stays vmapped-only
    sw = ParameterSweep(cfg, {"omega": np.array([9.0, 10.0])})
    assert sw._use_stack_engine()
    assert not sw._use_stack_engine(capture_state=True)
    res = sw.run(capture_state=True)     # falls back and still works
    assert np.all(np.isfinite(np.asarray(res["norm"])))
    # f64 -> vmapped XLA
    cfg64 = SimConfig(**CFG, impl="pallas", dtype="f64")
    assert not ParameterSweep(cfg64, PARAMS)._use_stack_engine()
    # impl=xla never
    assert not ParameterSweep(SimConfig(**CFG, impl="xla"),
                              PARAMS)._use_stack_engine()


OMEGA_PARAMS = {
    # distinct periods T=2pi/omega -> per-point t_end and exit steps;
    # point 2 is dc-only (egate) — the full per-omega gating matrix
    "omega": np.array([8.0, 10.0, 12.0, 14.0, 10.0]),
    "E_dc": np.linspace(0.4, 1.8, 5),
    "E_omega": np.array([2.0, 2.0, 0.0, 1.5, 2.0]),
}


def test_stack_engine_omega_sweep_matches_xla():
    """omega on the stacked engine (VERDICT r3 Missing #2): per-point
    in-kernel trig, per-point averaging windows, and rolled loop-exit
    captures must match the vmapped engine point for point."""
    cfg = SimConfig(**CFG, impl="xla")
    ref = ParameterSweep(cfg, OMEGA_PARAMS).run()
    sw = ParameterSweep(SimConfig(**CFG, impl="pallas"), OMEGA_PARAMS)
    assert sw._use_stack_engine()
    from slb2d_tpu.ops.sweep_stack import SweepStackRunner
    sw._stack_runner = SweepStackRunner(sw, g_points=2)  # 5 pts -> ragged
    assert sw._stack_runner.per_omega
    res = sw.run()
    # per-point av counts must differ (different T) and match exactly
    counts = np.asarray(ref["av_count"])
    assert len(np.unique(counts[[0, 1, 3]])) == 3
    np.testing.assert_array_equal(np.asarray(res["av_count"]), counts)
    for k in OBS:
        np.testing.assert_allclose(
            np.asarray(res[k]), np.asarray(ref[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)
    # dc-only point: averages exactly zero
    np.testing.assert_array_equal(np.asarray(res["v_dr_av"])[2], 0.0)


def test_stack_engine_omega_sweep_checkpoint_resume(tmp_path):
    """Mid-run checkpoint/resume in per-omega mode: the rolled captures
    must survive the restart (points already past their t_end never
    update again after resume)."""
    sw_full = ParameterSweep(SimConfig(**CFG, impl="pallas"), OMEGA_PARAMS)
    full = sw_full.run()
    ck = str(tmp_path / "ck.npz")

    class Stop(Exception):
        pass

    sw = ParameterSweep(SimConfig(**CFG, impl="pallas"), OMEGA_PARAMS)
    orig = ParameterSweep._save_checkpoint

    def save_once(self, path, states, cap, done):
        orig(self, path, states, cap, done)
        if done < self.n_steps:
            raise Stop

    ParameterSweep._save_checkpoint = save_once
    try:
        with pytest.raises(Stop):
            # past the SHORTEST point's exit (~649 steps at omega=14,
            # t_end = 0.2 + 2pi/14) but before the longest (~985)
            sw.run(checkpoint=ck, checkpoint_every=700)
    finally:
        ParameterSweep._save_checkpoint = orig

    sw2 = ParameterSweep(SimConfig(**CFG, impl="pallas"), OMEGA_PARAMS)
    res = sw2.run(resume=ck)
    for k in OBS:
        np.testing.assert_allclose(
            np.asarray(res[k]), np.asarray(full[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


def test_stack_engine_omega_sweep_on_mesh():
    """Per-omega mode sharded over a "sweep" mesh: the per-point trig /
    exit-step / averaging-window columns must shard at point boundaries
    exactly like the state rows (the dryrun checks this path is finite;
    here it is value-pinned against the meshless per-omega run and the
    vmapped engine)."""
    from slb2d_tpu.parallel.mesh import make_mesh

    # 6 points pad to a multiple of 2 devices x G groups
    params = {"omega": np.array([8.0, 10.0, 12.0, 14.0, 10.0, 9.0]),
              "E_dc": np.linspace(0.4, 1.8, 6),
              "E_omega": np.array([2.0, 2.0, 0.0, 1.5, 2.0, 2.0])}
    mesh = make_mesh((2,), ("sweep",))
    sw = ParameterSweep(SimConfig(**CFG, impl="pallas"), params, mesh=mesh)
    assert sw._use_stack_engine()
    res = sw.run()
    assert sw._stack_runner.per_omega

    sw_m = ParameterSweep(SimConfig(**CFG, impl="pallas"), params)
    ref_m = sw_m.run()                                 # meshless stacked
    ref_x = ParameterSweep(SimConfig(**CFG, impl="xla"), params).run()
    np.testing.assert_array_equal(np.asarray(res["av_count"]),
                                  np.asarray(ref_x["av_count"]))
    for k in OBS:
        np.testing.assert_allclose(np.asarray(res[k]),
                                   np.asarray(ref_m[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
        np.testing.assert_allclose(np.asarray(res[k]),
                                   np.asarray(ref_x[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_stack_engine_vmem_point_gate():
    """A single point beyond the VMEM residency bound (even G=1 cannot
    compile) falls back to the vmapped XLA engine — with a warning when
    pallas was explicit (code-review r3 finding #1)."""
    big = dict(CFG, n_harmonics=100, g_grid=12000)   # 104x12160 ~ 1.26M
    params = {"E_dc": np.linspace(0.3, 2.0, 4)}
    sw = ParameterSweep(SimConfig(**big, impl="pallas"), params)
    assert sw.base.NHP * sw.base.MP > 1_000_000
    with pytest.warns(UserWarning, match="VMEM residency bound"):
        assert not sw._use_stack_engine()
    # impl=auto: silent fallback
    import warnings as _w
    sw = ParameterSweep(SimConfig(**big, impl="auto"), params)
    with _w.catch_warnings():
        _w.simplefilter("error")
        assert not sw._use_stack_engine()


def test_stack_engine_per_omega_paper_point_shape():
    """The TRIG_RESYNC=32 drift bound at the advertised absorption-map
    workload shape (examples/absorption_map.py paper: N=40, M=500,
    omega in [6, 14]): the full paper omega axis (16 points — the axis
    the angle-addition recurrence drifts along) x 4 E_dc values, on a
    2-device sweep mesh, one drive period per point (~1100 steps, ~34
    resync blocks).  The full 16x16 grid at the same point shape was
    measured once off-suite with identical tolerances (docs/PERF.md
    "Per-omega drift at paper scale"); only the E_dc multiplicity — drift
    -irrelevant — is reduced here to keep suite wall time bounded."""
    from slb2d_tpu.parallel.mesh import make_mesh

    base = dict(display=4, E_dc=0.0, E_omega=1.5, omega=1.0, mu=1.0,
                alpha=0.9495, n_harmonics=40, phi_y_min=-10.0,
                phi_y_max=10.0, B=0.1, t_start=0.05, g_grid=500, dt=1e-3,
                quiet=True)
    e_dc = np.linspace(0.0, 3.0, 4)
    omega = np.linspace(6.0, 14.0, 16)
    E, W = np.meshgrid(e_dc, omega, indexing="ij")
    params = {"E_dc": E.ravel(), "omega": W.ravel()}

    mesh = make_mesh((2,), ("sweep",))
    sw = ParameterSweep(SimConfig(**base, impl="pallas"), params,
                        mesh=mesh)
    assert sw._use_stack_engine()
    res = sw.run()
    assert sw._stack_runner.per_omega

    ref = ParameterSweep(SimConfig(**base, impl="xla"), params).run()
    np.testing.assert_array_equal(np.asarray(res["av_count"]),
                                  np.asarray(ref["av_count"]))
    for k in OBS:
        np.testing.assert_allclose(
            np.asarray(res[k]), np.asarray(ref[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


def test_stack_engine_per_omega_auto_gate(monkeypatch):
    """impl=auto keeps omega sweeps on the vmapped engine until the
    per-omega kernel has a measured chip win (PER_OMEGA_AUTO flips it;
    docs/PERF.md "Per-omega stacked sweeps").  Non-omega sweeps stay on
    the stacked kernel; explicit impl=pallas still forces per-omega."""
    import slb2d_tpu.parallel.sweep as swmod

    cfg = SimConfig(**CFG, impl="auto")
    sw_edc = ParameterSweep(cfg, PARAMS)
    sw_om = ParameterSweep(cfg, {"omega": np.array([9.0, 10.0])})
    sw_forced = ParameterSweep(SimConfig(**CFG, impl="pallas"),
                               {"omega": np.array([9.0, 10.0])})

    monkeypatch.setattr(swmod.jax, "default_backend", lambda: "tpu")
    assert sw_edc._use_stack_engine()
    assert not sw_om._use_stack_engine()
    assert sw_forced._use_stack_engine()
    monkeypatch.setattr(swmod, "PER_OMEGA_AUTO", True)
    assert sw_om._use_stack_engine()
