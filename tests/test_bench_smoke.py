"""Smoke coverage for bench.py — the driver contract file.

The real benchmark runs on the TPU (`python bench.py`); these tests pin
the bench harness itself (builders, runners, metric arithmetic) on tiny
CPU shapes so an API drift in the package cannot silently break the
round-end benchmark run.
"""

import numpy as np

import bench


def test_bench_build_and_run_xla():
    model, state, run = bench.build("xla", N=6, M=24)
    state = run(state, 10)
    a = np.asarray(state.a)
    assert a.shape == (model.NHP, model.MP)
    assert np.all(np.isfinite(a))
    assert int(state.step) == 10


def test_bench_build_and_run_pallas_interpret():
    # on CPU the pallas runner auto-selects interpreter mode
    model, state, run = bench.build("pallas", N=6, M=24)
    state = run(state, 4)
    assert np.all(np.isfinite(np.asarray(state.a)))


def test_bench_sweep_stack_axes():
    # both sweep axes exercise the stacked megakernel bench path; omega
    # takes the per-omega mode (recurrence trig chains, rolled captures)
    for axis in ("E_dc", "omega"):
        ups, wall, steps = bench.bench_sweep_stack(B=4, N=6, M=32, K=64,
                                                   axis=axis)
        assert steps == 64 and ups > 0 and wall > 0


def test_bench_driver_metric(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ups, wall, steps = bench.bench_driver("xla", N=6, M=24, t_start=0.05)
    assert steps > 0 and wall > 0
    expected = 2 * 7 * 25 * steps / wall
    assert abs(ups - expected) / expected < 1e-12
