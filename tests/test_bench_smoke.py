"""Smoke coverage for bench.py — the driver contract file.

The real benchmark runs on the TPU (`python bench.py`); these tests pin
the bench harness itself (builders, runners, metric arithmetic) on tiny
CPU shapes so an API drift in the package cannot silently break the
round-end benchmark run.
"""

import json
import os
import time

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


def test_probe_backend_cpu_success():
    # force the subprocess onto the CPU backend (strip the axon plugin)
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ""}
    platform, err = bench.probe_backend(deadline=120, env=env)
    assert err is None
    assert platform == "cpu"


def test_probe_backend_failure_is_bounded_and_reasoned():
    env = {**os.environ, "JAX_PLATFORMS": "no_such_backend",
           "PYTHONPATH": ""}
    t0 = time.perf_counter()
    platform, err = bench.probe_backend(deadline=120, env=env)
    assert platform is None
    assert err and "no_such_backend" in err
    assert time.perf_counter() - t0 < 60       # fails fast, not at deadline


def test_emit_error_is_one_parseable_json_line(capsys):
    bench.emit_error("tunnel down")
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["error"] == "tunnel down"
    assert rec["value"] is None and "metric" in rec


def test_backend_error_classifier():
    assert bench._is_backend_error(
        RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE"))
    assert not bench._is_backend_error(ValueError("bad shape"))


def test_bench_driver_metric(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ups, wall, steps = bench.bench_driver("xla", N=6, M=24, t_start=0.05)
    assert steps > 0 and wall > 0
    expected = 2 * 7 * 25 * steps / wall
    assert abs(ups - expected) / expected < 1e-12
