"""Benchmark: lattice-site updates/sec on the flagship single-chip config.

Metric (BASELINE.md): site-updates/sec = 2*(N+1)*(M+1)*steps / wall, on
BASELINE config #4 (n-harmonics=100, g-grid=4000, float32, fast device-side
trig, no host syncs inside the timed region).  Baseline to beat: 1e9
updates/sec (the reference publishes no numbers; this is the driver-set
north star for 1x TPU v5e).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

import jax
import numpy as np

from slb2d_tpu.config import SimConfig, open_out as cfgmod_open_out
from slb2d_tpu.models.superlattice import SuperlatticeModel
from slb2d_tpu.ops import stencil

BASELINE = 1e9  # updates/sec north star (BASELINE.json)

# Backend-init on the axon tunnel retries in-process for ~45 min when the
# tunnel is down (observed round 4: one outage erased the round artifact,
# BENCH_r04.json rc=124/parsed=null).  Every bench mode therefore probes the
# backend FIRST in a subprocess with a hard deadline; on failure we emit one
# parseable JSON error line and exit instead of wedging.  Killing the probe
# is safe when init itself hangs (no chip acquired).  In the half-up case —
# init succeeds, then the one tiny probe op hangs — the kill does risk
# wedging the tunnel for minutes (CLAUDE.md), and that tradeoff is
# deliberate: a bounded kill of one 8-element op beats the observed
# alternative, a ~45-min unbounded hang ending in the harness SIGKILLing a
# full bench run mid-flight.
PROBE_DEADLINE = float(os.environ.get("SLB2D_BENCH_PROBE_DEADLINE", "120"))

_PROBE_CODE = """\
import jax, jax.numpy as jnp, numpy as np
d = jax.devices()
# init alone can succeed while the tunnel is half-up: run one op end-to-end
x = np.asarray(jnp.arange(8.0) * 2.0)
assert x[7] == 14.0
print("PROBE_OK", d[0].platform, len(d))
"""


def probe_backend(deadline=PROBE_DEADLINE, env=None):
    """Bounded end-to-end backend check in a subprocess.

    Returns (platform, None) on success or (None, reason) on failure;
    never blocks longer than `deadline` seconds.
    """
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                           capture_output=True, text=True, timeout=deadline,
                           env=env)
    except subprocess.TimeoutExpired:
        return None, f"backend init/compute exceeded {deadline:.0f}s deadline"
    for line in r.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            return line.split()[1], None
    tail = [ln for ln in (r.stderr or "").strip().splitlines() if ln]
    return None, (tail[-1][-300:] if tail else f"probe rc={r.returncode}")


def emit_error(reason, metric="lattice-site updates/sec"):
    """One parseable JSON line on failure — the round artifact must parse
    even when the tunnel is down (VERDICT r4 Missing #2)."""
    print(json.dumps({
        "metric": metric,
        "value": None,
        "unit": "updates/sec",
        "vs_baseline": None,
        "error": reason,
    }))


def _is_backend_error(e):
    s = str(e)
    return ("Unable to initialize backend" in s or "UNAVAILABLE" in s
            or "DEADLINE_EXCEEDED" in s)


def build(impl: str, N=100, M=4000, dtype="f32"):
    cfg = SimConfig(display=8, E_dc=1.0, E_omega=2.0, omega=1.0, mu=1.0,
                    alpha=0.9495, n_harmonics=N, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=10.0, g_grid=M, dt=1e-3,
                    impl=impl, dtype=dtype)
    model = SuperlatticeModel(cfg)
    c = stencil.consts_from_model(model)
    state = stencil.bootstrap_state(c, model)
    if impl == "pallas":
        from slb2d_tpu.ops.stepper_pallas import make_pallas_runner
        run = make_pallas_runner(c, model, av_enabled=False)
    elif impl == "stream":
        from slb2d_tpu.ops.stepper_stream import make_stream_runner
        run = make_stream_runner(c, model, av_enabled=False)
    else:
        step = stencil.make_step_fn(c, av_enabled=False, exact_trig=False)
        unroll = stencil.default_scan_unroll()

        def body(s, n_steps):
            return jax.lax.scan(step, s, None, length=n_steps,
                                unroll=unroll)[0]

        run = jax.jit(body, static_argnums=1, donate_argnums=0)
    return model, state, run


def bench(impl: str, chunk=1000, reps=20, N=100, M=4000, dtype="f32"):
    model, state, run = build(impl, N, M, dtype)
    # warmup / compile; a full host fetch is the only reliable barrier on
    # the axon tunnel platform (block_until_ready returns early there)
    state = run(state, chunk)
    np.asarray(state.a)
    t0 = time.perf_counter()
    for _ in range(reps):
        state = run(state, chunk)
    a_host = np.asarray(state.a)   # true barrier: materialize the result
    wall = time.perf_counter() - t0
    assert np.all(np.isfinite(a_host)), "state went non-finite"
    steps = chunk * reps
    updates = 2 * (model.N + 1) * (model.M + 1) * steps
    return updates / wall, wall, steps


def bench_driver(impl: str, N=100, M=4000, t_start=10.0, exact_time=True,
                 display=4):
    """End-to-end product throughput: the real Simulation driver (schedule
    generation, chunked scan, emission machinery, final output write) at
    BASELINE #4 shape.  Compile time is excluded via Simulation.warmup();
    a short settle follows it because on this 1-core box the axon tunnel
    process steals the CPU for a few seconds after heavy compile/device
    activity, which would otherwise be misattributed to the driver."""
    import os
    import tempfile

    from slb2d_tpu.runtime.loop import Simulation

    cfg = SimConfig(display=display, E_dc=1.0, E_omega=2.0, omega=1.0,
                    mu=1.0, alpha=0.9495, n_harmonics=N, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=t_start, g_grid=M,
                    dt=1e-3, impl=impl, quiet=True, exact_time=exact_time,
                    out_file="obs.txt")
    cwd = os.getcwd()
    os.chdir(tempfile.mkdtemp())
    try:
        sim = Simulation(cfg)
        sim.warmup()
        time.sleep(10)
        # best of 5 full runs: this box's tunnel process steals the single
        # CPU core in bursts, inflating individual walls by up to ~30%;
        # each rep is sub-second after warmup so extra reps are nearly free
        wall = float("inf")
        for rep in range(5):
            if rep:
                sim.state = stencil.bootstrap_state(sim.c, sim.model)
                sim.t0 = 0.0
                sim.steps_done = 0
                sim.frame_number = 1
                sim.frame_time = 0.0
                sim.out = cfgmod_open_out(cfg)
            t0 = time.perf_counter()
            sim.run()
            wall = min(wall, time.perf_counter() - t0)
    finally:
        os.chdir(cwd)
    steps = sim.steps_done
    updates = 2 * (sim.model.N + 1) * (sim.model.M + 1) * steps
    return updates / wall, wall, steps


def _sweep_params(B, axis="E_dc"):
    """The swept grid: E_dc (BASELINE #2) or omega (the per-omega kernel
    mode — a primary absorption-map axis, VERDICT r3 Missing #2)."""
    if axis == "omega":
        return {"omega": np.linspace(0.8, 1.2, B)}
    return {"E_dc": np.linspace(0.1, 3.0, B)}


def bench_sweep_stack(B=64, N=40, M=500, K=6144, axis="E_dc"):
    """Sublane-stacked VMEM-resident sweep megakernel (ops/sweep_stack.py)
    at the BASELINE #2 shape, compile-excluded."""
    from slb2d_tpu.parallel.sweep import ParameterSweep
    from slb2d_tpu.ops.sweep_stack import SweepStackRunner, CAP_KEYS

    cfg = SimConfig(display=4, E_dc=1.0, E_omega=2.0, omega=1.0, mu=1.0,
                    alpha=0.9495, n_harmonics=N, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=0.1, g_grid=M, dt=1e-3,
                    impl="pallas")
    sw = ParameterSweep(cfg, _sweep_params(B, axis))
    runner = SweepStackRunner(sw)
    D = sw.base.np_dtype
    cap = {k: np.zeros(B, D) for k in CAP_KEYS}

    def adv(states, k):
        if runner.per_omega:
            nonlocal cap
            states, cap = runner.advance(states, k, cap=cap)
            return states
        return runner.advance(states, k)

    states = sw._initial_states()
    states = adv(states, 512)                     # compile + warm
    np.asarray(states.av)
    time.sleep(5)
    t0 = time.perf_counter()
    states = adv(states, K)
    # barrier: av is a tiny (B, 8) fetch that CHAINS through every
    # launch's kernel output (states.t is schedule-derived and would not
    # synchronize; fetching the full state would bill a multi-MB tunnel
    # transfer to the kernel)
    np.asarray(states.av)
    wall = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(states.a)))   # outside the wall
    agg = 2 * (N + 1) * (M + 1) * K * B
    return agg / wall, wall, K


def bench_sweep_pallas(B=64, N=40, M=500):
    """Lane-packed pallas sweep kernel: the full 64-point one-period
    absorption-map run (BASELINE #2 shape), compile-excluded."""
    from slb2d_tpu.parallel.sweep import ParameterSweep
    from slb2d_tpu.ops.sweep_pallas import make_sweep_pallas_runner

    cfg = SimConfig(display=4, E_dc=1.0, E_omega=2.0, omega=1.0, mu=1.0,
                    alpha=0.9495, n_harmonics=N, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=0.1, g_grid=M, dt=1e-3)
    sw = ParameterSweep(cfg, {"E_dc": np.linspace(0.1, 3.0, B)})
    runner = make_sweep_pallas_runner(sw)
    runner()                       # compile + warm
    time.sleep(3)
    t0 = time.perf_counter()
    runner()
    wall = time.perf_counter() - t0
    agg = 2 * (N + 1) * (M + 1) * sw.n_steps * B
    return agg / wall, wall, sw.n_steps


def bench_sweep(B=64, K=1000, reps=6, N=40, M=500, axis="E_dc"):
    """Aggregate sweep throughput (BASELINE #2 shape, vmapped XLA engine),
    compile-excluded: a 64-point sweep advanced in timed chunks."""
    from slb2d_tpu.parallel.sweep import ParameterSweep
    from slb2d_tpu.ops import stencil as _st

    cfg = SimConfig(display=4, E_dc=1.0, E_omega=2.0, omega=1.0, mu=1.0,
                    alpha=0.9495, n_harmonics=N, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=0.1, g_grid=M, dt=1e-3)
    sw = ParameterSweep(cfg, _sweep_params(B, axis))
    consts, in_axes = sw.consts, sw.in_axes

    def point_step(c, st):
        trig = _st.device_trig(c, st.t)
        do_av = (c.E_omega > 0) & (st.t >= c.t_start) & (st.t < c.t_end)
        return _st.full_step(c, st, trig, do_av)

    unroll = 1        # the production sweep setting (parallel/sweep.py)

    def run_all(consts, states):
        def body(st, _):
            return jax.vmap(point_step, in_axes=(in_axes, 0))(consts, st), None
        return jax.lax.scan(body, states, None, length=K, unroll=unroll)[0]

    run = jax.jit(run_all, donate_argnums=1)
    states = sw._initial_states()
    states = run(consts, states)
    np.asarray(states.t)          # compile barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        states = run(consts, states)
    np.asarray(states.t)
    wall = time.perf_counter() - t0
    agg = 2 * (N + 1) * (M + 1) * K * reps * B
    return agg / wall, wall, K * reps


def bench_movie(frame_batch=8, N=20, M=1000, t_start=0.3, omega=10.0):
    """Display-7 (movie mode) wall clock at BASELINE #3 shape: frames
    reconstructed on the MXU, batched device->host, formatted natively."""
    import os
    import glob
    import tempfile

    from slb2d_tpu.runtime.loop import Simulation

    cfg = SimConfig(display=7, E_dc=1.0, E_omega=2.0, omega=omega, mu=1.0,
                    alpha=0.9495, n_harmonics=N, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=t_start, g_grid=M,
                    dt=1e-3, quiet=True, frame_batch=frame_batch)
    cwd = os.getcwd()
    os.chdir(tempfile.mkdtemp())
    try:
        sim = Simulation(cfg)
        sim.warmup()
        time.sleep(5)
        t0 = time.perf_counter()
        sim.run()
        wall = time.perf_counter() - t0
        frames = len(glob.glob("frame*.data"))
    finally:
        os.chdir(cwd)
    return wall, frames, sim.steps_done


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "auto"
    # Fail fast with a parseable artifact if the backend is unreachable;
    # SLB2D_BENCH_NO_PROBE=1 skips the ~15 s probe (e.g. CPU-only tests).
    if os.environ.get("SLB2D_BENCH_NO_PROBE") != "1":
        platform, err = probe_backend()
        if err is not None:
            emit_error(f"backend probe failed: {err}")
            sys.exit(1)
        # a fast axon-init failure can fall back to the CPU backend: a
        # well-formed CPU number recorded as the TPU round artifact would
        # be worse than a parse failure.  Accept only TPU-class platforms
        # unless the caller says otherwise.
        allowed = os.environ.get("SLB2D_BENCH_PLATFORMS", "tpu,axon")
        if platform not in allowed.split(","):
            emit_error(f"backend probe landed on '{platform}', expected "
                       f"one of [{allowed}] (set SLB2D_BENCH_PLATFORMS "
                       f"to override)")
            sys.exit(1)
    try:
        _dispatch(impl)
    except Exception as e:         # tunnel died mid-bench: artifact > trace
        if _is_backend_error(e):
            emit_error(f"backend lost mid-bench: {str(e)[:300]}")
            sys.exit(1)
        raise


def _dispatch(impl):
    if impl == "movie":
        fb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        wall, frames, steps = bench_movie(frame_batch=fb)
        print(json.dumps({
            "metric": (f"display-7 movie frames/sec (N=20 M=1000, "
                       f"frame-batch={fb})"),
            "value": round(frames / wall, 2),
            "unit": "frames/sec",
            "vs_baseline": None,
        }))
        return
    if impl == "sweep":
        # python bench.py sweep [xla|stack|pallas] [E_dc|omega]
        sub = sys.argv[2] if len(sys.argv) > 2 else "xla"
        axis = sys.argv[3] if len(sys.argv) > 3 else "E_dc"
        if sub == "pallas":
            ups, wall, steps = bench_sweep_pallas()
        elif sub == "stack":
            ups, wall, steps = bench_sweep_stack(axis=axis)
        else:
            ups, wall, steps = bench_sweep(axis=axis)
        print(json.dumps({
            "metric": ("aggregate sweep site-updates/sec "
                       f"(64-point {axis} sweep, N=40 M=500, {sub})"),
            "value": round(ups),
            "unit": "updates/sec",
            "vs_baseline": round(ups / BASELINE, 3),
        }))
        return
    if impl == "f64":
        # f64 verification-mode throughput (VERDICT r3 Weak #3): the XLA
        # scan engine under jax_enable_x64 — the mode that rigorously
        # meets the <=1e-6 BASELINE fidelity bar (docs/DEVIATIONS.md D7).
        # Usage: python bench.py f64 [M] [N]
        jax.config.update("jax_enable_x64", True)
        M = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
        N = int(sys.argv[3]) if len(sys.argv) > 3 else 100
        ups, wall, steps = bench("xla", M=M, N=N, dtype="f64")
        print(json.dumps({
            "metric": (f"lattice-site updates/sec (N={N} M={M}, xla "
                       f"engine, f64 verification mode)"),
            "value": round(ups),
            "unit": "updates/sec",
            "vs_baseline": round(ups / BASELINE, 3),
        }))
        return
    if impl == "driver":
        # end-to-end driver bench:
        #   python bench.py driver [impl] [exact|fast] [display]
        sub = sys.argv[2] if len(sys.argv) > 2 else "auto"
        exact = (sys.argv[3] != "fast") if len(sys.argv) > 3 else True
        display = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        ups, wall, steps = bench_driver(sub, exact_time=exact,
                                        display=display)
        print(json.dumps({
            "metric": (f"end-to-end slb2d driver updates/sec "
                       f"(N=100 M=4000, display={display}, impl={sub}, "
                       f"{'exact' if exact else 'fast'}-time)"),
            "value": round(ups),
            "unit": "updates/sec",
            "vs_baseline": round(ups / BASELINE, 3),
        }))
        return
    if impl == "auto":
        # headline metric: the END-TO-END driver (real Simulation, chunked
        # pallas scan, schedule, emission machinery) — the product number,
        # not a kernel microbenchmark.  Falls back to the raw kernel bench
        # (xla engine last) if the driver path cannot run.
        try:
            ups, wall, steps = bench_driver("auto")
            name = "end-to-end driver, pallas"
        except Exception as e:
            # a backend outage must NOT cascade into further bench attempts
            # (each would re-enter the same multi-minute init — the exact
            # failure that nulled BENCH_r04); re-raise for main()'s handler
            if _is_backend_error(e):
                raise
            print(f"# driver bench failed ({e}); kernel bench",
                  file=sys.stderr)
            try:
                name = "pallas kernel"
                ups, wall, steps = bench("pallas")
            except Exception as e2:
                if _is_backend_error(e2):
                    raise
                print(f"# pallas failed ({e2}); falling back to xla",
                      file=sys.stderr)
                name = "xla kernel"
                ups, wall, steps = bench("xla")
    else:
        # kernel-only: python bench.py {pallas,stream,xla} [M] [N]
        M = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
        N = int(sys.argv[3]) if len(sys.argv) > 3 else 100
        ups, wall, steps = bench(impl, M=M, N=N)
        print(json.dumps({
            "metric": f"lattice-site updates/sec (N={N} M={M}, {impl})",
            "value": round(ups),
            "unit": "updates/sec",
            "vs_baseline": round(ups / BASELINE, 3),
        }))
        return
    print(json.dumps({
        "metric": f"lattice-site updates/sec (N=100 M=4000, {name})",
        "value": round(ups),
        "unit": "updates/sec",
        "vs_baseline": round(ups / BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
