"""Measure the stack engine's single-point VMEM residency bound on the
real chip (sweep_stack.MAX_POINT_ELEMS is carried over from the
megakernel's measured ~1.0M bound; this probes the stack kernel itself).

For each probe shape (N=100 -> NHP=104, varying g-grid), builds a 2-point
E_dc sweep, forces the stack engine at G=1, and attempts ONE advance
chunk (compile + run).  A Mosaic scoped-stack overflow surfaces as a
compile error; record pass/fail per NHP*MP.

Run ON THE CHIP (one process, no timeout-kill):
    python tests/perf/stack_bound_probe.py 9473 10241 11265 12161
(g-grid values; MP = g-grid+3 padded to 128 -> 9600/10368/11392/12288)
"""

import sys
import time
import traceback

import numpy as np


def probe(g_grid: int) -> None:
    from slb2d_tpu.config import SimConfig
    from slb2d_tpu.ops.sweep_stack import SweepStackRunner
    from slb2d_tpu.parallel.sweep import ParameterSweep

    cfg = SimConfig(display=4, E_dc=1.0, E_omega=2.0, omega=10.0, mu=1.0,
                    alpha=0.9495, n_harmonics=100, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=0.2, g_grid=g_grid,
                    dt=1e-3, quiet=True, impl="pallas")
    sw = ParameterSweep(cfg, {"E_dc": np.array([0.5, 1.0])})
    NHP, MP = sw.base.NHP, sw.base.MP
    t0 = time.time()
    try:
        runner = SweepStackRunner(sw, interpret=False, g_points=1)
        states = sw._initial_states()
        out = runner.advance(states, 64)
        a = np.asarray(out.a)           # fetch = the axon barrier
        ok = bool(np.all(np.isfinite(a)))
        print(f"PROBE g-grid={g_grid} NHP*MP={NHP * MP} "
              f"({NHP}x{MP}): {'OK' if ok else 'NONFINITE'} "
              f"in {time.time() - t0:.1f}s", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"PROBE g-grid={g_grid} NHP*MP={NHP * MP} "
              f"({NHP}x{MP}): FAIL after {time.time() - t0:.1f}s: "
              f"{type(e).__name__}: {msg}", flush=True)
        traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    for g in [int(a) for a in sys.argv[1:]] or [9473]:
        probe(g)
