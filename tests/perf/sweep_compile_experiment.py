"""Measure the sweep cold-start compile / throughput tradeoff vs scan
unroll (run manually on the real TPU; one process at a time):

    PYTHONPATH=/root/.axon_site:$PYTHONPATH \
        python tests/perf/sweep_compile_experiment.py [unroll ...]

Motivation (docs/PERF.md "Interactive sweep refinement latency"): the
first grid of a sweep session costs ~190 s of XLA compile on this box,
and compile cost is scan-body dominated — unroll=4 (the TPU default,
ops/stencil.default_scan_unroll) quadruplicates the scan body.  This
experiment times, per unroll factor, (a) the cold compile+run of the
full-length sweep scan and (b) the steady-state re-run throughput, at the
BASELINE #2 absorption-map shape (64-point E_dc sweep, N=40, M=500).
"""

import sys
import time

import numpy as np


def main():
    unrolls = [int(u) for u in sys.argv[1:]] or [1, 4]
    import jax
    import jax.numpy as jnp

    from slb2d_tpu.config import SimConfig
    from slb2d_tpu.parallel.sweep import ParameterSweep, _run_sweep

    cfg = SimConfig(display=4, E_dc=1.0, E_omega=2.0, omega=1.0, mu=1.0,
                    alpha=0.9495, n_harmonics=40, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=1.0, g_grid=500,
                    dt=1e-3, quiet=True)
    sw = ParameterSweep(cfg, {"E_dc": np.linspace(0.1, 3.0, 64)})
    weights = dict(w_d4=jnp.asarray(sw.base.w_d4),
                   w_d4_phi=jnp.asarray(sw.base.w_d4_phi),
                   w_norm=jnp.asarray(sw.base.w_norm))
    D = sw.base.np_dtype
    agg_updates = 2 * (sw.base.N + 1) * (sw.base.M + 1) * sw.n_steps * sw.B
    print(f"# B=64 N=40 M=500, n_steps={sw.n_steps}")

    for unroll in unrolls:
        cap0 = {k: jnp.zeros((sw.B,), D)
                for k in ("v_dr", "v_y", "m_x", "norm")}
        states = sw._initial_states()
        np.asarray(states.t)
        t0 = time.perf_counter()
        states, cap = _run_sweep(sw.consts, states, cap0, weights,
                                 in_axes=sw.in_axes, n_steps=sw.n_steps,
                                 unroll=unroll)
        np.asarray(cap["norm"])          # fetch barrier (tunnel-safe)
        cold = time.perf_counter() - t0
        time.sleep(5)                    # let the tunnel settle
        t0 = time.perf_counter()
        states, cap = _run_sweep(sw.consts, states, cap0, weights,
                                 in_axes=sw.in_axes, n_steps=sw.n_steps,
                                 unroll=unroll)
        np.asarray(cap["norm"])
        warm = time.perf_counter() - t0
        print(f"unroll={unroll}: cold compile+run {cold:.1f} s, "
              f"warm re-run {warm:.2f} s "
              f"({agg_updates / warm:.3g} agg updates/s)")


if __name__ == "__main__":
    main()
