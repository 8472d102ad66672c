"""Lane-packed pallas sweep megakernel vs the vmapped XLA sweep engine
(interpreter mode on CPU; bench.py `sweep pallas` runs it compiled).

The two engines share the stencil math (ops/stencil.apply_half_step) but
differ in layout (points packed along lanes vs a vmapped batch axis) and
reduction order (MXU segment matmul vs row sums) — equality to f32
accumulation tolerance over hundreds of steps is the correctness bar."""

import numpy as np
import pytest

import jax

from slb2d_tpu.config import SimConfig
from slb2d_tpu.ops.sweep_pallas import run_sweep_pallas
from slb2d_tpu.parallel.sweep import ParameterSweep


def _xla_reference(sw, n_steps):
    from slb2d_tpu.parallel.sweep import _run_sweep

    D = sw.base.np_dtype
    cap0 = {k: jax.numpy.zeros((sw.B,), D)
            for k in ("v_dr", "v_y", "m_x", "norm")}
    weights = dict(
        w_d4=jax.numpy.asarray(sw.base.w_d4),
        w_d4_phi=jax.numpy.asarray(sw.base.w_d4_phi),
        w_norm=jax.numpy.asarray(sw.base.w_norm),
    )
    return _run_sweep(sw.consts, sw._initial_states(), cap0, weights,
                      in_axes=sw.in_axes, n_steps=n_steps, unroll=1)


@pytest.fixture(scope="module")
def sweeps():
    cfg = SimConfig(display=4, E_dc=1.0, E_omega=2.0, omega=20.0, mu=1.0,
                    alpha=0.9495, n_harmonics=6, phi_y_min=-5.0,
                    phi_y_max=5.0, B=0.1, t_start=0.02, g_grid=29, dt=1e-3,
                    quiet=True, dtype="f32")
    # E_dc sweep + one dc-only point (E_omega=0: averaging must stay off)
    sw = ParameterSweep(cfg, {"E_dc": np.linspace(0.5, 2.0, 3),
                              "E_omega": np.asarray([2.0, 2.0, 0.0])})
    return sw


def test_sweep_pallas_matches_xla(sweeps):
    sw = sweeps
    av, cap, state = run_sweep_pallas(sw)
    (ref_states, ref_cap) = _xla_reference(sw, sw.n_steps)

    ref_av = np.asarray(ref_states.av)          # (B, 8)
    np.testing.assert_allclose(av[:, 0], ref_av[:, 0], rtol=0)  # counts
    np.testing.assert_allclose(av, ref_av, rtol=2e-4, atol=1e-7)
    for k in ("v_dr", "v_y", "m_x", "norm"):
        np.testing.assert_allclose(cap[k], np.asarray(ref_cap[k]),
                                   rtol=2e-4, atol=1e-7, err_msg=k)
    # packed state segments == vmapped per-point states
    MP = sw.base.MP
    a_p = np.asarray(state[0])
    for b in range(sw.B):
        np.testing.assert_allclose(
            a_p[:, b * MP:(b + 1) * MP], np.asarray(ref_states.a[b]),
            rtol=2e-4, atol=1e-7, err_msg=f"point {b}")
    # the dc-only point must have no averaging samples
    assert av[2, 0] == 0


def test_sweep_pallas_chunked_launches(sweeps):
    """max_points smaller than B: chunked launches (padded tail, shared
    compiled kernel) must agree with the single launch."""
    sw = sweeps
    av1, cap1, st1 = run_sweep_pallas(sw)
    av2, cap2, st2 = run_sweep_pallas(sw, max_points=2)
    np.testing.assert_array_equal(av2, av1)
    for k in cap1:
        np.testing.assert_array_equal(cap2[k], cap1[k])
    for x1, x2 in zip(st1, st2):
        np.testing.assert_array_equal(np.asarray(x2), np.asarray(x1))
