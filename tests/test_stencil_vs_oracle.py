"""Vectorized JAX stepper vs the literal numpy transcription of the C solver.

Validates the masked-roll stencil (shifts, bounds, n=0/1 special cases,
buffer-staleness emulation) step-by-step on a tiny grid.
"""

import numpy as np
import pytest

from slb2d_tpu.config import SimConfig
from slb2d_tpu.models.superlattice import SuperlatticeModel
from slb2d_tpu.ops import stencil

from tests.oracle.c_transcription import CTranscription

f32 = np.float32
f64 = np.float64

PARAMS = dict(E_dc=1.0, E_omega=2.0, omega=1.0, mu=1.0, alpha=0.9,
              B=0.4, t_start=0.01)
TINY = dict(n_harmonics=6, g_grid=12, dt=1e-3)


def make_pair(do_av):
    cfg = SimConfig(display=4, phi_y_min=-3.0, phi_y_max=3.0,
                    **PARAMS, **TINY)
    model = SuperlatticeModel(cfg)
    c = stencil.consts_from_model(model)
    state = stencil.bootstrap_state(c, model)
    oracle = CTranscription(
        N=TINY["n_harmonics"], M=TINY["g_grid"], dt=TINY["dt"],
        PhiYmin=-3.0, PhiYmax=3.0, **PARAMS)
    return model, c, state, oracle


def host_trig(oracle, t):
    om, dt = oracle.omega, oracle.dt
    t_hs = f32(t + dt / 2)
    return (
        f32(np.cos(f64(f32(om * t)))),
        f32(np.cos(f64(f32(om * f32(t + dt))))),
        f32(np.cos(f64(f32(om * t_hs)))),
        f32(np.cos(f64(f32(om * f32(t_hs + dt))))),
        f32(np.cos(f64(f32(om * t)))),
        f32(np.sin(f64(f32(om * t)))),
    )


def unpad(model, arr):
    return np.asarray(arr)[:model.NH, :model.MS]


def test_bootstrap_matches():
    model, c, state, oracle = make_pair("none")
    np.testing.assert_array_equal(unpad(model, state.a), oracle.a[0])
    np.testing.assert_allclose(unpad(model, state.a_hs), oracle.a[2],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(unpad(model, state.b_hs), oracle.b[2],
                               rtol=1e-6, atol=1e-9)
    # padding stays zero
    assert np.all(np.asarray(state.a_hs)[model.NH:, :] == 0)
    assert np.all(np.asarray(state.a_hs)[:, model.MS:] == 0)


@pytest.mark.parametrize("n_steps", [1, 2, 3, 25])
def test_steps_match_transcription(n_steps):
    model, c, state, oracle = make_pair("always")
    for _ in range(n_steps):
        trig = host_trig(oracle, oracle.t)
        state = stencil.full_step(c, state, trig, True)
        oracle.run_steps(1, do_av="always")

    cur, ch = oracle.current, oracle.current_hs
    tol = dict(rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(unpad(model, state.a), oracle.a[cur], **tol)
    np.testing.assert_allclose(unpad(model, state.b), oracle.b[cur], **tol)
    np.testing.assert_allclose(unpad(model, state.a_hs), oracle.a[ch], **tol)
    np.testing.assert_allclose(unpad(model, state.b_hs), oracle.b[ch], **tol)
    np.testing.assert_allclose(np.asarray(state.av)[:6], oracle.av_data,
                               rtol=2e-5, atol=1e-9)


def test_hs_edge_column_staleness():
    """Column M+1 of the half-step arrays must alternate between its
    bootstrap value and 0 (4-buffer rotation artifact, SURVEY.md §0)."""
    model, c, state, oracle = make_pair("none")
    e = model.M + 1
    boot_col = np.asarray(state.a_hs)[:, e].copy()
    assert np.any(boot_col != 0)
    for k in range(1, 6):
        trig = host_trig(oracle, oracle.t)
        state = stencil.full_step(c, state, trig, False)
        oracle.run_steps(1)
        # vs oracle: tolerance (XLA vs numpy differ by ~1 ulp via FMA)
        np.testing.assert_allclose(
            np.asarray(state.a_hs)[:model.NH, e],
            oracle.a[oracle.current_hs][:, e], rtol=1e-6, atol=1e-12)
        # vs self: the carried edge column must be an exact parity pattern
        expected = boot_col if k % 2 == 0 else np.zeros_like(boot_col)
        np.testing.assert_array_equal(np.asarray(state.a_hs)[:, e], expected)
