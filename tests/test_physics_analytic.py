"""Analytic physics validation: the Esaki-Tsu drift characteristic.

For a dc-only drive (E_omega=0) with no magnetic field (B=0) the harmonic
rows decouple (the bdt cross-coupling vanishes) and the semi-implicit
scheme (reference: src/boltzmann_c_solver.c:355-382) reduces to exact
Crank-Nicolson per harmonic:

    (nu) a' + (mu) b' = dt*a0 + (nu_tilde) a - (mu) b
   -(mu) a' + (nu) b' =            (nu_tilde) b + (mu) a

whose fixed point solves the CONTINUOUS steady state exactly, for any dt:

    a_n = a0_n / (1 + (n E)^2),     b_n = n E * a_n.

With the display multipliers (src/boltzmann_c_solver.c:247-249) the
steady-state observables then have closed forms in which every Bessel
factor cancels or appears identically on both sides:

    v_dr   -> 2 E / (1 + E^2)                  (Esaki-Tsu peak at E = 1)
    m/m_x  -> alpha * I_1(mu) / (I_0(mu) * (1 + E^2))
    v_y    -> 0
    norm   -> 1

The reference ships no such test (SURVEY.md §4: its only invariant check
was printing the norm); this pins the whole pipeline -- equilibrium
builder, stencil, observable weights, multipliers -- against physics
rather than against a recorded binary run.  Residual error sources are
the relaxation transient (e^{-t_start} ~ 2e-9 at t_start=20) and the
Riemann-sum quadrature of the Gaussian (exponentially small at
dPhi=0.1), so f64 tolerances can be tight.
"""

import numpy as np

from slb2d_tpu.config import SimConfig
from slb2d_tpu.models.bessel import bessel_In
from slb2d_tpu.parallel import ParameterSweep

MU = 1.3
ALPHA = 0.9495

CFG = dict(display=4, E_dc=1.0, E_omega=0.0, omega=1.0, mu=MU,
           alpha=ALPHA, n_harmonics=8, phi_y_min=-10.0, phi_y_max=10.0,
           B=0.0, t_start=20.0, g_grid=200, dt=5e-3, quiet=True,
           dtype="f64")


def test_esaki_tsu_drift_characteristic():
    e_dcs = np.array([0.25, 0.5, 1.0, 1.5, 2.0, 3.0])
    cfg = SimConfig(**CFG)
    res = ParameterSweep(cfg, {"E_dc": e_dcs}).run()

    expected_v_dr = 2 * e_dcs / (1 + e_dcs**2)
    np.testing.assert_allclose(res["v_dr_inst"], expected_v_dr, rtol=1e-7,
                               err_msg="Esaki-Tsu v_dr(E) = 2E/(1+E^2)")

    ratio = bessel_In(1, MU) / bessel_In(0, MU)
    expected_m_x = ALPHA * ratio / (1 + e_dcs**2)
    np.testing.assert_allclose(res["m_over_m_x_inst"], expected_m_x,
                               rtol=1e-7)

    # a_0 never moves for a dc drive (mu_t ~ n vanishes at n=0), so the
    # transverse velocity is the symmetric-Gaussian first moment (== 0)
    # and the norm is the equilibrium normalization (== 1)
    np.testing.assert_allclose(res["v_y_inst"], 0.0, atol=1e-12)
    np.testing.assert_allclose(res["norm"], 1.0, rtol=1e-10)

    # dc-only points never enter the averaging branch (E_omega > 0 gate,
    # src/boltzmann_c_solver.c:188): all period averages stay zero
    assert np.all(res["av_count"] == 0)
    np.testing.assert_array_equal(res["A"], 0.0)


def test_steady_state_is_dt_independent():
    """The CN fixed point is exact for ANY stable dt: two very different
    step sizes must land on the same steady state (the discretization
    error lives only in the transient, which has decayed)."""
    cfg_coarse = SimConfig(**{**CFG, "dt": 8e-3})
    cfg_fine = SimConfig(**{**CFG, "dt": 1e-3})
    e = np.array([0.7, 1.0])
    coarse = ParameterSweep(cfg_coarse, {"E_dc": e}).run()
    fine = ParameterSweep(cfg_fine, {"E_dc": e}).run()
    np.testing.assert_allclose(coarse["v_dr_inst"], fine["v_dr_inst"],
                               rtol=1e-9)
    np.testing.assert_allclose(coarse["m_over_m_x_inst"],
                               fine["m_over_m_x_inst"], rtol=1e-9)
