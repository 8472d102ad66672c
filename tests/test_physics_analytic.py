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


def test_small_signal_absorption_matches_linear_response():
    """The ac absorption quadratures against linear-response theory.

    With B=0 the n=1 harmonic pair obeys dz/dt = a0 - z + i E(t) z for
    z = a_1 + i b_1.  For E(t) = E0 + eps*cos(wt), first order in eps:

        z0  = a0 / (1 - i E0)
        dz  = i (eps/2) z0 [ e^{iwt}/d+  +  e^{-iwt}/d- ],  d± = 1 - iE0 ± iw

    and with v_dr(t) = 2 Im z(t) / integral(a0) the period-averaged
    quadratures (reference av(), src/boltzmann_c_solver.c:433-434) become

        A    = <cos(wt) v_dr> = (eps/2) Re[ z0' (1/d+ + 1/d-) ]
        Asin = <sin(wt) v_dr> = -(eps/2) Im[ z0' (1/d+ - 1/d-) ]

    with z0' = 1/(1 - i E0).  (Check: E0=0 gives the Drude absorption
    A = eps/(1+w^2) > 0.)

    One subtlety makes the closed forms unusable directly: the engine's
    averaging window is one period QUANTIZED to whole steps (the gate
    t in [t_start, t_end) of a float time accumulation), so the huge
    zeroth-order term cos(wt)*v_bar does not integrate to exactly zero —
    it leaves a quantization residue ~ v_bar*dt/T that can reach several
    percent of A.  The honest expectation is therefore the DISCRETE
    quadrature of the analytic trajectory over the engine's own sampling:
    cos/sin at the pre-step t, v_dr evaluated at the post-step t+dt
    (ops/stencil.av_update sampling), summed over the gated steps.  This
    pins the whole ac pipeline — time-dependent drive, averaging window,
    quadratures, 1/T normalization — against linear-response theory with
    only O(eps^2) and O((w dt)^2) residuals."""
    eps = 0.02
    e0 = 0.8
    omegas = np.array([0.5, 1.0, 2.0])
    dt = 2e-3
    t_start = CFG["t_start"]
    cfg = SimConfig(**{**CFG, "E_dc": e0, "E_omega": eps, "dt": dt})
    sw = ParameterSweep(cfg, {"omega": omegas})
    res = sw.run()

    z0p = 1.0 / (1.0 - 1j * e0)

    def v_dr_analytic(t, w):
        dpl = 1.0 - 1j * e0 + 1j * w
        dmi = 1.0 - 1j * e0 - 1j * w
        dz = 1j * (eps / 2) * z0p * (np.exp(1j * w * t) / dpl
                                     + np.exp(-1j * w * t) / dmi)
        return 2 * np.imag(z0p + dz)

    expected_A = np.empty(3)
    expected_Asin = np.empty(3)
    for i, (w, model) in enumerate(zip(omegas, sw.models)):
        T = float(model.T)
        t_end = np.float64(t_start + T)
        # the engine's sequential f64 time accumulation from t=0
        t = np.float64(0.0)
        ts = []
        for _ in range(sw.n_steps):
            ts.append(t)
            t = np.float64(t + dt)
        ts = np.asarray(ts)
        gate = (ts >= t_start) & (ts < t_end)
        tg = ts[gate]
        v = v_dr_analytic(tg + dt, w)           # post-step arrays
        expected_A[i] = np.sum(np.cos(w * tg) * v * dt) / T
        expected_Asin[i] = np.sum(np.sin(w * tg) * v * dt) / T

    # atol covers near-zero crossings (Asin(w=1) ~ 4e-5) where the
    # O(eps^3)/O((w dt)^2) residual exceeds any relative bound
    np.testing.assert_allclose(res["A"], expected_A, rtol=2e-3, atol=5e-7)
    np.testing.assert_allclose(res["Asin"], expected_Asin, rtol=2e-3,
                               atol=5e-7)
    # the averaged drift velocity is the dc characteristic + O(eps^2)
    np.testing.assert_allclose(res["v_dr_av"], 2 * e0 / (1 + e0**2),
                               rtol=1e-3)


def test_full_distribution_matches_analytic_steady_state():
    """Per-element pin of the ENTIRE steady-state distribution via the
    sweep state capture: for dc drive at B=0 every harmonic row must relax
    to a_n(phi) = a0_n(phi) / (1 + (nE)^2), b_n = nE * a_n — at every
    phi_y grid point, not just in the integrated observables."""
    e = 1.2
    cfg = SimConfig(**CFG)
    sw = ParameterSweep(cfg, {"E_dc": np.array([e])})
    sw.run(capture_state=True)
    a, b = sw.final_ab[0][0], sw.final_ab[1][0]

    m0 = sw.base
    n = np.arange(m0.NHP)[:, None]
    expected_a = m0.a0 / (1 + (n * e) ** 2)
    expected_b = n * e * expected_a
    # interior only: the main grid writes rows n < N and columns
    # m = 1..M+1; ghost cells carry the reference's parity artifacts
    rows = slice(0, m0.N)
    cols = slice(1, m0.M + 2)
    scale = np.abs(m0.a0[rows, cols]).max()
    np.testing.assert_allclose(a[rows, cols], expected_a[rows, cols],
                               rtol=1e-7, atol=1e-13 * scale)
    np.testing.assert_allclose(b[rows, cols], expected_b[rows, cols],
                               rtol=1e-7, atol=1e-13 * scale)


def test_mirror_symmetry_of_magnetic_coupling():
    """The dynamics are invariant under (phi_y -> -phi_y, B -> -B): the
    drive term n*(E + B*phi_y) is unchanged and the bdt neighbor coupling
    flips sign twice (bdt ~ B, and the m+1/m-1 difference mirrors).  With
    the symmetric Gaussian initial condition this forces

        a_B[n, m] == a_{-B}[n, M+2-m]   (same for b)

    exactly in real arithmetic — a pin on the full magnetic stencil path
    (cross-harmonic, cross-column) that the B=0 closed forms cannot
    reach.  Float residue: phi(m') != -phi(m) at ulp level only."""
    cfg = SimConfig(**{**CFG, "E_omega": 1.5, "B": 0.4, "t_start": 1.0})
    sw = ParameterSweep(cfg, {"B": np.array([0.4, -0.4])})
    sw.run(capture_state=True)
    a, b = sw.final_ab
    m0 = sw.base
    M = m0.M
    # mirror the live column range m = 0..M+2 (ghosts included)
    mirror = np.arange(M + 3)[::-1]
    for arr, name in ((a, "a"), (b, "b")):
        plus = arr[0][:, :M + 3]
        minus_mirrored = arr[1][:, mirror]
        np.testing.assert_allclose(plus, minus_mirrored, rtol=1e-10,
                                   atol=1e-14, err_msg=name)
    # non-degeneracy: the field actually did something asymmetric
    assert np.abs(a[0] - a[1]).max() > 1e-6


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
