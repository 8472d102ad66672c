"""Host-side observable finalization, float32-faithful to the reference.

The on-device running reductions live in ops/stencil.av_update; this module
computes the derived quantities emitted at output points:
norm (eval_norm, src/boltzmann_c_solver.c:289-296), the instantaneous
velocities and effective mass, and the display-4 normalization of av_data
(:236-268).  All arithmetic goes through the same float32 round-off points
as the C code so golden comparisons stay tight.
"""

from __future__ import annotations

import numpy as np

from ..constants import PI

f64 = np.float64


def eval_norm(model, a: np.ndarray):
    """norm = 2*pi*sqrt(alpha) * sum_{m=1..M} a0_row * dPhi  (:289-296).
    Accepts the full (NHP, MP) array or just its harmonic-0 row."""
    D = model.np_dtype
    row = a[0] if a.ndim == 2 else a
    s = D(np.dot(row.astype(D), model.w_norm))
    # C: norm *= 2*PI*sqrt(alpha)  — double expression, float store
    return D(f64(s) * (2 * PI * np.sqrt(f64(model.alpha))))


def instantaneous(model, a: np.ndarray, b: np.ndarray, *, bounds="d4"):
    """(v_dr, v_y, m/m_x) raw sums.  bounds: 'd4' = m<M (display-4 inline,
    :241) or 'av' = m<M+1 (av() and the sane display-77 bounds, :417)."""
    D = model.np_dtype
    w = model.w_d4 if bounds == "d4" else model.w_av
    wp = model.w_d4_phi if bounds == "d4" else model.w_av_phi
    v_dr = D(np.dot(b[1].astype(D), w))
    v_y = D(np.dot(a[0].astype(D), wp))
    m_x = D(np.dot(a[1].astype(D), w))
    return v_dr, v_y, m_x


def scaled_observables(model, a, b, av_data, *, bounds="d4",
                       quadrature_denom=None):
    """Apply the Bessel-ratio multipliers (:247-259).

    quadrature_denom: T for display 4 (:258), t for display 77
    (src/boltzmann_solver.c:437).  av_data is not mutated (the C path's
    in-place compounding at :319-325 is a defect we do not replicate).
    """
    D = model.np_dtype
    v_dr, v_y, m_x = instantaneous(model, a, b, bounds=bounds)
    vm, ym, mm = (model.v_dr_multiplier, model.v_y_multiplier,
                  model.m_over_multiplier)
    d = np.asarray(av_data, D).copy()
    d[1] = D(d[1] * vm)
    d[2] = D(d[2] * ym)
    d[3] = D(d[3] * mm)
    q = D(quadrature_denom if quadrature_denom is not None else model.T)
    d[4] = D(D(d[4] * vm) / q)
    d[5] = D(D(d[5] * vm) / q)
    return dict(
        v_dr_inst=D(v_dr * vm),
        v_y_inst=D(v_y * ym),
        m_over_m_x_inst=D(m_x * mm),
        av=d,
    )
