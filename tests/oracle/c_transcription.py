"""Straight numpy transcription of the reference C solver's numerics.

This is the in-repo oracle (SURVEY.md §4): a literal, slow, float32
re-statement of src/boltzmann_c_solver.c — including the 4-buffer rotation,
per-loop bounds, and float32 scalar accumulation — used to validate the
vectorized JAX stepper step-by-step on tiny grids.  It is NOT part of the
framework; nothing imports it outside tests.

Transcribed behaviors and their reference lines:
  * derived constants          src/boltzmann_c_solver.c:87-113
  * equilibrium a0             :116-122
  * bootstrap half step        :141-145
  * main loop + buffer swap    :162-214
  * step_on_grid               :355-382  (writes m=1..M+1, n=0..N-1)
  * step_on_half_grid          :384-411  (writes m=1..M)
  * av()                       :413-437
  * eval_norm                  :289-296
  * display-4 observables      :236-268
"""

from __future__ import annotations

import numpy as np

from slb2d_tpu.constants import PI
from slb2d_tpu.models.bessel import bessel_In

f32 = np.float32
f64 = np.float64


class CTranscription:
    def __init__(self, *, E_dc, E_omega, omega, mu, alpha, N, PhiYmin,
                 PhiYmax, B, t_start, dt=1e-3, M=3069):
        self.E_dc = f32(E_dc)
        self.E_omega = f32(E_omega)
        self.omega = f32(omega)
        self.mu = f32(mu)
        self.alpha = f32(alpha)
        self.N = int(N)
        self.PhiYmin = f32(PhiYmin)
        self.PhiYmax = f32(PhiYmax)
        self.B = f32(B)
        self.t_start = f32(t_start)
        self.dt = f32(dt)
        self.M = int(M)

        self.T = f32(2 * PI / f64(self.omega)) if self.omega > 0 else f32(0)
        self.t_max = f32(self.t_start + self.T)
        self.dPhi = f32((self.PhiYmax - self.PhiYmin) / self.M)
        self.NSIZE = self.N + 1
        self.MSIZE = self.M + 3
        self.TMSIZE = self.M + 1
        self.nu = f32(1 + self.dt / 2)
        self.nu2 = f32(self.nu * self.nu)
        self.nu_tilde = f32(1 - self.dt / 2)
        self.bdt = f32(self.B * self.dt / (4 * self.dPhi))

        # a0 (:116-122): coefficient computed in double, stored to float,
        # then multiplied by the Gaussian evaluated in (long) double.
        self.a0 = np.zeros((self.NSIZE, self.MSIZE), f32)
        mu64 = f64(self.mu)
        for n in range(self.N + 1):
            a = f32(bessel_In(n, mu64) * (0.5 if n == 0 else 1.0)
                    / (PI * bessel_In(0, mu64))
                    * np.sqrt(mu64 / (2 * PI * f64(self.alpha))))
            for m in range(self.M + 3):
                self.a0[n, m] = f32(
                    f64(a) * np.exp(-mu64 * f64(self.phi_y(m)) ** 2 / 2))

        self.a = [np.zeros((self.NSIZE, self.MSIZE), f32) for _ in range(4)]
        self.b = [np.zeros((self.NSIZE, self.MSIZE), f32) for _ in range(4)]
        self.current, self.next = 0, 1
        self.current_hs, self.next_hs = 2, 3
        self.a[self.current][:] = self.a0
        self.av_data = np.zeros(6, f32)
        self.t = f32(0)
        self.steps_done = 0

        # tiptoe to the first half step (:141-145)
        cos_omega_t = f32(1)
        cos_omega_t_plus_dt = f32(np.cos(f64(f32(self.omega * self.dt))))
        self.step_on_grid(self.a0, self.a[self.current], self.b[self.current],
                          self.a[self.current_hs], self.b[self.current_hs],
                          self.a[self.current], self.b[self.current],
                          cos_omega_t, cos_omega_t_plus_dt)

    def phi_y(self, m) -> f32:
        return f32(self.PhiYmin + self.dPhi * f32(m - 1))

    # -- stencil (:355-411) -------------------------------------------------

    def _stencil(self, a0, a_src, b_src, a_nb, b_nb, a_out, b_out,
                 cos_t, cos_t_dt, m_hi_inclusive):
        nm = lambda arr, n, m: arr[n, m]
        for m in range(1, m_hi_inclusive + 1):
            phi = self.phi_y(m)
            mu_t_part = f32(
                (self.E_dc + self.E_omega * cos_t + self.B * phi)
                * self.dt / 2)
            mu_t1_part = f32(
                (self.E_dc + self.E_omega * cos_t_dt + self.B * phi)
                * self.dt / 2)
            for n in range(self.N):
                mu_t = f32(f32(n) * mu_t_part)
                mu_t1 = f32(f32(n) * mu_t1_part)
                g = f32(self.dt * nm(a0, n, m)
                        + nm(a_src, n, m) * self.nu_tilde
                        - nm(b_src, n, m) * mu_t
                        + self.bdt * (nm(b_nb, n + 1, m + 1)
                                      - nm(b_nb, n + 1, m - 1)
                                      - (f32(0) if n < 2 else
                                         f32(nm(b_nb, n - 1, m + 1)
                                             - nm(b_nb, n - 1, m - 1)))))
                h = f32(nm(b_src, n, m) * self.nu_tilde
                        + nm(a_src, n, m) * mu_t
                        + self.bdt * (
                            f32(2 if n == 1 else 1)
                            * (f32(0) if n == 0 else
                               f32(nm(a_nb, n - 1, m + 1)
                                   - nm(a_nb, n - 1, m - 1)))
                            - nm(a_nb, n + 1, m + 1)
                            + nm(a_nb, n + 1, m - 1)))
                xi = f32(self.nu2 + mu_t1 * mu_t1)
                a_out[n, m] = f32((g * self.nu - h * mu_t1) / xi)
                if n > 0:
                    b_out[n, m] = f32((g * mu_t1 + h * self.nu) / xi)

    def step_on_grid(self, a0, a_cur, b_cur, a_next, b_next, a_hs, b_hs,
                     cos_t, cos_t_dt):
        # m runs 1..TMSIZE inclusive (:361)
        self._stencil(a0, a_cur, b_cur, a_hs, b_hs, a_next, b_next,
                      cos_t, cos_t_dt, self.TMSIZE)

    def step_on_half_grid(self, a0, a_hs, b_hs, a_next, b_next,
                          a_next_hs, b_next_hs, cos_t, cos_t_dt):
        # m runs 1..TMSIZE-1 (:391)
        self._stencil(a0, a_hs, b_hs, a_next, b_next, a_next_hs, b_next_hs,
                      cos_t, cos_t_dt, self.TMSIZE - 1)

    # -- observables ---------------------------------------------------------

    def av(self, a, b, t):
        av_count = int(self.av_data[0] + 1)
        v_dr = f32(0)
        v_y = f32(0)
        m_x = f32(0)
        for m in range(1, self.TMSIZE):
            v_dr = f32(v_dr + b[1, m] * self.dPhi)
            v_y = f32(v_y + a[0, m] * self.phi_y(m) * self.dPhi)
            m_x = f32(m_x + a[1, m] * self.dPhi)
        d = self.av_data
        d[1] = f32(d[1] + (v_dr - d[1]) / f32(av_count))
        d[2] = f32(d[2] + (v_y - d[2]) / f32(av_count))
        d[3] = f32(d[3] + (m_x - d[3]) / f32(av_count))
        d[4] = f32(f64(d[4]) + np.cos(f64(f32(self.omega * t))) * f64(v_dr)
                   * f64(self.dt))
        d[5] = f32(f64(d[5]) + np.sin(f64(f32(self.omega * t))) * f64(v_dr)
                   * f64(self.dt))
        d[0] = f32(d[0] + 1)

    def eval_norm(self, a):
        norm = f32(0)
        for m in range(1, self.M + 1):
            norm = f32(norm + a[0, m] * self.dPhi)
        return f32(norm * f32(2 * PI * np.sqrt(f64(self.alpha))))

    # -- driver ---------------------------------------------------------------

    def run_steps(self, n_steps, *, do_av="none"):
        """Advance n_steps full steps.  do_av: 'none' | 'always' |
        'after_t_start' (display-4 semantics, :188-191)."""
        for _ in range(n_steps):
            t = self.t
            t_hs = f32(t + self.dt / 2)
            cos_t = f32(np.cos(f64(f32(self.omega * t))))
            cos_t_dt = f32(np.cos(f64(f32(self.omega * f32(t + self.dt)))))
            cur, nxt = self.current, self.next
            ch, nh = self.current_hs, self.next_hs
            self.step_on_grid(self.a0, self.a[cur], self.b[cur],
                              self.a[nxt], self.b[nxt],
                              self.a[ch], self.b[ch], cos_t, cos_t_dt)
            cos_hs = f32(np.cos(f64(f32(self.omega * t_hs))))
            cos_hs_dt = f32(
                np.cos(f64(f32(self.omega * f32(t_hs + self.dt)))))
            self.step_on_half_grid(self.a0, self.a[ch], self.b[ch],
                                   self.a[nxt], self.b[nxt],
                                   self.a[nh], self.b[nh], cos_hs, cos_hs_dt)
            if do_av == "always" or (
                    do_av == "after_t_start" and self.E_omega > 0
                    and t >= self.t_start):
                self.av(self.a[nxt], self.b[nxt], t)
            self.current, self.next = self.next, self.current
            self.current_hs, self.next_hs = self.next_hs, self.current_hs
            self.t = f32(self.t + self.dt)
            self.steps_done += 1

    def run_to_t_max(self, do_av="after_t_start"):
        while self.t < self.t_max:
            self.run_steps(1, do_av=do_av)

    def display4(self):
        """Final display-4 observable line values (:236-268)."""
        a, b = self.a[self.current], self.b[self.current]
        norm = self.eval_norm(a)
        v_dr = f32(0)
        v_y = f32(0)
        m_x = f32(0)
        for m in range(1, self.M):
            v_dr = f32(v_dr + b[1, m] * self.dPhi)
            v_y = f32(v_y + a[0, m] * self.phi_y(m) * self.dPhi)
            m_x = f32(m_x + a[1, m] * self.dPhi)
        mu64 = f64(self.mu)
        v_dr_mult = f32(2 * bessel_In(0, mu64) * PI
                        * np.sqrt(f64(self.alpha)) / bessel_In(1, mu64))
        v_y_mult = f32(4 * PI * bessel_In(0, mu64) / bessel_In(1, mu64))
        m_mult = f32(PI * f64(self.alpha) * np.sqrt(f64(self.alpha)))
        d = self.av_data.copy()
        d[1] = f32(d[1] * v_dr_mult)
        d[2] = f32(d[2] * v_y_mult)
        d[3] = f32(d[3] * m_mult)
        d[4] = f32(f32(d[4] * v_dr_mult) / self.T)
        d[5] = f32(f32(d[5] * v_dr_mult) / self.T)
        return dict(
            norm=norm,
            v_dr_inst=f32(v_dr * v_dr_mult),
            v_y_inst=f32(v_y * v_y_mult),
            m_over_m_x_inst=f32(m_x * m_mult),
            av=d,
        )

    # -- frame reconstruction & GPU-driver displays 8/9 ----------------------
    # (GPU driver only: src/boltzmann_solver.c:334-346 single-shot,
    #  :260-275 + :447-484 strobe; the C binary lacks these, so this
    #  transcription is their numerics oracle.)

    def frame_phi_x(self):
        """`for(ffloat phi_x = -PI; phi_x < PI; phi_x += 0.01)` — float
        storage, double accumulate/compare (0.01 is a double constant)."""
        vals = []
        px = f32(-PI)
        while f64(px) < PI:
            vals.append(px)
            px = f32(f64(px) + 0.01)
        return np.asarray(vals, f32)

    def reconstruct_frame(self, a, b, m_hi_inclusive):
        """print_2d_data / print_2d_strobe value grid (GPU bounds
        m=1..M+1, src/boltzmann_solver.c:496): per (phi_x, m),
        value = f32 accumulation over n of the DOUBLE product+sum
        a[n,m]*cos(n*phi_x) + b[n,m]*sin(n*phi_x); clamped at 0."""
        pxs = self.frame_phi_x()
        asl = a[:, 1:m_hi_inclusive + 1].astype(f64)     # (N+1, m)
        bsl = b[:, 1:m_hi_inclusive + 1].astype(f64)
        F = np.zeros((len(pxs), m_hi_inclusive), f32)
        for n in range(self.N + 1):
            arg = f64(f32(n * pxs))                      # f32 product, f64 trig
            term = (np.cos(arg)[:, None] * asl[n][None, :]
                    + np.sin(arg)[:, None] * bsl[n][None, :])
            F = (F.astype(f64) + term).astype(f32)       # ffloat value +=
        return np.maximum(F, 0)

    def run_display8(self):
        """GPU display-8: run to t_max (av excluded by the GPU guard,
        src/boltzmann_solver.c:247 — docs/DEVIATIONS.md D5), then one
        frame from the post-swap current arrays (:334-346).
        Returns (t_exit, F) with F over m=1..M+1."""
        self.run_to_t_max(do_av="none")
        F = self.reconstruct_frame(self.a[self.current], self.b[self.current],
                                   self.M + 1)
        return self.t, F

    def run_display9(self, n_periods=101):
        """GPU display-9 strobe: t_max = t_start + n_periods*T
        (reference uses 101, src/boltzmann_solver.c:80-82; a smaller
        count truncates the run without changing any per-period logic);
        after each step, at drive-period wraparound past t_start
        (fractional t/T decreasing, :260-263), the current frame is
        clamped and ACCUMULATED into strobe_values (:474) and a snapshot
        emitted.  Returns [(t_emit, accumulated_strobe), ...]."""
        self.t_max = f32(self.t_start + f32(n_periods * self.T))
        last_rem = f32(0)
        strobe = np.zeros((len(self.frame_phi_x()), self.M + 1), f32)
        frames = []
        while self.t < self.t_max:
            t = self.t                                   # loop t of this step
            self.run_steps(1, do_av="none")
            if t >= self.t_start:
                tT = f32(t / self.T)
                rem = f32(tT - int(tT))
                if rem < last_rem:
                    F = self.reconstruct_frame(self.a[self.current],
                                               self.b[self.current],
                                               self.M + 1)
                    strobe = (strobe + F).astype(f32)    # ffloat +=, :474
                    frames.append((t, strobe.copy()))
                last_rem = rem
        return frames
