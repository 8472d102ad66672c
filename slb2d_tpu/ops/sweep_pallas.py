"""Lane-packed Pallas sweep megakernel: a whole parameter sweep per launch.

The vmapped XLA sweep engine (parallel/sweep.py) streams (B, NHP, MP)
state through HBM every step.  This kernel packs the B sweep points along
the LANE axis instead — state (NHP, B*MP), each point occupying one
MP-lane segment — and keeps everything VMEM-resident for the whole run:

  * the stencil math is ops/stencil.apply_half_step verbatim; m±1 rolls
    leak across segment boundaries only into each point's ghost/padding
    columns, which the masked formulation zeroes — the same invariant that
    makes the single-run roll formulation correct;
  * per-point physics scalars (E_dc, E_omega, omega, B, bdt) become
    per-segment-constant (1, B*MP) rows; trig is evaluated in-kernel on
    those rows from the carried float32 loop t (device_trig semantics,
    matching the XLA sweep engine's per-point trig);
  * per-point observables exploit LINEARITY: the av() running means and
    Kahan quadratures are per-lane recurrences on packed (1, B*MP) rows
    (the gate/count sequence is constant within a segment, so the
    segment-sum of per-lane accumulators equals the accumulator of the
    per-point sums); the final segment reduction happens ONCE on the host
    after the run.  No per-step cross-lane reduction at all;
  * the half-step-grid edge column (4-buffer staleness artifact) provably
    alternates between the bootstrap tiptoe value and 0 — a parity-gated
    FMA against a precomputed one-hot table, no per-step column plumbing.

Matches parallel/sweep.ParameterSweep semantics: shared step count,
per-point averaging window [t_start, t_end_b), capture of the last live
step's instantaneous observables.  Reference analogue: the serial stdin
parameter server (src/boltzmann_cli.c:71-91) explored points one at a
time; this runs the whole grid at once on one chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stencil
from .stepper_pallas import _pl_shift

# SMEM scalar packing order
SWEEP_SCALARS = ("t0", "dt", "nu", "nu2", "nu_tilde", "t_start")


def _sweep_kernel(sc_ref,                     # SMEM (8,) scalars
                  a_ref, b_ref, ahs_ref, bhs_ref,     # (NHP, BMP) states
                  a0_ref, aghost_ref, bea_ref, beb_ref,
                  nf_ref, nge2_ref, wn_ref, rowup_ref,
                  colm_ref, colh_ref, phi_ref,
                  edc_ref, eom_ref, bfield_ref, bdt_ref, omrow_ref,
                  wstack_ref,                 # (8, BMP) weight rows
                  eompos_ref, tend_ref,       # (1, BMP) gates
                  a_out, b_out, ahs_out, bhs_out,
                  av_out, cap_out,            # (8, BMP), (4, BMP)
                  *, n_steps: int, unroll: int):
    a_out[:] = a_ref[:]
    b_out[:] = b_ref[:]
    ahs_out[:] = ahs_ref[:]
    bhs_out[:] = bhs_ref[:]
    av_out[:] = jnp.zeros_like(av_out)
    cap_out[:] = jnp.zeros_like(cap_out)

    dtype = a_out.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    t0 = sc_ref[0]
    dt = sc_ref[1]
    t_start = sc_ref[5]

    consts = stencil.StencilConsts(
        a0=a0_ref[:], a0_ghost=aghost_ref[:], phi=phi_ref[:],
        n_float=nf_ref[:], row_update=rowup_ref[:] > 0,
        n_ge2=nge2_ref[:], w_n=wn_ref[:], b_row_mask=nf_ref[:] > 0,
        col_main=colm_ref[:], col_half=colh_ref[:],
        w_av=wstack_ref[0:1, :], w_av_phi=wstack_ref[1:2, :],
        col_edge=colm_ref[:] > 2,     # unused here
        E_dc=edc_ref[:], E_omega=eom_ref[:], omega=omrow_ref[:],
        B=bfield_ref[:], dt=dt, nu=sc_ref[2], nu2=sc_ref[3],
        nu_tilde=sc_ref[4], bdt=bdt_ref[:], t_start=t_start,
        t_end=sc_ref[5])

    om_row = omrow_ref[:]                     # (1, BMP)
    phi_row = phi_ref[:]
    eompos = eompos_ref[:]                    # (1, BMP) E_omega > 0
    tend = tend_ref[:]                        # (1, BMP) per-point t_end

    def mu_of(cos_row):
        # C operand order (src/boltzmann_c_solver.c:363-365), per-point
        # scalars as per-segment rows
        return consts.n_float * (
            (consts.E_dc + consts.E_omega * cos_row
             + consts.B * phi_row) * dt / 2)

    def do_step(i, t, mu_main):
        # device_trig semantics (ops/stencil.device_trig) on packed rows:
        # cos of f32 products of the carried f32 loop t.  Only the MAIN
        # grid's mu_t carries across steps (om*(t+dt) at step i is
        # bitwise om*t_next at step i+1); the staggered grid has no such
        # identity (fl((t+dt/2)+dt) != fl((t+dt)+dt/2)), so both hs
        # broadcasts are fresh — matching the XLA sweep engine exactly.
        t_hs = t + dt / 2
        mu1_main = mu_of(jnp.cos(om_row * (t + dt)))
        a = a_out[:]
        b = b_out[:]
        ahs = ahs_out[:]
        bhs = bhs_out[:]
        a_new, b_new = stencil.apply_half_step(
            consts, a, b, ahs, bhs, zero, zero, main=True,
            shift=_pl_shift, use_reciprocal=True, mus=(mu_main, mu1_main))
        # parity ghost fill (buffer 0 keeps a0's ghost cells; fresh
        # bootstrap, so parity0 = 0)
        ghost_on = ((i + np.int32(1)) % np.int32(2)) == 0
        gf = jnp.where(ghost_on, one, zero)
        a_new = a_new + gf * consts.a0_ghost

        mu_hs = mu_of(jnp.cos(om_row * t_hs))
        mu1_hs = mu_of(jnp.cos(om_row * (t_hs + dt)))
        ahs_new, bhs_new = stencil.apply_half_step(
            consts, ahs, bhs, a_new, b_new, zero, zero, main=False,
            shift=_pl_shift, use_reciprocal=True, mus=(mu_hs, mu1_hs))
        # half-grid edge column M+1: never rewritten after bootstrap, so
        # it alternates tiptoe-value / 0 with step parity (4-buffer
        # rotation; see module docstring).  col_half zeroed it in *_new.
        ahs_new = ahs_new + gf * bea_ref[:]
        bhs_new = bhs_new + gf * beb_ref[:]

        # av() per-lane recurrences on packed rows (reference
        # src/boltzmann_c_solver.c:413-437; E_omega>0 gate :188; window
        # [t_start, t_end_b) as in parallel/sweep.py).  All linear in the
        # summed quantity, so host-side segment sums recover the per-point
        # values (up to f32 reassociation).
        live = (t < tend).astype(dtype)            # (1, BMP)
        g = live * eompos * (t >= t_start).astype(dtype)
        gb = g > 0
        x_dr = b_new[1:2, :] * wstack_ref[0:1, :]
        x_vy = a_new[0:1, :] * wstack_ref[1:2, :]
        x_mx = a_new[1:2, :] * wstack_ref[2:3, :]
        av = av_out[:]
        count = av[0:1, :] + g
        den = jnp.where(count > 0, count, one)
        av1 = av[1:2, :] + g * (x_dr - av[1:2, :]) / den
        av2 = av[2:3, :] + g * (x_vy - av[2:3, :]) / den
        av3 = av[3:4, :] + g * (x_mx - av[3:4, :]) / den
        cos_av = jnp.cos(om_row * t)
        sin_av = jnp.sin(om_row * t)
        y4 = cos_av * x_dr * dt - av[6:7, :]
        t4 = av[4:5, :] + y4
        c4 = (t4 - av[4:5, :]) - y4
        y5 = sin_av * x_dr * dt - av[7:8, :]
        t5 = av[5:6, :] + y5
        c5 = (t5 - av[5:6, :]) - y5
        av_out[:] = jnp.concatenate([
            count, av1, av2, av3,
            jnp.where(gb, t4, av[4:5, :]),
            jnp.where(gb, t5, av[5:6, :]),
            jnp.where(gb, c4, av[6:7, :]),
            jnp.where(gb, c5, av[7:8, :]),
        ], axis=0)

        # loop-exit capture (d4 bounds + norm), per-lane, overwritten
        # while the PRE-step t is < t_end_b (parallel/sweep.py point_step)
        lb = live > 0
        cap = cap_out[:]
        cap_out[:] = jnp.concatenate([
            jnp.where(lb, b_new[1:2, :] * wstack_ref[3:4, :], cap[0:1, :]),
            jnp.where(lb, a_new[0:1, :] * wstack_ref[4:5, :], cap[1:2, :]),
            jnp.where(lb, a_new[1:2, :] * wstack_ref[5:6, :], cap[2:3, :]),
            jnp.where(lb, a_new[0:1, :] * wstack_ref[6:7, :], cap[3:4, :]),
        ], axis=0)

        a_out[:] = a_new
        b_out[:] = b_new
        ahs_out[:] = ahs_new
        bhs_out[:] = bhs_new
        return t + dt, mu1_main

    carry = (t0, mu_of(jnp.cos(om_row * t0)))

    def body(j, carry):
        i = j * np.int32(unroll)
        for k in range(unroll):
            carry = do_step(i + np.int32(k), *carry)
        return carry

    carry = jax.lax.fori_loop(np.int32(0), np.int32(n_steps // unroll),
                              body, carry)
    for r in range(n_steps - (n_steps // unroll) * unroll):
        carry = do_step(np.int32((n_steps // unroll) * unroll + r), *carry)


def make_sweep_pallas_runner(sweep, interpret=None, max_points=16):
    """Build a reusable runner() for a parallel.sweep.ParameterSweep on
    the lane-packed kernel.  runner() returns (av (B, 8), cap dict of
    (B,) arrays, packed final state (NHP, B*MP) host arrays).

    Sweeps larger than max_points split into per-launch chunks; all
    chunks share one compiled kernel because every chunk-dependent array
    is an argument, not a closure constant.  float32-only, one device."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m0 = sweep.base
    D = m0.np_dtype
    if D != np.float32:
        raise ValueError("pallas sweep engine is float32-only")
    NHP, MP = m0.NHP, m0.MP
    cfg = sweep.cfg
    n_steps = sweep.n_steps

    chunks = [sweep.models[i:i + max_points]
              for i in range(0, sweep.B, max_points)]
    # pad the last chunk's model list to the common size with copies of
    # its final model (dead lanes are gated off via t_end=-inf)
    CB = min(max_points, sweep.B)
    BMP = CB * MP

    def build_chunk(models):
        n_live = len(models)
        models = list(models) + [models[-1]] * (CB - n_live)

        def packed(field):
            return np.concatenate([np.asarray(getattr(m, field), D)
                                   for m in models], axis=-1)

        def row(x):
            return np.asarray(x, D).reshape(1, -1)

        def per_point_row(vals):
            return row(np.repeat(np.asarray(vals, D), MP))

        colm = row(np.tile(np.asarray(m0.col_main, D), (1, CB)))
        colh = row(np.tile(np.asarray(m0.col_half, D), (1, CB)))

        # weight-row stack (av bounds x3, d4 bounds x3, norm, zero)
        wstack = np.zeros((8, BMP), D)
        wstack[0] = packed("w_av")
        wstack[1] = packed("w_av_phi")
        wstack[2] = wstack[0]
        wstack[3] = packed("w_d4")
        wstack[4] = packed("w_d4_phi")
        wstack[5] = wstack[3]
        wstack[6] = wstack[0]      # w_norm aliases w_av

        eompos = per_point_row(
            [1.0 if float(m.E_omega) > 0 else 0.0 for m in models])
        t_end = [D(D(cfg.t_start) + m.T) for m in models]
        t_end[n_live:] = [D(-np.inf)] * (CB - n_live)
        tend = per_point_row(t_end)

        boots = [stencil.bootstrap_state(stencil.consts_from_model(m), m)
                 for m in models]

        def pack_states(field):
            return np.concatenate(
                [np.asarray(getattr(s, field)) for s in boots], axis=1)

        # one-hot tiptoe-edge tables (column M+1 of each bootstrap hs)
        bea = np.zeros((NHP, BMP), D)
        beb = np.zeros((NHP, BMP), D)
        for i in range(CB):
            col = i * MP + m0.M + 1
            bea[:, col] = np.asarray(boots[i].a_hs)[:, m0.M + 1]
            beb[:, col] = np.asarray(boots[i].b_hs)[:, m0.M + 1]

        scalars = np.zeros(8, D)
        scalars[1] = m0.dt
        scalars[2] = m0.nu
        scalars[3] = m0.nu2
        scalars[4] = m0.nu_tilde
        scalars[5] = D(cfg.t_start)

        return (n_live,
                (scalars, pack_states("a"), pack_states("b"),
                 pack_states("a_hs"), pack_states("b_hs"),
                 packed("a0"), packed("a0_ghost"), bea, beb,
                 np.asarray(m0.n_float), np.asarray(m0.n_ge2),
                 np.asarray(m0.w_n), np.asarray(m0.row_update, D),
                 colm, colh, row(packed("phi")),
                 per_point_row([m.E_dc for m in models]),
                 per_point_row([m.E_omega for m in models]),
                 per_point_row([m.B for m in models]),
                 per_point_row([m.bdt for m in models]),
                 per_point_row([m.omega for m in models]),
                 wstack, eompos, tend))

    kernel = functools.partial(
        _sweep_kernel, n_steps=n_steps,
        unroll=4 if NHP * BMP >= (256 * 1024) else 1)
    out_shapes = [
        jax.ShapeDtypeStruct((NHP, BMP), D),   # a
        jax.ShapeDtypeStruct((NHP, BMP), D),   # b
        jax.ShapeDtypeStruct((NHP, BMP), D),   # a_hs
        jax.ShapeDtypeStruct((NHP, BMP), D),   # b_hs
        jax.ShapeDtypeStruct((8, BMP), D),     # av rows
        jax.ShapeDtypeStruct((4, BMP), D),     # cap rows
    ]

    @jax.jit
    def run(*args):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 23,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_shape=out_shapes,
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(*args)

    built = [build_chunk(ms) for ms in chunks]

    def runner():
        avs, caps, states = [], [], []
        for n_live, args in built:
            a, b, ahs, bhs, av, cap = run(*args)
            # host-side segment sums (f64) finish the per-lane linear
            # accumulators; count is per-segment constant (sample lane 0)
            avr = np.asarray(av, np.float64).reshape(8, CB, MP)
            capr = np.asarray(cap, np.float64).reshape(4, CB, MP)
            av_b = np.zeros((n_live, 8), D)
            av_b[:, 0] = avr[0, :n_live, 0].astype(D)
            av_b[:, 1] = avr[1, :n_live].sum(-1).astype(D)
            av_b[:, 2] = avr[2, :n_live].sum(-1).astype(D)
            av_b[:, 3] = avr[3, :n_live].sum(-1).astype(D)
            # quadratures: fold the per-lane Kahan compensations
            av_b[:, 4] = (avr[4, :n_live]
                          - avr[6, :n_live]).sum(-1).astype(D)
            av_b[:, 5] = (avr[5, :n_live]
                          - avr[7, :n_live]).sum(-1).astype(D)
            avs.append(av_b)
            caps.append(capr[:, :n_live].sum(-1).astype(D))
            states.append(tuple(
                np.asarray(x)[:, :n_live * MP] for x in (a, b, ahs, bhs)))
        av_host = np.concatenate(avs, axis=0)
        cap_host = np.concatenate(caps, axis=1)
        cap_dict = dict(v_dr=cap_host[0], v_y=cap_host[1],
                        m_x=cap_host[2], norm=cap_host[3])
        state = tuple(np.concatenate([s[i] for s in states], axis=1)
                      for i in range(4))
        return av_host, cap_dict, state

    return runner


def run_sweep_pallas(sweep, interpret=None, max_points=16):
    """One-shot convenience wrapper around make_sweep_pallas_runner."""
    return make_sweep_pallas_runner(sweep, interpret=interpret,
                                    max_points=max_points)()
