"""Layout experiment: transposed (m-on-sublanes, n-on-lanes) pallas
stencil vs the production (n-on-sublanes, m-on-lanes) megakernel.

Motivation: the lane-packed sweep kernel showed Mosaic roll cost grows
with lane width; the flagship single-run kernel rolls 4096-lane rows.
Transposing puts the harmonic axis on exactly one 128-lane vreg (n±1 =
single-vreg lane roll) and the m axis on sublanes, at the price of
padding NHP 104 -> 128 lanes (+23% elements).

Run on TPU:  python tests/perf/transposed_experiment.py
(not a pytest test; one-off measurement recorded in docs/PERF.md)
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slb2d_tpu.config import SimConfig
from slb2d_tpu.models.superlattice import SuperlatticeModel
from slb2d_tpu.ops import stencil


def _shift_T(arr, dn: int, dm: int):
    """(m, n)-layout shift: m is axis 0 (sublanes), n is axis 1 (lanes)."""
    out = arr
    if dm:
        out = pltpu.roll(out, np.int32((-dm) % out.shape[0]), 0)
    if dn:
        out = pltpu.roll(out, np.int32((-dn) % out.shape[1]), 1)
    return out


def transposed_consts(c, model, NHL):
    """StencilConsts with every array transposed into (m, n) layout and
    the n axis padded to NHL lanes."""
    D = model.np_dtype
    NHP, MP = model.NHP, model.MP

    def padT(arr2d):     # (NHP, MP) -> (MP, NHL)
        out = np.zeros((MP, NHL), D)
        out[:, :NHP] = np.asarray(arr2d, D).T
        return out

    def rowT(vec_n):     # (NHP, 1) -> (1, NHL)
        out = np.zeros((1, NHL), D)
        out[0, :NHP] = np.asarray(vec_n, D).ravel()
        return out

    def colT(vec_m):     # (1, MP) or (MP,) -> (MP, 1)
        return np.asarray(vec_m, D).reshape(MP, 1)

    return stencil.StencilConsts(
        a0=padT(c.a0), a0_ghost=padT(c.a0_ghost), phi=colT(c.phi),
        n_float=rowT(c.n_float),
        row_update=rowT(np.asarray(c.row_update, D)) > 0,
        n_ge2=rowT(c.n_ge2), w_n=rowT(c.w_n),
        b_row_mask=rowT(np.asarray(c.b_row_mask, D)) > 0,
        col_main=colT(np.asarray(c.col_main, D)),
        col_half=colT(np.asarray(c.col_half, D)),
        w_av=colT(c.w_av), w_av_phi=colT(c.w_av_phi),
        col_edge=colT(np.asarray(c.col_edge, D)) > 0,
        E_dc=c.E_dc, E_omega=c.E_omega, omega=c.omega, B=c.B, dt=c.dt,
        nu=c.nu, nu2=c.nu2, nu_tilde=c.nu_tilde, bdt=c.bdt,
        t_start=c.t_start, t_end=c.t_end)


def _kernel_T(xs_ref, a_ref, b_ref, ahs_ref, bhs_ref,
              a0_ref, aghost_ref, phi_ref, nf_ref, nge2_ref, wn_ref,
              rowup_ref, colm_ref, colh_ref,
              a_out, b_out, ahs_out, bhs_out,
              *, n_steps: int, unroll: int, parity0: int, edge_row: int):
    a_out[:] = a_ref[:]
    b_out[:] = b_ref[:]
    ahs_out[:] = ahs_ref[:]
    bhs_out[:] = bhs_ref[:]
    dtype = a_out.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    ME = edge_row

    consts = stencil.StencilConsts(
        a0=a0_ref[:], a0_ghost=aghost_ref[:], phi=phi_ref[:],
        n_float=nf_ref[:], row_update=rowup_ref[:] > 0,
        n_ge2=nge2_ref[:], w_n=wn_ref[:], b_row_mask=nf_ref[:] > 0,
        col_main=colm_ref[:], col_half=colh_ref[:],
        w_av=colm_ref[:], w_av_phi=colm_ref[:], col_edge=colm_ref[:] > 2,
        E_dc=xs_ref[0, 0] * 0 + 1.0,     # placeholders; mus precomputed
        E_omega=zero, omega=zero, B=zero, dt=xs_ref[0, 7] * 0 + 1e-3,
        nu=1.0005, nu2=1.00100025, nu_tilde=0.9995,
        bdt=0.005, t_start=zero, t_end=zero)

    phi_col = phi_ref[:]
    nf = nf_ref[:]

    def mu_of(cos_v):
        return nf * ((1.0 + 2.0 * cos_v + 0.1 * phi_col) * 1e-3 / 2)

    def do_step(i, mu_main):
        cos_t = xs_ref[i, 0]
        cos_t_dt = xs_ref[i, 1]
        cos_hs = xs_ref[i, 2]
        cos_hs_dt = xs_ref[i, 3]
        a = a_out[:]
        b = b_out[:]
        ahs = ahs_out[:]
        bhs = bhs_out[:]
        mu1_main = mu_of(cos_t_dt)
        a_new, b_new = stencil.apply_half_step(
            consts, a, b, ahs, bhs, cos_t, cos_t_dt, main=True,
            shift=_shift_T, use_reciprocal=True, mus=(mu_main, mu1_main))
        ghost_on = ((i + np.int32(parity0 + 1)) % np.int32(2)) == 0
        gf = jnp.where(ghost_on, one, zero)
        a_new = a_new + gf * consts.a0_ghost
        mu_hs = mu_of(cos_hs)
        mu1_hs = mu_of(cos_hs_dt)
        ahs_new, bhs_new = stencil.apply_half_step(
            consts, ahs, bhs, a_new, b_new, cos_hs, cos_hs_dt, main=False,
            shift=_shift_T, use_reciprocal=True, mus=(mu_hs, mu1_hs))
        old_edge_a = ahs[ME:ME + 1, :]   # edge ROW in this layout
        old_edge_b = bhs[ME:ME + 1, :]
        a_out[:] = a_new
        b_out[:] = b_new
        ahs_out[:] = ahs_new
        bhs_out[:] = bhs_new
        ahs_out[ME:ME + 1, :] = old_edge_a
        bhs_out[ME:ME + 1, :] = old_edge_b
        return mu1_main

    def body(j, carry):
        i = j * np.int32(unroll)
        for k in range(unroll):
            carry = do_step(i + np.int32(k), carry)
        return carry

    carry = mu_of(xs_ref[np.int32(0), 0])
    carry = jax.lax.fori_loop(np.int32(0), np.int32(n_steps // unroll),
                              body, carry)


def main():
    cfg = SimConfig(display=8, E_dc=1.0, E_omega=2.0, omega=1.0, mu=1.0,
                    alpha=0.9495, n_harmonics=100, phi_y_min=-10.0,
                    phi_y_max=10.0, B=0.1, t_start=10.0, g_grid=4000,
                    dt=1e-3)
    model = SuperlatticeModel(cfg)
    c = stencil.consts_from_model(model)
    D = model.np_dtype
    NHP, MP = model.NHP, model.MP
    NHL = 128
    cT = transposed_consts(c, model, NHL)
    state = stencil.bootstrap_state(c, model)

    def padT(x):
        out = np.zeros((MP, NHL), D)
        out[:, :NHP] = np.asarray(x).T
        return out

    aT, bT = padT(state.a), padT(state.b)
    ahsT, bhsT = padT(state.a_hs), padT(state.b_hs)

    from slb2d_tpu.ops.stepper_pallas import build_xs_table
    K = 1000
    xs = build_xs_table(model, c, 0.0, 0, K, av_enabled=False, exact=False)

    kernel = functools.partial(_kernel_T, n_steps=K, unroll=8, parity0=0,
                               edge_row=model.M + 1)

    # NOTE: the in-kernel physics scalars are hardcoded to this config in
    # mu_of/consts above (quick experiment, not product code)
    @jax.jit
    def run(a, b, ahs, bhs, xs):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_shape=[jax.ShapeDtypeStruct((MP, NHL), D)] * 4,
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() == "cpu",
        )(xs, a, b, ahs, bhs,
          jnp.asarray(cT.a0), jnp.asarray(cT.a0_ghost),
          jnp.asarray(cT.phi), jnp.asarray(cT.n_float),
          jnp.asarray(cT.n_ge2), jnp.asarray(cT.w_n),
          jnp.asarray(np.asarray(cT.row_update, D)),
          jnp.asarray(np.asarray(cT.col_main, D)),
          jnp.asarray(np.asarray(cT.col_half, D)))

    # correctness sanity vs the XLA reference for a few steps
    outs = run(aT, bT, ahsT, bhsT, xs[:K])
    aTo = np.asarray(outs[0])

    step = stencil.make_step_fn(c, av_enabled=False, exact_trig=False)
    ref = jax.jit(lambda s: jax.lax.scan(step, s, None, length=K)[0])(state)
    ref_a = np.asarray(ref.a)
    # exclude the hs-edge column M+1: the experiment kernel restores the
    # 1-step-old edge rather than carrying the 2-step rotation (perf
    # experiment only); a is unaffected but compare defensively
    mine = aTo[:, :NHP].T.copy()
    refa = ref_a.copy()
    mine[:, model.M + 1] = 0
    refa[:, model.M + 1] = 0
    err = np.max(np.abs(mine - refa))
    print(f"correctness: max |a_T - a_ref| after {K} steps = {err:.3e}")
    # guard: the in-kernel scalars are hardcoded to this config; a drift
    # would invalidate the timing as a measurement of the layout
    assert err < 1e-4, "transposed kernel diverged — timing is invalid"

    # timing
    a, b, ahs, bhs = (jnp.asarray(x) for x in (aT, bT, ahsT, bhsT))
    outs = run(a, b, ahs, bhs, xs)
    np.asarray(outs[0])
    t0 = time.perf_counter()
    reps = 10
    o = outs
    for _ in range(reps):
        o = run(o[0], o[1], o[2], o[3], xs)
    np.asarray(o[0])
    wall = time.perf_counter() - t0
    per_step = wall / (reps * K) * 1e6
    ups = 2 * (model.N + 1) * (model.M + 1) * reps * K / wall
    print(f"transposed kernel: {per_step:.2f} us/step, {ups:.3e} updates/s")


if __name__ == "__main__":
    main()
