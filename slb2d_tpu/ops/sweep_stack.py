"""Sublane-stacked sweep megakernel: VMEM-resident parameter sweeps.

The production sweep engine (parallel/sweep.py) vmaps the XLA stencil
over the point batch — every step streams the whole (B, NHP, MP) state
through HBM (~10 array passes/step), measured HBM-bound at 1.93e10
aggregate site-updates/s on BASELINE #2 (64 points, N=40 M=500).

This engine instead STACKS points along the sublane (harmonic) axis:
the batch becomes one (B*NHP, MP) array per state buffer, and a Pallas
grid walks point-GROUPS of G points — each (G*NHP, MP) group stays
VMEM-resident for a whole chunk of K steps (megakernel-class residency,
stepper_pallas.py), with zero halo/overlap cost because points are
independent along the stacked axis: the stencil's n±1 rolls leak across
point boundaries only into rows the existing row masks already zero
(row N is never updated; w_n[0]=0 and n_ge2[0..1]=0 kill the n-1 terms
at n<2 — the same data-driven branch elimination that handles the
physical n=0/1 special cases, ops/stencil.py).

Per-point physics scalars (E_dc, E_omega, B, bdt — reference constant
memory, src/boltzmann_gpu.cu:57-82) ride a (B*NHP, 128) column table and
broadcast row-wise through the SAME stencil math (apply_half_step takes
them as (rows, 1) columns transparently).  The running av() reduction
becomes COLUMN-wise: each row carries the running chain of its own
weighted row-sum, and only the physically meaningful rows (row 0 of a
point for v_y, row 1 for v_dr/m_x/quadratures) are read out — per-point
E_omega>0 gating (reference src/boltzmann_c_solver.c:188) is an `egate`
column.

omega sweeps run in the kernel's per-omega mode (round 4): trig comes
from per-point angle-addition chains resynced every TRIG_RESYNC steps
(device_trig's f32 class), each point's averaging window ends at its own
t_end (PP_TEND), and the display-4 loop-exit capture fires in-kernel at
each point's true exit step — so omega, a primary absorption-map axis,
stays on the fast engine.

Constraints: dt and t_start are shared across points (one t/xs table),
and one point must fit the VMEM residency bound (fits_vmem_point).
ParameterSweep falls back to the vmapped XLA engine when a point is too
large, when the mesh has a "space" axis, or for capture_state (frames)
with omega swept; a pure "sweep" mesh is supported — the stacked rows
shard at point-group boundaries (SweepStackRunner(mesh=..., axis=...),
shard_map over the sweep axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stencil
from .stepper_pallas import (XS_LANES, _pl_shift, build_xs_table,
                             capacity_rows)

# pparams columns (OMEGA..SDT feed the per-point-omega mode; CDT/SDT are
# cos/sin(omega*dt) — the angle-addition increments of the trig chains)
(PP_EDC, PP_EOM, PP_B, PP_BDT, PP_EGATE, PP_OMEGA, PP_TEND,
 PP_CDT, PP_SDT) = range(9)

# per-omega trig chains re-evaluate exactly every RESYNC steps, bounding
# the angle-addition drift at ~2*RESYNC ulp (~8e-6 relative) — measured
# necessity: 4-5 per-step column transcendentals on (G*NHP, 1) cost the
# engine its whole lead over the vmapped scan (2.10e10 vs the 3.16e10
# single-transcendental probe at BASELINE #2)
TRIG_RESYNC = 32
# av columns: count, <v_dr>, <v_y>, <m_x>, A, Asin, Kahan(A), Kahan(Asin)
AV_COLS = 8
# per-point-omega mode: 4 more av-table columns roll the loop-exit
# instantaneous capture (the vmapped engine's _make_point_step capture,
# parallel/sweep.py) — points exit at their OWN t_end there
CAP_COL0 = 8
CAP_KEYS = ("v_dr", "v_y", "m_x", "norm")


# Largest single point (NHP*MP f32 elements) the kernel can hold
# VMEM-resident at G=1 — beyond it even one-point groups cannot compile
# and ParameterSweep falls back to the vmapped XLA engine.  MEASURED on
# v5e (tests/perf/stack_bound_probe.py, G=1, N=100): 104x9600 = 998k
# compiles and runs; 104x10368 = 1.078M fails XLA:TPU compile with
# "Used 131.71M of 128.00M vmem" (~122 B/element = ~30.5 resident f32
# array copies), as do 1.185M and 1.278M.  Same ~1.0M bound as the
# single-run megakernel (stepper_pallas.fits_vmem).
MAX_POINT_ELEMS = 1_000_000


def fits_vmem_point(NHP: int, MP: int) -> bool:
    """Whether ONE sweep point fits the stack kernel's VMEM residency."""
    return NHP * MP <= MAX_POINT_ELEMS


def default_group_points(NHP: int, MP: int) -> int:
    """Points per VMEM-resident group (~400k f32 elements of state per
    group, the stepper_stream working-set heuristic)."""
    return max(1, 400_000 // (NHP * MP))


def _kernel(meta_ref, xs_ref, sparams_ref,
            a_ref, b_ref, ahs_ref, bhs_ref, a0_ref, ag_ref,
            pp_ref, ncol_ref, rowm_ref, edges_ref, av_ref,
            a_out, b_out, ahs_out, bhs_out, edges_out, av_out,
            *, unroll: int, edge_col: int, per_omega: bool = False):
    """Advance one point-group meta[0] steps in VMEM (see module doc).

    per_omega=True: omega varies per point — trig is evaluated in-kernel
    on per-point columns (f32 cos/sin of f32 products, the SAME class the
    vmapped engine's stencil.device_trig uses on its fast path), the
    averaging window ends at each point's own t_end (PP_TEND column), and
    the display-4 loop-exit instantaneous sums roll per point into av
    columns CAP_COL0.. (the vmapped capture semantics).  The shared-omega
    mode keeps its host-exact SMEM trig tables bit-for-bit."""
    dtype = a_ref.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    ME = edge_col

    a_out[:] = a_ref[:]
    b_out[:] = b_ref[:]
    ahs_out[:] = ahs_ref[:]
    bhs_out[:] = bhs_ref[:]
    edges_out[:] = edges_ref[:]
    av_out[:] = av_ref[:]

    nf = ncol_ref[:, 0:1]
    phi_row = rowm_ref[0:1, :]
    wav_row = rowm_ref[1:2, :]
    wavphi_row = rowm_ref[2:3, :]
    consts = stencil.StencilConsts(
        a0=a0_ref[:], a0_ghost=ag_ref[:], phi=phi_row,
        n_float=nf, row_update=ncol_ref[:, 3:4] > 0,
        n_ge2=ncol_ref[:, 1:2], w_n=ncol_ref[:, 2:3], b_row_mask=nf > 0,
        col_main=rowm_ref[3:4, :] > 0, col_half=rowm_ref[4:5, :] > 0,
        w_av=wav_row, w_av_phi=wavphi_row, col_edge=rowm_ref[5:6, :] > 0,
        E_dc=pp_ref[:, 0:1], E_omega=pp_ref[:, 1:2], B=pp_ref[:, 2:3],
        bdt=pp_ref[:, 3:4],
        dt=sparams_ref[0], nu=sparams_ref[1], nu2=sparams_ref[2],
        nu_tilde=sparams_ref[3], omega=sparams_ref[4],
        t_start=sparams_ref[5], t_end=sparams_ref[6])
    eg = pp_ref[:, 4:5]
    om_col = pp_ref[:, 5:6]
    tend_col = pp_ref[:, 6:7]
    dt = consts.dt

    def mu_of(cos_v):
        # per-point columns broadcast through the C operand order
        return nf * ((consts.E_dc + consts.E_omega * cos_v
                      + consts.B * phi_row) * dt / 2)

    def exact_chains(i):
        """Per-point (rows, 1) trig columns at step i, evaluated from
        scratch (stencil.device_trig's formula class: f32 products, f32
        cos/sin — the vmapped engine's fast path)."""
        t = xs_ref[i, 7]
        t_hs = t + dt / 2
        return (jnp.cos(om_col * t), jnp.sin(om_col * t),
                jnp.cos(om_col * t_hs), jnp.sin(om_col * t_hs))

    def do_step(i, carry):
        if per_omega:
            # per-point trig by angle-addition recurrence: column
            # transcendentals are ~30 vector ops each and 5/step erased
            # the engine's advantage (module constant note); the chains
            # advance by cos/sin(omega*dt) (PP_CDT/PP_SDT) at 12 cheap
            # column ops per step.  The chains arrive valid in the carry
            # — the loop structure below re-evaluates them exactly at
            # every TRIG_RESYNC-step block boundary (no in-step cond:
            # a lax.cond per unrolled step blew up the Mosaic compile,
            # >20 min vs ~2 min without)
            mu_main, ct, st, chs, shs = carry
            cdt = pp_ref[:, 7:8]
            sdt = pp_ref[:, 8:9]
            cos_t, sin_av, cos_hs = ct, st, chs
            cos_av = ct
            cos_t_dt = ct * cdt - st * sdt
            sin_t_dt = st * cdt + ct * sdt
            cos_hs_dt = chs * cdt - shs * sdt
            sin_hs_dt = shs * cdt + chs * sdt
        else:
            mu_main = carry
            cos_t = xs_ref[i, 0]
            cos_t_dt = xs_ref[i, 1]
            cos_hs = xs_ref[i, 2]
            cos_hs_dt = xs_ref[i, 3]
            cos_av = xs_ref[i, 4]
            sin_av = xs_ref[i, 5]
        do_av = xs_ref[i, 6] > 0
        t_i = xs_ref[i, 7]

        a = a_out[:]
        b = b_out[:]
        ahs = ahs_out[:]
        bhs = bhs_out[:]

        mu1_main = mu_of(cos_t_dt)
        a_new, b_new = stencil.apply_half_step(
            consts, a, b, ahs, bhs, cos_t, cos_t_dt, main=True,
            shift=_pl_shift, use_reciprocal=True,
            mus=(mu_main, mu1_main))
        ghost_on = ((i + meta_ref[1] + np.int32(1)) % np.int32(2)) == 0
        gf = jnp.where(ghost_on, one, zero)
        a_new = a_new + gf * consts.a0_ghost

        ahs_new, bhs_new = stencil.apply_half_step(
            consts, ahs, bhs, a_new, b_new, cos_hs, cos_hs_dt, main=False,
            shift=_pl_shift, use_reciprocal=True,
            mus=(mu_of(cos_hs), mu_of(cos_hs_dt)))
        old_edge_a = edges_out[:, 0:1]
        old_edge_b = edges_out[:, 1:2]
        new_edge_a = ahs[:, ME:ME + 1]
        new_edge_b = bhs[:, ME:ME + 1]

        # columnar av(): every row runs the chain of its own row-sum;
        # only rows 0/1 of each point are read out (module doc).  In
        # per-omega mode each point's window additionally ends at its OWN
        # t_end (the shared xs gate spans to the LONGEST window there).
        if per_omega:
            egm = eg * jnp.where(t_i < tend_col, one, zero)
        else:
            egm = eg

        @pl.when(do_av)
        def _():
            cnt = av_out[:, 0:1] + egm
            cnt_safe = jnp.maximum(cnt, one)
            s_vdr = jnp.sum(b_new * wav_row, axis=1, keepdims=True)
            s_vy = jnp.sum(a_new * wavphi_row, axis=1, keepdims=True)
            s_mx = jnp.sum(a_new * wav_row, axis=1, keepdims=True)
            av_out[:, 1:2] = (av_out[:, 1:2]
                              + egm * (s_vdr - av_out[:, 1:2]) / cnt_safe)
            av_out[:, 2:3] = (av_out[:, 2:3]
                              + egm * (s_vy - av_out[:, 2:3]) / cnt_safe)
            av_out[:, 3:4] = (av_out[:, 3:4]
                              + egm * (s_mx - av_out[:, 3:4]) / cnt_safe)
            y4 = egm * (cos_av * s_vdr * dt) - av_out[:, 6:7]
            t4 = av_out[:, 4:5] + y4
            av_out[:, 6:7] = (t4 - av_out[:, 4:5]) - y4
            av_out[:, 4:5] = t4
            y5 = egm * (sin_av * s_vdr * dt) - av_out[:, 7:8]
            t5 = av_out[:, 5:6] + y5
            av_out[:, 7:8] = (t5 - av_out[:, 5:6]) - y5
            av_out[:, 5:6] = t5
            av_out[:, 0:1] = cnt

        if per_omega:
            # loop-exit capture (vmapped _make_point_step semantics: the
            # last step with PRE-step t < t_end wins).  The vmapped
            # engine rolls the capture every live step; here the winning
            # step is identified exactly IN-KERNEL — the f32 t_i + dt
            # equals the schedule's next-step t bitwise (sequential
            # accumulation), so `live & (t_i + dt >= t_end)` fires
            # exactly once per point, at its true exit step — and the 4
            # extra row-sum passes run on ~G steps per chunk instead of
            # every step (measured: ungated capture cost the engine its
            # whole lead over the vmapped scan, 1.93e10 vs 2.11e10 agg)
            last_live = (t_i < tend_col) & (t_i + dt >= tend_col)

            @pl.when(jnp.any(last_live))
            def _():
                wd4 = rowm_ref[6:7, :]
                wd4p = rowm_ref[7:8, :]
                caps = (jnp.sum(b_new * wd4, axis=1, keepdims=True),
                        jnp.sum(a_new * wd4p, axis=1, keepdims=True),
                        jnp.sum(a_new * wd4, axis=1, keepdims=True),
                        jnp.sum(a_new * wav_row, axis=1, keepdims=True))
                for j, s in enumerate(caps):
                    col = slice(CAP_COL0 + j, CAP_COL0 + j + 1)
                    av_out[:, col] = jnp.where(last_live, s,
                                               av_out[:, col])

        a_out[:] = a_new
        b_out[:] = b_new
        ahs_out[:] = ahs_new
        bhs_out[:] = bhs_new
        ahs_out[:, ME:ME + 1] = old_edge_a
        bhs_out[:, ME:ME + 1] = old_edge_b
        edges_out[:, 0:1] = new_edge_a
        edges_out[:, 1:2] = new_edge_b
        if per_omega:
            return (mu1_main, cos_t_dt, sin_t_dt, cos_hs_dt, sin_hs_dt)
        return mu1_main

    n = meta_ref[0]
    if per_omega:
        # resync-block loop: RB steps per block (RB = TRIG_RESYNC rounded
        # down to a multiple of unroll), exact chain re-evaluation at
        # each block start, pure recurrence inside — zero conditionals
        RB = unroll * max(1, TRIG_RESYNC // unroll)

        def body_rb(b, carry):
            i0 = b * np.int32(RB)
            c = (carry[0],) + exact_chains(i0)

            def body8(j, c):
                i = i0 + j * np.int32(unroll)
                for k in range(unroll):
                    c = do_step(i + np.int32(k), c)
                return c

            return jax.lax.fori_loop(np.int32(0),
                                     np.int32(RB // unroll), body8, c)

        ct0, st0, chs0, shs0 = exact_chains(np.int32(0))
        carry = (mu_of(ct0), ct0, st0, chs0, shs0)
        n_rb = n // np.int32(RB)
        carry = jax.lax.fori_loop(np.int32(0), n_rb, body_rb, carry)
        # tail (< RB steps): one exact re-evaluation, then per-step.
        # When RB divides n the tail is empty and i0t == n — which can
        # equal the padded table capacity (capacity_rows is a 256
        # quantum), so clamp the re-eval index into the table; the
        # chains are unused then (the tail loop never executes).
        i0t = n_rb * np.int32(RB)
        i0t_safe = jnp.maximum(jnp.minimum(i0t, n - np.int32(1)),
                               np.int32(0))
        carry = (carry[0],) + exact_chains(i0t_safe)
        jax.lax.fori_loop(i0t, n, do_step, carry)
    else:
        def body(j, carry):
            i = j * np.int32(unroll)
            for k in range(unroll):
                carry = do_step(i + np.int32(k), carry)
            return carry

        n_by = n // np.int32(unroll)
        carry = mu_of(xs_ref[np.int32(0), 0])
        carry = jax.lax.fori_loop(np.int32(0), n_by, body, carry)
        jax.lax.fori_loop(n_by * np.int32(unroll), n, do_step, carry)


@functools.lru_cache(maxsize=None)
def _stack_run(B, Bp, G, NHP, MP, unroll, edge_col, dt, interpret,
               mesh=None, axis="sweep", per_omega=False):
    """Module-level jitted advance for one stacked-sweep geometry: cached
    so same-shape refinement grids (slb2d-sweep read-from=stdin) share a
    compiled executable like the vmapped engine's _run_sweep — the
    per-grid constants are ARGS, not closures.

    mesh: shard the point batch over the `axis` mesh axis (BASELINE #5's
    "sweep sharded across a v5e-8 mesh", on the fast engine): the
    row-stacked arrays shard along axis 0 at point boundaries (Bp is a
    multiple of shards*G), each device walks its own VMEM-resident point
    groups — embarrassingly parallel, zero collectives in the hot loop."""
    D = jnp.float32
    GR = G * NHP
    S = mesh.shape[axis] if mesh is not None else 1
    n_groups = Bp // G // S                   # per-device pallas grid
    kernel = functools.partial(_kernel, unroll=unroll, edge_col=edge_col,
                               per_omega=per_omega)

    def _blk(rows, lanes):
        return pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def _shared(shape, space=pltpu.VMEM):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=space)

    rows_loc = Bp * NHP // S                  # per-device stacked rows

    def make_call(cap):
        call = pl.pallas_call(
            kernel,
            grid=(n_groups,),
            in_specs=[
                _shared((4,), pltpu.SMEM),
                _shared((cap, XS_LANES), pltpu.SMEM),
                _shared((16,), pltpu.SMEM),
                _blk(GR, MP), _blk(GR, MP), _blk(GR, MP),
                _blk(GR, MP), _blk(GR, MP), _blk(GR, MP),
                _blk(GR, 128), _blk(GR, 128), _shared((8, MP)),
                _blk(GR, 128), _blk(GR, 128),
            ],
            out_specs=[_blk(GR, MP)] * 4 + [_blk(GR, 128)] * 2,
            out_shape=[jax.ShapeDtypeStruct((rows_loc, MP), D)
                       for _ in range(4)]
            + [jax.ShapeDtypeStruct((rows_loc, 128), D)] * 2,
            input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3, 12: 4, 13: 5},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
        if mesh is None:
            return call
        from jax.sharding import PartitionSpec as P
        rs = P(axis, None)                    # row-sharded at point bounds
        return jax.shard_map(
            call, mesh=mesh,
            in_specs=(P(), P(), P(), rs, rs, rs, rs, rs, rs,
                      rs, rs, P(), rs, rs),
            out_specs=(rs, rs, rs, rs, rs, rs), check_vma=False)

    @functools.partial(jax.jit, donate_argnums=0)
    def run(states: stencil.State, consts_dev, psel, xs_table,
            sparams_arg, meta, cap_arr=None):
        # (B, NHP, MP) batched -> (Bp*NHP, MP) stacked, pad by point 0
        def stack(x):
            return x[psel].reshape(Bp * NHP, MP)

        a, b = stack(states.a), stack(states.b)
        ahs, bhs = stack(states.a_hs), stack(states.b_hs)
        edges = jnp.zeros((Bp * NHP, 128), D)
        edges = edges.at[:, 0].set(
            states.hs_edge_a[psel].reshape(Bp * NHP))
        edges = edges.at[:, 1].set(
            states.hs_edge_b[psel].reshape(Bp * NHP))
        # broadcast per-point av to all of its rows: each row then
        # carries a valid chain for ITS row-sum; rows 0/1 are read out
        av = jnp.zeros((Bp * NHP, 128), D)
        av = av.at[:, :AV_COLS].set(
            jnp.repeat(states.av[psel], NHP, axis=0))
        if per_omega:
            # resume the rolled loop-exit captures: points already past
            # their t_end never update again, so the incoming values
            # must seed the columns
            av = av.at[:, CAP_COL0:CAP_COL0 + 4].set(
                jnp.repeat(cap_arr[psel], NHP, axis=0))

        a0d, agd, ppd, ncold, rowmd = consts_dev
        outs = make_call(xs_table.shape[0])(
            meta, xs_table, sparams_arg,
            a, b, ahs, bhs, a0d, agd, ppd, ncold, rowmd, edges, av)
        a, b, ahs, bhs, edges_o, av_o = outs

        def unstack(x):
            return x.reshape(Bp, NHP, MP)[:B]

        r0 = jnp.arange(B) * NHP
        av_new = jnp.stack([
            av_o[r0, 0], av_o[r0 + 1, 1], av_o[r0, 2],
            av_o[r0 + 1, 3], av_o[r0 + 1, 4], av_o[r0 + 1, 5],
            av_o[r0 + 1, 6], av_o[r0 + 1, 7]], axis=1)
        n = meta[0]
        t_next = xs_table[n - 1, 7] + D(dt)
        out = stencil.State(
            a=unstack(a), b=unstack(b), a_hs=unstack(ahs),
            b_hs=unstack(bhs),
            hs_edge_a=edges_o[:, 0].reshape(Bp, NHP)[:B],
            hs_edge_b=edges_o[:, 1].reshape(Bp, NHP)[:B],
            av=av_new,
            t=jnp.broadcast_to(t_next, (B,)),
            step=states.step + n)
        if not per_omega:
            return out
        C0 = CAP_COL0
        cap_new = jnp.stack([
            av_o[r0 + 1, C0], av_o[r0, C0 + 1],
            av_o[r0 + 1, C0 + 2], av_o[r0, C0 + 3]], axis=1)
        return out, cap_new

    return run


class SweepStackRunner:
    """advance(states, n_steps) for a ParameterSweep batch: states keep
    the canonical (B, NHP, MP) layout (checkpoint/capture compatible);
    each call reshapes to the stacked layout, runs ceil-padded point
    groups through the kernel grid, and reshapes back.  One compiled
    executable serves every chunk length (SMEM meta + padded xs capacity,
    the stepper_pallas design)."""

    def __init__(self, sweep, interpret=None, unroll=None, g_points=None,
                 mesh=None, axis="sweep"):
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        base = sweep.base
        D = base.np_dtype
        if D != np.float32:
            raise ValueError("sweep stack engine is float32-only")
        self.per_omega = "omega" in sweep.params
        self.sweep = sweep
        self.base = base
        self.mesh, self.axis = mesh, axis
        S = mesh.shape[axis] if mesh is not None else 1
        B, NHP, MP = sweep.B, base.NHP, base.MP
        G = g_points or min(max(1, B // S),
                            default_group_points(NHP, MP))
        Bp = -(-B // (S * G)) * (S * G)    # pad to shards x groups
        self.B, self.Bp, self.G, self.NHP, self.MP = B, Bp, G, NHP, MP
        GR = G * NHP
        n_groups = Bp // G
        pad_sel = np.concatenate(
            [np.arange(B), np.zeros(Bp - B, np.int64)])
        self._pad_sel = pad_sel

        models = [sweep.models[i] for i in pad_sel]
        c0 = stencil.consts_from_model(base)
        self.c0 = c0

        a0 = np.concatenate([np.asarray(m.a0, D) for m in models])
        ag = np.concatenate([np.asarray(m.a0_ghost, D) for m in models])
        pp = np.zeros((Bp * NHP, 128), D)
        for p, m in enumerate(models):
            rows = slice(p * NHP, (p + 1) * NHP)
            pp[rows, PP_EDC] = D(m.E_dc)
            pp[rows, PP_EOM] = D(m.E_omega)
            pp[rows, PP_B] = D(m.B)
            pp[rows, PP_BDT] = D(m.bdt)
            pp[rows, PP_EGATE] = D(1) if float(m.E_omega) > 0 else D(0)
            pp[rows, PP_OMEGA] = D(m.omega)
            pp[rows, PP_TEND] = D(D(base.cfg.t_start) + m.T)
            # angle-addition increments for the per-omega trig chains
            pp[rows, PP_CDT] = D(np.cos(np.float64(m.omega)
                                        * np.float64(base.dt)))
            pp[rows, PP_SDT] = D(np.sin(np.float64(m.omega)
                                        * np.float64(base.dt)))
        ncol1 = np.zeros((NHP, 128), D)
        ncol1[:, 0] = np.asarray(c0.n_float, D).ravel()
        ncol1[:, 1] = np.asarray(c0.n_ge2, D).ravel()
        ncol1[:, 2] = np.asarray(c0.w_n, D).ravel()
        ncol1[:, 3] = np.asarray(c0.row_update, D).ravel()
        ncol = np.tile(ncol1, (Bp, 1))
        rowm = np.zeros((8, MP), D)
        rowm[0] = np.asarray(c0.phi, D)
        rowm[1] = np.asarray(c0.w_av, D)
        rowm[2] = np.asarray(c0.w_av_phi, D)
        rowm[3] = np.asarray(c0.col_main, D).ravel()
        rowm[4] = np.asarray(c0.col_half, D).ravel()
        rowm[5] = np.asarray(c0.col_edge, D).ravel()
        # display-4 instantaneous-capture weights (per-omega mode): the
        # inline-sum bounds m=1..M-1 (src/boltzmann_c_solver.c:241)
        rowm[6] = np.asarray(base.w_d4, D)
        rowm[7] = np.asarray(base.w_d4_phi, D)

        sparams = np.zeros(16, D)
        # xs do_av gate spans to the LONGEST point's window end; in
        # per-omega mode each point's own end rides its PP_TEND column
        t_end = max(D(D(base.cfg.t_start) + m.T) for m in models)
        for j, v in enumerate((base.dt, base.nu, base.nu2, base.nu_tilde,
                               base.omega, D(base.cfg.t_start), t_end)):
            sparams[j] = D(v)
        self.t_end = float(t_end)

        if mesh is None:
            self._consts_dev = tuple(jnp.asarray(x)
                                     for x in (a0, ag, pp, ncol, rowm))
            self._psel = jnp.asarray(pad_sel)
        else:
            # host numpy -> global sharded arrays (multi-host safe, the
            # parallel/sweep.py convention): row-stacked consts shard
            # along axis 0 at point-group boundaries
            from jax.sharding import NamedSharding, PartitionSpec as P
            rshard = NamedSharding(mesh, P(axis))
            repl = NamedSharding(mesh, P())
            self._consts_dev = tuple(
                jax.device_put(x, s) for x, s in
                ((a0, rshard), (ag, rshard), (pp, rshard),
                 (ncol, rshard), (rowm, repl)))
            self._psel = jax.device_put(pad_sel, repl)
        self._geom = (B, Bp, G, NHP, MP,
                      unroll or (8 if GR * MP >= 64 * 1024 else 1),
                      base.M + 1, float(base.dt), interpret, mesh, axis,
                      self.per_omega)
        self._jit_run = _stack_run(*self._geom)
        self.sparams = sparams
        # prime the xs capacity at the full 512-step launch so every
        # chunk (and every same-shape refinement grid) shares ONE compile
        self._cap = capacity_rows(512)
        self.step0 = 0
        self.t0 = 0.0

    def reserve(self, n_steps):
        self._cap = max(self._cap, capacity_rows(n_steps))

    def seek(self, done_steps):
        """Position the host-side (t, step) trackers at an absolute step
        count (checkpoint resume)."""
        if done_steps != self.step0:
            from ..runtime.schedule import accum_sequence
            self.step0 = done_steps
            self.t0 = float(accum_sequence(0.0, float(self.base.dt),
                                           done_steps,
                                           self.base.np_dtype)[-1])

    def advance(self, states, n_steps, cap=None):
        """Advance the whole batch n_steps (chunked internally at the
        SMEM xs capacity limit of 512 steps per launch).

        per-omega mode additionally threads the rolled loop-exit capture:
        cap is a dict of (B,) arrays over CAP_KEYS (zeros on a fresh
        start) and the return value is (states, new_cap_dict); shared-
        omega mode ignores cap and returns states alone."""
        D = self.base.np_dtype
        if self.per_omega:
            cap_arr = jnp.stack(
                [jnp.asarray(cap[k], D) for k in CAP_KEYS], axis=1)
        done = 0
        while done < n_steps:
            k = min(512, n_steps - done)
            # exact tables: the vmapped XLA engine carries per-point t by
            # sequential f32 accumulation — the exact table reproduces
            # that bit-for-bit, so per-step averaging gates cannot drift
            # by a step between the two sweep engines
            xs = build_xs_table(self.base, self.c0, self.t0,
                                self.step0, k, av_enabled=True, exact=True)
            # per-point E_omega gating rides the kernel's egate column;
            # the table's global gate is the time window only
            xs[:, 6] = ((xs[:, 7] >= D(self.base.cfg.t_start))
                        & (xs[:, 7] < D(self.t_end))).astype(D)
            self.reserve(k)
            t_last = xs[k - 1, 7]
            if xs.shape[0] < self._cap:
                xs = np.concatenate(
                    [xs, np.zeros((self._cap - k, XS_LANES), D)])
            meta = jnp.asarray(np.array([k, self.step0 % 2, 0, 0],
                                        np.int32))
            args = (states, self._consts_dev, self._psel, jnp.asarray(xs),
                    jnp.asarray(self.sparams), meta)
            if self.per_omega:
                states, cap_arr = self._jit_run(*args, cap_arr)
            else:
                states = self._jit_run(*args)
            self.step0 += k
            self.t0 = float(D(t_last + D(self.base.dt)))
            done += k
        if self.per_omega:
            return states, {k2: cap_arr[:, j]
                            for j, k2 in enumerate(CAP_KEYS)}
        return states
