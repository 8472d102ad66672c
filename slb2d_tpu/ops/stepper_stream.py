"""HBM-streaming Pallas engine: temporal-blocked m-tiles, any grid size.

The VMEM-resident megakernel (stepper_pallas.py) dies at ~1.0M grid
points — beyond that the whole state cannot live in VMEM and round 2 fell
back to the XLA scan (2.1e10 vs 4.5e10 site-updates/s, a 2.2x cliff
exactly where grids get expensive).  This engine removes the cliff with
classic overlapped temporal tiling, mapped onto the Pallas pipeline:

  * the phi_y axis is cut into tiles of W columns; each kernel instance
    loads its tile plus an H-column halo block per side (Pallas block
    specs with clamped index maps; the DMA pipeline double-buffers
    automatically), assembles a (NHP, W+2H) working array in VMEM, and
    advances it K FULL steps before writing the W center columns back;
  * one full step propagates information by <= 2 columns (two half-steps
    of a (n±1, m±1) stencil), so after K steps the center W columns are
    exact provided 2K <= H — the halo region absorbs the error wave
    (trapezoid argument).  HBM traffic per step falls from ~10 array
    passes (XLA scan: read 4 + write 2 per half-step) to (3r+w)*4/K
    passes; compute overhead is (W+2H)/W (12.5% at W=2048);
  * the running-average reduction needs a GLOBAL row sum per step, which
    tiles cannot know — the kernel instead emits the 4 raw weighted row
    sums of its center columns per step, accumulated across tiles into an
    SMEM table; a tiny lax.scan afterwards replays the reference av()
    chain (src/boltzmann_c_solver.c:413-437) from those sums via
    stencil.av_update_from_sums, and display-77 emission records are
    gathered from the same per-step sums (pre-step sums of step k are the
    post-step sums of step k-1).

The stencil math is ops/stencil.apply_half_step verbatim (imported), as
in the other two engines; buffer-staleness quirks (hs edge column, parity
ghost fill) are reproduced per tile — any tile whose working array covers
column M+1 maintains the retired-edge chain locally, which is exact
wherever the trapezoid validity holds and harmless elsewhere.

Reference anchors: the CUDA kernels re-launched per half-step from HBM
(src/boltzmann_gpu.cu:1169-1265, cudaThreadSynchronize between the
dependent launches, src/boltzmann_solver.c:211); temporal blocking across
K steps has no reference counterpart — it is the TPU answer to "the grid
no longer fits on chip".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stencil
from .stepper_pallas import (SCALAR_FIELDS, XS_LANES, _pl_shift,
                             pack_xs_dict)

H = 128                    # halo block width (one lane tile)
SUM_LANES = 8              # per-step sums: norm, v_dr, v_y, m_x (+pad)
LAUNCH_QUANTUM = 4         # xs capacity rounds to this many launches


def default_k_steps() -> int:
    """Steps per launch: 2K <= H bounds correctness; K=64 uses the full
    halo and measured fastest on v5e at N=100 M=12000 (3.38e10 vs
    3.24e10 at K=32 and 2.98e10 at W=3072; tuning table in PERF.md)."""
    return 64


# Extended-tile element budget NHP*(W+2H), MEASURED against Mosaic's
# scoped stack: 700k put an NHP=408, W=1408 kernel 876 KB over the
# 100 MB limit on v5e; 620k compiles.  Applies to ANY launch of this
# kernel — the sharded runner (one (W_ext)-wide tile per shard) checks
# the same number.
TILE_ELEM_BUDGET = 620_000


def default_tile_w(NHP: int) -> int:
    """Center tile width: as wide as a comfortable VMEM working set
    allows (working arrays + ~15 elementwise temporaries of (NHP, W+2H)
    floats), multiple of the 128-lane tile.  Wider tiles matter for
    tall-thin grids (large n-harmonics): the halo overhead is (W+2H)/W."""
    budget_cols = max(256, (TILE_ELEM_BUDGET // max(NHP, 1)) - 2 * H)
    return int(min(2048, (budget_cols // 128) * 128))


def _stream_kernel(meta_ref,                  # SMEM (4,) i32: n, parity
                   xs_ref,                    # SMEM (K, XS_LANES)
                   params_ref,                # SMEM (16,)
                   a_c, a_l, a_r, b_c, b_l, b_r,
                   ahs_c, ahs_l, ahs_r, bhs_c, bhs_l, bhs_r,
                   a0_c, a0_l, a0_r, ag_c, ag_l, ag_r,
                   rowc_c, rowc_l, rowc_r,    # (8, W|H) col consts
                   ncol_ref,                  # (NHP, 128) row consts
                   edges_ref,                 # (NHP, 128) in edges
                   a_out, b_out, ahs_out, bhs_out,     # center blocks
                   edges_out,                 # (NHP, 128) accumulated
                   sums_out,                  # SMEM (K, SUM_LANES) accum
                   wa, wb, wahs, wbhs,        # VMEM (NHP, WT) scratch
                   edge_s,                    # VMEM (NHP, 128) scratch
                   *, K: int, W: int, unroll: int):
    """Advance one W-column tile K steps inside VMEM (see module doc)."""
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    dtype = a_c.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)

    @pl.when(i == 0)
    def _():
        edges_out[:] = jnp.zeros_like(edges_out)
        for k in range(K):
            for j in range(SUM_LANES):
                sums_out[k, j] = zero

    # assemble the working tile: [left halo | center | right halo]
    wa[:, :H] = a_l[:]
    wa[:, H:H + W] = a_c[:]
    wa[:, H + W:] = a_r[:]
    wb[:, :H] = b_l[:]
    wb[:, H:H + W] = b_c[:]
    wb[:, H + W:] = b_r[:]
    wahs[:, :H] = ahs_l[:]
    wahs[:, H:H + W] = ahs_c[:]
    wahs[:, H + W:] = ahs_r[:]
    wbhs[:, :H] = bhs_l[:]
    wbhs[:, H:H + W] = bhs_c[:]
    wbhs[:, H + W:] = bhs_r[:]
    edge_s[:] = edges_ref[:]

    # working-tile constants (values, not refs — XLA keeps them hoisted)
    a0_w = jnp.concatenate([a0_l[:], a0_c[:], a0_r[:]], axis=1)
    ag_w = jnp.concatenate([ag_l[:], ag_c[:], ag_r[:]], axis=1)
    rw = jnp.concatenate([rowc_l[:], rowc_c[:], rowc_r[:]], axis=1)
    phi_w = rw[0:1, :]
    colmain_w = rw[3:4, :] > 0
    colhalf_w = rw[4:5, :] > 0
    # the hs-edge one-hot at global column M+1: at the OUTERMOST tiles the
    # clamped halo blocks duplicate a center block, which would duplicate
    # the one-hot — zero the halo copies there (the duplicated halo region
    # is beyond the global array; only masked/invalid positions read it)
    lf = jnp.where(i > 0, one, zero)
    rf = jnp.where(i < nt - 1, one, zero)
    emaskf = jnp.concatenate(
        [rowc_l[5:6, :] * lf, rowc_c[5:6, :], rowc_r[5:6, :] * rf], axis=1)
    emask = emaskf > 0
    wav_c = rowc_c[1:2, :]           # center w_av / w_av_phi for the sums
    wavphi_c = rowc_c[2:3, :]
    nf = ncol_ref[:, 0:1]

    consts = stencil.StencilConsts(
        a0=a0_w, a0_ghost=ag_w, phi=phi_w,
        n_float=nf, row_update=ncol_ref[:, 3:4] > 0,
        n_ge2=ncol_ref[:, 1:2], w_n=ncol_ref[:, 2:3], b_row_mask=nf > 0,
        col_main=colmain_w, col_half=colhalf_w,
        w_av=wav_c, w_av_phi=wavphi_c, col_edge=emask,
        **{name: params_ref[j] for j, name in enumerate(SCALAR_FIELDS)})

    def mu_of(cos_v):
        # C operand order (src/boltzmann_c_solver.c:363-365)
        return nf * ((consts.E_dc + consts.E_omega * cos_v
                      + consts.B * phi_w) * consts.dt / 2)

    def do_step(s, mu_main):
        cos_t = xs_ref[s, 0]
        cos_t_dt = xs_ref[s, 1]
        cos_hs = xs_ref[s, 2]
        cos_hs_dt = xs_ref[s, 3]

        a = wa[:]
        b = wb[:]
        ahs = wahs[:]
        bhs = wbhs[:]

        mu1_main = mu_of(cos_t_dt)
        a_new, b_new = stencil.apply_half_step(
            consts, a, b, ahs, bhs, cos_t, cos_t_dt, main=True,
            shift=_pl_shift, use_reciprocal=True, mus=(mu_main, mu1_main))
        # parity ghost fill (see stepper_pallas._kernel)
        ghost_on = ((s + meta_ref[1] + np.int32(1)) % np.int32(2)) == 0
        gf = jnp.where(ghost_on, one, zero)
        a_new = a_new + gf * ag_w

        ahs_new, bhs_new = stencil.apply_half_step(
            consts, ahs, bhs, a_new, b_new, cos_hs, cos_hs_dt, main=False,
            shift=_pl_shift, use_reciprocal=True,
            mus=(mu_of(cos_hs), mu_of(cos_hs_dt)))
        # stale hs edge column (4-buffer rotation): restore the retired
        # edge and retire the pre-update one, chained locally per tile
        old_a = edge_s[:, 0:1]
        old_b = edge_s[:, 1:2]
        new_a = jnp.sum(ahs * emaskf, axis=1, keepdims=True)
        new_b = jnp.sum(bhs * emaskf, axis=1, keepdims=True)
        ahs_new = jnp.where(emask, old_a, ahs_new)
        bhs_new = jnp.where(emask, old_b, bhs_new)

        wa[:] = a_new
        wb[:] = b_new
        wahs[:] = ahs_new
        wbhs[:] = bhs_new
        edge_s[:, 0:1] = new_a
        edge_s[:, 1:2] = new_b

        # per-step raw sums over the OWNED center columns (w_av is zero at
        # padding, so tile partials add up to the global av()/norm sums)
        sums_out[s, 0] = sums_out[s, 0] + jnp.sum(
            a_new[0:1, H:H + W] * wav_c)
        sums_out[s, 1] = sums_out[s, 1] + jnp.sum(
            b_new[1:2, H:H + W] * wav_c)
        sums_out[s, 2] = sums_out[s, 2] + jnp.sum(
            a_new[0:1, H:H + W] * wavphi_c)
        sums_out[s, 3] = sums_out[s, 3] + jnp.sum(
            a_new[1:2, H:H + W] * wav_c)
        return mu1_main

    def body(j, carry):
        s = j * np.int32(unroll)
        for k in range(unroll):
            carry = do_step(s + np.int32(k), carry)
        return carry

    n = meta_ref[0]
    n_by = n // np.int32(unroll)
    carry = mu_of(xs_ref[np.int32(0), 0])
    carry = jax.lax.fori_loop(np.int32(0), n_by, body, carry)
    jax.lax.fori_loop(n_by * np.int32(unroll), n, do_step, carry)

    # write back the center; contribute the edge chain iff this tile OWNS
    # column M+1 (one-hot in the center block)
    a_out[:] = wa[:, H:H + W]
    b_out[:] = wb[:, H:H + W]
    ahs_out[:] = wahs[:, H:H + W]
    bhs_out[:] = wbhs[:, H:H + W]
    # rowc row 6 is the OWNED-ONLY edge one-hot: identical to row 5 on
    # the single-device path, but zeroed at halo positions on the sharded
    # ext path so exactly one shard contributes the edge chain
    owner = jnp.where(jnp.sum(rowc_c[6:7, :]) > 0, one, zero)
    edges_out[:] = edges_out[:] + owner * edge_s[:]


def _build_launch_call(NHP, W, K, MP_s, unroll, interpret):
    """The shape-parameterized pallas_call for one K-step launch over a
    (NHP, MP_s) array set: grid of MP_s/W tiles, 3 specs per blocked
    input (center W + clamped H-halo blocks each side).  Consts are
    runtime args, so the single-device and sharded-ext paths share it."""
    n_tiles = MP_s // W
    cb = W // H
    nhb = MP_s // H
    WT = W + 2 * H
    kernel = functools.partial(_stream_kernel, K=K, W=W, unroll=unroll)

    def _rspec(shape, space=pltpu.VMEM):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=space)

    def _cspec(rows):
        return (pl.BlockSpec((rows, W), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, H),
                             lambda i: (0, jnp.maximum(i * cb - 1, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (rows, H),
                    lambda i: (0, jnp.minimum(i * cb + cb, nhb - 1)),
                    memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=(
            [_rspec((4,), pltpu.SMEM),
             _rspec((K, XS_LANES), pltpu.SMEM),
             _rspec((16,), pltpu.SMEM)]
            + [s for _ in range(4) for s in _cspec(NHP)]
            + list(_cspec(NHP)) + list(_cspec(NHP)) + list(_cspec(8))
            + [_rspec((NHP, 128)), _rspec((NHP, 128))]),
        out_specs=[_cspec(NHP)[0] for _ in range(4)]
        + [_rspec((NHP, 128)), _rspec((K, SUM_LANES), pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((NHP, MP_s), jnp.float32)
                   for _ in range(4)]
        + [jax.ShapeDtypeStruct((NHP, 128), jnp.float32),
           jax.ShapeDtypeStruct((K, SUM_LANES), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((NHP, WT), jnp.float32)
                        for _ in range(4)]
        + [pltpu.VMEM((NHP, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def make_stream_runner(c: stencil.StencilConsts, model, av_enabled=True,
                       exact_trig=False, interpret=None, K=None, W=None,
                       unroll=None):
    """Driver-compatible Runner (same surface as stepper_pallas's):
    run_xs(state, xs_dict, parity0, emit_idx) -> State, plus take_obs /
    reserve / update_consts, plus the (state, n_steps) __call__ used by
    benches.  Works at ANY grid size; intended for grids beyond the
    megakernel's VMEM bound (Simulation picks automatically).
    av_enabled/exact_trig affect only the __call__ path's self-built
    tables; run_xs gating rides the schedule's xs do_av lane."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    D = model.np_dtype
    if D != np.float32:
        raise ValueError("pallas steppers are float32-only (TPU native)")
    NHP, MP = model.NHP, model.MP
    if K is None:
        K = default_k_steps()
    if W is None:
        W = default_tile_w(NHP)
    if unroll is None:
        unroll = 8 if NHP * (W + 2 * H) >= (64 * 1024) else 1
    if unroll < 1:
        raise ValueError(f"unroll must be >= 1, got {unroll}")
    if 2 * K > H:
        raise ValueError(f"K={K} violates the halo bound 2K <= H={H}")
    W = min(W, ((MP + 127) // 128) * 128)     # never wider than the grid
    MP_s = ((MP + W - 1) // W) * W            # stream-padded lane extent
    n_tiles = MP_s // W

    params = np.zeros(16, D)
    for j, name in enumerate(SCALAR_FIELDS):
        params[j] = D(getattr(c, name))

    launch_call = _build_launch_call(NHP, W, K, MP_s, unroll, interpret)

    def padc(arr2d):
        out = np.zeros((arr2d.shape[0], MP_s), D)
        out[:, :MP] = np.asarray(arr2d, D)
        return out

    a0_p = padc(c.a0)
    ag_p = padc(c.a0_ghost)
    rowc = np.zeros((8, MP_s), D)
    rowc[0, :MP] = np.asarray(c.phi, D)
    rowc[1, :MP] = np.asarray(c.w_av, D)
    rowc[2, :MP] = np.asarray(c.w_av_phi, D)
    rowc[3, :MP] = np.asarray(c.col_main, D).ravel()
    rowc[4, :MP] = np.asarray(c.col_half, D).ravel()
    rowc[5, :MP] = np.asarray(c.col_edge, D).ravel()
    ncol = np.zeros((NHP, 128), D)
    ncol[:, 0] = np.asarray(c.n_float, D).ravel()
    ncol[:, 1] = np.asarray(c.n_ge2, D).ravel()
    ncol[:, 2] = np.asarray(c.w_n, D).ravel()
    ncol[:, 3] = np.asarray(c.row_update, D).ravel()

    rowc[6] = rowc[5]                         # owned == center here
    w_av_p = jnp.asarray(rowc[1])             # padded, for presum0
    w_av_phi_p = jnp.asarray(rowc[2])

    a0_d, ag_d, rowc_d, ncol_d = (jnp.asarray(a0_p), jnp.asarray(ag_p),
                                  jnp.asarray(rowc), jnp.asarray(ncol))

    @functools.partial(jax.jit, donate_argnums=0)
    def run(state: stencil.State, xs_all, metas, params_arg, emit_arr):
        pad = ((0, 0), (0, MP_s - MP))
        a = jnp.pad(state.a, pad)
        b = jnp.pad(state.b, pad)
        ahs = jnp.pad(state.a_hs, pad)
        bhs = jnp.pad(state.b_hs, pad)
        edges = jnp.zeros((NHP, 128), D)
        edges = edges.at[:, 0].set(state.hs_edge_a)
        edges = edges.at[:, 1].set(state.hs_edge_b)

        presum0 = jnp.stack([
            jnp.sum(a[0] * w_av_p), jnp.sum(b[1] * w_av_p),
            jnp.sum(a[0] * w_av_phi_p), jnp.sum(a[1] * w_av_p)])

        def real(carry, xs_l, meta_l):
            ca, cb_, cahs, cbhs, cedges = carry
            outs = launch_call(
                meta_l, xs_l, params_arg,
                ca, ca, ca, cb_, cb_, cb_, cahs, cahs, cahs,
                cbhs, cbhs, cbhs,
                a0_d, a0_d, a0_d, ag_d, ag_d, ag_d,
                rowc_d, rowc_d, rowc_d, ncol_d, cedges)
            na, nb, nahs, nbhs, nedges, sums = outs
            return (na, nb, nahs, nbhs, nedges), sums

        def launch(carry, inp):
            xs_l, meta_l = inp
            # capacity-padding launches (n=0) skip the kernel entirely —
            # a real launch would still pay a full HBM read+write pass
            return jax.lax.cond(
                meta_l[0] > 0, real,
                lambda c_, *_: (c_, jnp.zeros((K, SUM_LANES), D)),
                carry, xs_l, meta_l)

        (a, b, ahs, bhs, edges), sums_all = jax.lax.scan(
            launch, (a, b, ahs, bhs, edges), (xs_all, metas))

        LK = xs_all.shape[0] * K
        sums_flat = sums_all.reshape(LK, SUM_LANES)
        xs_flat = xs_all.reshape(LK, XS_LANES)

        # replay the reference av() chain from the per-step sums
        def av_step(av, row):
            s_row, x_row = row
            new = stencil.av_update_from_sums(
                c, av, s_row[1], s_row[2], s_row[3], x_row[4], x_row[5])
            out = jnp.where(x_row[6] > 0, new, av)
            return out, out

        av_final, av_seq = jax.lax.scan(
            av_step, jnp.asarray(state.av), (sums_flat, xs_flat))

        # display-77 records: pre-step sums = post sums of the previous
        # step (or the incoming state for step 0) + loop t + post av
        pre = jnp.concatenate([presum0[None, :], sums_flat[:-1, :4]])[
            :, :4]
        obs = jnp.concatenate(
            [pre[emit_arr], xs_flat[emit_arr, 7:8], av_seq[emit_arr]],
            axis=1)

        return stencil.State(
            a=a[:, :MP], b=b[:, :MP], a_hs=ahs[:, :MP], b_hs=bhs[:, :MP],
            hs_edge_a=edges[:, 0], hs_edge_b=edges[:, 1], av=av_final,
            t=state.t, step=state.step), obs

    r = _StreamRunner(run, model, c, params, K,
                      av_enabled=av_enabled, exact_trig=exact_trig)
    r.W, r.MP_s, r.n_tiles = W, MP_s, n_tiles
    return r


def validate_sharded_geometry(NHP: int, MP: int, S: int) -> None:
    """Reject sharded-stream geometries that cannot run: non-H-multiple
    per-shard slices, and per-shard VMEM working sets over the measured
    budget.  The sharded launch is the single-device kernel with ONE
    (W_ext = MP/S + 2H)-wide tile, so the measured extended-tile budget
    (TILE_ELEM_BUDGET vs Mosaic's 100 MB scoped stack) applies verbatim
    — beyond it the compile fails, so fail fast with guidance instead.
    Called eagerly by the driver's _select_impl and again by
    make_sharded_stream_runner."""
    if MP % S or (MP // S) % H:
        raise ValueError(
            f"sharded stream needs MP={MP} divisible into {H}-column "
            f"multiples across {S} shards; pick g-grid/shards so that "
            f"(M+3 padded to 128) / shards is a multiple of {H}")
    W_ext = MP // S + 2 * H
    if NHP * (W_ext + 2 * H) > TILE_ELEM_BUDGET:
        raise ValueError(
            f"per-shard extended slice {NHP}x{W_ext} exceeds the "
            f"measured VMEM working-set budget "
            f"({NHP * (W_ext + 2 * H)} > {TILE_ELEM_BUDGET} elements); "
            f"raise shards=")


def make_sharded_stream_runner(c: stencil.StencilConsts, model, mesh,
                               axis: str = "space", av_enabled=True,
                               exact_trig=False, interpret=None, K=None,
                               unroll=None):
    """The stream engine shard_map'd over the phi_y axis: pallas-class
    speed for `shards>1` runs (round-2 Weak #2's second half — those
    previously always fell back to the XLA scan).

    Each shard holds its (NHP, MP/S) slice; per K-step launch it receives
    an H-column halo from each neighbor via `jax.lax.ppermute` (2*(NHP*H)
    floats per direction per K steps, riding ICI), assembles the extended
    (NHP, MP/S + 2H) array, and runs the SAME temporal-tiling kernel on
    it as one tile — the trapezoid absorbs the halo staleness exactly as
    in the single-device case (2K <= H).  Per-shard extended constants
    are precomputed host-side; per-step observable sums are shard-local
    partials psum'd across the mesh.  State keeps its driver-facing
    global (NHP, MP) shape, sharded along m (parallel/spatial.py specs).
    """
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    D = model.np_dtype
    if D != np.float32:
        raise ValueError("pallas steppers are float32-only (TPU native)")
    NHP, MP = model.NHP, model.MP
    S = mesh.shape[axis]
    validate_sharded_geometry(NHP, MP, S)
    MP_loc = MP // S
    W_ext = MP_loc + 2 * H
    if K is None:
        K = default_k_steps()
    if unroll is None:
        unroll = 8 if NHP * (W_ext + 2 * H) >= (64 * 1024) else 1
    if 2 * K > H:
        raise ValueError(f"K={K} violates the halo bound 2K <= H={H}")

    launch_call = _build_launch_call(NHP, W_ext, K, W_ext, unroll,
                                     interpret)

    params = np.zeros(16, D)
    for j, name in enumerate(SCALAR_FIELDS):
        params[j] = D(getattr(c, name))

    # ---- per-shard extended constants, stacked (NHP|8, S*W_ext) -------
    def window(glob2d, zero_halo_rows=()):
        """glob2d (rows, MP) -> stacked ext (rows, S*W_ext): shard s gets
        global cols [s*MP_loc - H, (s+1)*MP_loc + H), zero outside."""
        rows = glob2d.shape[0]
        out = np.zeros((rows, S * W_ext), D)
        for s in range(S):
            lo = s * MP_loc - H      # global col of the shard's col 0
            src_lo, src_hi = max(lo, 0), min(lo + W_ext, MP)
            dst = s * W_ext
            out[:, dst + (src_lo - lo):dst + (src_hi - lo)] = \
                glob2d[:, src_lo:src_hi]
        for r in zero_halo_rows:
            for s in range(S):
                out[r, s * W_ext:s * W_ext + H] = 0
                out[r, (s + 1) * W_ext - H:(s + 1) * W_ext] = 0
        return out

    rowc_g = np.zeros((8, MP), D)
    rowc_g[0] = np.asarray(c.phi, D)[:MP]
    rowc_g[1] = np.asarray(c.w_av, D)[:MP]
    rowc_g[2] = np.asarray(c.w_av_phi, D)[:MP]
    rowc_g[3] = np.asarray(c.col_main, D).ravel()[:MP]
    rowc_g[4] = np.asarray(c.col_half, D).ravel()[:MP]
    rowc_g[5] = np.asarray(c.col_edge, D).ravel()[:MP]
    rowc_g[6] = rowc_g[5]
    # rows 1/2 (observable weights) and 6 (edge-owner one-hot) must count
    # each column exactly once across shards: zero their halo copies
    rowc_e = window(rowc_g, zero_halo_rows=(1, 2, 6))
    a0_e = window(np.asarray(c.a0, D))
    ag_e = window(np.asarray(c.a0_ghost, D))
    ncol = np.zeros((NHP, 128), D)
    ncol[:, 0] = np.asarray(c.n_float, D).ravel()
    ncol[:, 1] = np.asarray(c.n_ge2, D).ravel()
    ncol[:, 2] = np.asarray(c.w_n, D).ravel()
    ncol[:, 3] = np.asarray(c.row_update, D).ravel()

    a0_d, ag_d, rowc_d, ncol_d = (jnp.asarray(a0_e), jnp.asarray(ag_e),
                                  jnp.asarray(rowc_e), jnp.asarray(ncol))
    w_av_g = jnp.asarray(rowc_g[1])
    w_av_phi_g = jnp.asarray(rowc_g[2])

    perm_from_left = [(i, (i + 1) % S) for i in range(S)]
    perm_from_right = [((i + 1) % S, i) for i in range(S)]

    def body(a0s, ags, rowcs, ncols, a, b, ahs, bhs, edges, xs_all, metas,
             params_arg):
        def ext(x):
            recv_l = jax.lax.ppermute(x[:, -H:], axis, perm_from_left)
            recv_r = jax.lax.ppermute(x[:, :H], axis, perm_from_right)
            return jnp.concatenate([recv_l, x, recv_r], axis=1)

        def real(carry, xs_l, meta_l):
            ca, cb_, cahs, cbhs, cedges = carry
            ea, eb, eahs, ebhs = ext(ca), ext(cb_), ext(cahs), ext(cbhs)
            outs = launch_call(
                meta_l, xs_l, params_arg,
                ea, ea, ea, eb, eb, eb, eahs, eahs, eahs,
                ebhs, ebhs, ebhs,
                a0s, a0s, a0s, ags, ags, ags,
                rowcs, rowcs, rowcs, ncols, cedges)
            na, nb, nahs, nbhs, nedges, sums = outs
            sl = slice(H, H + MP_loc)
            nedges = jax.lax.psum(nedges, axis)
            sums = jax.lax.psum(sums, axis)
            return ((na[:, sl], nb[:, sl], nahs[:, sl], nbhs[:, sl],
                     nedges), sums)

        def launch(carry, inp):
            xs_l, meta_l = inp
            # n=0 capacity padding: skip kernel, ppermutes and psums (the
            # replicated meta makes the predicate uniform across shards)
            return jax.lax.cond(
                meta_l[0] > 0, real,
                lambda c_, *_: (c_, jnp.zeros((K, SUM_LANES),
                                              jnp.float32)),
                carry, xs_l, meta_l)

        return jax.lax.scan(launch, (a, b, ahs, bhs, edges),
                            (xs_all, metas))

    sp = P(None, axis)
    sharded_body = jax.shard_map(
        body, mesh=mesh,
        in_specs=(sp, sp, sp, P(), sp, sp, sp, sp, P(), P(), P(), P()),
        out_specs=((sp, sp, sp, sp, P()), P()), check_vma=False)

    @functools.partial(jax.jit, donate_argnums=0)
    def run(state: stencil.State, xs_all, metas, params_arg, emit_arr):
        edges = jnp.zeros((NHP, 128), D)
        edges = edges.at[:, 0].set(state.hs_edge_a)
        edges = edges.at[:, 1].set(state.hs_edge_b)
        presum0 = jnp.stack([
            jnp.sum(state.a[0] * w_av_g), jnp.sum(state.b[1] * w_av_g),
            jnp.sum(state.a[0] * w_av_phi_g),
            jnp.sum(state.a[1] * w_av_g)])

        (a, b, ahs, bhs, edges), sums_all = sharded_body(
            a0_d, ag_d, rowc_d, ncol_d, state.a, state.b, state.a_hs,
            state.b_hs, edges, xs_all, metas, params_arg)

        LK = xs_all.shape[0] * K
        sums_flat = sums_all.reshape(LK, SUM_LANES)
        xs_flat = xs_all.reshape(LK, XS_LANES)

        def av_step(av, row):
            s_row, x_row = row
            new = stencil.av_update_from_sums(
                c, av, s_row[1], s_row[2], s_row[3], x_row[4], x_row[5])
            out = jnp.where(x_row[6] > 0, new, av)
            return out, out

        av_final, av_seq = jax.lax.scan(
            av_step, jnp.asarray(state.av), (sums_flat, xs_flat))
        pre = jnp.concatenate([presum0[None, :], sums_flat[:-1, :4]])
        obs = jnp.concatenate(
            [pre[emit_arr, :4], xs_flat[emit_arr, 7:8],
             av_seq[emit_arr]], axis=1)
        return stencil.State(
            a=a, b=b, a_hs=ahs, b_hs=bhs,
            hs_edge_a=edges[:, 0], hs_edge_b=edges[:, 1], av=av_final,
            t=state.t, step=state.step), obs

    r = _StreamRunner(run, model, c, params, K,
                      av_enabled=av_enabled, exact_trig=exact_trig)
    r.engine = "stream-shard"
    r.W_ext, r.S = W_ext, S
    return r


class _StreamRunner:
    """Host-side wrapper shared by the single-device and sharded stream
    engines: chunk -> padded launch tables (capacity in LAUNCH_QUANTUM
    launches so nearby chunk lengths share a compile), step/t tracked
    host-side like the megakernel Runner."""

    engine = "stream"

    def __init__(self, run, model, c, params, K, *, av_enabled=True,
                 exact_trig=False):
        self._run = run
        self._model = model
        self.c = c
        self.params = params
        self.K = K
        self._av_enabled = av_enabled
        self._exact_trig = exact_trig
        self._cap = 0                    # capacity, in launches
        self._jit_run = run
        self.last_obs = None
        self.step0 = 0
        self.t0 = 0.0

    def update_consts(self, c_new):
        D = self._model.np_dtype
        self.c = c_new
        p = np.zeros(16, D)
        for j, name in enumerate(SCALAR_FIELDS):
            p[j] = D(getattr(c_new, name))
        self.params = p

    @property
    def compile_key(self):
        """Executable identity (see stepper_pallas.Runner.compile_key):
        the emit array is always L*K long here, so launches alone key."""
        return self._cap

    def reserve(self, n_steps, n_emit=0):
        launches = -(-n_steps // self.K)
        L = -(-launches // LAUNCH_QUANTUM) * LAUNCH_QUANTUM
        self._cap = max(self._cap, L)

    def __call__(self, state, n_steps):
        from .stepper_pallas import build_xs_table
        D = self._model.np_dtype
        xs = build_xs_table(self._model, self.c, self.t0, self.step0,
                            n_steps, av_enabled=self._av_enabled,
                            exact=self._exact_trig)
        out = self._run_table(state, xs, n_steps, self.step0 % 2, ())
        self.step0 += n_steps
        self.t0 = float(D(xs[-1, 7] + D(self.c.dt)))
        return out

    def run_xs(self, state, xs_dict, parity0, emit_idx=()):
        D = self._model.np_dtype
        n = len(xs_dict["t"])
        xs = pack_xs_dict(xs_dict, D)
        return self._run_table(state, xs, n, parity0, emit_idx)

    def _run_table(self, state, xs_n, n, parity0, emit_idx):
        D = self._model.np_dtype
        K = self.K
        self.reserve(n)
        L = self._cap
        xs = np.zeros((L * K, XS_LANES), D)
        xs[:n] = xs_n[:, :XS_LANES]
        metas = np.zeros((L, 4), np.int32)
        full, tail = divmod(n, K)
        metas[:full, 0] = K
        if tail:
            metas[full, 0] = tail
        metas[:, 1] = (parity0 + np.arange(L) * K) % 2
        emit = np.zeros(L * K, np.int32)
        if len(emit_idx):
            emit[:len(emit_idx)] = np.asarray(emit_idx, np.int32)
        out, self.last_obs = self._run(
            state, jnp.asarray(xs.reshape(L, K, XS_LANES)),
            jnp.asarray(metas), jnp.asarray(self.params),
            jnp.asarray(emit))
        t_next = D(xs[n - 1, 7] + D(self.c.dt))
        return out._replace(t=jnp.asarray(t_next), step=out.step + n)

    def take_obs(self, n_emit):
        """First n_emit display-77 records of the last run, one
        transfer, ops/stencil.emission_record layout."""
        return np.asarray(self.last_obs)[:n_emit, :13]
