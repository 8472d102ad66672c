"""Vmapped + mesh-sharded parameter sweeps (BASELINE config #5).

The reference explores parameter space serially through its stdin parameter
server (src/boltzmann_cli.c:71-91), one point at a time, with relaxation
between points.  TPU-native: a whole (E_dc, E_omega, omega, B, mu, alpha)
grid becomes a batch axis — `jax.vmap` over the stencil, sharded across the
"sweep" mesh axis with jax.sharding so XLA parallelizes points across chips
with zero communication (absorption maps are embarrassingly parallel).

Each sweep point reproduces a standalone display-4 run: its own float32
time accumulation, averaging window [t_start, t_start + T(omega_b)), and
loop-exit instantaneous observables — captured per point at its own t_max
crossing even though all points share one scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..constants import PI
from ..models.superlattice import SuperlatticeModel
from ..ops import stencil
from ..runtime.schedule import count_steps

SWEEPABLE = ("E_dc", "E_omega", "omega", "mu", "alpha", "B")


@functools.partial(jax.jit,
                   static_argnames=("in_axes", "n_steps", "unroll"))
def _run_sweep(consts, states, cap0, weights, *, in_axes, n_steps, unroll):
    """Advance a whole batch of sweep points n_steps and capture each
    point's loop-exit instantaneous observables.

    Module-level and jitted on static (in_axes, n_steps, unroll) so the
    compiled executable is shared by every ParameterSweep with the same
    batch/grid shapes — interactive grid refinement (slb2d-sweep
    read-from=stdin) re-runs without recompiling.
    """

    def point_step(c, carry):
        st, cap = carry
        trig = stencil.device_trig(c, st.t)
        # E_omega > 0 gates averaging exactly as the reference
        # (src/boltzmann_c_solver.c:188): a dc-only point leaves all
        # period averages at zero
        do_av = ((c.E_omega > 0) & (st.t >= c.t_start)
                 & (st.t < c.t_end))
        new = stencil.full_step(c, st, trig, do_av)
        # capture loop-exit instantaneous observables: the last step
        # whose loop t is still < t_max overwrites the capture
        # (display-4 inline sums, src/boltzmann_c_solver.c:236-244)
        live = st.t < c.t_end
        inst = dict(
            v_dr=jnp.sum(new.b[1] * weights["w_d4"]),
            v_y=jnp.sum(new.a[0] * weights["w_d4_phi"]),
            m_x=jnp.sum(new.a[1] * weights["w_d4"]),
            norm=jnp.sum(new.a[0] * weights["w_norm"]),
        )
        cap = jax.tree.map(lambda old, cur: jnp.where(live, cur, old),
                           cap, inst)
        return new, cap

    def body(carry, _):
        st, cap = carry
        st, cap = jax.vmap(point_step, in_axes=(in_axes, 0))(
            consts, (st, cap))
        return (st, cap), None

    return jax.lax.scan(body, (states, cap0), None, length=n_steps,
                        unroll=unroll)[0]


class ParameterSweep:
    def __init__(self, cfg: SimConfig, params: dict, mesh=None,
                 axis: str = "sweep"):
        """params: {name: 1-D array}; all arrays broadcast together into a
        flat batch (use numpy meshgrid + ravel upstream for grids)."""
        for k in params:
            if k not in SWEEPABLE:
                raise ValueError(f"cannot sweep over {k!r}")
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        arrs = jnp.broadcast_arrays(*[np.asarray(v, np.float64)
                                      for v in params.values()])
        flat = [np.ravel(np.asarray(a)) for a in arrs]
        self.B = len(flat[0]) if flat else 1
        self.params = dict(zip(params.keys(), flat))

        # Per-point models: scalar derivations are cheap; a0 differs only
        # when mu/alpha vary.
        self.models = []
        for i in range(self.B):
            kw = {k: float(v[i]) for k, v in self.params.items()}
            self.models.append(SuperlatticeModel(cfg.replace(**kw)))
        m0 = self.models[0]
        self.base = m0
        D = m0.np_dtype

        def stack(field):
            return np.stack([getattr(m, field) for m in self.models])

        varies_a0 = any(k in self.params for k in ("mu", "alpha"))
        c0 = stencil.consts_from_model(m0)
        # batched consts: leading axis only on fields that vary per point
        batched = dict(c0._asdict())
        axes = {k: None for k in batched}
        for f in ("E_dc", "E_omega", "omega", "B", "bdt"):
            batched[f] = stack(f)
            axes[f] = 0
        if varies_a0:
            batched["a0"] = stack("a0")
            batched["a0_ghost"] = stack("a0_ghost")
            axes["a0"] = axes["a0_ghost"] = 0
        # per-point averaging window end: t_max = f32(t_start + T_b)
        t_end = np.asarray([D(D(cfg.t_start) + m.T) for m in self.models])
        batched["t_end"] = t_end
        axes["t_end"] = 0
        self.consts = stencil.StencilConsts(**batched)
        self.in_axes = stencil.StencilConsts(**axes)

        # shared step count: the longest point's loop trip count
        self.n_steps = max(
            count_steps(0.0, float(t_end[i]), float(m0.dt), D)
            for i in range(self.B))

    # -- device program -------------------------------------------------------

    def _initial_states(self):
        axes = self.in_axes._asdict()
        states = []
        for i, m in enumerate(self.models):
            fields = {k: (v[i] if axes[k] == 0 else v)
                      for k, v in self.consts._asdict().items()}
            ci = stencil.StencilConsts(**fields)
            states.append(stencil.bootstrap_state(ci, m))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    def run(self):
        """Run all points to their t_max; returns per-point display-4
        observables as a dict of (B,) arrays."""
        D = self.base.np_dtype
        consts = self.consts
        in_axes = self.in_axes
        unroll = stencil.default_scan_unroll()
        weights = dict(
            w_d4=jnp.asarray(self.base.w_d4),
            w_d4_phi=jnp.asarray(self.base.w_d4_phi),
            w_norm=jnp.asarray(self.base.w_norm),
        )

        cap0 = {k: jnp.zeros((self.B,), D)
                for k in ("v_dr", "v_y", "m_x", "norm")}
        states = self._initial_states()

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(self.mesh, P(self.axis))
            repl = NamedSharding(self.mesh, P())
            # go through host numpy: every process holds the full value, so
            # device_put scatters the addressable shards — this is what
            # makes the same code path work on a multi-host (DCN) mesh,
            # where jax arrays committed to one process's device could not
            # be re-sharded globally
            put = lambda x, s: jax.device_put(np.asarray(x), s)  # noqa: E731
            states = jax.tree.map(lambda x: put(x, shard), states)
            axes = in_axes._asdict()
            consts = stencil.StencilConsts(**{
                k: put(jnp.asarray(v), shard if axes[k] == 0 else repl)
                for k, v in consts._asdict().items()})
            cap0 = jax.tree.map(lambda x: put(x, shard), cap0)

        final, cap = _run_sweep(consts, states, cap0, weights,
                                in_axes=in_axes, n_steps=self.n_steps,
                                unroll=unroll)
        return self._finalize(final, cap)

    @staticmethod
    def _fetch(x) -> np.ndarray:
        """Global array -> host numpy; allgathers across processes when the
        mesh spans hosts (multi-host sweeps: every process gets the full
        result table, like the reference's single output stream)."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x,
                                                                tiled=True))
        return np.asarray(x)

    def _finalize(self, final: stencil.State, cap):
        D = self.base.np_dtype
        av = self._fetch(final.av)         # (B, 8): av_data[0..5] + Kahan
                                           # compensations in slots 6/7
        out = {k: self._fetch(v) for k, v in cap.items()}
        res = dict(av_count=av[:, 0])
        v_dr_m = np.empty(self.B, D)
        v_y_m = np.empty(self.B, D)
        m_x_m = np.empty(self.B, D)
        T = np.empty(self.B, D)
        for i, m in enumerate(self.models):
            v_dr_m[i] = m.v_dr_multiplier
            v_y_m[i] = m.v_y_multiplier
            m_x_m[i] = m.m_over_multiplier
            T[i] = m.T
        norm_mult = np.asarray(
            [D(2 * PI * np.sqrt(np.float64(m.alpha))) for m in self.models])
        res["v_dr_inst"] = (out["v_dr"] * v_dr_m).astype(D)
        res["v_y_inst"] = (out["v_y"] * v_y_m).astype(D)
        res["m_over_m_x_inst"] = (out["m_x"] * m_x_m).astype(D)
        # astype, not np.float64(): the latter collapses a size-1 batch to
        # a scalar (B=1 sweeps)
        res["norm"] = (out["norm"].astype(np.float64)
                       * norm_mult.astype(np.float64)).astype(D)
        res["v_dr_av"] = (av[:, 1] * v_dr_m).astype(D)
        res["v_y_av"] = (av[:, 2] * v_y_m).astype(D)
        res["m_over_m_x_av"] = (av[:, 3] * m_x_m).astype(D)
        res["A"] = ((av[:, 4] * v_dr_m).astype(D) / T).astype(D)
        res["Asin"] = ((av[:, 5] * v_dr_m).astype(D) / T).astype(D)
        return res
