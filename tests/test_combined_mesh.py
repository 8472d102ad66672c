"""Combined 2-D (sweep x space) mesh execution must equal independent
single-device runs — the full multichip configuration the driver dry-runs
(__graft_entry__.dryrun_multichip), here with numeric verification."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from slb2d_tpu.config import SimConfig
from slb2d_tpu.models.superlattice import SuperlatticeModel
from slb2d_tpu.ops import stencil
from slb2d_tpu.parallel.mesh import make_mesh
from slb2d_tpu.parallel.spatial import (_halo_shift_factory, _sum_m_factory,
                                        spatial_specs)


def test_sweep_x_space_equals_single_device():
    cfg = SimConfig(display=4, E_dc=1.0, E_omega=2.0, omega=10.0, mu=1.0,
                    alpha=0.9495, n_harmonics=6, phi_y_min=-8.0,
                    phi_y_max=8.0, B=0.1, t_start=0.05, g_grid=29,
                    dt=1e-3, quiet=True, dtype="f64")
    model = SuperlatticeModel(cfg)
    c = stencil.consts_from_model(model)
    mesh = make_mesh((4, 2), ("sweep", "space"))
    B = 8
    e_dcs = np.linspace(0.5, 2.0, B).astype(model.np_dtype)
    n_steps = 40

    consts = jax.tree.map(jnp.asarray, c._replace(E_dc=jnp.asarray(e_dcs)))
    consts_spec, state_spec1 = spatial_specs(mesh, "space")
    consts_spec = consts_spec._replace(E_dc=P("sweep"))
    state_spec = jax.tree.map(lambda p: P("sweep", *p), state_spec1,
                              is_leaf=lambda x: isinstance(x, P))
    consts_axes = stencil.StencilConsts(
        **{k: (0 if k == "E_dc" else None)
           for k in stencil.StencilConsts._fields})

    # bootstrap per point: the tiptoe half-step depends on E_dc
    # (reference src/boltzmann_c_solver.c:141-145)
    boots = [stencil.bootstrap_state(
        c._replace(E_dc=model.np_dtype(e)), model) for e in e_dcs]
    stB = jax.tree.map(lambda *xs: jnp.stack(xs), *boots)

    shift = _halo_shift_factory("space", 2)
    sum_m = _sum_m_factory("space")

    def point_step(cl, st):
        trig = stencil.device_trig(cl, st.t)
        do_av = (st.t >= cl.t_start) & (st.t < cl.t_end)
        return stencil.full_step(cl, st, trig, do_av,
                                 shift=shift, sum_m=sum_m)

    def body(cl, st_local):
        def one(s, _):
            return jax.vmap(point_step, in_axes=(consts_axes, 0))(cl, s), None
        return jax.lax.scan(one, st_local, None, length=n_steps)[0]

    sharded = jax.shard_map(body, mesh=mesh,
                            in_specs=(consts_spec, state_spec),
                            out_specs=state_spec, check_vma=False)
    out = jax.jit(sharded)(consts, stB)

    # reference: each point as an unsharded single-device run
    for i in (0, 3, 7):
        ci = c._replace(E_dc=model.np_dtype(e_dcs[i]))
        step = stencil.make_step_fn(ci, av_enabled=True, exact_trig=False)
        ref = jax.jit(
            lambda s: jax.lax.scan(step, s, None, length=n_steps)[0])(
            stencil.bootstrap_state(ci, model))
        # guard: point bootstraps must differ across E_dc (the bug this
        # test once had: broadcasting one bootstrap to all points)
        assert not np.array_equal(np.asarray(stB.a_hs[0]),
                                  np.asarray(stB.a_hs[-1]))
        np.testing.assert_allclose(np.asarray(out.a[i]), np.asarray(ref.a),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(out.av[i]), np.asarray(ref.av),
                                   rtol=1e-12, atol=1e-14)
