"""Pallas megakernel vs the XLA scan path.

On CPU the kernel runs in interpreter mode (loose rtol: the interpreter
and the scan accumulate different roundings over 160 steps).  On real TPU
the compiled kernel tracks the XLA engine at the ulp level — measured
max abs 7.5e-9 over 160 steps at this shape; NOT bit-exact (Mosaic and
the XLA TPU emitter place FMA contractions differently, and the kernel
uses reciprocal-multiply instead of division) — asserted by the TPU-gated
test below (run: SLB2D_TPU_TESTS=1 pytest tests/test_pallas.py -k tpu)."""

import numpy as np
import pytest

import jax

from slb2d_tpu.config import SimConfig
from slb2d_tpu.models.superlattice import SuperlatticeModel
from slb2d_tpu.ops import stencil
from slb2d_tpu.ops.stepper_pallas import make_pallas_runner

CFG = dict(display=4, E_dc=1.0, E_omega=2.0, omega=10.0, mu=1.0,
           alpha=0.9495, n_harmonics=8, phi_y_min=-10.0, phi_y_max=10.0,
           B=0.1, t_start=0.1, g_grid=64, dt=1e-3, quiet=True)


def build():
    cfg = SimConfig(**CFG)
    model = SuperlatticeModel(cfg)
    c = stencil.consts_from_model(model)
    return cfg, model, c


@pytest.mark.parametrize("exact", [False, True])
def test_pallas_matches_xla_scan(exact):
    cfg, model, c = build()
    s0 = stencil.bootstrap_state(c, model)
    runner = make_pallas_runner(c, model, av_enabled=True, exact_trig=exact)
    out = runner(stencil.bootstrap_state(c, model), 100)
    out = runner(out, 60)   # second chunk: parity/t continuation

    if exact:
        from slb2d_tpu.runtime.schedule import iter_chunks
        step = stencil.make_step_fn(c, av_enabled=True, exact_trig=True)
        chunks = list(iter_chunks(
            omega=model.omega, dt=model.dt, t0=0.0, t_max=0.161,
            t_start=cfg.t_start, E_omega=model.E_omega, display=4,
            frame_start=0.0, T=model.T, dtype=model.np_dtype,
            chunk_max=10**9))
        assert chunks[0].n_steps >= 160
        xs = {k: v[:160] for k, v in chunks[0].xs.items()}
        ref = jax.jit(lambda s, xs: jax.lax.scan(step, s, xs)[0])(s0, xs)
    else:
        step = stencil.make_step_fn(c, av_enabled=True, exact_trig=False)
        ref = jax.jit(
            lambda s: jax.lax.scan(step, s, None, length=160)[0])(s0)

    for f in ("a", "b", "a_hs", "b_hs"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, f)), np.asarray(getattr(ref, f)),
            rtol=1e-4, atol=1e-7, err_msg=f)
    np.testing.assert_allclose(np.asarray(out.av), np.asarray(ref.av),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out.hs_edge_a),
                                  np.asarray(ref.hs_edge_a))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU invariant (tests force the CPU "
                           "backend; set SLB2D_TPU_TESTS=1 to enable)")
def test_pallas_matches_xla_on_tpu_ulp_level():
    """Compiled-kernel invariant on real TPU: the pallas engine tracks the
    XLA engine to <= 1e-7 abs over 160 steps (measured 7.5e-9; the gap is
    FMA-placement + reciprocal ulps, see module docstring)."""
    cfg, model, c = build()
    s0 = stencil.bootstrap_state(c, model)
    runner = make_pallas_runner(c, model, av_enabled=True, exact_trig=False)
    out = runner(stencil.bootstrap_state(c, model), 100)
    out = runner(out, 60)
    step = stencil.make_step_fn(c, av_enabled=True, exact_trig=False)
    ref = jax.jit(lambda s: jax.lax.scan(step, s, None, length=160)[0])(s0)
    for f in ("a", "b", "a_hs", "b_hs", "av"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, f)), np.asarray(getattr(ref, f)),
            rtol=0, atol=1e-7, err_msg=f)


def test_pallas_inkernel_d77_records_match_xla(tmp_path, monkeypatch):
    """The megakernel's in-kernel display-77 emission table must reproduce
    the XLA engine's batched records: a full display=77 run with
    impl=pallas forced writes the same lines (all 15 columns) as impl=xla,
    with NO per-emission chunk cuts (VERDICT r2 item 2)."""
    from slb2d_tpu.runtime.loop import Simulation

    monkeypatch.chdir(tmp_path)
    texts = {}
    for impl in ("xla", "pallas"):
        cfg = SimConfig(**{**CFG, "display": 77, "t_start": 0.2,
                           "omega": 10.0}, impl=impl,
                        out_file=f"{impl}.txt")
        Simulation(cfg).run()
        texts[impl] = [l for l in open(tmp_path / f"{impl}.txt")
                       .read().splitlines()
                       if l and not l.startswith("#")]
    assert len(texts["xla"]) == len(texts["pallas"]) > 10
    for lx, lp in zip(texts["xla"], texts["pallas"]):
        vx = np.array(lx.split(), float)
        vp = np.array(lp.split(), float)
        assert vx.shape == vp.shape == (15,)
        assert vx[13] == vp[13]                     # t bit-exact
        np.testing.assert_allclose(vp, vx, rtol=2e-4, atol=1e-6)


def test_pallas_repl_session_matches_xla(tmp_path, monkeypatch):
    """A parameter-server session (two mutations) through the megakernel:
    the SMEM params swap must reproduce the XLA engine's display-4 lines
    (frozen a0/bdt semantics, moved averaging windows, t continuation)."""
    import io

    from slb2d_tpu.runtime.loop import Simulation

    monkeypatch.chdir(tmp_path)
    session = "E_dc 1.5 0.1\nomega 12.0 0.1\nexit\n"
    rows = {}
    for impl in ("xla", "pallas", "stream"):
        cfg = SimConfig(**{**CFG, "t_start": 0.15, "omega": 10.0},
                        impl=impl, read_from="stdin",
                        out_file=f"{impl}.txt")
        Simulation(cfg).run(repl_stream=io.StringIO(session))
        rows[impl] = [np.array(l.split(), float)
                      for l in open(tmp_path / f"{impl}.txt")
                      if l and not l.startswith("#")]
    assert len(rows["xla"]) == len(rows["pallas"]) == 3
    for other in ("pallas", "stream"):
        assert len(rows[other]) == 3
        for rx, rp in zip(rows["xla"], rows[other]):
            np.testing.assert_allclose(rp, rx, rtol=2e-4, atol=1e-6,
                                       err_msg=other)


def test_pallas_parity_ghost_cells():
    """The parity ghost fill must survive chunk boundaries (odd-length
    chunk flips parity)."""
    cfg, model, c = build()
    runner = make_pallas_runner(c, model)
    out = runner(stencil.bootstrap_state(c, model), 7)   # odd
    out = runner(out, 6)
    # after 13 steps (odd), main buffer 1 is current: ghost cells zero
    a = np.asarray(out.a)
    assert np.all(a[:, 0] == 0)
    out = runner(out, 1)
    a = np.asarray(out.a)   # 14 steps: buffer 0, ghost col 0 = a0 col 0
    np.testing.assert_array_equal(a[:, 0], model.a0[:, 0])


def test_pallas_one_compile_serves_all_chunk_lengths():
    """n_steps and parity live in SMEM meta, and xs tables pad to a
    rounded capacity: chunks of different lengths and parities must share
    ONE jitted executable (the driver's main/tail chunks; measured tens
    of seconds per extra Mosaic compile at flagship shapes)."""
    cfg, model, c = build()
    runner = make_pallas_runner(c, model)
    out = runner(stencil.bootstrap_state(c, model), 40)
    out = runner(out, 17)            # different length AND parity
    out = runner(out, 199)           # still under the 256-row capacity
    assert runner._cap == 256
    if hasattr(runner._jit_run, "_cache_size"):   # private jax API
        assert runner._jit_run._cache_size() == 1
    # state advanced 256 steps total with correct t accumulation
    assert int(out.step) == 256
    np.testing.assert_allclose(float(out.t), 256 * float(model.dt),
                               rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(out.a)))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-TPU perf smoke (tests force the CPU "
                           "backend; set SLB2D_TPU_TESTS=1 to enable)")
def test_pallas_tpu_perf_smoke():
    """Perf floor on the real chip: the megakernel at a mid-size grid
    (N=40, M=2000) must stay >= 3e9 site-updates/s — an order of
    magnitude under the ~4.5e10 flagship steady state, 3x over the 1e9
    north star, so only a catastrophic Mosaic/engine regression trips it
    (tunnel variance on this box is ~±35%, PERF.md)."""
    import time

    cfg = SimConfig(**{**CFG, "n_harmonics": 40, "g_grid": 2000})
    model = SuperlatticeModel(cfg)
    c = stencil.consts_from_model(model)
    runner = make_pallas_runner(c, model, av_enabled=True)
    out = runner(stencil.bootstrap_state(c, model), 512)   # compile+warm
    np.asarray(out.a)                 # fetch = the axon barrier
    t0 = time.time()
    steps = 0
    for _ in range(8):
        out = runner(out, 512)       # driver's SMEM-capped chunk length
        steps += 512
    np.asarray(out.a)
    wall = time.time() - t0
    ups = 2 * (model.N + 1) * (model.M + 1) * steps / wall
    assert np.all(np.isfinite(np.asarray(out.a)))
    assert ups >= 3e9, f"megakernel perf smoke: {ups:.3e} updates/s"


def test_pallas_multi_launch_pipeline_matches_single_launches():
    """Chunks beyond MAX_CHUNK_STEPS run as a lax.scan of 512-step SMEM
    launches inside ONE dispatch (the device-resident chunk pipeline).
    The pipelined result must equal the same steps issued as individual
    <=512-step launches — including a non-multiple tail and av
    accumulation — and subsequent small chunks must stay on the multi
    executable (one compiled program per run)."""
    from slb2d_tpu.ops.stepper_pallas import MAX_CHUNK_STEPS

    cfg, model, c = build()
    n = 2 * MAX_CHUNK_STEPS + 179          # two full launches + odd tail
    # exact mode: xs tables chain bitwise across call boundaries (the
    # sequential f32 t accumulation), so single vs multi is bit-equal
    runner = make_pallas_runner(c, model, exact_trig=True)
    out = runner(stencil.bootstrap_state(c, model), n)
    assert runner._lcap >= 3
    out = runner(out, 33)                  # small follow-up chunk
    assert int(out.step) == n + 33

    ref_runner = make_pallas_runner(c, model, exact_trig=True)
    ref = stencil.bootstrap_state(c, model)
    for k in (MAX_CHUNK_STEPS, MAX_CHUNK_STEPS, 179, 33):
        ref = ref_runner(ref, k)

    for f in ("a", "b", "a_hs", "b_hs", "av", "hs_edge_a", "hs_edge_b"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, f)), np.asarray(getattr(ref, f)),
            err_msg=f)
    np.testing.assert_allclose(float(out.t), float(ref.t), rtol=0, atol=0)
    if hasattr(runner._jit_run_multi, "_cache_size"):
        assert runner._jit_run_multi._cache_size() == 1
