"""Native C++ IO helpers vs Python fallbacks, Bessel series fallback,
profiler smoke."""

import io
import os

import numpy as np
import pytest

from slb2d_tpu.io import native, writers
from slb2d_tpu.models import bessel
from slb2d_tpu.runtime import schedule


def test_native_writer_matches_python(tmp_path):
    if native._load() is None:
        pytest.skip("libslbio.so not built")
    rng = np.random.default_rng(0)
    phi_x = rng.normal(size=37)
    phi_y = rng.normal(size=23)
    F = rng.normal(size=(37, 23)) * np.float32(0.1)

    with open(tmp_path / "native.txt", "w") as fh:
        fh.write("# header\n")
        assert native.write_xy_rows_native(fh, phi_x, phi_y, F)
        fh.write("# footer\n")

    buf = io.StringIO()
    # force the python path by writing to a non-file stream
    writers._write_xy_rows(buf, phi_x, phi_y, F)

    native_txt = open(tmp_path / "native.txt").read()
    assert native_txt == "# header\n" + buf.getvalue() + "# footer\n"


def test_native_fmt20_matches_printf():
    """The native exact-decimal '%0.20f' (128-bit integer path) must be
    byte-identical to printf across magnitudes, signs, ties, and
    subnormals."""
    import ctypes
    lib = native._load()
    if lib is None:
        pytest.skip("libslbio.so not built")
    lib.slb_fmt20.argtypes = [ctypes.c_double, ctypes.c_char_p]
    lib.slb_fmt20.restype = ctypes.c_int
    buf = ctypes.create_string_buffer(128)
    rng = np.random.default_rng(42)
    vals = []
    for scale in (1e-30, 1e-12, 1e-6, 1e-3, 1.0, 1e3, 1e9, 1e14):
        vals += list((rng.standard_normal(500) * scale)
                     .astype(np.float32).astype(np.float64))
    vals += list(rng.standard_normal(500) * np.exp(rng.uniform(-60, 30, 500)))
    vals += [0.0, -0.0, 1.0, -1.0, 0.5, 2**-53, 1e-21, 5e-21, 2.5e-20,
             0.05, 0.25, 1e14, 123456789.123456789, 5e-324,
             np.nextafter(0, 1), 0.1, 1 / 3]
    vals += [float(np.ldexp(1, -k)) for k in range(1, 80)]   # dyadic ties
    for v in vals:
        v = float(v)
        lib.slb_fmt20(v, buf)
        assert buf.value.decode() == "%0.20f" % v, repr(v)


def test_native_count_steps_matches_python():
    if native._load() is None:
        pytest.skip("libslbio.so not built")
    for t0, t_max, dt in [(0.0, 16.28319, 1e-3), (0.0, 1.0, 1e-3),
                          (5.0, 5.0, 1e-3), (0.0, 0.9999, 0.1)]:
        n_native = native.count_steps_f32(t0, t_max, dt)
        t = np.float32(t0)
        n_py = 0
        while t < np.float32(t_max):
            t = np.float32(t + np.float32(dt))
            n_py += 1
        assert n_native == n_py, (t0, t_max, dt)


def test_bessel_series_matches_scipy():
    from scipy.special import iv
    for n in (0, 1, 5, 20, 60):
        for x in (1e-3, 0.5, 1.0, 7.3, 42.0):
            np.testing.assert_allclose(
                bessel._series_In(n, x), float(iv(n, x)),
                rtol=1e-13, err_msg=f"I_{n}({x})")


def test_profiler_trace_smoke(tmp_path, monkeypatch):
    from slb2d_tpu import cli
    monkeypatch.chdir(tmp_path)
    rc = cli.main([
        "display=4", "E_dc=1.0", "E_omega=2.0", "omega=10.0", "mu=1.0",
        "alpha=0.9495", "n-harmonics=6", "PhiYmin=-5", "PhiYmax=5", "B=0.1",
        "t-max=0.05", "g-grid=24", "quiet=1", "o=out.txt",
        f"profile-dir={tmp_path / 'trace'}"])
    assert rc == 0
    files = [os.path.join(r, f)
             for r, _, fs in os.walk(tmp_path / "trace") for f in fs]
    assert files, "profiler trace produced no files"


def test_frame_device_path_matches_host():
    import jax
    from slb2d_tpu.config import SimConfig
    from slb2d_tpu.models.superlattice import SuperlatticeModel
    from slb2d_tpu.ops import stencil
    from slb2d_tpu.ops.frames import FrameReconstructor

    cfg = SimConfig(display=7, E_dc=1.0, E_omega=2.0, omega=10.0, mu=1.0,
                    alpha=0.9495, n_harmonics=8, phi_y_min=-5.0,
                    phi_y_max=5.0, B=0.1, t_start=0.1, g_grid=64, dt=1e-3,
                    quiet=True)
    model = SuperlatticeModel(cfg)
    c = stencil.consts_from_model(model)
    s = stencil.bootstrap_state(c, model)
    r = FrameReconstructor(model)
    F_host = r.reconstruct(np.asarray(s.a), np.asarray(s.b), 1, model.M + 2)
    F_dev, norm_sum = r.reconstruct_on_device(s.a, s.b, 1, model.M + 2)
    np.testing.assert_allclose(F_dev, F_host, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        float(norm_sum), float(np.dot(np.asarray(s.a)[0], model.w_norm)),
        rtol=1e-6)
    # lazy variant returns device values
    F_lazy, ns_lazy = r.reconstruct_on_device(s.a, s.b, 1, model.M + 2,
                                              fetch=False)
    np.testing.assert_array_equal(np.asarray(F_lazy), F_dev)
