"""Host-side step schedule: exact emulation of the C driver's time loop.

The reference accumulates simulation time in float32 (`ffloat t`,
src/boltzmann_c_solver.c:164 `for(t = t0; t < t_max; t += dt)`) and gates
averaging/emissions on float32 comparisons, with trig evaluated in double
on float32 arguments.  The number of steps, every cos/sin value, and every
emission index are therefore pure functions of the config — precomputed
here on the host and fed to the device scan as `xs`, so the device loop
replays the C solver exactly without data-dependent control flow.

Emission kinds and their reference anchors:
  * "e77" — display 77 time-series line: av() with the post-step arrays,
    then print with the PRE-step arrays (:178-186); the emitting step is
    its own chunk so the driver still holds the pre-step state.
  * "e7"  — display 7 movie frame, post-step arrays (:196-204); the GPU
    driver additionally requires t > frame_start (src/boltzmann_solver.c:277)
    which we adopt (identical when frame_start=0).
  * "e9"  — display 9 strobe at drive-period wraparound, post-step arrays
    (src/boltzmann_solver.c:260-275; GPU-only display).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np

f32 = np.float32
f64 = np.float64


@dataclasses.dataclass
class Chunk:
    """A run of consecutive steps executed as one device scan."""
    xs: dict                      # per-step arrays, each of length n_steps
    n_steps: int
    event: Optional[str]          # None | "e77" | "e7" | "e9"
    t_first: float                # loop t of the first step in the chunk
    t_last: float                 # loop t of the last step (event time)
    emit_idx: tuple = ()          # in-chunk indices of display-77 emissions
                                  # (batched-emission mode only)


def count_steps(t0, t_max, dt, dtype=f32) -> int:
    """Number of iterations of `for(t=t0; t<t_max; t+=dt)` at dtype."""
    if dtype is f32:
        from ..io.native import count_steps_f32
        n = count_steps_f32(float(t0), float(t_max), float(dt))
        if n is not None:
            return n
    t = dtype(t0)
    t_max = dtype(t_max)
    dt = dtype(dt)
    n = 0
    while t < t_max:
        t = dtype(t + dt)
        n += 1
    return n


def iter_chunks(*, omega, dt, t0, t_max, t_start, E_omega, display,
                frame_start, T, dtype=f32, chunk_max=4096,
                frame_time0=0.0, last_tT_reminder0=0.0,
                av_always_off=False, carry_out: Optional[dict] = None,
                break_on_e77: bool = True) -> Iterator[Chunk]:
    """Yield the step schedule for one parameter-server round.

    All float state (t, frame_time, tT reminder) is carried at `dtype`,
    replicating the C driver when dtype=float32.  On exhaustion the final
    carries (frame_time, last_rem, t_exit) are written into `carry_out` so
    the driver can resume the next parameter-server round exactly.
    """
    D = dtype
    omega = D(omega)
    dt = D(dt)
    t = D(t0)
    t_max = D(t_max)
    t_start = D(t_start)
    T = D(T)
    frame_time = D(frame_time0)
    last_rem = D(last_tT_reminder0)
    e_om_pos = float(E_omega) > 0

    buf: list[tuple] = []   # (t, cos_t, cos_t_dt, cos_hs, cos_hs_dt, cos_av, sin_av, do_av)
    emit_idx: list[int] = []

    def trig(x):
        # C: cos(omega*t) — float product, double cos, float store
        return D(np.cos(f64(D(omega * x))))

    def strig(x):
        return D(np.sin(f64(D(omega * x))))

    def flush(event=None, t_last=None):
        nonlocal buf, emit_idx
        if not buf and event is None:
            return None
        cols = list(zip(*buf)) if buf else [[]] * 8
        xs = dict(
            cos_t=np.asarray(cols[1], D), cos_t_dt=np.asarray(cols[2], D),
            cos_hs=np.asarray(cols[3], D), cos_hs_dt=np.asarray(cols[4], D),
            cos_av=np.asarray(cols[5], D), sin_av=np.asarray(cols[6], D),
            do_av=np.asarray(cols[7], bool),
            t=np.asarray(cols[0], D),
        )
        ch = Chunk(xs=xs, n_steps=len(buf), event=event,
                   t_first=float(cols[0][0]) if buf else float(t),
                   t_last=float(t_last if t_last is not None
                                else (cols[0][-1] if buf else t)),
                   emit_idx=tuple(emit_idx))
        buf = []
        emit_idx = []
        return ch

    while t < t_max:
        t_hs = D(t + dt / 2)
        cos_t = trig(t)
        cos_t_dt = trig(D(t + dt))
        cos_hs = trig(t_hs)
        cos_hs_dt = trig(D(t_hs + dt))

        emit77 = (e_om_pos and display == 77 and frame_time >= 0.01)
        do_av = emit77 or (
            e_om_pos and display not in (7, 77, 8) and t >= t_start
            and not av_always_off)
        step_rec = (t, cos_t, cos_t_dt, cos_hs, cos_hs_dt,
                    trig(t), strig(t), bool(do_av))

        if emit77 and break_on_e77:
            # pre-step state must be observable: cut before, 1-step chunk
            ch = flush()
            if ch:
                yield ch
            buf.append(step_rec)
            yield flush(event="e77", t_last=t)
            frame_time = D(0)
        else:
            buf.append(step_rec)
            if emit77:
                # batched mode: the scan collects the emission record
                # on-device; remember which row it lands in
                emit_idx.append(len(buf) - 1)
                frame_time = D(0)

        emit7 = (display == 7 and frame_time >= 0.01 and t > frame_start)
        emit9 = False
        if display == 9 and t >= t_start and float(T) > 0:
            tT = D(t / T)
            rem = D(tT - int(tT))
            if rem < last_rem:
                emit9 = True
            last_rem = rem
        if emit7:
            yield flush(event="e7", t_last=t)
            frame_time = D(0)
        elif emit9:
            yield flush(event="e9", t_last=t)

        frame_time = D(frame_time + dt)
        t = D(t + dt)
        if len(buf) >= chunk_max:
            ch = flush()
            if ch:
                yield ch

    ch = flush()
    if ch:
        yield ch
    if carry_out is not None:
        carry_out["frame_time"] = float(frame_time)
        carry_out["last_rem"] = float(last_rem)
        carry_out["t_exit"] = float(t)   # first t failing t < t_max
