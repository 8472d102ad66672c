"""State checkpoint/resume — a capability the reference lacks (SURVEY.md §5:
"no file checkpointing"; its only resume is in-memory via the parameter
server).  Full solver state (a, b, a_hs, b_hs, staleness carries, av_data,
t, step) round-trips through one .npz file.
"""

from __future__ import annotations

import numpy as np

from ..ops.stencil import State


def save_state(path: str, state: State, *, model=None, **extra):
    arrays = {f"state_{k}": np.asarray(v) for k, v in state._asdict().items()}
    arrays.update({f"extra_{k}": np.asarray(v) for k, v in extra.items()})
    if model is not None:
        arrays["meta_N"] = np.asarray(model.N)
        arrays["meta_M"] = np.asarray(model.M)
    np.savez_compressed(path, **arrays)


def load_state(path: str, model):
    data = np.load(path)
    kw = {}
    for field in State._fields:
        arr = data[f"state_{field}"]
        kw[field] = arr
    # pre-Kahan checkpoints carried av as (6,); slots 6/7 are compensation
    # terms that legitimately start at zero
    if kw["av"].shape == (6,):
        kw["av"] = np.concatenate([kw["av"],
                                   np.zeros(2, kw["av"].dtype)])
    st = State(**kw)
    if st.a.shape != (model.NHP, model.MP):
        raise ValueError(
            f"checkpoint shape {st.a.shape} does not match configured grid "
            f"({model.NHP}, {model.MP}) — n-harmonics/g-grid must match")
    if "meta_N" in data and (int(data["meta_N"]) != model.N
                             or int(data["meta_M"]) != model.M):
        raise ValueError(
            f"checkpoint grid (N={int(data['meta_N'])}, "
            f"M={int(data['meta_M'])}) does not match configured "
            f"(N={model.N}, M={model.M})")
    if st.a.dtype != model.np_dtype:
        raise ValueError(
            f"checkpoint dtype {st.a.dtype} does not match dtype= setting")
    extra = {k[6:]: data[k] for k in data.files if k.startswith("extra_")}
    return st, extra
