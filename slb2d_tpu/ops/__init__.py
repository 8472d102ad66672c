from .stencil import State, bootstrap_state, make_step_fn  # noqa: F401
