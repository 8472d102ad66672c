"""Backend/environment helpers.

This machine exposes the TPU through the experimental 'axon' PJRT plugin,
which ignores the JAX_PLATFORMS env var — CPU must be forced through
jax.config BEFORE any computation (see tests/conftest.py).
"""

from __future__ import annotations

import os


def force_cpu(n_virtual_devices: int = 0):
    """Force the CPU backend (optionally with N virtual devices for mesh
    tests).  Must run before the backend is initialized."""
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")


def on_tpu() -> bool:
    import jax
    return jax.default_backend() == "tpu"
