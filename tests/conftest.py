import os

# Tests run on a virtual 8-device CPU mesh (the "fake cluster" mechanism,
# SURVEY.md §4); the real-TPU bench path is exercised by bench.py instead.
#
# NOTE: this machine exports JAX_PLATFORMS=axon (the TPU tunnel) and the
# axon plugin ignores later env-var overrides, so the CPU backend must be
# forced through jax.config — otherwise every test silently runs on (and
# contends for) the single real TPU chip.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
