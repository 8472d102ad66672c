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

if os.environ.get("SLB2D_TPU_TESTS") == "1":
    # real-TPU test mode: keep the axon backend and x64 OFF (the pallas
    # kernel requires a pure-i32/f32 world on TPU).  Run only the
    # TPU-gated tests this way, one process at a time:
    #   SLB2D_TPU_TESTS=1 pytest tests/test_pallas.py -k tpu
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
