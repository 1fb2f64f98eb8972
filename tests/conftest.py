"""Test configuration: force CPU with 8 virtual devices, enable x64.

Multi-device tests follow SURVEY.md §4's prescription: shard-invariance is
validated on a virtual CPU mesh (no pod needed).  x64 is enabled so float64
parity tests against the (float64) reference semantics are meaningful; the
library itself is dtype-explicit and defaults to float32.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The TPU tunnel plugin pins JAX_PLATFORMS at import time; the config update
# after import reliably forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
