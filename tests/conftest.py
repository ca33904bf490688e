"""Test env setup: run JAX on CPU with 8 fake devices.

Must run before the first ``import jax`` anywhere in the test session
(SURVEY.md §4d: the fake-device mesh substitutes for multi-chip
hardware; the driver separately dry-runs the multi-chip path).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize (TPU tunnel) can override JAX_PLATFORMS at
# interpreter startup; force the config back to CPU before any backend
# initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
