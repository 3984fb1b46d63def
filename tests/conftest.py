"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the multi-chip path); unit tests never need the real TPU.

Note: the environment's sitecustomize registers the TPU tunnel backend and
force-sets ``jax_platforms``; we must override via ``jax.config.update`` (env
vars alone are ignored once that ran) or every test run blocks for minutes on
tunnel initialization.
"""

import os

# Must be set before the CPU backend is initialized.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
