"""Test environment: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

The container boots with an `axon` TPU PJRT plugin pre-registered via
sitecustomize (which overrides JAX_PLATFORMS), so plain env vars are not
enough — we must also flip jax's platform config before the backend
initializes. XLA_FLAGS is still read at first backend init, which happens
after conftest import."""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Enable x64 globally so dtype behavior doesn't depend on test order
# (several numerics test modules need float64).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
