"""Test config: force CPU backend with 8 virtual devices.

This lets the full multi-chip sharding path (mesh, NamedSharding, collectives)
run in CI without TPU hardware.

Force CPU: the ambient environment may export JAX_PLATFORMS=axon (tunneled
TPU), which is far too slow for a unit-test loop, and a sitecustomize hook
registers that backend at interpreter startup — so we must override the jax
config, not just the env var. Set TPU_DEER_TEST_TPU=1 to run the suite
against real hardware.
"""

import os

if not os.environ.get("TPU_DEER_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
