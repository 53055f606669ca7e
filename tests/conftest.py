"""Test config: run on CPU with 8 virtual devices so mesh/sharding tests work
without a pod (SURVEY.md §4 item 4). Must set env before jax is imported."""

import os

# Force CPU with 8 virtual devices: the driver environment pins
# JAX_PLATFORMS=axon (the real TPU) and the axon plugin overrides the env var
# at import, so the config must be updated explicitly too.
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

assert jax.default_backend() == "cpu", "tests must not run on the real TPU"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
