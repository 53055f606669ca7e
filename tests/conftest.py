"""Test config: run on CPU with 8 virtual devices so mesh/sharding tests work
without a pod (SURVEY.md §4 item 4). Must set env before jax is imported."""

import os

# Force CPU: the driver environment pins JAX_PLATFORMS=axon (the TPU), so a
# plain setdefault would silently run the whole suite against the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
