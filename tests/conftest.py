"""Test configuration: CPU backend with an 8-device virtual mesh and x64.

Tests validate numerics against float64 NumPy/SciPy golden models and check
multi-chip sharding on a forced 8-device CPU mesh; the TPU path is exercised
by bench.py / __graft_entry__.py on real hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The hosted axon TPU plugin force-selects itself regardless of the env var;
# config.update has higher priority than both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
