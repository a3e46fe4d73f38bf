"""Test env: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware.

The environment pre-sets JAX_PLATFORMS=axon (tunneled TPU); tests must run
on CPU, and `jax.config.update` is the override that actually sticks here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
