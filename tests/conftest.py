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


@pytest.fixture
def eval_cli():
    """The repo's evaluate.py loaded by explicit path: a bare `import
    evaluate` is cwd-dependent and can collide with the HF `evaluate`
    package when another test chdirs."""
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "evaluate.py"
    spec = importlib.util.spec_from_file_location("tclight_evaluate", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
