"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (must run
before the first jax import)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize force-registers the axon TPU backend and
# pins JAX_PLATFORMS=axon; the config flag wins over both.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache (separate dir from the TPU runs):
# most of the suite's wall-clock is CPU compiles, repeated identically
# every session — a warm cache cuts the full run substantially.
from sir_gcn_tpu.utils import enable_compile_cache

enable_compile_cache(os.path.expanduser("~/.cache/sir_gcn_tpu/xla_tests"))

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
