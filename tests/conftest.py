"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and execute without TPU hardware.

NOTE: this environment's sitecustomize registers an `axon` TPU plugin that
overrides JAX_PLATFORMS from the environment, so we must override the
platform via jax.config AFTER import (verified: env vars alone are
ignored). XLA_FLAGS must still be set before the first backend init.
"""

import os

# Compiles in this environment can go over a slow remote tunnel; cache them.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
