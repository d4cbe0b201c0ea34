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

import time  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ---- fast-tier wall-clock budget guard (VERDICT r3 item 7) ----
# The default tier must stay a quick pre-commit gate (~5 min). The guard
# only arms on FULL unfiltered fast-tier runs, and the hard threshold is
# deliberately loose (2x the target) because this box's shared host core
# swings >2x minute-to-minute — the guard exists to catch structural
# growth (a new expensive test landing untiered), not tenancy noise.
_BUDGET_WARN_S = 400.0
_BUDGET_FAIL_S = 900.0
_t_session = None


def pytest_configure(config):
    global _t_session
    # Arm only for the default fast tier: no -k filter and the markexpr
    # is pytest.ini's addopts default ("not slow").
    if not config.option.keyword and \
            config.option.markexpr == "not slow":
        _t_session = time.monotonic()


def pytest_sessionfinish(session, exitstatus):
    if _t_session is None:
        return
    dt = time.monotonic() - _t_session
    if dt > _BUDGET_FAIL_S:
        session.exitstatus = 1
        print(f"\nFAST-TIER BUDGET EXCEEDED: {dt:.0f}s > "
              f"{_BUDGET_FAIL_S:.0f}s — move new expensive tests to the "
              f"slow tier (@pytest.mark.slow)")
    elif dt > _BUDGET_WARN_S:
        print(f"\nfast-tier budget warning: {dt:.0f}s "
              f"(target < {_BUDGET_WARN_S:.0f}s)")
