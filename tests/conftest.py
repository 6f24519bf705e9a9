"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
is testable without TPU hardware (the reference has no such fixture; see
SURVEY.md section 4).

Note: the environment's sitecustomize registers a TPU backend at interpreter
startup, so ``JAX_PLATFORMS`` env alone is not enough — we switch the platform
via jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent XLA:CPU compile cache: the suite is compile-dominated (deep UNet
# train-step jits); warm reruns drop ~30% wall time. Harmless for
# correctness — tests assert values, not compile events.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("WCT_TEST_COMPILE_CACHE", "/tmp/wct_cpu_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_random_coords(rng, n, valid_n, coord_range=128):
    """Random int coords [n,3] with first valid_n rows valid (may contain dups)."""
    coords = rng.integers(0, coord_range, size=(n, 3)).astype(np.int32)
    valid = np.zeros((n,), bool)
    valid[:valid_n] = True
    return coords, valid
