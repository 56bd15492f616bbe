"""Test configuration.

All tests run on CPU with 8 virtual devices (for sharding tests) and fp64
enabled (for oracle comparisons), per SURVEY.md §4 "Distributed without a
cluster". Must set env vars before jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from climate_model_tpu.core.config import GridConfig, ModelConfig, NumericsConfig


@pytest.fixture(scope="session")
def small_cfg() -> ModelConfig:
    """Tiny grid for fast unit tests; fp64 for oracle comparison."""
    return ModelConfig(
        grid=GridConfig(nx=16, ny=10, nz=4),
        numerics=NumericsConfig(),
        dtype="float64",
    )


@pytest.fixture(scope="session")
def cfg1() -> ModelConfig:
    """BASELINE milestone config #1 grid (dry core 64x32x8) at fp64."""
    from climate_model_tpu.core.config import baseline_config
    return baseline_config(1).replace(dtype="float64")


def rng(seed=0):
    return np.random.default_rng(seed)
