"""Test configuration.

All tests run on CPU with 8 virtual devices (for the sharding suite) and
fp64 enabled (for oracle comparisons), per SURVEY.md §4 "Distributed without
a cluster".

CAUTION: this environment PRE-IMPORTS jax before pytest starts (so
JAX_PLATFORMS/env-var tricks are latched too late) and pre-sets
JAX_PLATFORMS=axon (a tunneled TPU). The backend, however, is not yet
initialized, so ``jax.config.update`` + XLA_FLAGS below still take effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (usually already imported; config still mutable)

# tests/tpu's on-device gates (opt-in CLIMATE_TPU_RUN_TPU=1) need the REAL
# accelerator backend; everything else pins CPU + fp64 + 8 virtual devices.
_want_tpu = os.environ.get("CLIMATE_TPU_RUN_TPU") == "1"
if not _want_tpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if not _want_tpu:
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; backend was initialized before conftest "
        "could reconfigure it")
    assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from climate_model_tpu.core.config import GridConfig, ModelConfig, NumericsConfig


def pytest_collection_modifyitems(config, items):
    """With CLIMATE_TPU_RUN_TPU=1 the whole pytest process runs on the REAL
    TPU backend (the flag drops the CPU pin + fp64 above), so every test
    OUTSIDE tests/tpu would execute with wrong dtype expectations over the
    serializing device tunnel (ADVICE r4). Auto-skip them instead of
    relying on the user to pass tests/tpu explicitly."""
    if not _want_tpu:
        return
    skip = pytest.mark.skip(
        reason="CLIMATE_TPU_RUN_TPU=1 selects the real-TPU backend; CPU "
               "fp64 suites are auto-skipped (run them without the flag)")
    for item in items:
        path = str(item.fspath).replace(os.sep, "/")
        if "/tests/tpu/" not in path:
            item.add_marker(skip)


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
