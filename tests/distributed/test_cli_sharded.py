"""CLI run with a 2x4 device mesh on virtual CPU devices (both modes)."""

import os

import jax
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.mark.parametrize("mode", ["shard_map", "auto"])
def test_cli_run_sharded(tmp_path, mode):
    from climate_model_tpu.cli import main

    cfgp = tmp_path / "cfg.toml"
    cfgp.write_text(f'''
sim_days = 0.1
dtype = "float64"

[grid]
nx = 32
ny = 16
nz = 4

[physics]
microphysics = true

[sharding]
mesh_lat = 2
mesh_lon = 4
mode = "{mode}"
''')
    out = str(tmp_path / "out")
    rc = main(["run", "--config", str(cfgp), "--out-dir", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "restart.npz"))


def test_scaling_harness():
    """Plumbing check of the scaling-efficiency harness on virtual devices
    (efficiency numbers are meaningless on CPU; shapes/fields must be sane)."""
    from climate_model_tpu.bench.scaling import measure_scaling
    from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                               ShardingConfig)

    cfg = ModelConfig(grid=GridConfig(nx=32, ny=16, nz=4),
                      sharding=ShardingConfig(mesh_lat=2, mesh_lon=4,
                                              mode="shard_map"),
                      dtype="float64")
    out = measure_scaling(cfg, steps=3)
    assert out["n_devices"] == 8
    assert out["gps_1dev"] > 0 and out["gps_ndev"] > 0
    assert 0 < out["value"]
