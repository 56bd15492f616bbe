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
    """Scaling harness on 8 virtual devices. The 8 virtual CPU devices share
    the same physical cores, so per-device efficiency (value) is
    structurally meaningless here; the plumbing gate is the N-vs-1
    throughput RATIO — sharding + per-substep ppermute halos must not eat
    the run (measured ~0.9 on this box at 256x128x16, docs/STATUS.md)."""
    from climate_model_tpu.bench.scaling import measure_scaling
    from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                               ShardingConfig)

    cfg = ModelConfig(grid=GridConfig(nx=128, ny=64, nz=8),
                      sharding=ShardingConfig(mesh_lat=2, mesh_lon=4,
                                              mode="shard_map"),
                      dtype="float32")
    # Wall-clock ratios on shared cores are sensitive to transient host
    # load (observed 0.27 while a TPU bench hogged the host vs ~0.9 idle);
    # take the best of up to 3 measurements before judging.
    best = None
    for _ in range(3):
        out = measure_scaling(cfg, steps=5)
        assert out["n_devices"] == 8
        assert out["gps_1dev"] > 0 and out["gps_ndev"] > 0
        best = out if best is None or out["gps_ratio"] > best["gps_ratio"] \
            else best
        if best["gps_ratio"] > 0.3:
            break
    assert best["gps_ratio"] > 0.3, best
