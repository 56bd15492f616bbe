"""IO subsystem tests: NetCDF output, checkpoint/restart, metrics, CLI.

SURVEY.md §5: checkpoint/resume must be bit-exact (the reference's pickled
restarts were); NetCDF output must carry the reference's field set.
"""

import json
import os

import jax
import numpy as np
import pytest

from climate_model_tpu.core.config import GridConfig, ModelConfig
from climate_model_tpu.core.init import initialize
from climate_model_tpu.dycore.stepper import run_scan
from climate_model_tpu.io.checkpoint import (config_fingerprint,
                                             load_checkpoint, save_checkpoint)
from climate_model_tpu.io.metrics import MetricsLogger, diagnostics
from climate_model_tpu.io.netcdf import NCWriter
from climate_model_tpu.model import make_step_fn


@pytest.fixture()
def small_run():
    cfg = ModelConfig(grid=GridConfig(nx=16, ny=10, nz=4), dtype="float64")
    state, forcing, grid = initialize(cfg)
    return cfg, state, forcing, grid


def test_checkpoint_bit_exact_resume(small_run, tmp_path):
    cfg, state, forcing, grid = small_run
    step = make_step_fn(cfg)
    run5 = jax.jit(lambda s: run_scan(step, s, grid, forcing, 5))

    mid = jax.block_until_ready(run5(state))
    path = str(tmp_path / "restart.npz")
    save_checkpoint(path, mid, cfg)
    resumed = load_checkpoint(path, cfg)
    a = jax.block_until_ready(run5(mid))
    b = jax.block_until_ready(run5(resumed))
    for name in ("u", "v", "colp", "pott", "qv", "qc", "t", "step"):
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)), err_msg=name)


def test_checkpoint_refuses_config_mismatch(small_run, tmp_path):
    cfg, state, forcing, grid = small_run
    path = str(tmp_path / "restart.npz")
    save_checkpoint(path, state, cfg)
    other = cfg.replace(dtype="float32")
    assert config_fingerprint(other) != config_fingerprint(cfg)
    with pytest.raises(ValueError, match="fingerprint"):
        load_checkpoint(path, other)


def test_netcdf_output_fields(small_run, tmp_path):
    from scipy.io import netcdf_file

    cfg, state, forcing, grid = small_run
    w = NCWriter(str(tmp_path))
    p = w.write(state, grid, forcing)
    assert os.path.exists(os.path.join(str(tmp_path), "constants.nc"))
    with netcdf_file(p, "r") as f:
        for name in ("UWIND", "VWIND", "WWIND", "POTT", "TAIR", "PHI",
                     "QV", "QC", "PSURF", "COLP", "RAIN", "TSURF", "time"):
            assert name in f.variables, name
        assert f.variables["UWIND"].shape == (1, 4, 10, 16)
        assert f.variables["WWIND"].shape == (1, 5, 10, 16)
        tair = f.variables["TAIR"][0]
        assert 180.0 < tair.mean() < 320.0
    with netcdf_file(os.path.join(str(tmp_path), "constants.nc"), "r") as f:
        assert "HSURF" in f.variables and "LAND_MASK" in f.variables


def test_metrics_logger(small_run, tmp_path):
    cfg, state, forcing, grid = small_run
    d = diagnostics(state, grid)
    assert not bool(d.nan_flag)
    assert 85000.0 < float(d.mean_colp) < 95000.0
    jsonl = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(jsonl_path=jsonl, grid_points=16 * 10 * 4,
                           quiet=True)
    rec = logger.log_chunk(d)
    with open(jsonl) as f:
        read_back = json.loads(f.read().strip())
    assert read_back["mean_colp"] == rec["mean_colp"]
    assert "grid_points_per_s" in read_back


def test_cli_run_and_restart(tmp_path):
    from climate_model_tpu.cli import main

    out = str(tmp_path / "out")
    rc = main(["run", "--nx", "16", "--ny", "10", "--nz", "4",
               "--days", "0.05", "--dtype", "float64", "--out-dir", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "restart.npz"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "out_0000.nc"))
    # resume from the restart file
    rc = main(["run", "--nx", "16", "--ny", "10", "--nz", "4",
               "--days", "0.05", "--dtype", "float64",
               "--restart-from", os.path.join(out, "restart.npz")])
    assert rc == 0


def test_toml_namelist_roundtrip(tmp_path):
    from climate_model_tpu.core.namelist import load_config

    p = tmp_path / "nl.toml"
    p.write_text('''
sim_days = 0.5
dtype = "float64"

[grid]
nx = 20
ny = 12
nz = 4

[physics]
microphysics = true

[numerics]
time_stepping = "rk4"
diff_pott = 100.0
''')
    cfg = load_config(str(p))
    assert cfg.grid.nx == 20 and cfg.numerics.time_stepping == "rk4"
    assert cfg.physics.microphysics and cfg.sim_days == 0.5
    # unknown key rejection (the reference silently ignored namelist typos)
    p2 = tmp_path / "bad.toml"
    p2.write_text("[grid]\nnnx = 3\n")
    with pytest.raises(ValueError, match="unknown keys"):
        load_config(str(p2))


def test_rad_every_hours_resolves_against_dt(tmp_path):
    """Hour-based radiation cadence (the reference i_rad_nth_hour unit) is
    converted to rad_every_steps against the grid's CFL dt by the loader."""
    from climate_model_tpu.core.grid import make_grid
    from climate_model_tpu.core.namelist import load_config

    p = tmp_path / "nl.toml"
    p.write_text('''
[grid]
nx = 64
ny = 32
nz = 4

[physics]
radiation = true
rad_every_hours = 1.0
''')
    cfg = load_config(str(p))
    dt = float(make_grid(cfg.grid, cfg.numerics, np_mode=True).dt)
    assert cfg.physics.rad_every_steps == max(1, round(3600.0 / dt))
    assert cfg.physics.rad_every_steps != 6      # actually resolved


def test_topography_loader(tmp_path):
    """Synthetic ETOPO-like NetCDF -> model grid regrid (SURVEY.md §2.3)."""
    from scipy.io import netcdf_file

    from climate_model_tpu.core.config import GridConfig, ModelConfig
    from climate_model_tpu.core.grid import make_grid
    from climate_model_tpu.io.topo import load_topography

    # fine source grid: one gaussian island in an ocean
    slat = np.linspace(-85, 85, 180)
    slon = np.linspace(0, 359, 360)
    LA, LO = np.meshgrid(slat, slon, indexing="ij")
    z = 7000.0 * np.exp(-(((LA - 30) / 10) ** 2 + ((LO - 120) / 10) ** 2)) \
        - 4000.0
    path = str(tmp_path / "etopo.nc")
    with netcdf_file(path, "w") as f:
        f.createDimension("lat", len(slat))
        f.createDimension("lon", len(slon))
        v = f.createVariable("lat", "d", ("lat",)); v[:] = slat
        v = f.createVariable("lon", "d", ("lon",)); v[:] = slon
        v = f.createVariable("z", "d", ("lat", "lon")); v[:] = z

    cfg = ModelConfig(grid=GridConfig(nx=36, ny=18, nz=4))
    grid_np = make_grid(cfg.grid, cfg.numerics, np_mode=True)
    hsurf, land = load_topography(path, grid_np)
    assert hsurf.shape == (18, 36) and land.shape == (18, 36)
    assert (hsurf >= 0).all()
    assert land.max() == 1.0 and land.mean() < 0.2   # one island
    # island at ~(30N, 120E): nearest model cell is land with elevation
    j = np.argmin(np.abs(np.rad2deg(grid_np.lat) - 30))
    i = np.argmin(np.abs(np.rad2deg(grid_np.lon) - 120))
    assert land[j, i] == 1.0 and hsurf[j, i] > 500.0
    # ocean cells have zero HSURF
    assert hsurf[land < 0.5].max() == 0.0


def test_quicklook_plot(small_run, tmp_path):
    from climate_model_tpu.io.plot import quicklook_nc

    cfg, state, forcing, grid = small_run
    w = NCWriter(str(tmp_path))
    p = w.write(state, grid, forcing)
    png = quicklook_nc(p, str(tmp_path / "ql.png"))
    assert os.path.getsize(png) > 10_000


def test_baseline_toml_presets_match_coded_presets():
    """configs/baseline_{1..5}.toml must agree with core.config.baseline_config
    on grid, physics switches, sharding, and the scale-aware diffusion
    defaults — guards the two preset sources against drifting apart."""
    import os

    from climate_model_tpu.core.config import baseline_config
    from climate_model_tpu.core.namelist import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "..", "configs")
    for n in range(1, 6):
        toml_cfg = load_config(os.path.join(root, f"baseline_{n}.toml"))
        code_cfg = baseline_config(n)
        assert toml_cfg.grid == code_cfg.grid, n
        assert toml_cfg.physics == code_cfg.physics, n
        assert toml_cfg.sharding == code_cfg.sharding, n
        for f in ("diff_uv", "diff_pott", "diff_moist"):
            tv = getattr(toml_cfg.numerics, f)
            cv = getattr(code_cfg.numerics, f)
            assert abs(tv - cv) <= 1e-9 * max(abs(cv), 1.0), (n, f, tv, cv)
        assert (toml_cfg.numerics.moisture_tendency
                == code_cfg.numerics.moisture_tendency), n
        assert toml_cfg.backend == code_cfg.backend, n


def test_checkpoint_resume_across_run_settings(small_run, tmp_path):
    """The fingerprint covers state semantics (grid/physics/numerics/dtype)
    only: extending the horizon, changing output cadence, switching
    backend, or resharding are legitimate resumes; a changed diffusion
    coefficient is not."""
    import dataclasses

    from climate_model_tpu.core.config import ShardingConfig

    cfg, state, forcing, grid = small_run
    path = str(tmp_path / "restart.npz")
    save_checkpoint(path, state, cfg)
    extended = cfg.replace(
        sim_days=cfg.sim_days * 8, out_every_hours=1.0, backend="pallas",
        sharding=ShardingConfig(mesh_lat=2, mesh_lon=4, mode="shard_map"))
    assert config_fingerprint(extended) == config_fingerprint(cfg)
    back = load_checkpoint(path, extended)
    np.testing.assert_array_equal(np.asarray(back.u), np.asarray(state.u))
    retuned = cfg.replace(numerics=dataclasses.replace(
        cfg.numerics, diff_uv=12345.0))
    with pytest.raises(ValueError, match="fingerprint"):
        load_checkpoint(path, retuned)


def test_checkpoint_fingerprint_backward_compat():
    """Pin fingerprint stability across config-surface evolution: the
    committed out_adapt checkpoint (written before rad_every_hours existed)
    must still match its config's fingerprint today. Config-sugar fields
    that resolve into existing fields before use (rad_every_hours ->
    rad_every_steps) are excluded from the hash for exactly this reason —
    adding one must not orphan users' restart files."""
    import dataclasses
    import os

    from climate_model_tpu.core.config import baseline_config

    path = os.path.join(os.path.dirname(__file__), "..", "..",
                        "out_adapt", "restart.npz")
    z = np.load(path)
    saved = bytes(z["_fingerprint"]).decode()
    cfg = baseline_config(3)
    cfg = cfg.replace(numerics=dataclasses.replace(cfg.numerics,
                                                   adaptive_dt=True))
    assert saved == config_fingerprint(cfg)
