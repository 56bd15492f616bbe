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
    with pytest.raises(ValueError, match="config mismatch"):
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


def test_cli_force_resume_persists_branch_provenance(tmp_path):
    """--force-resume from a mismatched config must leave an auditable
    record in the out-dir (ADVICE r4: the branch lineage used to live only
    in transient stdout)."""
    from climate_model_tpu.cli import main

    out = str(tmp_path / "out")
    rc = main(["run", "--nx", "16", "--ny", "10", "--nz", "4",
               "--days", "0.05", "--dtype", "float64", "--out-dir", out,
               "--no-nc"])
    assert rc == 0
    branch = str(tmp_path / "branch")
    args = ["run", "--nx", "16", "--ny", "10", "--nz", "4",
            "--days", "0.1", "--dtype", "float64", "--diff", "77.0",
            "--restart-from", os.path.join(out, "restart.npz"),
            "--out-dir", branch, "--no-nc"]
    with pytest.raises(ValueError, match="numerics.diff_uv"):
        main(args)                         # refused without --force-resume
    rc = main(args + ["--force-resume"])
    assert rc == 0
    recs = [json.loads(l)
            for l in open(os.path.join(branch, "forced_branch.jsonl"))]
    assert recs[0]["mismatch"]["numerics.diff_uv"]["current"] == 77.0
    assert recs[0]["restart_from"].endswith("restart.npz")


def test_cli_topo_file(tmp_path):
    """--topo-file: NetCDF elevation -> regrid -> run, end to end
    (reference ETOPO-input parity through the CLI)."""
    from scipy.io import netcdf_file

    from climate_model_tpu.cli import main

    slat = np.linspace(-85, 85, 60)
    slon = np.linspace(0, 359, 120)
    LA, LO = np.meshgrid(slat, slon, indexing="ij")
    z = 3000.0 * np.exp(-(((LA - 35) / 12) ** 2 + ((LO - 100) / 15) ** 2)) \
        - 2500.0
    path = str(tmp_path / "etopo.nc")
    with netcdf_file(path, "w") as f:
        f.createDimension("lat", len(slat))
        f.createDimension("lon", len(slon))
        v = f.createVariable("lat", "d", ("lat",)); v[:] = slat
        v = f.createVariable("lon", "d", ("lon",)); v[:] = slon
        v = f.createVariable("z", "d", ("lat", "lon")); v[:] = z
    out = str(tmp_path / "out")
    rc = main(["run", "--nx", "24", "--ny", "12", "--nz", "4",
               "--physics", "mic", "--days", "0.02", "--dtype", "float64",
               "--topo-file", path, "--out-dir", out, "--no-nc"])
    assert rc == 0
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert recs and not any(r["nan"] for r in recs)


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


def test_metrics_logger_resume_aware(tmp_path):
    """VERDICT r3 weak #6: re-running into the same out-dir must not
    accumulate duplicate step lines. Fresh session truncates; a resumed
    session drops lines beyond the resume step (a crashed earlier session's
    superseded future) and appends from there."""
    import json

    from climate_model_tpu.io.metrics import MetricsLogger

    path = str(tmp_path / "metrics.jsonl")
    with open(path, "w") as f:
        for s in (100, 200, 300):
            f.write(json.dumps({"step": s}) + "\n")
    # resume from step 200: the stale step-300 line is dropped
    lg = MetricsLogger(jsonl_path=path, quiet=True)
    lg.begin_session(200)
    steps = [json.loads(l)["step"] for l in open(path)]
    assert steps == [100, 200]
    # fresh run: the old history is ROTATED aside, not destroyed
    # (ADVICE r4: truncation silently lost completed-run evidence)
    MetricsLogger(jsonl_path=path, quiet=True).begin_session(0)
    assert not os.path.exists(path)
    steps = [json.loads(l)["step"] for l in open(path + ".1")]
    assert steps == [100, 200]
    # an empty stale file is simply removed from the way (nothing to keep)
    open(path, "w").close()
    MetricsLogger(jsonl_path=path, quiet=True).begin_session(0)
    assert open(path).read() == ""


def test_unresolved_rad_hours_refused_at_build(monkeypatch):
    """A ModelConfig built in Python with rad_every_hours set but never
    passed through resolve_rad_interval must be refused by the step-fn
    builders (ADVICE r3: it used to silently run at the step default while
    the fingerprint, which drops the sugar field, couldn't flag it)."""
    import dataclasses

    from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                               PhysicsConfig,
                                               resolve_rad_interval)
    from climate_model_tpu.model import make_step_fn

    cfg = ModelConfig(grid=GridConfig(nx=32, ny=16, nz=4),
                      physics=PhysicsConfig(radiation=True,
                                            rad_every_hours=1.0))
    with pytest.raises(ValueError, match="resolve_rad_interval"):
        make_step_fn(cfg)
    # resolved -> builds fine, and is idempotent under re-resolution
    rcfg = resolve_rad_interval(cfg)
    assert resolve_rad_interval(rcfg) == rcfg
    make_step_fn(rcfg)


def test_pallas_float64_refused_on_tpu(monkeypatch):
    """float64 + backend='pallas' is interpret-mode (CPU) only; on a real
    TPU backend the builders must refuse up front instead of failing deep
    inside Mosaic lowering (VERDICT r3 hygiene)."""
    import climate_model_tpu.model as model_mod
    from climate_model_tpu.core.config import GridConfig, ModelConfig
    from climate_model_tpu.model import make_chunk_runner

    cfg = ModelConfig(grid=GridConfig(nx=32, ny=16, nz=4), dtype="float64",
                      backend="pallas")
    # on this CPU test backend it builds (interpret mode)...
    make_chunk_runner(cfg, 1)
    # ...but with a TPU default backend it must refuse
    monkeypatch.setattr(model_mod.jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="float64"):
        make_chunk_runner(cfg, 1)


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
        assert (toml_cfg.numerics.adaptive_dt
                == code_cfg.numerics.adaptive_dt), n
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
    # the refusal names the differing field (round 5: full-value record)
    with pytest.raises(ValueError, match="numerics.diff_uv"):
        load_checkpoint(path, retuned)
    # ... unless the mismatch is a deliberate perturbation branch
    # (CLI --force-resume): loads with a warning, bytes unchanged
    forced = load_checkpoint(path, retuned, force=True)
    np.testing.assert_array_equal(np.asarray(forced.u), np.asarray(state.u))


def test_checkpoint_legacy_fingerprint_accepted():
    """Checkpoints saved BEFORE the round-5 full-value identity record
    carry only the delta-hash ``_fingerprint``; loads must still accept
    them via the exact legacy hash computation. The legacy hash of the
    flagship adaptive config is pinned to a committed text fixture, so the
    legacy algorithm cannot silently drift while legacy checkpoints exist
    (every committed out_*/restart.npz through round 4 is one)."""
    import dataclasses
    import os

    from climate_model_tpu.core.config import baseline_config
    from climate_model_tpu.io.checkpoint import _legacy_fingerprints

    fixture = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                           "fingerprint_baseline3_adaptive.txt")
    expected = [ln for ln in open(fixture)
                if ln.strip() and not ln.startswith("#")][0].strip()
    cfg = baseline_config(3)   # presets carry adaptive_dt=True since round 5
    assert cfg.numerics.adaptive_dt
    # dual accept: saved by an adaptive run (hash included the then-
    # non-default adaptive_dt=True) or a fixed-dt run (it did not)
    assert expected in _legacy_fingerprints(cfg)
    assert config_fingerprint(cfg.replace(numerics=dataclasses.replace(
        cfg.numerics, adaptive_dt=False))) == config_fingerprint(cfg)

    # the committed adaptive-run checkpoint (if this checkout carries run
    # artifacts) is a real legacy file: it must verify against the current
    # flagship preset
    path = os.path.join(os.path.dirname(__file__), "..", "..",
                        "out_adapt", "restart.npz")
    if os.path.exists(path):
        from climate_model_tpu.io.checkpoint import _config_mismatch
        with np.load(path) as z:
            assert bytes(z["_fingerprint"]).decode() == expected
            assert "_config_json" not in z.files       # genuinely legacy
            assert _config_mismatch(z, cfg) is None


def _rewrite_config_json(path, mutate):
    """Rewrite a saved checkpoint's _config_json record through ``mutate``
    (None drops the record entirely -> legacy hash-only file)."""
    import json as _json
    with np.load(path) as z:
        items = {k: z[k] for k in z.files}
    if mutate is None:
        del items["_config_json"]
    else:
        rec = _json.loads(bytes(items["_config_json"]).decode())
        mutate(rec)
        items["_config_json"] = np.frombuffer(
            _json.dumps(rec, sort_keys=True).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **items)
    os.replace(tmp, path)


def test_checkpoint_detects_default_retune(small_run, tmp_path):
    """THE hole the round-5 record closes (ADVICE r4 medium): a checkpoint
    saved when a physics field equaled the THEN-default must refuse to
    resume after the default is retuned. Simulated by rewriting the saved
    record to the old default value (e.g. the pre-round-4 ocean albedo)
    while the current config sits at the new default — the old delta-hash
    was blind to exactly this (both sides omitted the field)."""
    cfg, state, forcing, grid = small_run
    path = str(tmp_path / "restart.npz")
    save_checkpoint(path, state, cfg)

    def retune(rec):
        assert rec["physics"]["albedo_ocean"] == cfg.physics.albedo_ocean
        rec["physics"]["albedo_ocean"] = 0.08      # the pre-retune default
    _rewrite_config_json(path, retune)
    with pytest.raises(ValueError, match="physics.albedo_ocean"):
        load_checkpoint(path, cfg)
    # ... unless deliberately branched; the mismatch record names the field
    from climate_model_tpu.io.checkpoint import load_checkpoint_ex
    st, mismatch = load_checkpoint_ex(path, cfg, force=True)
    assert mismatch == {"physics.albedo_ocean":
                        {"saved": 0.08, "current": cfg.physics.albedo_ocean}}
    np.testing.assert_array_equal(np.asarray(st.u), np.asarray(state.u))


def test_checkpoint_identity_skips_unknown_and_policy_fields(small_run,
                                                             tmp_path):
    """Config-surface growth and runtime-policy flips never orphan
    restarts: a field unknown to the current code is skipped (it was saved
    by a NEWER or OLDER surface), and the policy fields (adaptive_dt,
    rad_every_hours) are not part of the identity at all."""
    import dataclasses

    cfg, state, forcing, grid = small_run
    path = str(tmp_path / "restart.npz")
    save_checkpoint(path, state, cfg)
    _rewrite_config_json(
        path, lambda rec: rec["physics"].update(future_switch=True))
    load_checkpoint(path, cfg)                      # unknown field: fine
    # policy flip: fixed-dt save resumes under an adaptive config
    adaptive = cfg.replace(numerics=dataclasses.replace(
        cfg.numerics, adaptive_dt=True))
    load_checkpoint(path, adaptive)
    # and a TRUE legacy hash-only file (pre-round-5: delta-hash in
    # _fingerprint, no record) still resumes under either policy
    import json as _json

    from climate_model_tpu.io.checkpoint import _legacy_fingerprints
    legacy_fp = sorted(_legacy_fingerprints(cfg))[0]
    _rewrite_config_json(path, None)
    with np.load(path) as z:
        items = {k: z[k] for k in z.files}
    items["_fingerprint"] = np.frombuffer(legacy_fp.encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **items)
    os.replace(tmp, path)
    load_checkpoint(path, cfg)
    load_checkpoint(path, adaptive)
