"""Adaptive dt (reference solver.py per-step CFL/max-wind dt, SURVEY.md
§3.1 hot loop #0): rebuilt as a per-chunk host-side recomputation.
"""

import json
import os

import pytest

from climate_model_tpu.cli import main
from climate_model_tpu.core.config import GridConfig, ModelConfig
from climate_model_tpu.core.grid import adaptive_cfl_dt, make_grid


def test_adaptive_dt_run(tmp_path):
    rc = main(["run", "--nx", "32", "--ny", "16", "--nz", "4",
               "--days", "0.05", "--adaptive-dt",
               "--out-every-hours", "0.4",
               "--out-dir", str(tmp_path)])
    assert rc == 0
    recs = [json.loads(line)
            for line in open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert recs and all(not r["nan"] for r in recs)
    # the run covers the sim-time horizon even though dt changed mid-run,
    # and the tail chunk is clamped with a half-step tolerance so the final
    # t lands within dt/2 of the horizon (exact-horizon behavior, adaptive
    # mode; ADVICE r3 — previously up to 2 steps over)
    dt_days = recs[-1]["dt"] / 86400.0
    assert recs[-1]["t_days"] >= 0.05 - 0.51 * dt_days
    assert recs[-1]["t_days"] <= 0.05 + 0.51 * dt_days

    cfg = ModelConfig(grid=GridConfig(nx=32, ny=16, nz=4))
    grid = make_grid(cfg.grid, cfg.numerics)
    dt0 = float(grid.dt)
    # every chunk logs the dt it ran with; the first chunk runs the init dt
    assert recs[0]["dt"] == pytest.approx(dt0, rel=1e-6)
    # winds below the 100 m/s init margin do NOT grow dt (the init dt sits
    # near the Matsuno stability boundary — adaptive_cfl_dt docstring);
    # winds above it shrink dt as a blow-up safety net
    assert recs[1]["dt"] == pytest.approx(dt0, rel=1e-6)
    min_dx = float(min(grid.dx.min(), grid.dy))
    stormy = adaptive_cfl_dt(min_dx, cfg.numerics.cfl, 150.0)
    assert stormy < dt0
    assert stormy == pytest.approx(dt0 * (100.0 + 313.2) / (150.0 + 313.2),
                                   rel=1e-3)


def test_adaptive_dt_pallas_backend(tmp_path):
    """dt rides into the fused kernel as an SMEM operand (round 3), so the
    adaptive-dt driver runs on backend=pallas too — one compiled program
    serves every chunk's dt (the round-2 static-Mosaic-constant refusal is
    gone)."""
    rc = main(["run", "--nx", "32", "--ny", "16", "--nz", "4",
               "--days", "0.05", "--adaptive-dt", "--backend", "pallas",
               "--out-every-hours", "0.4",
               "--out-dir", str(tmp_path)])
    assert rc == 0
    recs = [json.loads(line)
            for line in open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert recs and all(not r["nan"] for r in recs)
    dt_days = recs[-1]["dt"] / 86400.0
    assert recs[-1]["t_days"] >= 0.05 - 0.51 * dt_days
    assert recs[-1]["t_days"] <= 0.05 + 0.51 * dt_days
    assert all("dt" in r for r in recs)


def test_no_nc_run_and_npz_quicklook(tmp_path):
    """--no-nc keeps metrics + restart only; plot renders straight from the
    checkpoint (the slow-device-link workflow, README usage) — map
    quicklook, zonal-mean cross-sections, and the metrics time series."""
    rc = main(["run", "--nx", "32", "--ny", "16", "--nz", "4",
               "--days", "0.02", "--no-nc", "--out-dir", str(tmp_path)])
    assert rc == 0
    files = sorted(os.listdir(tmp_path))
    assert files == ["metrics.jsonl", "restart.npz"]   # no .nc dumps
    rc = main(["plot", str(tmp_path / "restart.npz")])
    assert rc == 0
    assert (tmp_path / "restart.png").exists()
    rc = main(["plot", str(tmp_path / "restart.npz"), "--zonal",
               "--out", str(tmp_path / "zonal.png")])
    assert rc == 0
    assert os.path.getsize(tmp_path / "zonal.png") > 10_000
    rc = main(["plot", str(tmp_path / "metrics.jsonl"),
               "--out", str(tmp_path / "series.png")])
    assert rc == 0
    assert os.path.getsize(tmp_path / "series.png") > 10_000


def test_cli_exact_horizon_resume_and_nc_sequence(tmp_path):
    """The driver executes EXACTLY the requested horizon (tail-chunk
    program when the cadence does not divide it), --auto-resume picks up
    the run's own checkpoint, and a resumed run CONTINUES the out_NNNN.nc
    numbering instead of overwriting the earlier timeline."""
    import json

    d = str(tmp_path)
    base = ["run", "--nx", "32", "--ny", "16", "--nz", "4",
            "--out-every-hours", "0.4", "--out-dir", d]
    assert main(base + ["--days", "0.06"]) == 0
    recs = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert recs[-1]["step"] == 9          # int(0.06*86400/548.5s), not 10
    first = sorted(f for f in os.listdir(d) if f.startswith("out_"))
    assert main(base + ["--days", "0.12", "--auto-resume"]) == 0
    recs = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert recs[-1]["step"] == 18
    both = sorted(f for f in os.listdir(d) if f.startswith("out_"))
    assert both[:len(first)] == first      # earlier timeline untouched
    assert len(both) > len(first)          # sequence continued
