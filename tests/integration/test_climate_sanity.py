"""Climate-sanity gates: global energy balance + water closure over a long
full-physics run (SURVEY.md §4 properties row; BASELINE config #5
"sustained" — a multi-day climatology needs more than "no NaN").

Opt-in (CLIMATE_TPU_RUN_CLIMATE=1; a few minutes of CPU). Checks, from the
JSONL-diagnostic fields (io/metrics.py):

1. Energy: d(energy)/dt over each chunk tracks the net TOA flux
   (toa_net_sw - olr). The residual isolates the model's known
   non-conservative terms (KE dissipation by surface drag / horizontal
   diffusion, rain enthalpy removal, radiation-interval sampling) — it must
   stay small against the ~250 W/m2 flux scale (calibrated: |resid| < 12
   W/m2 per chunk, |mean| < 5 W/m2 at 96x48x8 fp32).
2. Water: total column water + accumulated rain grows exactly by the
   integrated surface evaporation (rain moves water between reservoirs;
   evaporation is the only source). Trapezoid-integrated evap_rate matches
   the total_water change to < 2%.
"""

import os

import jax
import numpy as np
import pytest

from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           NumericsConfig, PhysicsConfig,
                                           default_diffusion)
from climate_model_tpu.core.init import initialize
from climate_model_tpu.io.metrics import diagnostics
from climate_model_tpu.model import make_run_fn

def test_stability_probe_smoke():
    """bench --stability plumbing (always-on smoke): tiny config, few
    steps, reports a bounded trajectory and the config's diffusion."""
    from climate_model_tpu.bench.stability import probe_stability

    cfg = ModelConfig(grid=GridConfig(nx=32, ny=16, nz=4),
                      numerics=NumericsConfig(diff_uv=1e4, diff_pott=1e4,
                                              diff_moist=1e4),
                      dtype="float32")
    out = probe_stability(cfg, steps=20, chunk=10, verbose=False)
    assert out["stable"] and out["steps_run"] == 20
    assert out["diff_uv"] == 1e4
    assert len(out["trajectory"]) == 2
    assert out["trajectory"][-1]["max_u"] < 100.0


_opt_in = pytest.mark.skipif(
    os.environ.get("CLIMATE_TPU_RUN_CLIMATE") != "1",
    reason="climate-sanity closure gates are opt-in "
           "(CLIMATE_TPU_RUN_CLIMATE=1; several minutes)")


@_opt_in
def test_energy_and_water_closure():
    cfg = ModelConfig(
        grid=GridConfig(nx=96, ny=48, nz=8),
        physics=PhysicsConfig(microphysics=True, radiation=True,
                              surface=True, turbulence=True,
                              rad_every_steps=4),
        numerics=NumericsConfig(diff_uv=1e4, diff_pott=1e4, diff_moist=1e4),
        dtype="float32")
    state, forcing, grid = initialize(cfg)
    run = make_run_fn(cfg, 50, donate=False)
    diag = jax.jit(lambda s: diagnostics(s, grid, forcing, cfg))
    area_tot = float(np.sum(np.asarray(grid.area)) * cfg.grid.nx)

    d = diag(state)
    w0 = float(d.total_water)
    e_prev, t_prev, ev_prev = (float(d.energy), float(d.t),
                               float(d.evap_rate))
    resids = []
    evap_int = 0.0
    for _ in range(16):    # 800 steps, ~1.3 sim days at this grid
        state = jax.block_until_ready(run(state, grid, forcing))
        d = diag(state)
        assert not bool(d.nan_flag)
        e, t, ev = float(d.energy), float(d.t), float(d.evap_rate)
        toa = float(d.toa_net_sw) - float(d.olr)
        resid = (e - e_prev) / (t - t_prev) - toa
        resids.append(resid)
        assert abs(resid) < 12.0, \
            f"energy closure residual {resid:.1f} W/m2 at step {int(d.step)}"
        evap_int += 0.5 * (ev + ev_prev) * (t - t_prev) * area_tot
        e_prev, t_prev, ev_prev = e, t, ev
    assert abs(float(np.mean(resids))) < 5.0
    dwater = float(d.total_water) - w0
    assert dwater > 0.0 and evap_int > 0.0
    assert abs(dwater - evap_int) / evap_int < 0.02, (dwater, evap_int)


@_opt_in
def test_equilibrium_approach():
    """Round-4 gate (VERDICT r3 missing #1 / next #1): the retuned gray
    atmosphere must let the climate CLOSE its TOA budget — not just stay
    finite. A 6-deg full-physics run from the standard IC must show (a)
    the global TOA imbalance decaying well below its peak, (b) the mean
    atmospheric temperature flattening, and (c) an ACTIVE hydrologic cycle
    whose rain rate tends toward the evaporation rate. Thresholds are
    calibrated on the committed 4-deg/6-deg tuning runs (docs/STATUS.md
    round-4: imbalance 15.5 -> ~8 W/m2 by day 60 at 6 deg, POTT trend
    ~0.005 K/day, rain/evap ~0.85) with ~50% headroom. ~6 min of CPU."""
    k = default_diffusion(60)
    cfg = ModelConfig(
        grid=GridConfig(nx=60, ny=30, nz=10),
        physics=PhysicsConfig(microphysics=True, radiation=True,
                              surface=True, turbulence=True,
                              rad_every_steps=12),
        numerics=NumericsConfig(diff_uv=k, diff_pott=k, diff_moist=k),
        dtype="float32")
    state, forcing, grid = initialize(cfg)
    dt = float(grid.dt)
    chunk = int(3 * 86400.0 / dt)                  # 3-day chunks
    run = make_run_fn(cfg, chunk, donate=False)
    diag = jax.jit(lambda s: diagnostics(s, grid, forcing, cfg))
    hist = []
    for _ in range(20):                            # 60 sim days
        state = jax.block_until_ready(run(state, grid, forcing))
        d = diag(state)
        assert not bool(d.nan_flag)
        hist.append(dict(t=float(d.t) / 86400.0,
                         pott=float(d.mean_tair_proxy),
                         imb=float(d.toa_net_sw) - float(d.olr),
                         rain=float(d.total_rain),
                         evap=float(d.evap_rate) * 86400.0))
    peak_imb = max(abs(h["imb"]) for h in hist)
    end_imb = abs(np.mean([h["imb"] for h in hist[-3:]]))
    # (a) TOA imbalance decays: well below peak AND small in absolute terms
    assert end_imb < 0.75 * peak_imb, (end_imb, peak_imb)
    assert end_imb < 12.0, end_imb
    # (b) mean POTT flattens (the r1-r3 tuning warmed +0.5..1.3 K/day
    # monotonically and could never equilibrate)
    dpott_dt = (hist[-1]["pott"] - hist[-4]["pott"]) \
        / (hist[-1]["t"] - hist[-4]["t"])
    assert abs(dpott_dt) < 0.03, dpott_dt
    # (c) hydrologic cycle: rain active and tending toward balancing evap
    assert hist[-1]["rain"] > 10.0, hist[-1]["rain"]
    rain_rate = (hist[-1]["rain"] - hist[-4]["rain"]) \
        / (hist[-1]["t"] - hist[-4]["t"])
    evap_rate = np.mean([h["evap"] for h in hist[-4:]])
    assert 0.55 * evap_rate < rain_rate < 1.35 * evap_rate, \
        (rain_rate, evap_rate)


@_opt_in
def test_fine_grid_stability_with_default_diffusion():
    """Production-scale stability gate (VERDICT r2 next-round #1): the
    round-2 1-deg NaN only manifested at fine grids the CI never ran; this
    opt-in gate runs a 2-deg full-physics config with the scale-aware
    default diffusion for 2000 steps (~1.6 sim days) and asserts bounded
    winds. (The 1-deg TPU evidence is the committed multi-day run in
    out_clim/; this is the CPU-affordable regression guard.)"""
    from climate_model_tpu.bench.stability import probe_stability
    from climate_model_tpu.core.config import default_diffusion

    k = default_diffusion(180)
    cfg = ModelConfig(
        grid=GridConfig(nx=180, ny=90, nz=16),
        physics=PhysicsConfig(microphysics=True, radiation=True,
                              surface=True, turbulence=True,
                              rad_every_steps=6),
        numerics=NumericsConfig(diff_uv=k, diff_pott=k, diff_moist=k),
        dtype="float32")
    out = probe_stability(cfg, steps=2000, chunk=200, wind_limit=150.0,
                          verbose=False)
    assert out["stable"], out
