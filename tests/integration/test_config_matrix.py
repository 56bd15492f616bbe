"""Config-combination robustness gate (round 5).

Every individual switch has a test somewhere; what none covered was the
CROSS PRODUCT — a stepper x physics-subset x topography x dtype
combination that builds a step function nobody ever composed (e.g. rk4 +
radiation-only + aquaplanet at fp32, or euler + full physics over the
continents). This enumerates a deterministic matrix of composable
configs, runs a few steps of each, and asserts finite bounded output —
the cheap insurance that config surface growth keeps every combination
runnable (the reference's namelist allowed the same free mixing).
"""

import jax
import numpy as np
import pytest

from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           NumericsConfig, PhysicsConfig)
from climate_model_tpu.core.init import initialize
from climate_model_tpu.dycore.stepper import run_scan
from climate_model_tpu.model import make_step_fn

PHYS = {
    "dry": dict(),
    "rad": dict(radiation=True),
    "mic+srf": dict(microphysics=True, surface=True),
    "full": dict(microphysics=True, radiation=True, surface=True,
                 turbulence=True, rad_every_steps=3),
    "full+conv": dict(microphysics=True, radiation=True, surface=True,
                      turbulence=True, rad_every_steps=3, convection=True),
}

MATRIX = [
    # (stepper, phys key, topo, dtype, sigma_stretch)
    ("matsuno", "dry", "aquaplanet", "float32", 1.0),
    ("matsuno", "full", "continents", "float32", 1.0),
    ("matsuno", "full+conv", "gaussian_mountain", "float64", 1.2),
    ("rk4", "rad", "gaussian_mountain", "float32", 1.0),
    ("rk4", "full", "aquaplanet", "float64", 1.0),
    ("euler", "mic+srf", "continents", "float64", 1.0),
    ("euler", "dry", "gaussian_mountain", "float32", 1.5),
    ("matsuno", "mic+srf", "aquaplanet", "float32", 1.2),
]


@pytest.mark.parametrize("stepper,phys,topo,dtype,stretch", MATRIX)
def test_config_combination_runs_finite(stepper, phys, topo, dtype,
                                        stretch):
    cfg = ModelConfig(
        grid=GridConfig(nx=24, ny=12, nz=4, sigma_stretch=stretch),
        physics=PhysicsConfig(**PHYS[phys]),
        numerics=NumericsConfig(time_stepping=stepper,
                                diff_uv=1e4, diff_pott=1e4, diff_moist=1e4),
        dtype=dtype, topo=topo)
    state, forcing, grid = initialize(cfg)
    step = make_step_fn(cfg)
    out = jax.block_until_ready(jax.jit(
        lambda s: run_scan(step, s, grid, forcing, 8))(state))
    for name in ("u", "v", "colp", "pott", "qv", "qc", "tsurf", "rain",
                 "soil_moist"):
        arr = np.asarray(getattr(out, name))
        assert np.isfinite(arr).all(), (name, stepper, phys, topo)
    assert float(np.abs(np.asarray(out.u)).max()) < 150.0
    assert 150.0 < float(np.asarray(out.pott).mean()) < 500.0
    assert (np.asarray(out.qv) >= 0).all() and (np.asarray(out.qc) >= 0).all()
