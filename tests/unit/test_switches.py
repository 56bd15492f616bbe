"""Per-tendency switch isolation (the reference's namelist debug mechanism,
SURVEY.md §4 item 2) + bounded-energy property."""

import jax
import numpy as np

from climate_model_tpu.core import constants as c
from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           NumericsConfig)
from climate_model_tpu.core.init import initialize
from climate_model_tpu.dycore.stepper import dynamics_step_fn, run_scan


def _run(cfg, n=5):
    state, forcing, grid = initialize(cfg)
    step = dynamics_step_fn(cfg)
    out = jax.jit(lambda s: run_scan(step, s, grid, forcing, n))(state)
    return state, out, grid


def test_wind_tendency_off_freezes_momentum_update():
    cfg = ModelConfig(grid=GridConfig(nx=16, ny=10, nz=4), dtype="float64",
                      numerics=NumericsConfig(wind_tendency=False))
    s0, s1, _ = _run(cfg)
    # u changes only through the COLP mass-weighting, not dynamics: with
    # dudt == 0, u_new = u * cu_old/cu_new ~ u. POTT still advects.
    ratio = np.asarray(s1.u) / np.where(np.asarray(s0.u) == 0, 1,
                                        np.asarray(s0.u))
    assert np.nanmax(np.abs(ratio - 1.0)) < 0.05
    assert not np.allclose(np.asarray(s1.pott), np.asarray(s0.pott))


def test_colp_tendency_off_freezes_mass():
    cfg = ModelConfig(grid=GridConfig(nx=16, ny=10, nz=4), dtype="float64",
                      numerics=NumericsConfig(colp_tendency=False))
    s0, s1, _ = _run(cfg)
    np.testing.assert_array_equal(np.asarray(s1.colp), np.asarray(s0.colp))


def test_temperature_tendency_off_freezes_pott():
    cfg = ModelConfig(grid=GridConfig(nx=16, ny=10, nz=4), dtype="float64",
                      numerics=NumericsConfig(temperature_tendency=False,
                                              colp_tendency=False))
    s0, s1, _ = _run(cfg)
    np.testing.assert_allclose(np.asarray(s1.pott), np.asarray(s0.pott))
    assert not np.allclose(np.asarray(s1.u), np.asarray(s0.u))


def test_total_energy_drift_bounded():
    """SURVEY.md §4 property: energy drift bounded (dry adiabatic core:
    total of internal+potential (c_p T per unit mass via enthalpy in sigma
    coords) + kinetic energy changes by < 0.1% over 50 steps)."""
    cfg = ModelConfig(grid=GridConfig(nx=32, ny=16, nz=8), dtype="float64",
                      numerics=NumericsConfig(moisture_tendency=False))
    state, forcing, grid = initialize(cfg)
    step = dynamics_step_fn(cfg)
    run = jax.jit(lambda s: run_scan(step, s, grid, forcing, 50))
    out = jax.block_until_ready(run(state))

    from climate_model_tpu.dycore import operators as ops

    def energy(s):
        area = np.asarray(grid.area)[:, None]
        dsig = np.asarray(grid.dsigma)[:, None, None]
        colp = np.asarray(s.colp)
        diag = ops.diagnose(s.colp, s.pott, forcing.hsurf, grid)
        tair = np.asarray(diag.tair)
        phi = np.asarray(diag.phi)
        u_c = 0.5 * (np.asarray(s.u) + np.roll(np.asarray(s.u), -1, -1))
        v_full = np.asarray(s.v)
        ke = 0.5 * (u_c ** 2 + v_full ** 2)
        dm = colp[None] * dsig / c.G * area[None]
        # dry total energy in sigma coords: cp*T + phi + ke per unit mass
        return float(np.sum((c.C_P * tair + phi + ke) * dm))

    e0, e1 = energy(state), energy(out)
    assert abs(e1 - e0) / abs(e0) < 1e-3
