"""Discrete budget identities (VERDICT r4 next #4): the water/energy
closure gates in test_climate_sanity.py tolerate a few percent because they
sample chunk-end metrics; these tests assert the EXACT per-split discrete
identities with bench/budget.py's instrumented scan, turning "the cycle
closes" into a theorem about the discretization with measured exception
terms. fp64, small grid, always-on (~20 s).

Measured magnitudes this pins (96x48x8 fp64, docs/STATUS.md round 5):
  * surface water:   |dW - dt*sum(evap*area)| ~ 30 kg vs increment 4e11
  * microphysics:    dW = 0.0 BITWISE (autoconversion -> rain uses the
                     same layer mass), dE ~ 2e-16 of E
  * turbulence:      |dW| ~ 25 kg (roundoff; rho_c*dz_c == dp/g exactly)
  * dynamics, diff=0: |dW| ~ 8e5 kg/step = the qv/qc>=0 clip gain
                     (2e-6 of evaporation — the only water leak)
  * dynamics, default diffusion: mean dW ~ -0.2% of evaporation (the
                     K(lat) colp-weighted Laplacian is not flux-form)
"""

import jax
import numpy as np
import pytest

from climate_model_tpu.bench.budget import make_budget_scan
from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           NumericsConfig, PhysicsConfig,
                                           default_diffusion)
from climate_model_tpu.core.init import initialize


def _run(diff: float, n_steps: int = 30):
    cfg = ModelConfig(
        grid=GridConfig(nx=48, ny=24, nz=8),
        physics=PhysicsConfig(microphysics=True, radiation=True,
                              surface=True, turbulence=True,
                              rad_every_steps=4),
        numerics=NumericsConfig(diff_uv=diff, diff_pott=diff,
                                diff_moist=diff),
        dtype="float64")
    state, forcing, grid = initialize(cfg)
    run = jax.jit(make_budget_scan(cfg, n_steps))
    out, rec = jax.block_until_ready(run(state, grid, forcing))
    rec = {k: np.asarray(v) for k, v in rec.items()}
    area_tot = float(np.sum(np.asarray(grid.area)) * cfg.grid.nx)
    return rec, float(grid.dt), area_tot


@pytest.fixture(scope="module")
def rec_diff0():
    return _run(0.0)


@pytest.fixture(scope="module")
def rec_diff():
    return _run(default_diffusion(48))


def test_water_identities_exact(rec_diff0):
    rec, dt, _ = rec_diff0
    W = rec["w_total"][-1]
    evap = rec["w_srf_expect"]
    assert evap.min() > 0
    # surface: dW == dt*sum(evap*area) to fp roundoff — same flux, same
    # layer mass on both sides of the identity
    assert np.max(np.abs(rec["w_srf"] - evap)) < 1e-9 * np.max(evap)
    # microphysics: qv<->qc<->rain transfers are globally EXACT
    assert np.max(np.abs(rec["w_mic"])) < 1e-13 * W
    # turbulence: flux-form in z telescopes (rho_c*dz_c == dp/g exactly)
    assert np.max(np.abs(rec["w_trb"])) < 1e-12 * W
    # dynamics with diff=0: flux-form advection telescopes; the residual is
    # the qv/qc >= 0 clip gain — bounded at well under 1e-4 of evaporation
    assert np.max(np.abs(rec["w_dyn"])) < 1e-4 * np.max(evap)


def test_water_leak_with_default_diffusion(rec_diff):
    """With the production scale-aware diffusion the K(lat) colp-weighted
    Laplacian is NOT flux-form; its measured non-conservation is the only
    systematic water leak — bound it at < 1% of evaporation so the
    committed rain/evap gap (~9% at day 90, 1 deg) is established as
    reservoir fill, not leak."""
    rec, dt, _ = rec_diff
    leak = rec["w_dyn"] + rec["w_trb"] + rec["w_mic"]
    assert abs(leak.sum()) < 0.01 * rec["w_srf_expect"].sum()


def test_energy_identities_exact(rec_diff0):
    rec, dt, area_tot = rec_diff0
    E = rec["e_total"][-1]
    # surface: the turbulent fluxes cancel slab vs air exactly; the only
    # external term is the absorbed radiation
    assert np.max(np.abs(rec["e_srf"] - rec["e_srf_expect"])) \
        < 1e-7 * np.max(np.abs(rec["e_srf"]))
    # microphysics: latent heating cancels the vapor-enthalpy change
    assert np.max(np.abs(rec["e_mic"])) < 1e-13 * E


def test_energy_residual_decomposition(rec_diff):
    """Decompose the climate-sanity energy gate's <12 W/m2 tolerance: after
    subtracting the applied radiative heating from the dynamics increment,
    what remains is adiabatic enthalpy<->PE/KE conversion; turbulence adds
    the theta-mixing rearrangement. Both must be small against the ~250
    W/m2 flux scale — these are the model's ONLY non-exact energy terms."""
    rec, dt, area_tot = rec_diff
    to_wm2 = 1.0 / (area_tot * dt)
    adiabatic = (rec["e_dyn"] - rec["e_rad_applied"]) * to_wm2
    turb = rec["e_trb"] * to_wm2
    assert abs(adiabatic.mean()) < 5.0, adiabatic.mean()
    assert np.max(np.abs(adiabatic)) < 15.0
    assert np.max(np.abs(turb)) < 5.0
