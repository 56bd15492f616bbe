"""Discrete budget-identity instrumentation (VERDICT r4 next #4).

The climate-sanity gates (tests/integration/test_climate_sanity.py) check
closure at the few-percent level from chunk-sampled metrics; the committed
climatologies carry small residuals (rain ~91% of evaporation after 90 days
at 1 deg, +2-3 W/m2 annual TOA at 2 deg) that were DISCLOSED but never
DECOMPOSED — reservoir fill vs genuine numerical leak was asserted, not
measured. This module steps the model through its exact operator-split
sequence (radiation -> dynamics -> surface -> turbulence -> microphysics;
model.py::make_step_fn order) and records the global water and moist-energy
totals AFTER EVERY SPLIT, so each split's budget increment can be tested
against its exact discrete identity:

water (column qv+qc mass + accumulated-rain reservoir):
  * surface:      dW = dt * sum(evap * area)          EXACTLY (the same
                  evap flux and the same layer mass enter the qv update)
  * microphysics: dW = 0 EXACTLY (saturation adjustment moves qv<->qc;
                  autoconversion moves qc -> rain with the same layer mass)
  * turbulence:   dW = 0 to roundoff (flux-form in z; rho_c*dz_c telescopes
                  to dp/g exactly) + the >=0 clip
  * dynamics:     flux-form advection telescopes globally (periodic lon,
                  zero-flux walls) => dW = (qv/qc >= 0 clip gain)
                  + (horizontal-diffusion non-conservation: the K(lat)
                  colp-weighted Laplacian is not in flux form) — both small,
                  and this instrument MEASURES them instead of hand-waving.

moist energy (cp*T + L_V*qv column integral + slab heat content — the
``energy`` diagnostic of io/metrics.py):
  * surface:      dE = dt * sum((swflx_sfc + lwflx_sfc) * area) EXACTLY
                  (turbulent fluxes cancel slab vs air; the radiative
                  absorption is the only external term)
  * microphysics: dE = 0 EXACTLY (latent heating +L_V*dqc cancels the
                  -L_V*dqc vapor enthalpy change; rain removes qc, which
                  carries no L_V term)
  * turbulence:   mixing theta conserves sum(theta*dp) but NOT
                  sum(theta*pvtf*dp): a real (physical) enthalpy
                  rearrangement term — measured here
  * dynamics:     adiabatic conversion (enthalpy <-> potential/kinetic,
                  which E does not count) + the applied radiative heating
                  dt*sum(cp * colp*dpottdt_rad * pvtf * dsig/g * area)
                  (recorded separately so the radiative part subtracts out)

Used by tests/integration/test_budget_identity.py (CPU fp64, tight bounds)
and tests/tpu/test_budget_identity_tpu.py (production shape #3, fp32,
opt-in) — together they turn "the cycle closes" from a 2%-tolerance
observation into a theorem about the discretization with measured
exception terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import constants as c
from ..core.config import ModelConfig, check_rad_resolved
from ..core.grid import Grid
from ..core.state import Forcing, State


def water_total(state: State, grid: Grid) -> jnp.ndarray:
    """Global water [kg]: column (qv+qc) mass + accumulated-rain reservoir
    (identical weighting to io/metrics.py diagnostics)."""
    area = grid.area[:, None]
    mass = state.colp[None] * grid.dsigma[:, None, None]
    return jnp.sum((state.qv + state.qc) * mass * area[None]) / c.G \
        + jnp.sum(state.rain * area)


def energy_total(state: State, grid: Grid, forcing: Forcing,
                 cfg: ModelConfig) -> jnp.ndarray:
    """Global moist enthalpy + slab heat [J] (io/metrics.py ``energy``
    integrand, in absolute units)."""
    from ..dycore.operators import diagnose_pressure
    area = grid.area[:, None]
    mass = state.colp[None] * grid.dsigma[:, None, None]
    _, pvtf, _ = diagnose_pressure(state.colp, grid)
    tair = state.pott * pvtf
    col = jnp.sum((c.C_P * tair + c.L_V * state.qv) * mass * area[None]) / c.G
    heat_cap = jnp.where(forcing.land_mask > 0.5,
                         cfg.physics.soil_heat_capacity,
                         cfg.physics.ocean_heat_capacity)
    return col + jnp.sum(heat_cap * state.tsurf * area)


def make_budget_scan(cfg: ModelConfig, n_steps: int):
    """Build ``run(state, grid, forcing) -> (state, rec)`` advancing
    ``n_steps`` through the exact make_step_fn split sequence, recording
    per-step budget increments. ``rec`` maps name -> (n_steps,) array:

      w_dyn/w_srf/w_trb/w_mic   water increment of each split [kg]
      w_srf_expect              dt * sum(evap*area) (the exact identity)
      e_dyn/e_srf/e_trb/e_mic   energy increment of each split [J]
      e_srf_expect              dt * sum((sw+lw)_sfc * area)
      e_rad_applied             dt * sum(cp*colp*rad*pvtf*dsig/g * area)
                                (the radiative part of e_dyn)
    """
    check_rad_resolved(cfg)
    from ..dycore.operators import diagnose_pressure
    from ..dycore.stepper import dynamics_step_fn
    from ..physics.microphysics import microphysics_step
    from ..physics.radiation import radiation_step
    from ..physics.surface import surface_fluxes, surface_step
    from ..physics.turbulence import turbulence_step

    dyn_step = dynamics_step_fn(cfg)
    phys = cfg.physics

    def step(state: State, grid: Grid, forcing: Forcing):
        area = grid.area[:, None]
        dt = grid.dt
        W = lambda s: water_total(s, grid)
        E = lambda s: energy_total(s, grid, forcing, cfg)
        w0, e0 = W(state), E(state)
        if phys.radiation:
            state = radiation_step(state, grid, forcing, cfg)
        # the radiative enthalpy injection the dynamics step is about to
        # apply (POTT tendency += colp * dpottdt_rad; enthalpy weight pvtf)
        _, pvtf0, _ = diagnose_pressure(state.colp, grid)
        e_rad = dt * jnp.sum(
            c.C_P * state.colp[None] * state.dpottdt_rad * pvtf0
            * grid.dsigma[:, None, None] * area[None]) / c.G \
            if phys.radiation else jnp.zeros_like(e0)
        state = dyn_step(state, grid, forcing)
        w1, e1 = W(state), E(state)
        press = diagnose_pressure(state.colp, grid)
        if phys.surface:
            fx = surface_fluxes(state, grid, forcing, cfg, press=press)
            w_srf_expect = dt * jnp.sum(fx.evap * area)
            e_srf_expect = dt * jnp.sum(
                (state.swflx_sfc + state.lwflx_sfc) * area)
            state = surface_step(state, grid, forcing, cfg, dt, press=press)
        else:
            w_srf_expect = e_srf_expect = jnp.zeros_like(w0)
        w2, e2 = W(state), E(state)
        if phys.turbulence:
            state = turbulence_step(state, grid, forcing, cfg, dt,
                                    press=press)
        w3, e3 = W(state), E(state)
        if phys.microphysics:
            state = microphysics_step(state, grid, forcing, cfg, dt,
                                      press=press)
        w4, e4 = W(state), E(state)
        state = state.replace(t=state.t + dt, step=state.step + 1)
        rec = dict(
            w_dyn=w1 - w0, w_srf=w2 - w1, w_trb=w3 - w2, w_mic=w4 - w3,
            w_srf_expect=w_srf_expect,
            e_dyn=e1 - e0, e_srf=e2 - e1, e_trb=e3 - e2, e_mic=e4 - e3,
            e_srf_expect=e_srf_expect, e_rad_applied=e_rad,
            w_total=w4, e_total=e4)
        return state, rec

    def run(state: State, grid: Grid, forcing: Forcing):
        def body(s, _):
            return step(s, grid, forcing)
        return jax.lax.scan(body, state, None, length=n_steps)

    return run
