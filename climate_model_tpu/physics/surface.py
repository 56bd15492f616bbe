"""Surface/soil model: slab land + slab ocean, bulk turbulent fluxes.

TPU-native rebuild of the reference ``soil_model.py`` / ``surface_model.py`` /
``srfc_main.py`` (SURVEY.md §2.1 [C/P]: prognostic surface temperature from
net radiative + turbulent fluxes; land-sea mask; albedo; evaporation
efficiency; bulk sensible flux SSHFLX ~ rho cp C_H |V| (T_s - T_air) and
latent analogue with the saturation deficit).

Operator-split column update: advances TSURF and deposits the surface
sensible/latent/momentum fluxes into the lowest model layer. Pure elementwise
math over (ny, nx) — XLA fuses it into the step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import constants as c
from ..core.config import ModelConfig
from ..core.grid import Grid
from ..core.state import Forcing, State
from ..dycore import boundaries as bc
from ..dycore import operators as ops


class SurfaceFluxes(NamedTuple):
    shflx: jnp.ndarray   # sensible heat flux into atmosphere [W m-2]
    lhflx: jnp.ndarray   # latent heat flux into atmosphere [W m-2]
    evap: jnp.ndarray    # surface evaporation [kg m-2 s-1]
    taux: jnp.ndarray    # zonal surface stress on lowest layer [N m-2]
    tauy: jnp.ndarray    # meridional surface stress [N m-2]


def evap_efficiency(state: State, forcing: Forcing, cfg: ModelConfig):
    """Evaporation efficiency 0..1. With soil hydrology on (reference
    ``soil_model.py`` SOILEVAPITY [P]): land efficiency follows the
    prognostic soil water fraction of field capacity; ocean evaporates
    freely. Otherwise the static Forcing.evap_eff map."""
    p = cfg.physics
    if not (p.surface and p.soil_moisture):
        return forcing.evap_eff
    frac = jnp.clip(state.soil_moist / p.soil_moist_cap, 0.0, 1.0)
    return jnp.where(forcing.land_mask > 0.5, frac,
                     jnp.ones_like(frac))


def surface_fluxes(state: State, grid: Grid, forcing: Forcing,
                   cfg: ModelConfig, press=None) -> SurfaceFluxes:
    from .thermo import qsat_water

    p = cfg.physics
    pvb, pvtf, _ = press if press is not None \
        else ops.diagnose_pressure(state.colp, grid)
    t_air = state.pott[-1] * pvtf[-1]               # lowest layer [K]
    p_air = 0.5 * (pvb[-2] + pvb[-1])
    rho = p_air / (c.R_D * t_air)

    # wind at cell centers (lowest layer); 1 m/s gustiness floor
    u_c = 0.5 * (state.u[-1] + bc.east(state.u[-1]))
    v_c = 0.5 * (state.v[-1] + bc.north_zero(state.v[-1]))
    wind = jnp.sqrt(u_c ** 2 + v_c ** 2 + 1.0)

    ch = p.drag_coef
    shflx = rho * c.C_P * ch * wind * (state.tsurf - t_air)
    qsat_s = qsat_water(state.tsurf, pvb[-1])
    evap = rho * ch * wind * evap_efficiency(state, forcing, cfg) \
        * jnp.maximum(qsat_s - state.qv[-1], 0.0)
    lhflx = c.L_V * evap
    taux = -rho * ch * wind * u_c
    tauy = -rho * ch * wind * v_c
    return SurfaceFluxes(shflx=shflx, lhflx=lhflx, evap=evap,
                         taux=taux, tauy=tauy)


def surface_step(state: State, grid: Grid, forcing: Forcing,
                 cfg: ModelConfig, dt, press=None) -> State:
    """Advance TSURF (slab land/ocean energy budget, reference
    ``Soil.advance_timestep`` [P]) and apply surface fluxes to the lowest
    model layer."""
    p = cfg.physics
    if press is None:
        press = ops.diagnose_pressure(state.colp, grid)
    fx = surface_fluxes(state, grid, forcing, cfg, press=press)
    _, pvtf_, _ = press

    # Surface energy budget. Radiative terms come from the radiation cache
    # (zero if radiation is off -> surface relaxes toward the atmosphere).
    heat_cap = jnp.where(forcing.land_mask > 0.5,
                         p.soil_heat_capacity, p.ocean_heat_capacity)
    net = state.swflx_sfc + state.lwflx_sfc - fx.shflx - fx.lhflx
    tsurf = state.tsurf + dt * net / heat_cap

    # Deposit fluxes into the lowest layer (mass colp*dsigma/g per m^2).
    dp_sfc = state.colp * grid.dsigma[-1]
    m_sfc = dp_sfc / c.G
    dpott = dt * fx.shflx / (c.C_P * m_sfc) / pvtf_[-1]
    dqv = dt * fx.evap / m_sfc
    pott = state.pott.at[-1].add(dpott)
    qv = state.qv.at[-1].add(dqv)

    # Momentum drag at u/v points (stress averaged to faces).
    m_u = 0.5 * (bc.west(dp_sfc) + dp_sfc) / c.G
    m_v = 0.5 * (bc.south_clamp(dp_sfc) + dp_sfc) / c.G
    du = dt * 0.5 * (bc.west(fx.taux) + fx.taux) / m_u
    dv = dt * 0.5 * (bc.south_clamp(fx.tauy) + fx.tauy) / m_v
    u = state.u.at[-1].add(du)
    v = bc.enforce_v_walls(state.v.at[-1].add(dv))

    # Soil hydrology: evaporation dries the land bucket (rain refills it in
    # the microphysics split; reference soil moisture budget [P]).
    soil_moist = state.soil_moist
    if p.soil_moisture:
        dried = jnp.clip(soil_moist - dt * fx.evap / c.RHO_WATER,
                         0.0, p.soil_moist_cap)
        soil_moist = jnp.where(forcing.land_mask > 0.5, dried, soil_moist)
    return state.replace(tsurf=tsurf, pott=pott, qv=qv, u=u, v=v,
                         soil_moist=soil_moist)
