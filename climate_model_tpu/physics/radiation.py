"""Gray-atmosphere column radiation: shortwave + longwave.

TPU-native rebuild of the reference ``radiation/`` package —
``org_radiation.py`` (orchestration + solar zenith angle), ``shortwave.py``
(Beer-Lambert transmission with surface albedo reflection), ``longwave.py``
(multi-layer emissivity sigma-T^4 exchange) — SURVEY.md §2.1 [C]/[P] and
§3.3 call stack.

TPU design (SURVEY.md §3.3 rebuild note): embarrassingly parallel over
columns with only vertical sweeps -> expressed as cumulative products/scans
over the level axis, vectorized over (ny, nx); no halo. Radiation runs every
``rad_every_steps`` dynamics steps (reference ``i_rad_nth_hour`` [P]) and its
outputs (``dpottdt_rad``, surface SW/LW fluxes) are cached in the State.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import constants as c
from ..core.config import ModelConfig
from ..core.grid import Grid
from ..core.state import Forcing, State
from ..dycore import operators as ops

# Gray-gas mass absorption coefficients [m2 kg-1].
K_SW_QV = 0.002      # shortwave absorption by water vapor
K_SW_DRY = 5e-5      # shortwave background (ozone/aerosol stand-in)
K_LW_QV = 0.15       # longwave absorption by water vapor
K_LW_DRY = 1.5e-3    # longwave background (CO2 stand-in)
K_LW_QC = 20.0       # longwave absorption by cloud water
DAY0 = 80.0          # simulations start at the March equinox (day-of-year 80)


class RadiationOut(NamedTuple):
    dpottdt_rad: jnp.ndarray   # (nz, ny, nx) [K s-1] heating of POTT
    swflx_sfc: jnp.ndarray     # (ny, nx) [W m-2] SW absorbed by surface
    lwflx_sfc: jnp.ndarray     # (ny, nx) [W m-2] net LW into surface
    swflx_toa: jnp.ndarray     # (ny, nx) [W m-2] net SW absorbed by column+sfc
    olr: jnp.ndarray           # (ny, nx) [W m-2] outgoing longwave at TOA


def solar_zenith_cos(t, lat, lon):
    """cos(solar zenith angle) from sim time [s], lat/lon [rad]
    (reference ``rad_solar_zenith_angle`` [P]): declination from day of year,
    hour angle from longitude + time of day; clipped at the horizon."""
    doy = DAY0 + t / c.SECONDS_PER_DAY
    decl = jnp.deg2rad(23.44) * jnp.sin(2.0 * jnp.pi * (doy - 80.0) / 365.25)
    hour_angle = 2.0 * jnp.pi * (t / c.SECONDS_PER_DAY % 1.0) + lon - jnp.pi
    mu = jnp.sin(lat) * jnp.sin(decl) \
        + jnp.cos(lat) * jnp.cos(decl) * jnp.cos(hour_angle)
    return jnp.maximum(mu, 0.0)


def effective_albedo(tsurf, forcing: Forcing, cfg: ModelConfig):
    """Surface SW albedo: the static map, raised to the ice/snow value where
    the surface is frozen (reference surface albedo's ice/snow dependence,
    SURVEY.md §2.1 row 17 [P])."""
    p = cfg.physics
    if not p.dynamic_albedo:
        return forcing.albedo
    return jnp.where(tsurf < c.T_ZERO_C, p.albedo_ice, forcing.albedo)


def compute_radiation(state: State, grid: Grid, forcing: Forcing,
                      cfg: ModelConfig) -> RadiationOut:
    """One full radiation calculation (reference ``Radiation.calc_radiation``)."""
    colp, pott, qv, qc = state.colp, state.pott, state.qv, state.qc
    _, pvtf, _ = ops.diagnose_pressure(colp, grid)
    tair = pott * pvtf
    dp = colp[None] * grid.dsigma[:, None, None]          # layer mass * g
    mass = dp / c.G                                       # [kg m-2]

    # ---- shortwave ----
    lat2 = grid.lat[:, None]
    lon2 = grid.lon[None, :]
    mu = solar_zenith_cos(state.t, lat2, lon2)            # (ny, nx)
    s0 = cfg.physics.solar_constant
    toa_dn = s0 * mu
    # slant optical depth per layer; 1/mu path amplification (capped for
    # grazing sun to avoid overflow at mu -> 0; flux -> 0 there anyway)
    inv_mu = 1.0 / jnp.maximum(mu, 0.05)
    tau_sw = (K_SW_QV * qv + K_SW_DRY) * mass
    trans_dn = jnp.exp(-tau_sw * inv_mu[None])
    # downward flux at borders 0..nz: cumulative transmission
    cumtrans = jnp.cumprod(trans_dn, axis=0)
    f_dn = toa_dn[None] * jnp.concatenate(
        [jnp.ones_like(cumtrans[:1]), cumtrans], axis=0)   # (nz+1, ny, nx)
    sw_sfc_dn = f_dn[-1]
    albedo = effective_albedo(state.tsurf, forcing, cfg)
    swflx_sfc = (1.0 - albedo) * sw_sfc_dn
    # reflected beam travels back up with diffuse path factor 1.66
    trans_up = jnp.exp(-tau_sw * 1.66)
    refl = albedo * sw_sfc_dn
    cumtrans_up = jnp.cumprod(trans_up[::-1], axis=0)[::-1]
    f_up = refl[None] * jnp.concatenate(
        [cumtrans_up, jnp.ones_like(cumtrans_up[:1])], axis=0)
    # net SW absorbed per layer (down-beam loss + up-beam loss)
    abs_sw = (f_dn[:-1] - f_dn[1:]) + (f_up[1:] - f_up[:-1])
    dtdt_sw = abs_sw * c.G / (c.C_P * dp)

    # ---- longwave (emissivity exchange, diffuse path factor 1.66) ----
    eps = 1.0 - jnp.exp(-1.66 * (K_LW_QV * qv + K_LW_DRY + K_LW_QC * qc) * mass)
    b = c.SIGMA_SB * tair ** 4

    # Downward sweep: D[0] = 0; D[k+1] = D[k]*(1-eps_k) + eps_k*B_k.
    # Expressed as an associative scan-free cumulative form via lax.scan over
    # nz (nz is small; the vertical loop stays on-chip).
    import jax

    def dn_body(d, x):
        e, bb = x
        d = d * (1.0 - e) + e * bb
        return d, d

    zero2 = jnp.zeros_like(b[0])
    _, d_rest = jax.lax.scan(dn_body, zero2, (eps, b))
    f_dn_lw = jnp.concatenate([zero2[None], d_rest], axis=0)   # (nz+1, ny, nx)

    # Upward sweep from the surface (emissivity-1 surface at tsurf).
    b_sfc = c.SIGMA_SB * state.tsurf ** 4

    def up_body(u, x):
        e, bb = x
        u = u * (1.0 - e) + e * bb
        return u, u

    _, u_rest = jax.lax.scan(up_body, b_sfc, (eps[::-1], b[::-1]))
    f_up_lw = jnp.concatenate([b_sfc[None], u_rest], axis=0)[::-1]

    net_up = f_up_lw - f_dn_lw                                 # (nz+1, ny, nx)
    # layer k gains net_up[k+1] - net_up[k]
    dtdt_lw = (net_up[1:] - net_up[:-1]) * c.G / (c.C_P * dp)

    lwflx_sfc = f_dn_lw[-1] - b_sfc
    dpottdt_rad = (dtdt_sw + dtdt_lw) / pvtf
    return RadiationOut(dpottdt_rad=dpottdt_rad, swflx_sfc=swflx_sfc,
                        lwflx_sfc=lwflx_sfc,
                        swflx_toa=toa_dn - f_up[0], olr=net_up[0])


def radiation_step(state: State, grid: Grid, forcing: Forcing,
                   cfg: ModelConfig) -> State:
    """Recompute the radiation cache when step % rad_every_steps == 0
    (cheap branchless cond; both sides are cached-state writes)."""
    import jax

    def do(s):
        out = compute_radiation(s, grid, forcing, cfg)
        return s.replace(dpottdt_rad=out.dpottdt_rad,
                         swflx_sfc=out.swflx_sfc, lwflx_sfc=out.lwflx_sfc)

    every = max(cfg.physics.rad_every_steps, 1)
    return jax.lax.cond(state.step % every == 0, do, lambda s: s, state)
