"""Analytic initial conditions + synthetic topography.

TPU-native rebuild of the reference ``initial_conditions.py`` (SURVEY.md §2.1
[C]: lapse-rate POTT profile, COLP reduced over topography, optional zonal
jet / gaussian COLP perturbation, topography + land-sea mask). The reference
could load real ETOPO-style NetCDF topography; the rebuild defaults to the
synthetic analytic variants (SURVEY.md §2.3: "synthetic-topography fallback
... so the allclose configs don't depend on data files") and accepts
user-supplied ``hsurf``/``land_mask`` arrays for real data.

Everything is computed deterministically in float64 NumPy and cast once, so
the jnp model and the NumPy oracle start from bit-identical states.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..physics.thermo import qsat_water
from . import constants as c
from .config import ModelConfig
from .grid import Grid, make_grid
from .state import Forcing, State

T0 = 288.0          # reference surface temperature [K]
THETA_SFC = 285.0   # surface potential temperature [K]
DTHETA = 50.0       # stratification: theta increase top vs surface [K]
RH0 = 0.7           # boundary-layer relative humidity for QV init


def synthetic_topography(grid_np, kind: str = "gaussian_mountain"):
    """Synthetic HSURF + land-sea mask on the model grid (fp64 NumPy)."""
    lat = grid_np.lat[:, None]
    lon = grid_np.lon[None, :]
    ny, nx = lat.shape[0], lon.shape[1]
    if kind == "aquaplanet":
        return np.zeros((ny, nx)), np.zeros((ny, nx))
    if kind == "gaussian_mountain":
        lat_c, lon_c = np.deg2rad(40.0), np.deg2rad(90.0)
        width = np.deg2rad(15.0)
        dlon = np.angle(np.exp(1j * (lon - lon_c)))          # periodic distance
        r2 = ((lat - lat_c) ** 2 + (np.cos(lat_c) * dlon) ** 2) / width ** 2
        hsurf = 2000.0 * np.exp(-r2)
        land = (hsurf > 100.0).astype(np.float64)
        return hsurf, land
    raise ValueError(f"unknown topography kind {kind!r}")


def initial_state_np(cfg: ModelConfig, kind: str = "gaussian_mountain",
                     u_jet: float = 10.0, colp_pert: float = -500.0):
    """Build the IC in fp64 NumPy. Returns (state dict, forcing dict,
    grid_np). The jet and a gaussian COLP low excite dynamics (reference's
    ``gaussian perturbation in UWIND or COLP`` [P])."""
    gc = cfg.grid
    grid_np = make_grid(gc, cfg.numerics, np_mode=True)
    nz, ny, nx = gc.nz, gc.ny, gc.nx
    lat = grid_np.lat[:, None]
    lon = grid_np.lon[None, :]

    p = cfg.physics
    hsurf, land = synthetic_topography(grid_np, kind)
    albedo = np.where(land > 0.5, p.albedo_land, p.albedo_ocean)
    evap_eff = np.where(land > 0.5, p.evap_efficiency_land, 1.0)

    # COLP reduced hydrostatically over topography.
    psurf = gc.psurf * np.exp(-c.G * hsurf / (c.R_D * T0))
    colp = psurf - gc.ptop

    # Gaussian low-pressure perturbation (excites gravity/Rossby waves).
    lat_c, lon_c = np.deg2rad(-30.0), np.deg2rad(210.0)
    width = np.deg2rad(12.0)
    dlon = np.angle(np.exp(1j * (lon - lon_c)))
    r2 = ((lat - lat_c) ** 2 + (np.cos(lat_c) * dlon) ** 2) / width ** 2
    colp = colp + colp_pert * np.exp(-r2)

    # Stable stratification theta(sigma).
    sig = grid_np.sigma[:, None, None]
    pott = (THETA_SFC + DTHETA * (1.0 - sig)) * np.ones((nz, ny, nx))

    # Zonal jet at u points (same latitude rows as centers); vanishes at walls.
    latu = grid_np.lat[None, :, None]
    lat0 = grid_np.lats[0]
    lat1 = 2.0 * grid_np.lat[-1] - grid_np.lats[-1]   # north wall
    ujet_shape = np.sin(np.pi * (latu - lat0) / (lat1 - lat0)) ** 2
    u = u_jet * ujet_shape * (1.0 - sig) * np.ones((nz, ny, nx))
    v = np.zeros((nz, ny, nx))

    # Moisture: RH0 at the surface layers falling off with sigma^2.
    pair = grid_np.ptop + sig * colp[None]
    tair = pott * (pair / c.P_REF) ** c.KAPPA
    qv = RH0 * (grid_np.sigma[:, None, None] ** 2) * qsat_water(tair, pair, np)
    qc = np.zeros((nz, ny, nx))

    # Surface starts 1 K warmer than the lowest-layer air (weakly unstable,
    # so surface fluxes engage immediately); the meridional structure comes
    # from radiation + the surface energy budget during the run.
    tsurf = tair[-1] + 1.0
    # Soil water: land starts half-full (reference soil moisture IC [P]);
    # ocean cells carry field capacity so their evap efficiency is 1.
    soil_moist = np.where(land > 0.5, p.soil_moist_init, p.soil_moist_cap)
    state = dict(u=u, v=v, colp=colp, pott=pott, qv=qv, qc=qc,
                 tsurf=tsurf, rain=np.zeros((ny, nx)), soil_moist=soil_moist)
    forcing = dict(hsurf=hsurf, land_mask=land, albedo=albedo,
                   evap_eff=evap_eff)
    return state, forcing, grid_np


def initialize(cfg: ModelConfig, kind: str = "gaussian_mountain",
               **kw):
    """Build (State, Forcing, Grid) as jnp arrays at the working dtype."""
    dtype = jnp.dtype(cfg.dtype)
    st_np, fo_np, _ = initial_state_np(cfg, kind, **kw)
    grid = make_grid(cfg.grid, cfg.numerics, dtype=dtype)
    nz, ny, nx = cfg.grid.nz, cfg.grid.ny, cfg.grid.nx
    z3 = jnp.zeros((nz, ny, nx), dtype)
    z2 = jnp.zeros((ny, nx), dtype)
    state = State(
        u=jnp.asarray(st_np["u"], dtype), v=jnp.asarray(st_np["v"], dtype),
        colp=jnp.asarray(st_np["colp"], dtype),
        pott=jnp.asarray(st_np["pott"], dtype),
        qv=jnp.asarray(st_np["qv"], dtype), qc=jnp.asarray(st_np["qc"], dtype),
        tsurf=jnp.asarray(st_np["tsurf"], dtype), rain=z2,
        soil_moist=jnp.asarray(st_np["soil_moist"], dtype),
        dpottdt_rad=z3, swflx_sfc=z2, lwflx_sfc=z2,
        t=jnp.zeros((), dtype), step=jnp.zeros((), jnp.int32),
    )
    forcing = Forcing(
        hsurf=jnp.asarray(fo_np["hsurf"], dtype),
        land_mask=jnp.asarray(fo_np["land_mask"], dtype),
        albedo=jnp.asarray(fo_np["albedo"], dtype),
        evap_eff=jnp.asarray(fo_np["evap_eff"], dtype),
    )
    return state, forcing, grid
