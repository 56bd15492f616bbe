"""Dycore equation operators (jnp reference forms).

TPU-native rebuild of the reference's per-equation kernel files —
``continuity.py``, ``wind.py``, ``temperature.py``, ``moisture.py``,
``geopotential.py``, ``diagnostics.py`` and their ``*_cuda.py`` twins
(SURVEY.md §2.1, L4). Design departure (SURVEY.md §7.1): ONE implementation
per equation in functional jnp; the Pallas kernels in
``climate_model_tpu/kernels/`` are drop-in optimizations behind the same
interface, and these jnp forms double as their unit-test oracles.

The discrete equations are specified in docs/NUMERICS.md; the NumPy oracle
(oracle_numpy.py) implements the same spec in a deliberately different idiom
(explicit slicing, per-level loops) for cross-checking.

All functions are shape-polymorphic pure functions of ``(nz, ny, nx)`` /
``(ny, nx)`` arrays and broadcast the 1-D per-latitude geometry arrays; no
in-place mutation, no global state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import constants as c
from ..core.grid import Grid
from . import boundaries as bc


class Diagnostics(NamedTuple):
    """Pressure/Exner/geopotential diagnostics (reference ``diagnostics.py`` +
    ``geopotential.py``)."""

    pvb: jnp.ndarray      # (nz+1, ny, nx) pressure at level borders [Pa]
    pvtf: jnp.ndarray     # (nz, ny, nx) layer-mean Exner factor
    pvtfvb: jnp.ndarray   # (nz+1, ny, nx) Exner factor at borders
    phi: jnp.ndarray      # (nz, ny, nx) geopotential at centers [m2 s-2]
    phivb: jnp.ndarray    # (nz+1, ny, nx) geopotential at borders
    tair: jnp.ndarray     # (nz, ny, nx) absolute temperature [K]


class Continuity(NamedTuple):
    uflx: jnp.ndarray      # (nz, ny, nx) zonal mass flux at u faces [Pa m2 s-1]
    vflx: jnp.ndarray      # (nz, ny, nx) meridional mass flux at v faces
    dcolpdt: jnp.ndarray   # (ny, nx) [Pa s-1]
    colp_new: jnp.ndarray  # (ny, nx) COLP_base + dt*dcolpdt
    wwind: jnp.ndarray     # (nz+1, ny, nx) sigma-velocity at borders [s-1]


class Tendencies(NamedTuple):
    dudt: jnp.ndarray      # (nz, ny, nx) d(COLP_u*u)/dt [Pa m s-2]
    dvdt: jnp.ndarray
    dcolpdt: jnp.ndarray   # (ny, nx)
    dpottdt: jnp.ndarray   # (nz, ny, nx) [Pa K s-1]
    dqvdt: jnp.ndarray
    dqcdt: jnp.ndarray
    colp_new: jnp.ndarray  # (ny, nx)
    wwind: jnp.ndarray     # (nz+1, ny, nx) diagnostic


# ---------------------------------------------------------------------------
# Diagnostics: pressure, Exner factors, temperature, geopotential.
# ---------------------------------------------------------------------------

def diagnose_pressure(colp, grid: Grid):
    """COLP-only part of the diagnostics (Exner factors + border pressures).
    These are invariant across the operator-split physics within a step, so
    model.py computes them once and shares them."""
    sig_vb = grid.sigma_vb[:, None, None]
    pvb = grid.ptop + sig_vb * colp[None]                    # (nz+1, ny, nx)
    pvtfvb = (pvb / c.P_REF) ** c.KAPPA
    num = pvb[1:] * pvtfvb[1:] - pvb[:-1] * pvtfvb[:-1]
    pvtf = num / ((1.0 + c.KAPPA) * (pvb[1:] - pvb[:-1]))    # (nz, ny, nx)
    return pvb, pvtf, pvtfvb


def diagnose_geopotential(pott, pvtf, pvtfvb, hsurf):
    """Hydrostatic integration, surface upward: dPHI = -cp * POTT * dP.
    phivb[nz] = g*hsurf; phi[k] = phivb[k+1] + cp*pott[k]*(pvtfvb[k+1]-pvtf[k]);
    phivb[k] = phi[k] + cp*pott[k]*(pvtf[k]-pvtfvb[k]).
    Closed form via suffix-cumsum of the per-layer border-to-border jump:
    phivb[k] = g*hsurf + cp * sum_{k'>=k} pott[k']*(pvtfvb[k'+1]-pvtfvb[k'])"""
    jump = c.C_P * pott * (pvtfvb[1:] - pvtfvb[:-1])         # (nz, ny, nx)
    suffix = jnp.cumsum(jump[::-1], axis=0)[::-1]            # sum over k' >= k
    phivb_sfc = c.G * hsurf[None]
    phivb = jnp.concatenate([phivb_sfc + suffix, phivb_sfc], axis=0)
    phi = phivb[1:] + c.C_P * pott * (pvtfvb[1:] - pvtf)
    return phi, phivb


def diagnose(colp, pott, hsurf, grid: Grid,
             press=None) -> Diagnostics:
    """NUMERICS.md 'Pressure / Exner / geopotential diagnostics'.

    Rebuild of reference ``diag_pvt_factor`` + ``diag_geopotential_jacobson``
    (SURVEY.md §2.1 [P]). ``press`` optionally supplies precomputed
    (pvb, pvtf, pvtfvb) for the same colp."""
    if press is None:
        press = diagnose_pressure(colp, grid)
    pvb, pvtf, pvtfvb = press
    tair = pott * pvtf
    phi, phivb = diagnose_geopotential(pott, pvtf, pvtfvb, hsurf)
    return Diagnostics(pvb=pvb, pvtf=pvtf, pvtfvb=pvtfvb, phi=phi,
                       phivb=phivb, tair=tair)


# ---------------------------------------------------------------------------
# Continuity: mass fluxes, dCOLP/dt, sigma vertical velocity.
# ---------------------------------------------------------------------------

def continuity(u, v, colp, colp_base, dt, grid: Grid) -> Continuity:
    """NUMERICS.md 'Continuity / column pressure'.

    Rebuild of reference ``colp_tendency_jacobson`` + ``vertical_wind_jacobson``
    (continuity.py / continuity_cuda.py, SURVEY.md §2.1 [C])."""
    colp_u = 0.5 * (bc.west(colp) + colp)
    colp_v = 0.5 * (bc.south_clamp(colp) + colp)
    dxs = grid.dxs[None, :, None]

    uflx = u * colp_u[None] * grid.dy
    vflx = bc.enforce_v_walls(v * colp_v[None] * dxs)

    div = (bc.east(uflx) - uflx + bc.north_zero(vflx) - vflx) \
        / grid.area[None, :, None]
    dsig = grid.dsigma[:, None, None]
    dcolpdt = -jnp.sum(div * dsig, axis=0)
    colp_new = colp_base + dt * dcolpdt

    csum = jnp.cumsum(div * dsig, axis=0)                    # sum_{k'<=k}
    sig_int = grid.sigma_vb[1:-1][:, None, None]
    w_int = -(csum[:-1] + sig_int * dcolpdt[None]) / colp_new[None]
    zero = jnp.zeros_like(w_int[:1])
    wwind = jnp.concatenate([zero, w_int, zero], axis=0)     # (nz+1, ny, nx)
    return Continuity(uflx=uflx, vflx=vflx, dcolpdt=dcolpdt,
                      colp_new=colp_new, wwind=wwind)


# ---------------------------------------------------------------------------
# Scalar flux-form advection (POTT, QV, QC).
# ---------------------------------------------------------------------------

def _diff_on(coef) -> bool:
    """Static on/off for a diffusion coefficient: None or literal 0 is off;
    a per-latitude array (grid.kdiff_*) or nonzero float is on."""
    return coef is not None and not (isinstance(coef, (int, float))
                                     and coef == 0.0)


def scalar_tendency(q, cont: Continuity, colp, grid: Grid,
                    source=None, diff_coef=None) -> jnp.ndarray:
    """NUMERICS.md 'Scalar flux-form advection'.

    Rebuild of reference ``temperature_tendency_jacobson`` /
    ``water_vapor_tendency`` / ``cloud_water_tendency`` (SURVEY.md §2.1 [P]).
    ``source`` is a physics source in [q s-1] (e.g. cached radiative heating
    for POTT); returns d(COLP*q)/dt in [Pa q s-1]."""
    fx = cont.uflx * 0.5 * (bc.west(q) + q)
    fy = cont.vflx * 0.5 * (bc.south_clamp(q) + q)
    dqdt = -(bc.east(fx) - fx + bc.north_zero(fy) - fy) / grid.area[None, :, None]

    q_vb = 0.5 * (q[:-1] + q[1:])                            # interior borders
    fz_int = cont.wwind[1:-1] * cont.colp_new[None] * q_vb
    zero = jnp.zeros_like(fz_int[:1])
    fz = jnp.concatenate([zero, fz_int, zero], axis=0)
    dqdt = dqdt - (fz[1:] - fz[:-1]) / grid.dsigma[:, None, None]

    if source is not None:
        dqdt = dqdt + colp[None] * source
    if _diff_on(diff_coef):
        dqdt = dqdt + horizontal_diffusion(q, colp[None], grid, diff_coef)
    return dqdt


def horizontal_diffusion(q, colp_face, grid: Grid, coef,
                         is_v: bool = False) -> jnp.ndarray:
    """COLP-weighted 5-point Laplacian smoothing (NUMERICS.md): zero-flux at
    the lat walls via edge clamping for scalars and u; for v the wall value
    itself (v == 0 on the walls) is the neighbor beyond the last row.
    Reference analogue: UVFLX_dif_coef / POTT_hor_dif_tau [P].
    ``coef`` [m2 s-1] is a scalar or a per-latitude (ny,) array
    (grid.kdiff_*)."""
    coef = jnp.asarray(coef)
    if coef.ndim == 1:
        coef = coef[None, :, None]
    dx2 = (grid.dx ** 2)[None, :, None]
    north = bc.north_zero(q) if is_v else bc.north_clamp(q)
    lap = (bc.east(q) - 2.0 * q + bc.west(q)) / dx2 \
        + (north - 2.0 * q + bc.south_clamp(q)) / grid.dy ** 2
    return coef * colp_face * lap


# ---------------------------------------------------------------------------
# Momentum tendencies.
# ---------------------------------------------------------------------------

def momentum_tendency(u, v, pott, colp, cont: Continuity, diag: Diagnostics,
                      grid: Grid, diff_coef=None):
    """NUMERICS.md 'Momentum'. Rebuild of reference ``wind_tendency_jacobson``
    (wind.py / wind_cuda.py — the largest reference kernel, SURVEY.md §2.1 [C]).

    Returns (dudt, dvdt) = d(COLP_face * wind)/dt in [Pa m s-2]."""
    uflx, vflx, wwind, colp_new = cont.uflx, cont.vflx, cont.wwind, cont.colp_new
    area = grid.area[None, :, None]
    area_v = grid.area_v[None, :, None]
    dsig = grid.dsigma[:, None, None]
    colp_u = 0.5 * (bc.west(colp) + colp)[None]
    colp_v = 0.5 * (bc.south_clamp(colp) + colp)[None]

    # ---- u momentum ----
    # zonal flux at cell centers c: 1/2(UFLX[c]+UFLX[c+1]) * 1/2(u[c]+u[c+1])
    fxc = 0.5 * (uflx + bc.east(uflx)) * 0.5 * (u + bc.east(u))
    # corner flux at (v-row j, u-face i)
    fyc = 0.5 * (bc.west(vflx) + vflx) * 0.5 * (bc.south_clamp(u) + u)
    adv_u = -(fxc - bc.west(fxc) + bc.north_zero(fyc) - fyc) / area

    w_int = wwind[1:-1]
    w_u = 0.5 * (bc.west(w_int) + w_int)
    cn_u = 0.5 * (bc.west(colp_new) + colp_new)[None]
    fz_int = w_u * cn_u * 0.5 * (u[:-1] + u[1:])
    zero = jnp.zeros_like(fz_int[:1])
    fz = jnp.concatenate([zero, fz_int, zero], axis=0)
    vadv_u = -(fz[1:] - fz[:-1]) / dsig

    vn = bc.north_zero(v)
    v_at_u = 0.25 * (bc.west(v) + v + bc.west(vn) + vn)
    tanf = grid.tan_lat[None, :, None]
    cor_u = colp_u * (grid.corf[None, :, None] + u * tanf / c.R_EARTH) * v_at_u

    pott_u = 0.5 * (bc.west(pott) + pott)
    dx = grid.dx[None, :, None]
    pgf_u = -colp_u * ((diag.phi - bc.west(diag.phi))
                       + c.C_P * pott_u * (diag.pvtf - bc.west(diag.pvtf))) / dx

    dudt = adv_u + vadv_u + cor_u + pgf_u
    if _diff_on(diff_coef):
        dudt = dudt + horizontal_diffusion(u, colp_u, grid, diff_coef)

    # ---- v momentum ----
    vflx_n = bc.north_zero(vflx)
    fyc_v = 0.5 * (vflx + vflx_n) * 0.5 * (v + bc.north_zero(v))
    fxc_v = 0.5 * (bc.south_clamp(uflx) + uflx) * 0.5 * (bc.west(v) + v)
    adv_v = -(bc.east(fxc_v) - fxc_v + fyc_v - bc.south_zero(fyc_v)) / area_v

    w_v = 0.5 * (bc.south_clamp(w_int) + w_int)
    cn_v = 0.5 * (bc.south_clamp(colp_new) + colp_new)[None]
    fz_int_v = w_v * cn_v * 0.5 * (v[:-1] + v[1:])
    fz_v = jnp.concatenate([zero, fz_int_v, zero], axis=0)
    vadv_v = -(fz_v[1:] - fz_v[:-1]) / dsig

    ue = bc.east(u)
    u_at_v = 0.25 * (bc.south_clamp(u) + bc.south_clamp(ue) + u + ue)
    tanf_v = grid.tan_lat_v[None, :, None]
    cor_v = -colp_v * (grid.corf_v[None, :, None]
                       + u_at_v * tanf_v / c.R_EARTH) * u_at_v

    pott_v = 0.5 * (bc.south_clamp(pott) + pott)
    pgf_v = -colp_v * ((diag.phi - bc.south_clamp(diag.phi))
                       + c.C_P * pott_v * (diag.pvtf - bc.south_clamp(diag.pvtf))) \
        / grid.dy

    dvdt = adv_v + vadv_v + cor_v + pgf_v
    if _diff_on(diff_coef):
        dvdt = dvdt + horizontal_diffusion(v, colp_v, grid, diff_coef,
                                           is_v=True)
    dvdt = bc.enforce_v_walls(dvdt)
    return dudt, dvdt
