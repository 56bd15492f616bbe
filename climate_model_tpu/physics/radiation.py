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

import jax
import jax.numpy as jnp

from ..core import constants as c
from ..core.config import ModelConfig
from ..core.grid import Grid
from ..core.state import Forcing, State
from ..dycore import operators as ops

# Gray-gas mass absorption coefficients [m2 kg-1], tuned (round 4) so the
# planetary TOA budget CLOSES at an Earth-like state (VERDICT r3 missing
# #1 — the round-1 values gave dry diffuse LW optical depth ~23, an
# atmosphere that emits from ~170 K levels and can never balance its
# absorbed SW). Derivation against the model column (colp ~ 91 kPa ->
# ~9.3e3 kg/m2 dry mass; diffuse two-stream path factor 1.66) plus the
# measured lessons of the tuning sweep (docs/STATUS.md round-4):
#   * LW dry:   tau_dry = 1.66 * K_LW_DRY * 9.3e3 ~ 1.55 — the gray-Earth
#     dry base that puts the emission level at a reachable temperature.
#   * LW vapor: tau_qv = 1.66 * K_LW_QV * PW ~ 0.2-0.5 at PW 30-70 kg/m2.
#     This SETS THE VAPOR FEEDBACK GAIN: without resolved subsidence
#     drying (no convection scheme — same as the reference) the column
#     saturates, PW tracks Clausius-Clapeyron, and a larger coefficient
#     measured supercritical (d OLR/dT from vapor beats Planck ->
#     monotone warming through 340 K; the 0.15 round-1 value was 40x over).
#   * LW cloud: deliberately ~100x below liquid water's real LW opacity.
#     Measured: the model keeps a PERMANENT global stock of sub-threshold
#     cloud water (~10-20 kg/m2 path — there is no cloud fraction, so thin
#     stratiform residue blankets every column); at real opacities that
#     blanket pins OLR to ~130-230 W/m2 cold cloud-top emission and the
#     climate runs away hot. Net cloud radiative forcing on Earth is a
#     small residual of big canceling LW/SW terms; with the SW half
#     structurally absent (no scattering), a small K_LW_QC ~ tau_qc <~ 1
#     is the defensible gray stand-in.
#   * SW:       vertical tau ~ 0.06-0.08 -> ~10% slant-path atmospheric
#     absorption, so the surface albedo (which carries the planetary
#     albedo, core/config.py) actually reaches TOA. Larger SW absorption
#     measured as a positive feedback (absorbed SW grew with PW).
# Empirical validation (4-deg 120-day run, docs/STATUS.md round-4): TOA
# imbalance decays 15 -> 2 W/m2, mean POTT flattens at 313 K, OLR 247 vs
# absorbed-SW 251, rain 1.4 mm/day rising toward evap 1.55. Reference
# counterpart: the tuned emissivity constants in its
# ``radiation/longwave.py``/``shortwave.py`` (SURVEY.md §2.1 row 16 [P];
# mount empty — VERIFY-ON-MOUNT: diff these against the real files).
K_SW_QV = 0.0005     # shortwave absorption by water vapor
K_SW_DRY = 5.0e-6    # shortwave background (ozone/aerosol stand-in)
K_LW_QV = 0.004      # longwave absorption by water vapor
K_LW_DRY = 1.0e-4    # longwave background (CO2 stand-in)
K_LW_QC = 0.15       # longwave absorption by cloud water
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


def gray_radiation_core(kax: int, nz: int, mass, dp, tair, qv, qc, b_sfc,
                        albedo, toa_dn, inv_mu):
    """Gray-gas SW + LW column radiation, generic over the level axis.

    ONE implementation of the reference ``shortwave.py``/``longwave.py``
    math shared by the standard layout (``compute_radiation``, k on axis 0)
    and the packed supertensor layout (``physics/packed.py``, k on axis 1)
    so the two cannot drift. Array conventions: k-extent arrays carry nz
    levels on axis ``kax``; per-column arrays (``b_sfc``, ``albedo``,
    ``toa_dn``, ``inv_mu``) carry a singleton on ``kax``. Returns
    ``(heat, swflx_sfc, lwflx_sfc, f_up_toa, olr)`` where ``heat`` is the
    layer heating dT/dt [K s-1] (divide by PVTF for dPOTTdt).

    The LW sweeps are first-order affine recurrences (F' = a*F + c with
    a = 1-eps, c = eps*B); they and the SW cumulative transmissions are
    evaluated as SEQUENTIAL unrolled sweeps over the level axis.
    History (round 4): these were log-depth ``associative_scan``/``cumprod``
    compositions through round 3, but on TPU the cumulative-op lowering
    along the k-sublane axis of the big packed (row, k, lane) layout is
    numerically WRONG at production shapes — ~1e-3-relative flux errors
    concentrated at the scan tree-merge levels (k = nz/2-1 and nz-1),
    which materialized as a spurious −66 K/day bottom-layer heating error
    at 0.25 deg that refrigerated the boundary layer (docs/STATUS.md
    round-4 postmortem; the same HLO is exact on CPU and in the k-major
    standard layout). The sequential form has one exact evaluation order
    on every backend and layout; radiation is interval-cached (hourly), so
    the extra scan latency amortizes to noise."""
    import functools

    cat = functools.partial(jnp.concatenate, axis=kax)
    sl = lambda x, lo, hi: jax.lax.slice_in_dim(x, lo, hi, axis=kax)

    def seq(f, init, xs, reverse=False):
        """Sequential first-order sweep over the level axis: returns the
        carries stacked along ``kax`` (length nz). UNROLLED Python loop,
        not ``lax.scan``: nz is small and static (8-32), the unrolled form
        is plain elementwise HLO that XLA fuses into the surrounding
        radiation math, and a lax.scan nested under the driver's outer
        step-scan measured pathologically slow to compile on this box's
        remote TPU compile service (>20 min vs ~2 min unrolled)."""
        order = range(nz - 1, -1, -1) if reverse else range(nz)
        carry = init
        ys = [None] * nz
        for k in order:
            carry = f(carry, tuple(sl(x, k, k + 1) for x in xs))
            ys[k] = carry
        return cat(ys)

    # ---- shortwave: Beer-Lambert down-beam, albedo-reflected up-beam ----
    tau_sw = (K_SW_QV * qv + K_SW_DRY) * mass
    trans_dn = jnp.exp(-tau_sw * inv_mu)
    cumtrans = seq(lambda c, x: c * x[0], jnp.ones_like(sl(trans_dn, 0, 1)),
                   (trans_dn,))
    ones = jnp.ones_like(sl(cumtrans, 0, 1))
    f_dn = toa_dn * cat([ones, cumtrans])                   # borders 0..nz
    sw_sfc_dn = sl(f_dn, nz, nz + 1)
    swflx_sfc = (1.0 - albedo) * sw_sfc_dn
    # reflected beam travels back up with diffuse path factor 1.66
    trans_up = jnp.exp(-tau_sw * 1.66)
    refl = albedo * sw_sfc_dn
    # upward cumulative transmission from the surface: row k holds the
    # product of trans_up[k:], built by a reverse sweep
    cumtrans_up = seq(lambda c, x: c * x[0],
                      jnp.ones_like(sl(trans_up, 0, 1)), (trans_up,),
                      reverse=True)
    f_up = refl * cat([cumtrans_up, ones])
    # net SW absorbed per layer (down-beam loss + up-beam loss)
    abs_sw = (sl(f_dn, 0, nz) - sl(f_dn, 1, nz + 1)) \
        + (sl(f_up, 1, nz + 1) - sl(f_up, 0, nz))
    dtdt_sw = abs_sw * c.G / (c.C_P * dp)

    # ---- longwave (emissivity exchange, diffuse path factor 1.66) ----
    eps = 1.0 - jnp.exp(-1.66 * (K_LW_QV * qv + K_LW_DRY + K_LW_QC * qc)
                        * mass)
    b = c.SIGMA_SB * tair ** 4
    a, e_b = 1.0 - eps, eps * b

    # downward sweep: D[0] = 0; D[k+1] = D[k]*(1-eps_k) + eps_k*B_k
    c_dn = seq(lambda d, x: d * x[0] + x[1],
               jnp.zeros_like(sl(a, 0, 1)), (a, e_b))
    zeros = jnp.zeros_like(sl(c_dn, 0, 1))
    f_dn_lw = cat([zeros, c_dn])                            # borders 0..nz
    # upward sweep from the (emissivity-1) surface at tsurf:
    #   U[nz] = B_sfc; U[k] = U[k+1]*(1-eps_k) + eps_k*B_k
    u_up = seq(lambda u, x: u * x[0] + x[1],
               b_sfc * jnp.ones_like(sl(a, 0, 1)), (a, e_b), reverse=True)
    f_up_lw = cat([u_up, b_sfc])                            # borders 0..nz

    net_up = f_up_lw - f_dn_lw                              # borders 0..nz
    # layer k gains net_up[k+1] - net_up[k]
    dtdt_lw = (sl(net_up, 1, nz + 1) - sl(net_up, 0, nz)) \
        * c.G / (c.C_P * dp)

    lwflx_sfc = sl(f_dn_lw, nz, nz + 1) - b_sfc
    return (dtdt_sw + dtdt_lw, swflx_sfc, lwflx_sfc, sl(f_up, 0, 1),
            sl(net_up, 0, 1))


def effective_albedo(tsurf, albedo_map, cfg: ModelConfig):
    """Surface SW albedo: the static map, raised to the ice/snow value where
    the surface is frozen (reference surface albedo's ice/snow dependence,
    SURVEY.md §2.1 row 17 [P]). Elementwise — shared by both layouts."""
    p = cfg.physics
    if not p.dynamic_albedo:
        return albedo_map
    return jnp.where(tsurf < c.T_ZERO_C, p.albedo_ice, albedo_map)


def solar_forcing(t, lat, lon, tsurf, albedo_map, cfg: ModelConfig):
    """Solar geometry + effective surface albedo for the SW calculation:
    ``(toa_dn, inv_mu, albedo)``, all elementwise over broadcastable lat/lon/
    tsurf arrays — ONE implementation shared by the standard layout
    (``compute_radiation``) and the packed supertensor layout
    (``physics/packed.py``), same dedup pattern as ``gray_radiation_core``.
    inv_mu is the slant optical-depth path amplification 1/mu, capped for
    grazing sun to avoid overflow at mu -> 0 (flux -> 0 there anyway)."""
    mu = solar_zenith_cos(t, lat, lon)
    toa_dn = cfg.physics.solar_constant * mu
    inv_mu = 1.0 / jnp.maximum(mu, 0.05)
    return toa_dn, inv_mu, effective_albedo(tsurf, albedo_map, cfg)


def compute_radiation(state: State, grid: Grid, forcing: Forcing,
                      cfg: ModelConfig) -> RadiationOut:
    """One full radiation calculation (reference ``Radiation.calc_radiation``).

    Standard-layout wrapper around ``gray_radiation_core`` (k on axis 0);
    the packed supertensor layout wraps the same core in physics/packed.py."""
    colp, pott, qv, qc = state.colp, state.pott, state.qv, state.qc
    _, pvtf, _ = ops.diagnose_pressure(colp, grid)
    tair = pott * pvtf
    dp = colp[None] * grid.dsigma[:, None, None]          # layer mass * g
    mass = dp / c.G                                       # [kg m-2]

    lat2 = grid.lat[:, None]
    lon2 = grid.lon[None, :]
    toa_dn, inv_mu, albedo = solar_forcing(state.t, lat2, lon2, state.tsurf,
                                           forcing.albedo, cfg)
    b_sfc = c.SIGMA_SB * state.tsurf ** 4

    heat, swflx_sfc, lwflx_sfc, f_up_toa, olr = gray_radiation_core(
        0, grid.nz, mass, dp, tair, qv, qc, b_sfc[None], albedo[None],
        toa_dn[None], inv_mu[None])
    return RadiationOut(dpottdt_rad=heat / pvtf, swflx_sfc=swflx_sfc[0],
                        lwflx_sfc=lwflx_sfc[0],
                        swflx_toa=toa_dn - f_up_toa[0], olr=olr[0])


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
