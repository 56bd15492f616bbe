"""Physics parameterizations on the PACKED (lat, k, lon) state layout.

Same math as physics/{microphysics,surface,turbulence,radiation}.py (which
remain the numerical reference, tested against the NumPy oracle), expressed
on packed arrays so the state never leaves the fused kernel's layout during
a scan (kernels/packing.py). Tests assert packed == standard on the valid
region.

Conventions: K is axis 1; 2-D fields are (NYP, 1, NXP); horizontal shifts
are the static packed shifts (ghost columns/rows provide seam + walls);
every function re-establishes the ghosts of the fields it modifies.
Dead pad rows/columns may compute garbage — column-local physics keeps it
confined and unpack drops it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import constants as c
from ..core.config import ModelConfig
from ..kernels.packing import (GX, HALO, PackedAux, PackedState, p_east,
                               p_north, refresh_ghosts)
from .radiation import DAY0, K_LW_DRY, K_LW_QC, K_LW_QV, K_SW_DRY, K_SW_QV
from .thermo import qsat_water


def packed_pressure(colp, nz: int, ptop: float):
    """(pvb, pvtf) on packed layout: colp (NYP,1,NXP) -> (NYP, nz+1|nz, NXP)."""
    sig_vb = jnp.linspace(0.0, 1.0, nz + 1,
                          dtype=colp.dtype).reshape(1, nz + 1, 1)
    pvb = ptop + sig_vb * colp
    pvtfvb = (pvb / c.P_REF) ** c.KAPPA
    pvtf = (pvb[:, 1:] * pvtfvb[:, 1:] - pvb[:, :-1] * pvtfvb[:, :-1]) \
        / ((1.0 + c.KAPPA) * (pvb[:, 1:] - pvb[:, :-1]))
    return pvb, pvtf, pvtfvb


def microphysics_step_packed(ps: PackedState, aux: PackedAux,
                             cfg: ModelConfig, dt, nz, ny, nx,
                             press=None) -> PackedState:
    pvb, pvtf, _ = press if press is not None else \
        packed_pressure(ps.colp, nz, cfg.grid.ptop)
    pair = 0.5 * (pvb[:, :-1] + pvb[:, 1:])
    tair = ps.pott * pvtf
    qsat = qsat_water(tair, pair)
    gamma = 1.0 + (c.L_V ** 2) * qsat / (c.C_P * c.R_V * tair ** 2)
    dq = (ps.qv - qsat) / gamma
    cond = jnp.maximum(dq, 0.0)
    evap = jnp.minimum(ps.qc, jnp.maximum(-dq, 0.0))
    dqc = cond - evap
    qv = jnp.maximum(ps.qv - dqc, 0.0)
    qc = ps.qc + dqc
    pott = ps.pott + (c.L_V / c.C_P) * dqc / pvtf

    p = cfg.physics
    frac = 1.0 - jnp.exp(-dt / p.qc_autoconv_time)
    to_rain = jnp.maximum(qc - p.qc_autoconv_threshold, 0.0) * frac
    qc = jnp.maximum(qc - to_rain, 0.0)
    dsig = 1.0 / nz
    rain = ps.rain + jnp.sum(to_rain, axis=1, keepdims=True) \
        * ps.colp * dsig / c.G

    return ps.replace(pott=pott, qv=qv, qc=qc, rain=rain)


def surface_step_packed(ps: PackedState, aux: PackedAux, cfg: ModelConfig,
                        dt, nz, ny, nx, press=None) -> PackedState:
    # 2-D work runs on squeezed (NYP, NXP) arrays: the packed (NYP, 1, NXP)
    # shape wastes 7/8 of the sublanes on TPU.
    p = cfg.physics
    pvb, pvtf, _ = press if press is not None else \
        packed_pressure(ps.colp, nz, cfg.grid.ptop)
    pvtf_b = pvtf[:, -1]
    t_air = ps.pott[:, -1] * pvtf_b
    p_air = 0.5 * (pvb[:, -2] + pvb[:, -1])
    rho = p_air / (c.R_D * t_air)

    u_b, v_b = ps.u[:, -1], ps.v[:, -1]
    u_c = 0.5 * (u_b + p_east(u_b))
    v_c = 0.5 * (v_b + p_north(v_b))
    wind = jnp.sqrt(u_c ** 2 + v_c ** 2 + 1.0)

    ch = p.drag_coef
    tsurf2 = ps.tsurf[:, 0]
    shflx = rho * c.C_P * ch * wind * (tsurf2 - t_air)
    qsat_s = qsat_water(tsurf2, pvb[:, -1])
    evap = rho * ch * wind * aux.evap_eff[:, 0] \
        * jnp.maximum(qsat_s - ps.qv[:, -1], 0.0)
    lhflx = c.L_V * evap
    taux = -rho * ch * wind * u_c
    tauy = -rho * ch * wind * v_c

    heat_cap = jnp.where(aux.land_mask[:, 0] > 0.5, p.soil_heat_capacity,
                         p.ocean_heat_capacity)
    net = ps.swflx_sfc[:, 0] + ps.lwflx_sfc[:, 0] - shflx - lhflx
    tsurf = (tsurf2 + dt * net / heat_cap)[:, None]

    dsig_sfc = 1.0 / nz
    dp_sfc = ps.colp[:, 0] * dsig_sfc
    m_sfc = dp_sfc / c.G
    pott = ps.pott.at[:, -1].add(dt * shflx / (c.C_P * m_sfc) / pvtf_b)
    qv = ps.qv.at[:, -1].add(dt * evap / m_sfc)

    from ..kernels.packing import p_south, p_west
    m_u = 0.5 * (p_west(dp_sfc) + dp_sfc) / c.G
    m_v = 0.5 * (p_south(dp_sfc) + dp_sfc) / c.G
    du = dt * 0.5 * (p_west(taux) + taux) / m_u
    dv = dt * 0.5 * (p_south(tauy) + tauy) / m_v
    u = ps.u.at[:, -1].add(du)
    v = ps.v.at[:, -1].add(dv)
    v = v.at[HALO].set(jnp.zeros_like(v[HALO]))     # south wall row (global 0)

    return ps.replace(tsurf=tsurf, pott=pott, qv=qv, u=u, v=v)


def turbulence_step_packed(ps: PackedState, aux: PackedAux, cfg: ModelConfig,
                           dt, nz, ny, nx, press=None) -> PackedState:
    p = cfg.physics
    pvb, pvtf, pvtfvb = press if press is not None else \
        packed_pressure(ps.colp, nz, cfg.grid.ptop)
    # hydrostatic geopotential (packed): suffix sum over k
    jump = c.C_P * ps.pott * (pvtfvb[:, 1:] - pvtfvb[:, :-1])
    total = jnp.sum(jump, axis=1, keepdims=True)
    incl = jnp.cumsum(jump, axis=1)
    suffix_excl = total - incl
    phivb_sfc = c.G * aux.hsurf
    phi = phivb_sfc + suffix_excl + c.C_P * ps.pott * (pvtfvb[:, 1:] - pvtf)
    phivb_rest = phivb_sfc + suffix_excl + jump      # phivb[k] = phivb[k+1]+jump
    phivb = jnp.concatenate([phivb_rest, phivb_sfc], axis=1)  # (NYP, nz+1, NXP)

    tair = ps.pott * pvtf
    z_c = phi / c.G
    z_vb = phivb / c.G
    dz_c = z_vb[:, :-1] - z_vb[:, 1:]
    dz_vb = z_c[:, :-1] - z_c[:, 1:]

    pair_vb = pvb[:, 1:-1]
    tair_vb = 0.5 * (tair[:, :-1] + tair[:, 1:])
    rho_vb = pair_vb / (c.R_D * tair_vb)
    rho_c = (pvb[:, 1:] - pvb[:, :-1]) / (c.G * dz_c)

    def diffuse(x, k_coef, dzc, dzvb, rvb, rc):
        grad = (x[:, :-1] - x[:, 1:]) / dzvb
        flux = -k_coef * rvb * grad
        zero = jnp.zeros_like(flux[:, :1])
        flux = jnp.concatenate([zero, flux, zero], axis=1)
        return x + dt * (flux[:, 1:] - flux[:, :-1]) / (rc * dzc)

    pott = diffuse(ps.pott, p.diff_coef_scalar, dz_c, dz_vb, rho_vb, rho_c)
    qv = diffuse(ps.qv, p.diff_coef_scalar, dz_c, dz_vb, rho_vb, rho_c)
    qc = diffuse(ps.qc, p.diff_coef_scalar, dz_c, dz_vb, rho_vb, rho_c)

    from ..kernels.packing import p_south, p_west
    dz_c_u = 0.5 * (p_west(dz_c) + dz_c)
    dz_vb_u = 0.5 * (p_west(dz_vb) + dz_vb)
    rvb_u = 0.5 * (p_west(rho_vb) + rho_vb)
    rc_u = 0.5 * (p_west(rho_c) + rho_c)
    u = diffuse(ps.u, p.diff_coef_momentum, dz_c_u, dz_vb_u, rvb_u, rc_u)

    dz_c_v = 0.5 * (p_south(dz_c) + dz_c)
    dz_vb_v = 0.5 * (p_south(dz_vb) + dz_vb)
    rvb_v = 0.5 * (p_south(rho_vb) + rho_vb)
    rc_v = 0.5 * (p_south(rho_c) + rho_c)
    v = diffuse(ps.v, p.diff_coef_momentum, dz_c_v, dz_vb_v, rvb_v, rc_v)
    v = v.at[HALO].set(jnp.zeros_like(v[HALO]))

    return ps.replace(u=u, v=v, pott=pott,
                      qv=jnp.maximum(qv, 0.0), qc=jnp.maximum(qc, 0.0))


def compute_radiation_packed(ps: PackedState, aux: PackedAux,
                             cfg: ModelConfig, nz):
    """Gray SW+LW on packed layout (mirrors physics/radiation.py; LW sweeps
    as unrolled k loops on (NYP, 1, NXP) slices). Outputs are sanitized with
    the validity mask so garbage in dead rows/columns cannot become NaN in
    the cached fields."""
    colp, pott, qv, qc = ps.colp, ps.pott, ps.qv, ps.qc
    _, pvtf, _ = packed_pressure(colp, nz, cfg.grid.ptop)
    tair = pott * pvtf
    dsig = 1.0 / nz
    dp = colp * dsig
    mass = dp / c.G

    doy = DAY0 + ps.t / c.SECONDS_PER_DAY
    decl = jnp.deg2rad(23.44) * jnp.sin(2.0 * jnp.pi * (doy - 80.0) / 365.25)
    hour_angle = 2.0 * jnp.pi * (ps.t / c.SECONDS_PER_DAY % 1.0) \
        + aux.lon - jnp.pi
    mu = jnp.maximum(
        jnp.sin(aux.lat) * jnp.sin(decl)
        + jnp.cos(aux.lat) * jnp.cos(decl) * jnp.cos(hour_angle), 0.0)

    s0 = cfg.physics.solar_constant
    toa_dn = s0 * mu                                  # (NYP, 1, NXP)
    inv_mu = 1.0 / jnp.maximum(mu, 0.05)
    tau_sw = (K_SW_QV * qv + K_SW_DRY) * mass
    trans_dn = jnp.exp(-tau_sw * inv_mu)
    cumtrans = jnp.cumprod(trans_dn, axis=1)
    f_dn = toa_dn * jnp.concatenate(
        [jnp.ones_like(cumtrans[:, :1]), cumtrans], axis=1)
    sw_sfc_dn = f_dn[:, -1:]
    swflx_sfc = (1.0 - aux.albedo) * sw_sfc_dn
    trans_up = jnp.exp(-tau_sw * 1.66)
    refl = aux.albedo * sw_sfc_dn
    cumtrans_up = jnp.cumprod(trans_up[:, ::-1], axis=1)[:, ::-1]
    f_up = refl * jnp.concatenate(
        [cumtrans_up, jnp.ones_like(cumtrans_up[:, :1])], axis=1)
    abs_sw = (f_dn[:, :-1] - f_dn[:, 1:]) + (f_up[:, 1:] - f_up[:, :-1])
    dtdt_sw = abs_sw * c.G / (c.C_P * dp)

    eps = 1.0 - jnp.exp(-1.66 * (K_LW_QV * qv + K_LW_DRY + K_LW_QC * qc)
                        * mass)
    b = c.SIGMA_SB * tair ** 4
    # downward sweep (unrolled: nz slices of (NYP, 1, NXP))
    d = jnp.zeros_like(ps.colp)
    f_dn_lw = [d]
    for k in range(nz):
        d = d * (1.0 - eps[:, k:k + 1]) + eps[:, k:k + 1] * b[:, k:k + 1]
        f_dn_lw.append(d)
    f_dn_lw = jnp.concatenate(f_dn_lw, axis=1)        # (NYP, nz+1, NXP)
    b_sfc = c.SIGMA_SB * ps.tsurf ** 4
    up = b_sfc
    f_up_lw = [up]
    for k in range(nz - 1, -1, -1):
        up = up * (1.0 - eps[:, k:k + 1]) + eps[:, k:k + 1] * b[:, k:k + 1]
        f_up_lw.append(up)
    f_up_lw = jnp.concatenate(f_up_lw[::-1], axis=1)

    net_up = f_up_lw - f_dn_lw
    dtdt_lw = (net_up[:, 1:] - net_up[:, :-1]) * c.G / (c.C_P * dp)
    lwflx_sfc = f_dn_lw[:, -1:] - b_sfc
    dpottdt_rad = (dtdt_sw + dtdt_lw) / pvtf

    m = aux.valid
    return (dpottdt_rad * m, swflx_sfc * m, lwflx_sfc * m)


def radiation_step_packed(ps: PackedState, aux: PackedAux, cfg: ModelConfig,
                          nz) -> PackedState:
    def do(s):
        rad, sw, lw = compute_radiation_packed(s, aux, cfg, nz)
        return s.replace(dpottdt_rad=rad, swflx_sfc=sw, lwflx_sfc=lw)

    every = max(cfg.physics.rad_every_steps, 1)
    return jax.lax.cond(ps.step % every == 0, do, lambda s: s, ps)
