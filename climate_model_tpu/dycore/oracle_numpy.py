"""NumPy oracle: independent fp64 implementation of docs/NUMERICS.md.

This is the rebuild's stand-in for the absent reference code (SURVEY.md §4:
"this NumPy 'oracle core' is a deliverable: it doubles as the spec of the
reference equations"). It is used ONLY by tests: the jnp/Pallas production
operators must agree with it allclose (BASELINE.md milestone configs #1/#2).

Deliberately written in a different idiom than dycore/operators.py —
explicit per-level loops, slice-based wall handling, no broadcasting tricks —
so transcription errors in either implementation do not cancel.
"""

from __future__ import annotations

import numpy as np

from ..core import constants as c


def _w(a):   # west neighbor value, periodic lon
    return np.roll(a, 1, axis=-1)


def _e(a):   # east neighbor value, periodic lon
    return np.roll(a, -1, axis=-1)


def diagnose(colp, pott, hsurf, grid):
    nz = grid.nz
    ny, nx = colp.shape
    pvb = np.empty((nz + 1, ny, nx))
    for ks in range(nz + 1):
        pvb[ks] = grid.ptop + grid.sigma_vb[ks] * colp
    pvtfvb = (pvb / c.P_REF) ** c.KAPPA
    pvtf = np.empty((nz, ny, nx))
    for k in range(nz):
        pvtf[k] = (pvb[k + 1] * pvtfvb[k + 1] - pvb[k] * pvtfvb[k]) \
            / ((1.0 + c.KAPPA) * (pvb[k + 1] - pvb[k]))
    tair = pott * pvtf

    phivb = np.empty((nz + 1, ny, nx))
    phi = np.empty((nz, ny, nx))
    phivb[nz] = c.G * hsurf
    for k in range(nz - 1, -1, -1):
        phi[k] = phivb[k + 1] + c.C_P * pott[k] * (pvtfvb[k + 1] - pvtf[k])
        phivb[k] = phi[k] + c.C_P * pott[k] * (pvtf[k] - pvtfvb[k])
    return dict(pvb=pvb, pvtf=pvtf, pvtfvb=pvtfvb, phi=phi, phivb=phivb,
                tair=tair)


def continuity(u, v, colp, colp_base, dt, grid):
    nz = grid.nz
    ny, nx = colp.shape
    colp_u = 0.5 * (_w(colp) + colp)
    uflx = np.empty_like(u)
    vflx = np.zeros_like(v)
    for k in range(nz):
        uflx[k] = u[k] * colp_u * grid.dy
        for j in range(1, ny):
            colp_vj = 0.5 * (colp[j - 1] + colp[j])
            vflx[k, j] = v[k, j] * colp_vj * grid.dxs[j]

    div = np.empty_like(u)
    for k in range(nz):
        for j in range(ny):
            vf_n = vflx[k, j + 1] if j + 1 < ny else 0.0   # north wall
            div[k, j] = (_e(uflx[k])[j] - uflx[k, j] + vf_n - vflx[k, j]) \
                / grid.area[j]

    dcolpdt = np.zeros((ny, nx))
    for k in range(nz):
        dcolpdt -= div[k] * grid.dsigma[k]
    colp_new = colp_base + dt * dcolpdt

    wwind = np.zeros((nz + 1, ny, nx))
    acc = np.zeros((ny, nx))
    for ks in range(1, nz):
        acc += div[ks - 1] * grid.dsigma[ks - 1]
        wwind[ks] = -(acc + grid.sigma_vb[ks] * dcolpdt) / colp_new
    return dict(uflx=uflx, vflx=vflx, div=div, dcolpdt=dcolpdt,
                colp_new=colp_new, wwind=wwind)


def scalar_tendency(q, cont, colp, grid, source=None, diff_coef=0.0):
    nz = grid.nz
    ny, nx = colp.shape
    uflx, vflx, wwind, colp_new = (cont["uflx"], cont["vflx"], cont["wwind"],
                                   cont["colp_new"])
    dqdt = np.zeros_like(q)
    for k in range(nz):
        fx = uflx[k] * 0.5 * (_w(q[k]) + q[k])
        fy = np.zeros((ny, nx))
        for j in range(1, ny):
            fy[j] = vflx[k, j] * 0.5 * (q[k, j - 1] + q[k, j])
        for j in range(ny):
            fy_n = fy[j + 1] if j + 1 < ny else 0.0
            dqdt[k, j] = -(_e(fx)[j] - fx[j] + fy_n - fy[j]) / grid.area[j]

    fz = np.zeros((nz + 1, ny, nx))
    for ks in range(1, nz):
        fz[ks] = wwind[ks] * colp_new * 0.5 * (q[ks - 1] + q[ks])
    for k in range(nz):
        dqdt[k] -= (fz[k + 1] - fz[k]) / grid.dsigma[k]

    if source is not None:
        for k in range(nz):
            dqdt[k] += colp * source[k]
    if diff_coef:
        dqdt += diffusion(q, colp[None, :, :], grid, diff_coef)
    return dqdt


def diffusion(q, colp_face, grid, coef, is_v=False):
    nz, ny, nx = q.shape
    out = np.zeros_like(q)
    for k in range(nz):
        for j in range(ny):
            js = max(j - 1, 0)
            if j + 1 < ny:
                q_n = q[k, j + 1]
            else:
                q_n = np.zeros(nx) if is_v else q[k, ny - 1]
            lap = (_e(q[k])[j] - 2.0 * q[k, j] + _w(q[k])[j]) / grid.dx[j] ** 2 \
                + (q_n - 2.0 * q[k, j] + q[k, js]) / grid.dy ** 2
            out[k, j] = coef * colp_face[min(k, colp_face.shape[0] - 1), j] * lap
    return out


def momentum_tendency(u, v, pott, colp, cont, diag, grid, diff_coef=0.0):
    nz = grid.nz
    ny, nx = colp.shape
    uflx, vflx, wwind, colp_new = (cont["uflx"], cont["vflx"], cont["wwind"],
                                   cont["colp_new"])
    phi, pvtf = diag["phi"], diag["pvtf"]
    colp_u = 0.5 * (_w(colp) + colp)

    dudt = np.zeros_like(u)
    dvdt = np.zeros_like(v)

    for k in range(nz):
        # ---- u: horizontal advection ----
        fxc = 0.5 * (uflx[k] + _e(uflx[k])) * 0.5 * (u[k] + _e(u[k]))
        fyc = np.zeros((ny + 1, nx))        # corners, rows 0..ny; walls = 0
        for j in range(1, ny):
            vflx_corner = 0.5 * (_w(vflx[k, j]) + vflx[k, j])
            fyc[j] = vflx_corner * 0.5 * (u[k, j - 1] + u[k, j])
        for j in range(ny):
            dudt[k, j] = -(fxc[j] - _w(fxc)[j] + fyc[j + 1] - fyc[j]) \
                / grid.area[j]

        # ---- u: Coriolis + metric ----
        for j in range(ny):
            v_n = v[k, j + 1] if j + 1 < ny else np.zeros(nx)
            v_at_u = 0.25 * (_w(v[k, j]) + v[k, j] + _w(v_n) + v_n)
            dudt[k, j] += colp_u[j] * (
                grid.corf[j] + u[k, j] * grid.tan_lat[j] / c.R_EARTH) * v_at_u

        # ---- u: PGF ----
        pott_u = 0.5 * (_w(pott[k]) + pott[k])
        for j in range(ny):
            dudt[k, j] += -colp_u[j] * (
                (phi[k, j] - _w(phi[k])[j])
                + c.C_P * pott_u[j] * (pvtf[k, j] - _w(pvtf[k])[j])
            ) / grid.dx[j]

        # ---- v: horizontal advection (rows 1..ny-1) ----
        fyc_v = np.zeros((ny, nx))          # meridional momentum flux at centers
        for jc in range(ny):
            vf_n = vflx[k, jc + 1] if jc + 1 < ny else 0.0
            v_n = v[k, jc + 1] if jc + 1 < ny else 0.0
            fyc_v[jc] = 0.5 * (vflx[k, jc] + vf_n) * 0.5 * (v[k, jc] + v_n)
        for j in range(1, ny):
            uflx_corner = 0.5 * (uflx[k, j - 1] + uflx[k, j])
            fxc_v = uflx_corner * 0.5 * (_w(v[k, j]) + v[k, j])
            dvdt[k, j] = -(_e(fxc_v) - fxc_v + fyc_v[j] - fyc_v[j - 1]) \
                / grid.area_v[j]

        # ---- v: Coriolis + metric, PGF ----
        for j in range(1, ny):
            colp_v = 0.5 * (colp[j - 1] + colp[j])
            u_at_v = 0.25 * (u[k, j - 1] + _e(u[k, j - 1])
                             + u[k, j] + _e(u[k, j]))
            dvdt[k, j] += -colp_v * (
                grid.corf_v[j] + u_at_v * grid.tan_lat_v[j] / c.R_EARTH) * u_at_v
            pott_v = 0.5 * (pott[k, j - 1] + pott[k, j])
            dvdt[k, j] += -colp_v * (
                (phi[k, j] - phi[k, j - 1])
                + c.C_P * pott_v * (pvtf[k, j] - pvtf[k, j - 1])
            ) / grid.dy

    # ---- vertical advection (borders 1..nz-1) ----
    fz_u = np.zeros((nz + 1, ny, nx))
    fz_v = np.zeros((nz + 1, ny, nx))
    cn_u = 0.5 * (_w(colp_new) + colp_new)
    for ks in range(1, nz):
        w_u = 0.5 * (_w(wwind[ks]) + wwind[ks])
        fz_u[ks] = w_u * cn_u * 0.5 * (u[ks - 1] + u[ks])
        for j in range(1, ny):
            w_v = 0.5 * (wwind[ks, j - 1] + wwind[ks, j])
            cn_v = 0.5 * (colp_new[j - 1] + colp_new[j])
            fz_v[ks, j] = w_v * cn_v * 0.5 * (v[ks - 1, j] + v[ks, j])
    for k in range(nz):
        dudt[k] -= (fz_u[k + 1] - fz_u[k]) / grid.dsigma[k]
        dvdt[k] -= (fz_v[k + 1] - fz_v[k]) / grid.dsigma[k]

    if diff_coef:
        dudt += diffusion(u, colp_u[None, :, :], grid, diff_coef)
        colp_v_full = np.empty_like(colp)
        colp_v_full[0] = colp[0]
        for j in range(1, ny):
            colp_v_full[j] = 0.5 * (colp[j - 1] + colp[j])
        dvdt += diffusion(v, colp_v_full[None, :, :], grid, diff_coef, is_v=True)
    dvdt[:, 0, :] = 0.0
    return dudt, dvdt


def tendencies(state, colp_base, dt, grid, hsurf, moisture=True,
               dpottdt_src=None, diff_uv=0.0, diff_pott=0.0, diff_moist=0.0):
    """Full tendency evaluation (oracle counterpart of tendencies.py)."""
    colp, pott = state["colp"], state["pott"]
    diag = diagnose(colp, pott, hsurf, grid)
    cont = continuity(state["u"], state["v"], colp, colp_base, dt, grid)
    dudt, dvdt = momentum_tendency(state["u"], state["v"], pott, colp, cont,
                                   diag, grid, diff_coef=diff_uv)
    dpottdt = scalar_tendency(pott, cont, colp, grid, source=dpottdt_src,
                              diff_coef=diff_pott)
    out = dict(dudt=dudt, dvdt=dvdt, dcolpdt=cont["dcolpdt"],
               dpottdt=dpottdt, colp_new=cont["colp_new"],
               wwind=cont["wwind"], cont=cont, diag=diag)
    if moisture:
        out["dqvdt"] = scalar_tendency(state["qv"], cont, colp, grid,
                                       diff_coef=diff_moist)
        out["dqcdt"] = scalar_tendency(state["qc"], cont, colp, grid,
                                       diff_coef=diff_moist)
    return out


def proceed(state, tend, dt, grid, moisture=True):
    ny = grid.ny
    colp_old, colp_new = state["colp"], tend["colp_new"]
    cu_old = 0.5 * (_w(colp_old) + colp_old)
    cu_new = 0.5 * (_w(colp_new) + colp_new)
    new = dict(state)
    new["colp"] = colp_new
    new["u"] = (state["u"] * cu_old + dt * tend["dudt"]) / cu_new
    v = state["v"].copy()
    for j in range(1, ny):
        cv_old = 0.5 * (colp_old[j - 1] + colp_old[j])
        cv_new = 0.5 * (colp_new[j - 1] + colp_new[j])
        v[:, j] = (state["v"][:, j] * cv_old + dt * tend["dvdt"][:, j]) / cv_new
    v[:, 0] = 0.0
    new["v"] = v
    new["pott"] = (state["pott"] * colp_old + dt * tend["dpottdt"]) / colp_new
    if moisture:
        new["qv"] = np.maximum(
            (state["qv"] * colp_old + dt * tend["dqvdt"]) / colp_new, 0.0)
        new["qc"] = np.maximum(
            (state["qc"] * colp_old + dt * tend["dqcdt"]) / colp_new, 0.0)
    return new


def step_matsuno(state, dt, grid, hsurf, moisture=True, dpottdt_src=None,
                 **diff):
    t1 = tendencies(state, state["colp"], dt, grid, hsurf, moisture,
                    dpottdt_src, **diff)
    pred = proceed(state, t1, dt, grid, moisture)
    t2 = tendencies(pred, state["colp"], dt, grid, hsurf, moisture,
                    dpottdt_src, **diff)
    return proceed(state, t2, dt, grid, moisture)


# ---------------------------------------------------------------------------
# Moist physics oracle (BASELINE milestone config #2: "QV advection + simple
# moisture physics"). Mirrors physics/microphysics.py per docs/NUMERICS.md
# conventions; written with per-level loops.
# ---------------------------------------------------------------------------

def microphysics_step(state, grid, hsurf, dt, qc_autoconv_time=1000.0,
                      qc_autoconv_threshold=1e-4, land_mask=None,
                      soil_moist_cap=0.02):
    """``land_mask`` switches on the soil-hydrology coupling: this step's
    rain refills the land bucket up to field capacity."""
    from ..physics.thermo import qsat_water

    d = diagnose(state["colp"], state["pott"], hsurf, grid)
    nz = grid.nz
    new = dict(state)
    pott = state["pott"].copy()
    qv = state["qv"].copy()
    qc = state["qc"].copy()
    rain = state["rain"].copy()
    rain_inc = np.zeros_like(rain)
    frac = 1.0 - np.exp(-dt / qc_autoconv_time)
    for k in range(nz):
        pair = 0.5 * (d["pvb"][k] + d["pvb"][k + 1])
        tair = pott[k] * d["pvtf"][k]
        qsat = qsat_water(tair, pair, np)
        gamma = 1.0 + (c.L_V ** 2) * qsat / (c.C_P * c.R_V * tair ** 2)
        dq = (qv[k] - qsat) / gamma
        cond = np.maximum(dq, 0.0)
        evap = np.minimum(qc[k], np.maximum(-dq, 0.0))
        dqc = cond - evap
        qv[k] -= dqc
        qc[k] += dqc
        pott[k] += (c.L_V / c.C_P) * dqc / d["pvtf"][k]
        to_rain = np.maximum(qc[k] - qc_autoconv_threshold, 0.0) * frac
        qc[k] -= to_rain
        rain_inc += to_rain * state["colp"] * grid.dsigma[k] / c.G
    rain += rain_inc
    new.update(pott=pott, qv=np.maximum(qv, 0.0), qc=np.maximum(qc, 0.0),
               rain=rain)
    if land_mask is not None:
        ny, nx = rain.shape
        soil = state["soil_moist"].copy()
        for j in range(ny):
            for i in range(nx):
                if land_mask[j, i] > 0.5:
                    soil[j, i] = min(soil[j, i]
                                     + rain_inc[j, i] / c.RHO_WATER,
                                     soil_moist_cap)
        new.update(soil_moist=soil)
    return new


def step_moist(state, dt, grid, hsurf, diff_uv=0.0, diff_pott=0.0,
               diff_moist=0.0, **mp_kw):
    """One full moist step: Matsuno dynamics + microphysics split
    (mirrors model.make_step_fn with microphysics only)."""
    s = step_matsuno(state, dt, grid, hsurf, moisture=True,
                     diff_uv=diff_uv, diff_pott=diff_pott,
                     diff_moist=diff_moist)
    return microphysics_step(s, grid, hsurf, dt, **mp_kw)


# ---------------------------------------------------------------------------
# Physics parameterization oracles (SURVEY.md §4 per-kernel golden tests;
# reference ``radiation/``, ``soil_model.py``, ``turbulence.py``). Written as
# explicit per-column / per-level loops — a deliberately different idiom from
# physics/{radiation,surface,turbulence}.py so a shared transcription bug in
# the production code cannot cancel. The only shared inputs are the physical
# constants (the spec).
# ---------------------------------------------------------------------------

# Gray-gas coefficients (spec values, physics/radiation.py header —
# round-4 TOA-closure retune).
_K_SW_QV, _K_SW_DRY = 0.0005, 5.0e-6
_K_LW_QV, _K_LW_DRY, _K_LW_QC = 0.004, 1.0e-4, 0.15
_DAY0 = 80.0


def _qsat_np(tair, pair):
    """Magnus saturation mixing ratio, transcribed independently."""
    t_c = tair - c.T_ZERO_C
    esat = c.MAGNUS_E0 * np.exp(c.MAGNUS_A * t_c / (t_c + c.MAGNUS_B))
    return c.EPS_V * esat / max(pair - (1.0 - c.EPS_V) * esat, 1.0)


def radiation_np(state, grid, forcing, t, solar_constant=1365.0,
                 dynamic_albedo=False, albedo_ice=0.5):
    """Gray SW + LW column radiation, one explicit loop per column.

    Returns (dpottdt_rad, swflx_sfc, lwflx_sfc) with the conventions of
    physics/radiation.py (which mirrors the reference ``radiation/`` package:
    SW Beer-Lambert with zenith-angle slant path + albedo-reflected upward
    beam at diffuse path factor 1.66; LW emissivity sweeps)."""
    nz, ny, nx = state["pott"].shape
    colp, pott, qv, qc = (state["colp"], state["pott"], state["qv"],
                          state["qc"])
    d = diagnose(colp, pott, forcing["hsurf"], grid)
    pvtf, pvb = d["pvtf"], d["pvb"]

    doy = _DAY0 + t / c.SECONDS_PER_DAY
    decl = np.deg2rad(23.44) * np.sin(2.0 * np.pi * (doy - 80.0) / 365.25)
    frac_day = (t / c.SECONDS_PER_DAY) % 1.0

    dpottdt = np.zeros((nz, ny, nx))
    sw_sfc = np.zeros((ny, nx))
    lw_sfc = np.zeros((ny, nx))
    for j in range(ny):
        lat = grid.lat[j]
        for i in range(nx):
            lon = grid.lon[i]
            hour_angle = 2.0 * np.pi * frac_day + lon - np.pi
            mu = np.sin(lat) * np.sin(decl) \
                + np.cos(lat) * np.cos(decl) * np.cos(hour_angle)
            mu = max(mu, 0.0)
            inv_mu = 1.0 / max(mu, 0.05)

            mass = np.empty(nz)
            tau_sw = np.empty(nz)
            for k in range(nz):
                mass[k] = colp[j, i] * grid.dsigma[k] / c.G
                tau_sw[k] = (_K_SW_QV * qv[k, j, i] + _K_SW_DRY) * mass[k]

            # SW downward beam border fluxes 0..nz
            f_dn = np.empty(nz + 1)
            f_dn[0] = solar_constant * mu
            for k in range(nz):
                f_dn[k + 1] = f_dn[k] * np.exp(-tau_sw[k] * inv_mu)
            # ice/snow albedo where the surface is frozen
            alb = forcing["albedo"][j, i]
            if dynamic_albedo and state["tsurf"][j, i] < c.T_ZERO_C:
                alb = albedo_ice
            sw_sfc[j, i] = (1.0 - alb) * f_dn[nz]
            # reflected upward beam, diffuse path
            f_up = np.empty(nz + 1)
            f_up[nz] = alb * f_dn[nz]
            for k in range(nz - 1, -1, -1):
                f_up[k] = f_up[k + 1] * np.exp(-tau_sw[k] * 1.66)

            # LW emissivity sweeps
            eps = np.empty(nz)
            b = np.empty(nz)
            for k in range(nz):
                eps[k] = 1.0 - np.exp(
                    -1.66 * (_K_LW_QV * qv[k, j, i] + _K_LW_DRY
                             + _K_LW_QC * qc[k, j, i]) * mass[k])
                b[k] = c.SIGMA_SB * (pott[k, j, i] * pvtf[k, j, i]) ** 4
            dn = np.zeros(nz + 1)
            for k in range(nz):
                dn[k + 1] = dn[k] * (1.0 - eps[k]) + eps[k] * b[k]
            b_sfc = c.SIGMA_SB * state["tsurf"][j, i] ** 4
            up = np.empty(nz + 1)
            up[nz] = b_sfc
            for k in range(nz - 1, -1, -1):
                up[k] = up[k + 1] * (1.0 - eps[k]) + eps[k] * b[k]
            lw_sfc[j, i] = dn[nz] - b_sfc

            for k in range(nz):
                dp = colp[j, i] * grid.dsigma[k]
                absorbed = (f_dn[k] - f_dn[k + 1]) + (f_up[k + 1] - f_up[k])
                net_gain = (up[k + 1] - dn[k + 1]) - (up[k] - dn[k])
                dtdt = (absorbed + net_gain) * c.G / (c.C_P * dp)
                dpottdt[k, j, i] = dtdt / pvtf[k, j, i]
    return dpottdt, sw_sfc, lw_sfc


def surface_np(state, grid, forcing, dt, drag_coef=1.3e-3,
               soil_heat_capacity=2.0e6, ocean_heat_capacity=2.0e8,
               soil_moisture=False, soil_moist_cap=0.02):
    """Slab surface energy budget + bulk fluxes deposited in the lowest
    layer (reference ``soil_model.py``/``srfc_main.py``), per-point loops.
    With ``soil_moisture``: land evap efficiency follows the prognostic
    bucket fraction and evaporation dries the bucket."""
    nz, ny, nx = state["pott"].shape
    colp = state["colp"]
    d = diagnose(colp, state["pott"], forcing["hsurf"], grid)
    new = dict(state)
    pott = state["pott"].copy()
    qv = state["qv"].copy()
    u = state["u"].copy()
    v = state["v"].copy()
    tsurf = state["tsurf"].copy()
    soil = state["soil_moist"].copy() if soil_moisture else None

    taux = np.zeros((ny, nx))
    tauy = np.zeros((ny, nx))
    shflx = np.zeros((ny, nx))
    evap = np.zeros((ny, nx))
    for j in range(ny):
        for i in range(nx):
            pvtf_b = d["pvtf"][nz - 1, j, i]
            t_air = pott[nz - 1, j, i] * pvtf_b
            p_air = 0.5 * (d["pvb"][nz - 1, j, i] + d["pvb"][nz, j, i])
            rho = p_air / (c.R_D * t_air)
            u_c = 0.5 * (u[nz - 1, j, i] + u[nz - 1, j, (i + 1) % nx])
            v_n = v[nz - 1, j + 1, i] if j + 1 < ny else 0.0
            v_c = 0.5 * (v[nz - 1, j, i] + v_n)
            wind = np.sqrt(u_c * u_c + v_c * v_c + 1.0)
            shflx[j, i] = rho * c.C_P * drag_coef * wind \
                * (tsurf[j, i] - t_air)
            qsat_s = _qsat_np(tsurf[j, i], d["pvb"][nz, j, i])
            if soil_moisture:
                if forcing["land_mask"][j, i] > 0.5:
                    eff = min(max(soil[j, i] / soil_moist_cap, 0.0), 1.0)
                else:
                    eff = 1.0
            else:
                eff = forcing["evap_eff"][j, i]
            evap[j, i] = rho * drag_coef * wind * eff \
                * max(qsat_s - qv[nz - 1, j, i], 0.0)
            taux[j, i] = -rho * drag_coef * wind * u_c
            tauy[j, i] = -rho * drag_coef * wind * v_c

            cap = soil_heat_capacity if forcing["land_mask"][j, i] > 0.5 \
                else ocean_heat_capacity
            net = state["swflx_sfc"][j, i] + state["lwflx_sfc"][j, i] \
                - shflx[j, i] - c.L_V * evap[j, i]
            tsurf[j, i] = tsurf[j, i] + dt * net / cap

    for j in range(ny):
        for i in range(nx):
            m_sfc = colp[j, i] * grid.dsigma[nz - 1] / c.G
            pott[nz - 1, j, i] += dt * shflx[j, i] / (c.C_P * m_sfc) \
                / d["pvtf"][nz - 1, j, i]
            qv[nz - 1, j, i] += dt * evap[j, i] / m_sfc
            dp_w = colp[j, (i - 1) % nx] * grid.dsigma[nz - 1]
            dp_c = colp[j, i] * grid.dsigma[nz - 1]
            m_u = 0.5 * (dp_w + dp_c) / c.G
            u[nz - 1, j, i] += dt * 0.5 * (taux[j, (i - 1) % nx]
                                           + taux[j, i]) / m_u
            if j >= 1:
                dp_s = colp[j - 1, i] * grid.dsigma[nz - 1]
                m_v = 0.5 * (dp_s + dp_c) / c.G
                v[nz - 1, j, i] += dt * 0.5 * (tauy[j - 1, i]
                                               + tauy[j, i]) / m_v
    v[:, 0, :] = 0.0
    new.update(tsurf=tsurf, pott=pott, qv=qv, u=u, v=v)
    if soil_moisture:
        for j in range(ny):
            for i in range(nx):
                if forcing["land_mask"][j, i] > 0.5:
                    soil[j, i] = min(
                        max(soil[j, i] - dt * evap[j, i] / c.RHO_WATER, 0.0),
                        soil_moist_cap)
        new.update(soil_moist=soil)
    return new


def turbulence_np(state, grid, forcing, dt, k_scalar=1.0, k_momentum=1.0,
                  conv_diffusivity=0.0, conv_rh_crit=0.95):
    """Vertical K-diffusion of all prognostics in reconstructed height
    coordinates (reference ``turbulence.py``), one explicit column loop.
    ``conv_diffusivity`` > 0 enables the moist-convective mixing guard:
    interfaces whose two layers are near-saturated (RH > conv_rh_crit)
    with saturation-theta_e decreasing upward get the enhanced scalar K
    (spec of physics/turbulence.py::convective_k, transcribed as a loop)."""
    nz, ny, nx = state["pott"].shape
    colp = state["colp"]
    d = diagnose(colp, state["pott"], forcing["hsurf"], grid)
    new = dict(state)
    out = {f: state[f].copy() for f in ("pott", "qv", "qc", "u", "v")}

    def col_diffuse(x_col, kco, dzc, dzvb, rvb, rc):
        flux = np.zeros(nz + 1)           # borders; 0 at top and bottom
        for ks in range(1, nz):
            k_here = kco[ks - 1] if isinstance(kco, np.ndarray) else kco
            grad = (x_col[ks - 1] - x_col[ks]) / dzvb[ks - 1]
            flux[ks] = -k_here * rvb[ks - 1] * grad
        r = x_col.copy()
        for k in range(nz):
            r[k] += dt * (flux[k + 1] - flux[k]) / (rc[k] * dzc[k])
        return r

    # per-column geometry at cell centers
    geom = {}
    for j in range(ny):
        for i in range(nx):
            z_c = d["phi"][:, j, i] / c.G
            z_vb = d["phivb"][:, j, i] / c.G
            dz_c = z_vb[:-1] - z_vb[1:]
            dz_vb = z_c[:-1] - z_c[1:]
            tair = state["pott"][:, j, i] * d["pvtf"][:, j, i]
            rho_vb = np.empty(nz - 1)
            for ks in range(1, nz):
                tair_b = 0.5 * (tair[ks - 1] + tair[ks])
                rho_vb[ks - 1] = d["pvb"][ks, j, i] / (c.R_D * tair_b)
            rho_c = np.empty(nz)
            for k in range(nz):
                rho_c[k] = (d["pvb"][k + 1, j, i] - d["pvb"][k, j, i]) \
                    / (c.G * dz_c[k])
            geom[(j, i)] = (dz_c, dz_vb, rho_vb, rho_c)
            ks_col = k_scalar
            if conv_diffusivity > 0.0:
                ks_col = np.full(nz - 1, k_scalar)
                pott_col = state["pott"][:, j, i]
                qv_col = state["qv"][:, j, i]
                for ks in range(1, nz):
                    pair_u = 0.5 * (d["pvb"][ks - 1, j, i]
                                    + d["pvb"][ks, j, i])
                    pair_l = 0.5 * (d["pvb"][ks, j, i]
                                    + d["pvb"][ks + 1, j, i])
                    qs_u = _qsat_np(tair[ks - 1], pair_u)
                    qs_l = _qsat_np(tair[ks], pair_l)
                    rh_u = qv_col[ks - 1] / max(qs_u, 1e-10)
                    rh_l = qv_col[ks] / max(qs_l, 1e-10)
                    th_u = pott_col[ks - 1] * np.exp(
                        c.L_V * qs_u / (c.C_P * tair[ks - 1]))
                    th_l = pott_col[ks] * np.exp(
                        c.L_V * qs_l / (c.C_P * tair[ks]))
                    if min(rh_u, rh_l) > conv_rh_crit and th_u < th_l:
                        ks_col[ks - 1] = k_scalar + conv_diffusivity
            for f in ("pott", "qv", "qc"):
                out[f][:, j, i] = col_diffuse(
                    state[f][:, j, i], ks_col, dz_c, dz_vb, rho_vb, rho_c)

    # staggered-point geometry: averages of the neighboring centers
    for j in range(ny):
        for i in range(nx):
            gw = geom[(j, (i - 1) % nx)]
            gc = geom[(j, i)]
            avg = [0.5 * (a + b) for a, b in zip(gw, gc)]
            out["u"][:, j, i] = col_diffuse(state["u"][:, j, i], k_momentum,
                                            *avg)
            gs = geom[(max(j - 1, 0), i)]
            avg_v = [0.5 * (a + b) for a, b in zip(gs, gc)]
            out["v"][:, j, i] = col_diffuse(state["v"][:, j, i], k_momentum,
                                            *avg_v)
    out["v"][:, 0, :] = 0.0
    out["qv"] = np.maximum(out["qv"], 0.0)
    out["qc"] = np.maximum(out["qc"], 0.0)
    new.update(out)
    return new


def step_full_physics(state, dt, grid, forcing, cfg, t, step_idx):
    """One full model step with every parameterization on, composed exactly
    as model.make_step_fn: radiation cache refresh (on its interval, from
    the PRE-dynamics state) -> Matsuno dynamics with the cached POTT source
    -> surface -> turbulence -> microphysics."""
    p = cfg.physics
    soil_on = p.surface and p.soil_moisture
    if step_idx % max(p.rad_every_steps, 1) == 0:
        rad, sw, lw = radiation_np(state, grid, forcing, t,
                                   solar_constant=p.solar_constant,
                                   dynamic_albedo=p.dynamic_albedo,
                                   albedo_ice=p.albedo_ice)
        state = dict(state)
        state.update(dpottdt_rad=rad, swflx_sfc=sw, lwflx_sfc=lw)
    s = step_matsuno(state, dt, grid, forcing["hsurf"], moisture=True,
                     dpottdt_src=state["dpottdt_rad"])
    s = surface_np(s, grid, forcing, dt, drag_coef=p.drag_coef,
                   soil_heat_capacity=p.soil_heat_capacity,
                   ocean_heat_capacity=p.ocean_heat_capacity,
                   soil_moisture=soil_on,
                   soil_moist_cap=p.soil_moist_cap)
    s = turbulence_np(s, grid, forcing, dt, k_scalar=p.diff_coef_scalar,
                      k_momentum=p.diff_coef_momentum,
                      conv_diffusivity=(p.conv_diffusivity if p.convection
                                        else 0.0),
                      conv_rh_crit=p.conv_rh_crit)
    s = microphysics_step(s, grid, forcing["hsurf"], dt,
                          qc_autoconv_time=p.qc_autoconv_time,
                          qc_autoconv_threshold=p.qc_autoconv_threshold,
                          land_mask=forcing["land_mask"] if soil_on else None,
                          soil_moist_cap=p.soil_moist_cap)
    return s
