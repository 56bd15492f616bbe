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
                      qc_autoconv_threshold=5e-4):
    from ..physics.thermo import qsat_water

    d = diagnose(state["colp"], state["pott"], hsurf, grid)
    nz = grid.nz
    new = dict(state)
    pott = state["pott"].copy()
    qv = state["qv"].copy()
    qc = state["qc"].copy()
    rain = state["rain"].copy()
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
        rain += to_rain * state["colp"] * grid.dsigma[k] / c.G
    new.update(pott=pott, qv=np.maximum(qv, 0.0), qc=np.maximum(qc, 0.0),
               rain=rain)
    return new


def step_moist(state, dt, grid, hsurf, **mp_kw):
    """One full moist step: Matsuno dynamics + microphysics split
    (mirrors model.make_step_fn with microphysics only)."""
    s = step_matsuno(state, dt, grid, hsurf, moisture=True)
    return microphysics_step(s, grid, hsurf, dt, **mp_kw)
