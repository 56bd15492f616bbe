"""Turbulent vertical diffusion (K-closure).

TPU-native rebuild of the reference ``turbulence.py`` / ``turb_main.py``
(SURVEY.md §2.1 [C]: vertical turbulent mixing of momentum, heat and moisture
between levels; surface-layer exchange handled by the surface model;
explicit scheme [P]).

Column-local: flux-form diffusion in height coordinates reconstructed from
the hydrostatic geopotential, explicit in time (K dt / dz^2 << 1 for
K ~ O(1-10) m2/s and dz ~ O(500 m) at the model's dt).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import constants as c
from ..core.config import ModelConfig
from ..core.grid import Grid
from ..core.state import Forcing, State
from ..dycore import boundaries as bc
from ..dycore import operators as ops


def convective_k(state: State, pvb, pvtf, cfg: ModelConfig):
    """Per-interface diffusivity enhancement of the moist-convective
    mixing guard (round-4 stretch, VERDICT r3 next #7): where a column is
    near-saturated AND moist-unstable (saturation equivalent potential
    temperature theta_e* decreasing with height), vertical heat/moisture
    mixing is raised to ``conv_diffusivity`` so the instability is
    released by a column adjustment instead of building a grid-point
    storm (the model has no convection parameterization otherwise — same
    as the reference). Returns the ADDITIVE K at the nz-1 interior
    interfaces. Explicitly stable: K dt / dz^2 ~ 100 * 34 / 500^2 ~ 0.01.
    """
    from .thermo import qsat_water

    p = cfg.physics
    tair = state.pott * pvtf
    pair = 0.5 * (pvb[:-1] + pvb[1:])
    qs = qsat_water(tair, pair)
    rh = state.qv / jnp.maximum(qs, 1e-10)
    # conditional-instability criterion on the SATURATED adiabat:
    # theta_e* = theta * exp(L qsat / (cp T)) decreasing upward
    theta_es = state.pott * jnp.exp(c.L_V * qs / (c.C_P * tair))
    near_sat = jnp.minimum(rh[:-1], rh[1:]) > p.conv_rh_crit
    unstable = theta_es[:-1] < theta_es[1:]          # axis 0: k=0 is top
    return jnp.where(near_sat & unstable, p.conv_diffusivity, 0.0)


def turbulence_step(state: State, grid: Grid, forcing: Forcing,
                    cfg: ModelConfig, dt, press=None) -> State:
    p = cfg.physics
    pvb, pvtf, pvtfvb = press if press is not None \
        else ops.diagnose_pressure(state.colp, grid)
    phi, phivb = ops.diagnose_geopotential(state.pott, pvtf, pvtfvb,
                                           forcing.hsurf)
    tair = state.pott * pvtf
    z_c = phi / c.G                              # layer-center heights
    z_vb = phivb / c.G
    dz_c = z_vb[:-1] - z_vb[1:]                  # layer thickness (>0)
    dz_vb = z_c[:-1] - z_c[1:]                   # center-to-center (>0)

    pair_vb = pvb[1:-1]
    tair_vb = 0.5 * (tair[:-1] + tair[1:])
    rho_vb = pair_vb / (c.R_D * tair_vb)
    rho_c = (pvb[1:] - pvb[:-1]) / (c.G * dz_c)

    def diffuse(x, k_coef, dzc, dzvb, rvb, rc):
        # Upward(+z)-positive diffusive flux at interior borders:
        #   F[ks] = -K rho_vb dx/dz = -K rho_vb (x[ks-1]-x[ks])/dz_vb
        # layer k tendency: dx/dt = (F[k+1]-F[k]) / (rho_c dz_c)
        # (top/bottom F = 0; the surface-flux boundary is the surface model's).
        grad = (x[:-1] - x[1:]) / dzvb
        flux = -k_coef * rvb * grad
        zero = jnp.zeros_like(flux[:1])
        flux = jnp.concatenate([zero, flux, zero], axis=0)
        return x + dt * (flux[1:] - flux[:-1]) / (rc * dzc)

    # scalar K; + per-interface moist-convective enhancement when enabled
    # (heat and moisture only — momentum keeps the base K, as in shallow
    # adjustment schemes)
    k_scalar = p.diff_coef_scalar
    if p.convection:
        k_scalar = k_scalar + convective_k(state, pvb, pvtf, cfg)
    pott = diffuse(state.pott, k_scalar, dz_c, dz_vb, rho_vb, rho_c)
    qv = diffuse(state.qv, k_scalar, dz_c, dz_vb, rho_vb, rho_c)
    qc = diffuse(state.qc, k_scalar, dz_c, dz_vb, rho_vb, rho_c)

    # Momentum: reuse column geometry averaged to the staggered points.
    dz_c_u = 0.5 * (bc.west(dz_c) + dz_c)
    dz_vb_u = 0.5 * (bc.west(dz_vb) + dz_vb)
    rvb_u = 0.5 * (bc.west(rho_vb) + rho_vb)
    rc_u = 0.5 * (bc.west(rho_c) + rho_c)
    u = diffuse(state.u, p.diff_coef_momentum, dz_c_u, dz_vb_u, rvb_u, rc_u)

    dz_c_v = 0.5 * (bc.south_clamp(dz_c) + dz_c)
    dz_vb_v = 0.5 * (bc.south_clamp(dz_vb) + dz_vb)
    rvb_v = 0.5 * (bc.south_clamp(rho_vb) + rho_vb)
    rc_v = 0.5 * (bc.south_clamp(rho_c) + rho_c)
    v = bc.enforce_v_walls(
        diffuse(state.v, p.diff_coef_momentum, dz_c_v, dz_vb_v, rvb_v, rc_v))

    return state.replace(u=u, v=v, pott=pott,
                         qv=jnp.maximum(qv, 0.0), qc=jnp.maximum(qc, 0.0))
