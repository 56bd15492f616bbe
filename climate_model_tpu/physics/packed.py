"""Interval physics on the PACKED (lat, k, lon) supertensor layout.

Radiation is the only physics that runs OUTSIDE the fused kernel on the
packed scan path: surface/turbulence/microphysics are column-local and
cheap, so they run as the epilogue inside the fused corrector kernel
(kernels/fused_substep.py); radiation is expensive and runs on its interval
(reference ``i_rad_nth_hour`` / async-radiation capability, realized as a
branchless ``lax.cond`` on the step counter).

Same math as physics/radiation.py (which remains the numerical reference,
tested against the NumPy oracle), expressed on packed arrays so the state
never leaves the fused kernel's layout during a scan (kernels/packing.py).

Conventions: K is axis 1; 2-D fields are (NYP, 1, NXP). Dead pad
rows/columns may compute garbage — outputs are masked with the validity
mask so garbage cannot become NaN in the cached heating fields.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import constants as c
from ..core.config import ModelConfig
from ..kernels.fused_substep import K2, radf_k
from ..kernels.packing import PackedAux, PackedState
from .radiation import gray_radiation_core, solar_forcing


def packed_pressure(colp, vert, ptop: float):
    """(pvb, pvtf) on packed layout: colp (NYP,1,NXP) -> (NYP, nz+1|nz, NXP).
    ``vert`` is the kernel's per-level geometry operand (1, nz+1, NVERT) —
    general sigma borders, incl. stretched grids."""
    sig_vb = vert[:, :, 0:1]
    pvb = ptop + sig_vb * colp
    pvtfvb = (pvb / c.P_REF) ** c.KAPPA
    pvtf = (pvb[:, 1:] * pvtfvb[:, 1:] - pvb[:, :-1] * pvtfvb[:, :-1]) \
        / ((1.0 + c.KAPPA) * (pvb[:, 1:] - pvb[:, :-1]))
    return pvb, pvtf, pvtfvb


def compute_radiation_packed(ps: PackedState, aux: PackedAux,
                             cfg: ModelConfig, nz):
    """Gray SW+LW on packed layout: wraps the SHARED
    ``radiation.gray_radiation_core`` + ``radiation.solar_forcing`` (k on
    axis 1) — one implementation of the column math and of the solar
    geometry / ice-albedo math for both layouts."""
    colp, pott, qv, qc = ps.colp, ps.pott, ps.qv, ps.qc
    _, pvtf, _ = packed_pressure(colp, aux.vert, cfg.grid.ptop)
    tair = pott * pvtf
    dsig = aux.vert[:, :nz, 1:2]                      # per-level (1, nz, 1)
    dp = colp * dsig
    mass = dp / c.G

    toa_dn, inv_mu, albedo = solar_forcing(ps.t, aux.lat, aux.lon, ps.tsurf,
                                           aux.albedo, cfg)
    b_sfc = c.SIGMA_SB * ps.tsurf ** 4

    # NB round-4 postmortem: through round 3 the shared core used log-depth
    # associative_scan/cumprod sweeps, and their TPU lowering along THIS
    # layout's k axis was numerically wrong at the 0.25-deg shape (~1e-3
    # relative flux errors at the scan tree-merge levels -> a spurious
    # -66 K/day bottom-layer cooling). The core now runs sequential
    # lax.scan sweeps with one exact evaluation order on every layout
    # (physics/radiation.py gray_radiation_core docstring); a pure
    # swapaxes-to-k-major wrapper here was measured NOT to help (XLA
    # cancels layout-only transposes and reproduces the same lowering).
    heat, swflx_sfc, lwflx_sfc, _, _ = gray_radiation_core(
        1, nz, mass, dp, tair, qv, qc, b_sfc, albedo, toa_dn, inv_mu)
    dpottdt_rad = heat / pvtf

    m = aux.valid
    return (dpottdt_rad * m, swflx_sfc * m, lwflx_sfc * m)


def radiation_step_packed(ps: PackedState, aux: PackedAux, cfg: ModelConfig,
                          nz) -> PackedState:
    def do(s):
        rad, sw, lw = compute_radiation_packed(s, aux, cfg, nz)
        nyp, _, nxp = rad.shape
        parts = [sw, lw, jnp.zeros((nyp, K2 - 2, nxp), rad.dtype), rad]
        tail = radf_k(nz) - K2 - nz
        if tail:
            parts.append(jnp.zeros((nyp, tail, nxp), rad.dtype))
        return s.replace(radf=jnp.concatenate(parts, axis=1))

    every = max(cfg.physics.rad_every_steps, 1)
    return jax.lax.cond(ps.step % every == 0, do, lambda s: s, ps)
