"""Microphysics: saturation adjustment + autoconversion to surface rain.

TPU-native rebuild of the reference ``microphysics.py`` / ``mic_main.py``
(SURVEY.md §2.1 [C]: Magnus saturation vapor pressure, condensation QV->QC
with latent heating of POTT, evaporation QC->QV, conversion of QC to
accumulated surface RAIN, QV/QC >= 0 clipping).

Operator-split: applied as a column-local update after the dynamics step
(pure elementwise — XLA fuses it; no Pallas needed). The latent-heating
increment is reported via the returned state's POTT directly (the reference's
``dPOTTdt_MIC`` increment field [P] exists only transiently here).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import constants as c
from ..core.config import ModelConfig
from ..core.grid import Grid
from ..core.state import State
from ..dycore import operators as ops
from .thermo import qsat_water


def saturation_adjustment(pott, qv, qc, pvtf, pair, dt, cfg: ModelConfig):
    """One implicit-ish saturation adjustment step. Returns
    (pott, qv, qc, rain_flux_column_integrand)."""
    tair = pott * pvtf
    qsat = qsat_water(tair, pair)
    # Single Newton step with latent-heat feedback:
    #   dq = (qv - qsat) / (1 + L^2 qsat / (cp Rv T^2))
    gamma = 1.0 + (c.L_V ** 2) * qsat / (c.C_P * c.R_V * tair ** 2)
    dq = (qv - qsat) / gamma
    cond = jnp.maximum(dq, 0.0)                 # condensation qv -> qc
    evap = jnp.minimum(qc, jnp.maximum(-dq, 0.0))  # evaporation qc -> qv
    dqc = cond - evap
    qv = qv - dqc
    qc = qc + dqc
    pott = pott + (c.L_V / c.C_P) * dqc / pvtf  # latent heating of theta

    # Autoconversion: cloud water above threshold rains out with timescale tau.
    p = cfg.physics
    frac = 1.0 - jnp.exp(-dt / p.qc_autoconv_time)
    to_rain = jnp.maximum(qc - p.qc_autoconv_threshold, 0.0) * frac
    qc = qc - to_rain
    return pott, qv, qc, to_rain


def microphysics_step(state: State, grid: Grid, forcing, cfg: ModelConfig,
                      dt, press=None) -> State:
    pvb, pvtf, _ = press if press is not None \
        else ops.diagnose_pressure(state.colp, grid)
    pair = 0.5 * (pvb[:-1] + pvb[1:])
    pott, qv, qc, to_rain = saturation_adjustment(
        state.pott, state.qv, state.qc, pvtf, pair, dt, cfg)
    # Rain accumulates as column-integrated removed water: sum_k q * dp/g [kg m-2]
    dp = state.colp[None] * grid.dsigma[:, None, None]
    rain_inc = jnp.sum(to_rain * dp, axis=0) / c.G
    rain = state.rain + rain_inc

    # Soil hydrology: rain refills the land bucket up to field capacity
    # (excess runs off; reference soil moisture budget [P]).
    p = cfg.physics
    soil_moist = state.soil_moist
    if p.surface and p.soil_moisture:
        wetted = jnp.minimum(soil_moist + rain_inc / c.RHO_WATER,
                             p.soil_moist_cap)
        soil_moist = jnp.where(forcing.land_mask > 0.5, wetted, soil_moist)
    return state.replace(pott=pott, qv=jnp.maximum(qv, 0.0),
                         qc=jnp.maximum(qc, 0.0), rain=rain,
                         soil_moist=soil_moist)
