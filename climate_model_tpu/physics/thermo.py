"""Moist-thermodynamics helpers (Magnus saturation formula).

Used by microphysics, the surface model, and initial conditions. Written
against a pluggable array module ``xp`` (jnp for the model, np for the
oracle/initial conditions) so both paths share one formula.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import constants as c


def esat_water(tair, xp=jnp):
    """Saturation vapor pressure over water [Pa], Magnus formula."""
    t_c = tair - c.T_ZERO_C
    return c.MAGNUS_E0 * xp.exp(c.MAGNUS_A * t_c / (t_c + c.MAGNUS_B))


def qsat_water(tair, pair, xp=jnp):
    """Saturation mixing ratio [kg/kg] at temperature ``tair`` and pressure
    ``pair``: q_sat = eps * e_sat / (p - (1 - eps) * e_sat)."""
    es = esat_water(tair, xp)
    return c.EPS_V * es / xp.maximum(pair - (1.0 - c.EPS_V) * es, 1.0)
