"""Radiation / surface / turbulence vs their independent NumPy oracles.

Closes VERDICT r1 gap #4: the three parameterizations previously had only
property tests + packed/jnp self-consistency; a shared sign/units bug would
have passed. The oracles (dycore/oracle_numpy.py) are independent
per-column-loop transcriptions of the same reference physics
(SURVEY.md §2.1 rows 16-18, §4 unit strategy).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           PhysicsConfig)
from climate_model_tpu.dycore import oracle_numpy as oracle
from climate_model_tpu.physics.radiation import compute_radiation
from climate_model_tpu.physics.surface import surface_step
from climate_model_tpu.physics.turbulence import turbulence_step

from .test_dycore_vs_oracle import _jnp_state, _setup


def _cfg(**phys):
    return ModelConfig(grid=GridConfig(nx=32, ny=16, nz=8), dtype="float64",
                       physics=PhysicsConfig(**phys))


def _forcing_np(fo):
    return {k: np.asarray(v) for k, v in fo.items()}


def test_radiation_matches_oracle():
    cfg = _cfg(radiation=True)
    st, fo, grid_np, grid = _setup(cfg)
    state, forcing = _jnp_state(st, fo, cfg)
    # mid-afternoon mid-season time so SW, zenith angle and LW all engage
    t = 86400.0 * 37.0 + 13.5 * 3600.0
    st = dict(st)
    # freeze the northern rows so the ice/snow albedo branch is exercised
    tsurf = np.asarray(st["tsurf"]).copy()
    tsurf[-4:] -= 30.0
    st["tsurf"] = tsurf
    assert (tsurf < 273.15).any() and (tsurf >= 273.15).any()
    state = state.replace(t=jnp.asarray(t), tsurf=jnp.asarray(tsurf))

    out = compute_radiation(state, grid, forcing, cfg)
    p = cfg.physics
    rad_o, sw_o, lw_o = oracle.radiation_np(
        st, grid_np, _forcing_np(fo), t,
        solar_constant=p.solar_constant,
        dynamic_albedo=p.dynamic_albedo, albedo_ice=p.albedo_ice)

    np.testing.assert_allclose(np.asarray(out.dpottdt_rad), rad_o,
                               rtol=1e-10, atol=1e-16, err_msg="dpottdt_rad")
    np.testing.assert_allclose(np.asarray(out.swflx_sfc), sw_o,
                               rtol=1e-10, atol=1e-10, err_msg="swflx_sfc")
    np.testing.assert_allclose(np.asarray(out.lwflx_sfc), lw_o,
                               rtol=1e-10, atol=1e-10, err_msg="lwflx_sfc")
    # physical sanity the oracle agrees on: daytime SW positive somewhere,
    # net LW cools the surface under a clear dry-ish sky (on the unfrozen
    # rows; the artificially frozen north rows emit less than they receive)
    assert sw_o.max() > 100.0
    assert lw_o[:-4].mean() < 0.0


def test_surface_matches_oracle():
    cfg = _cfg(surface=True)
    st, fo, grid_np, grid = _setup(cfg)
    state, forcing = _jnp_state(st, fo, cfg)
    # non-zero radiative cache so the TSURF energy budget has all terms
    r = np.random.default_rng(3)
    sw = np.abs(r.normal(200.0, 50.0, st["colp"].shape))
    lw = r.normal(-80.0, 20.0, st["colp"].shape)
    state = state.replace(swflx_sfc=jnp.asarray(sw), lwflx_sfc=jnp.asarray(lw))
    st = dict(st)
    st.update(swflx_sfc=sw, lwflx_sfc=lw)
    dt = float(grid_np.dt)

    out = surface_step(state, grid, forcing, cfg, dt)
    p = cfg.physics
    ref = oracle.surface_np(st, grid_np, _forcing_np(fo), dt,
                            drag_coef=p.drag_coef,
                            soil_heat_capacity=p.soil_heat_capacity,
                            ocean_heat_capacity=p.ocean_heat_capacity,
                            soil_moisture=p.soil_moisture,
                            soil_moist_cap=p.soil_moist_cap)
    for name in ("tsurf", "pott", "qv", "u", "v", "soil_moist"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)), ref[name],
                                   rtol=1e-11, atol=1e-13, err_msg=name)


def test_turbulence_matches_oracle():
    cfg = _cfg(turbulence=True)
    st, fo, grid_np, grid = _setup(cfg)
    state, forcing = _jnp_state(st, fo, cfg)
    dt = float(grid_np.dt)

    out = turbulence_step(state, grid, forcing, cfg, dt)
    p = cfg.physics
    ref = oracle.turbulence_np(st, grid_np, _forcing_np(fo), dt,
                               k_scalar=p.diff_coef_scalar,
                               k_momentum=p.diff_coef_momentum)
    for name in ("pott", "qv", "qc", "u", "v"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)), ref[name],
                                   rtol=1e-11, atol=1e-14, err_msg=name)


def test_full_physics_matches_oracle():
    """Multi-step full-physics gate: the composed jnp model step
    (model.make_step_fn: radiation interval -> dynamics -> surface ->
    turbulence -> microphysics) tracks the oracle composition allclose in
    fp64 — kills the 'self-consistent but wrong' failure mode for the whole
    physics suite at once."""
    from climate_model_tpu.model import make_step_fn

    cfg = _cfg(radiation=True, surface=True, turbulence=True,
               microphysics=True, rad_every_steps=3)
    st, fo, grid_np, grid = _setup(cfg)
    state, forcing = _jnp_state(st, fo, cfg)
    st = dict(st)
    st.update(rain=np.zeros_like(st["colp"]),
              dpottdt_rad=np.zeros_like(st["pott"]),
              swflx_sfc=np.zeros_like(st["colp"]),
              lwflx_sfc=np.zeros_like(st["colp"]))
    fo_np = _forcing_np(fo)
    dt = float(grid_np.dt)

    step = make_step_fn(cfg)
    n_steps = 12
    for n in range(n_steps):
        st = oracle.step_full_physics(st, dt, grid_np, fo_np, cfg,
                                      t=n * dt, step_idx=n)
        state = step(state, grid, forcing)

    for name in ("u", "v", "colp", "pott", "qv", "qc", "tsurf", "rain",
                 "soil_moist"):
        np.testing.assert_allclose(
            np.asarray(getattr(state, name)), st[name],
            rtol=1e-8, atol=1e-11, err_msg=name)
    assert np.isfinite(st["pott"]).all()
