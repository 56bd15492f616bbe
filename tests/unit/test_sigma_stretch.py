"""Stretched (non-uniform) sigma spacing: first-class on the jnp backend,
loud refusal on the fused-kernel (pallas) fast path (VERDICT r1 gap #6;
SURVEY.md §2.1 row 3: sigma_vb/dsigma arrays are first-class grid data)."""

import dataclasses

import jax
import numpy as np
import pytest

from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           NumericsConfig)
from climate_model_tpu.core.grid import make_grid
from climate_model_tpu.core.init import initialize
from climate_model_tpu.dycore import oracle_numpy as oracle
from climate_model_tpu.dycore.stepper import dynamics_step_fn, run_scan


def _cfg(stretch):
    return ModelConfig(
        grid=GridConfig(nx=32, ny=16, nz=8, sigma_stretch=stretch),
        dtype="float64", numerics=NumericsConfig())


def test_stretched_grid_arrays():
    g = make_grid(_cfg(1.6).grid, np_mode=True)
    assert np.isclose(g.sigma_vb[0], 0.0) and np.isclose(g.sigma_vb[-1], 1.0)
    d = np.diff(g.sigma_vb)
    assert (d > 0).all() and d[0] < d[-1]          # thin layers at the top
    assert np.isclose(d.sum(), 1.0)


def test_stretched_jnp_matches_oracle():
    """The jnp operators consume grid.dsigma/sigma_vb generally — a
    stretched grid must track the NumPy oracle exactly like a uniform one."""
    from .test_dycore_vs_oracle import _jnp_state, _setup

    cfg = _cfg(1.6)
    st, fo, grid_np, grid = _setup(cfg)
    state, forcing = _jnp_state(st, fo, cfg)
    step = dynamics_step_fn(cfg)
    dt = float(grid_np.dt)

    s_np = dict(st)
    for _ in range(5):
        s_np = oracle.step_matsuno(s_np, dt, grid_np, fo["hsurf"])
        state = step(state, grid, forcing)
    for name in ("u", "v", "colp", "pott", "qv", "qc"):
        np.testing.assert_allclose(
            np.asarray(getattr(state, name)), s_np[name],
            rtol=1e-10, atol=1e-11, err_msg=name)


def test_stretched_runs_bounded():
    cfg = _cfg(1.6)
    state, forcing, grid = initialize(cfg)
    step = dynamics_step_fn(cfg)
    out = jax.block_until_ready(
        jax.jit(lambda s: run_scan(step, s, grid, forcing, 50))(state))
    assert float(abs(out.u).max()) < 100.0
    assert np.isfinite(np.asarray(out.pott)).all()


def test_pallas_refuses_stretched_sigma():
    cfg = _cfg(1.6).replace(backend="pallas")
    with pytest.raises(NotImplementedError, match="uniform sigma"):
        dynamics_step_fn(cfg)
