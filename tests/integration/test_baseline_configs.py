"""BASELINE.md milestone gates #1 and #2 (CPU, fp64, vs the NumPy oracle).

Gate #1: dry hydrostatic core, 64x32x8, 100 explicit steps, allclose.
Gate #2: moist core + simple moisture physics, 500 steps, allclose (run at a
reduced grid so the looped-NumPy oracle finishes in CI time; the discrete
operators are shape-polymorphic, so the equivalence transfers).
"""

import jax
import numpy as np
import pytest

from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           NumericsConfig, PhysicsConfig)
from climate_model_tpu.core.grid import make_grid
from climate_model_tpu.core.init import initial_state_np
from climate_model_tpu.dycore import oracle_numpy as oracle
from climate_model_tpu.dycore.stepper import run_scan
from climate_model_tpu.model import make_step_fn

from ..unit.test_dycore_vs_oracle import _jnp_state


def test_config1_dry_100steps_allclose():
    """Milestone #1: dry core 64x32x8, 100 steps, allclose (u,v,COLP,POTT)."""
    cfg = ModelConfig(
        grid=GridConfig(nx=64, ny=32, nz=8),
        numerics=NumericsConfig(moisture_tendency=False),
        dtype="float64",
    )
    st, fo, grid_np = initial_state_np(cfg)
    grid = make_grid(cfg.grid, cfg.numerics, dtype=np.float64)
    state, forcing = _jnp_state(st, fo, cfg)
    step = make_step_fn(cfg)
    run = jax.jit(lambda s: run_scan(step, s, grid, forcing, 100))
    out = jax.block_until_ready(run(state))

    s_np = dict(st)
    dt = float(grid_np.dt)
    for _ in range(100):
        s_np = oracle.step_matsuno(s_np, dt, grid_np, fo["hsurf"],
                                   moisture=False)
    for name in ("u", "v", "colp", "pott"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), s_np[name],
            rtol=1e-8, atol=1e-8, err_msg=name)
    assert float(np.abs(np.asarray(out.u)).max()) < 60.0


@pytest.mark.slow
def test_config2_moist_500steps_allclose():
    """Milestone #2 structure: moist core + microphysics, 500 steps."""
    cfg = ModelConfig(
        grid=GridConfig(nx=32, ny=16, nz=8),
        physics=PhysicsConfig(microphysics=True),
        numerics=NumericsConfig(),
        dtype="float64",
    )
    st, fo, grid_np = initial_state_np(cfg)
    st["qv"] *= 2.0     # push columns toward saturation so physics engages
    grid = make_grid(cfg.grid, cfg.numerics, dtype=np.float64)
    state, forcing = _jnp_state(st, fo, cfg)
    step = make_step_fn(cfg)
    run = jax.jit(lambda s: run_scan(step, s, grid, forcing, 500))
    out = jax.block_until_ready(run(state))

    s_np = dict(st)
    dt = float(grid_np.dt)
    for _ in range(500):
        s_np = oracle.step_moist(s_np, dt, grid_np, fo["hsurf"])
    assert float(np.max(s_np["rain"])) > 0.0, "test vacuous: no rain fell"
    for name in ("u", "v", "colp", "pott", "qv", "qc", "rain"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), s_np[name],
            rtol=1e-7, atol=1e-9, err_msg=name)


@pytest.mark.slow
def test_fp32_long_run_stable():
    """SURVEY.md §4 property: no NaN / no blow-up over a long fp32 run with
    full physics (the production precision)."""
    import jax.numpy as jnp

    from climate_model_tpu.core.init import initialize
    from climate_model_tpu.io.metrics import diagnostics

    cfg = ModelConfig(
        grid=GridConfig(nx=48, ny=24, nz=8),
        physics=PhysicsConfig(microphysics=True, radiation=True,
                              surface=True, turbulence=True,
                              rad_every_steps=4),
        numerics=NumericsConfig(diff_uv=1e4, diff_pott=1e4, diff_moist=1e4),
        dtype="float32",
    )
    state, forcing, grid = initialize(cfg)
    step = make_step_fn(cfg)
    run = jax.jit(lambda s: run_scan(step, s, grid, forcing, 100))
    for _ in range(5):     # 500 steps total
        state = jax.block_until_ready(run(state))
        d = diagnostics(state, grid)
        assert not bool(d.nan_flag)
        assert float(d.max_wind) < 150.0
    area = np.asarray(grid.area)[:, None]
    colp = np.asarray(state.colp)
    assert 80000.0 < colp.mean() < 100000.0
