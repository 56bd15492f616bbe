"""Numerical validation of the Euler / Matsuno / RK4 steppers by observed
temporal convergence order (VERDICT r1 gap #5; SURVEY.md §2.1 rows 14-15).

Dry core on a smooth IC, fixed horizon T integrated with dt, dt/2 (dt/4),
error measured against a much-finer-dt RK4 reference. Observed order
p = log2(err(dt)/err(dt/2)) must match the scheme: ~1 for Euler-forward,
~1 for Matsuno (the Euler-backward approximation is first-order, with a
smaller error constant), ~4 for classical RK4.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           NumericsConfig)
from climate_model_tpu.core.grid import make_grid
from climate_model_tpu.core.init import initialize
from climate_model_tpu.dycore.stepper import dynamics_step_fn, run_scan


def _run(cfg_base, stepper: str, dt: float, n_steps: int):
    cfg = cfg_base.replace(numerics=dataclasses.replace(
        cfg_base.numerics, time_stepping=stepper, dt=dt))
    state, forcing, grid = initialize(cfg)
    step = dynamics_step_fn(cfg)
    out = jax.jit(lambda s: run_scan(step, s, grid, forcing, n_steps))(state)
    return jax.block_until_ready(out)


def _err(a, b):
    tot = 0.0
    for name in ("u", "v", "colp", "pott"):
        x = np.asarray(getattr(a, name), np.float64)
        y = np.asarray(getattr(b, name), np.float64)
        tot += float(np.mean((x - y) ** 2) / (np.mean(y ** 2) + 1.0))
    return np.sqrt(tot)


@pytest.fixture(scope="module")
def conv_setup():
    cfg = ModelConfig(grid=GridConfig(nx=32, ny=16, nz=4), dtype="float64",
                      numerics=NumericsConfig(moisture_tendency=False))
    grid_np = make_grid(cfg.grid, cfg.numerics, np_mode=True)
    dt0 = float(grid_np.dt)          # CFL-stable base step
    n0 = 8                           # horizon T = 8 * dt0
    ref = _run(cfg, "rk4", dt0 / 16.0, n0 * 16)
    return cfg, dt0, n0, ref


def _orders(conv_setup, stepper, levels=3):
    cfg, dt0, n0, ref = conv_setup
    errs = [
        _err(_run(cfg, stepper, dt0 / 2 ** l, n0 * 2 ** l), ref)
        for l in range(levels)
    ]
    return [np.log2(errs[i] / errs[i + 1]) for i in range(levels - 1)], errs


def test_euler_first_order(conv_setup):
    orders, errs = _orders(conv_setup, "euler")
    assert errs[0] > errs[-1] > 0.0
    assert 0.7 < orders[-1] < 1.4, (orders, errs)


def test_matsuno_first_order(conv_setup):
    # Matsuno (Euler-backward predictor-corrector) is formally FIRST-order
    # accurate (it approximates implicit Euler; only Heun's average is 2nd
    # order) — but with a smaller error constant than forward Euler.
    orders, errs = _orders(conv_setup, "matsuno")
    assert errs[0] > errs[-1] > 0.0
    assert 0.7 < orders[-1] < 1.6, (orders, errs)


def test_rk4_fourth_order(conv_setup):
    orders, errs = _orders(conv_setup, "rk4", levels=2)
    # one halving is enough: err must drop ~16x (allow >= 3.5 observed order
    # before the fp64 floor of the reference intrudes)
    assert errs[0] > errs[-1] > 0.0
    assert orders[-1] > 3.5, (orders, errs)
