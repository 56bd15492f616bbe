"""Sharded == unsharded equivalence on 8 virtual CPU devices.

SURVEY.md §4 'Distributed without a cluster': both distribution modes —
GSPMD auto-partitioned jit and explicit shard_map+ppermute halos — must
reproduce the single-device run (fp64, tolerance ~roundoff: collective
reduction order may differ).
"""

import jax
import numpy as np
import pytest

from climate_model_tpu.core.config import GridConfig, ModelConfig, PhysicsConfig
from climate_model_tpu.core.init import initialize
from climate_model_tpu.dist.halo import make_sharded_step_fn
from climate_model_tpu.dist.mesh import make_mesh
from climate_model_tpu.dist.sharding import shard_inputs
from climate_model_tpu.dycore.stepper import run_scan
from climate_model_tpu.model import make_step_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

N_STEPS = 5
PROGS = ("u", "v", "colp", "pott", "qv", "qc")


def _cfg(physics=False):
    phys = PhysicsConfig(microphysics=physics, radiation=physics,
                         surface=physics, turbulence=physics,
                         rad_every_steps=2)
    return ModelConfig(grid=GridConfig(nx=32, ny=16, nz=4), physics=phys,
                       dtype="float64")


def _reference_run(cfg):
    state, forcing, grid = initialize(cfg)
    step = make_step_fn(cfg)
    ref = jax.jit(lambda s: run_scan(step, s, grid, forcing, N_STEPS))(state)
    return state, forcing, grid, jax.block_until_ready(ref)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
@pytest.mark.parametrize("physics", [False, True])
def test_shard_map_matches_single_device(mesh_shape, physics):
    cfg = _cfg(physics)
    state, forcing, grid, ref = _reference_run(cfg)
    mesh = make_mesh(mesh_lat=mesh_shape[0], mesh_lon=mesh_shape[1])
    run = make_sharded_step_fn(cfg, mesh, grid, n_steps=N_STEPS)
    s, g, f = shard_inputs(mesh, state, grid, forcing)
    out = jax.block_until_ready(run(s, g, f))
    for name in PROGS:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-10, atol=1e-10, err_msg=f"{name} mesh={mesh_shape}")


@pytest.mark.parametrize("physics", [False, True])
def test_gspmd_auto_matches_single_device(physics):
    cfg = _cfg(physics)
    state, forcing, grid, ref = _reference_run(cfg)
    mesh = make_mesh(mesh_lat=2, mesh_lon=4)
    s, g, f = shard_inputs(mesh, state, grid, forcing)
    step = make_step_fn(cfg)
    run = jax.jit(lambda s_, g_, f_: run_scan(step, s_, g_, f_, N_STEPS))
    out = jax.block_until_ready(run(s, g, f))
    for name in PROGS:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-10, atol=1e-10, err_msg=name)
