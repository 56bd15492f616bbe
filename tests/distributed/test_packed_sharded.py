"""Packed fused-kernel path x shard_map: sharded == unsharded.

The fused Pallas substep kernels compose with the ('lat','lon') mesh via
shard-local packed supertensors + ppermute ghost refresh
(dist/packed_halo.py). The sharded run must reproduce the single-device
packed run (which is itself oracle-tested via the jnp operators).

Tolerance note (see dist/packed_halo.py): shard COUNT never changes the
answer (bitwise — asserted below); sharded-vs-unsharded is bitwise for
lat-only meshes up to XLA program-level FMA/fusion ulps, and lon-sharded
runs (the wrap_lon=False kernel variant, a distinct program) agree with
the single-device run to ~1 ulp/step.
"""

import jax
import numpy as np
import pytest

from climate_model_tpu.core.config import GridConfig, ModelConfig, PhysicsConfig
from climate_model_tpu.core.init import initialize
from climate_model_tpu.dist.mesh import make_mesh
from climate_model_tpu.dist.packed_halo import make_packed_sharded_runner
from climate_model_tpu.dist.sharding import shard_inputs
from climate_model_tpu.model import make_chunk_runner

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

N_STEPS = 4
FIELDS = ("u", "v", "colp", "pott", "qv", "qc", "tsurf", "rain",
          "soil_moist", "dpottdt_rad", "swflx_sfc", "lwflx_sfc")


def _cfg(physics=True):
    phys = PhysicsConfig(microphysics=physics, radiation=physics,
                         surface=physics, turbulence=physics,
                         rad_every_steps=2)
    return ModelConfig(grid=GridConfig(nx=32, ny=16, nz=8), physics=phys,
                       dtype="float64", backend="pallas")


@pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 2), (4, 2)])
@pytest.mark.parametrize("physics", [False, True])
def test_packed_sharded_matches_single_device(mesh_shape, physics):
    cfg = _cfg(physics)
    state, forcing, grid = initialize(cfg)
    ref = jax.block_until_ready(
        make_chunk_runner(cfg, N_STEPS)(state, grid, forcing))

    mesh = make_mesh(mesh_lat=mesh_shape[0], mesh_lon=mesh_shape[1])
    run = make_packed_sharded_runner(cfg, mesh, grid, n_steps=N_STEPS)
    s, g, f = shard_inputs(mesh, state, grid, forcing)
    out = jax.block_until_ready(run(s, g, f))
    for name in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=1e-13, err_msg=f"{name} mesh={mesh_shape}")
    assert int(out.step) == N_STEPS


@pytest.mark.parametrize("mesh_a,mesh_b", [((2, 1), (4, 1)),
                                           ((2, 2), (4, 2)),
                                           ((2, 2), (1, 4))])
def test_shard_count_invariance_bitwise(mesh_a, mesh_b):
    """Changing the shard count must not change the answer AT ALL: HALO=3/
    GX=3 cover the physics epilogue's full halo stencil chains, so every
    mesh running the same kernel-variant family is bitwise identical."""
    cfg = _cfg(True)
    state, forcing, grid = initialize(cfg)
    outs = []
    for ml, mlon in (mesh_a, mesh_b):
        mesh = make_mesh(mesh_lat=ml, mesh_lon=mlon)
        run = make_packed_sharded_runner(cfg, mesh, grid, n_steps=N_STEPS)
        s, g, f = shard_inputs(mesh, state, grid, forcing)
        outs.append(jax.block_until_ready(run(s, g, f)))
    for name in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(outs[0], name)),
            np.asarray(getattr(outs[1], name)),
            err_msg=f"{name} {mesh_a} vs {mesh_b}")


def _overlap_cfg(cfg, mesh_lat, mesh_lon):
    import dataclasses
    return cfg.replace(sharding=dataclasses.replace(
        cfg.sharding, mesh_lat=mesh_lat, mesh_lon=mesh_lon,
        mode="shard_map", halo_overlap=True))


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4)])
@pytest.mark.parametrize("physics", [False, True])
def test_packed_sharded_overlap_matches_single_device(mesh_shape, physics):
    """halo_overlap=True (main kernel on stale lat ghosts + seam-strip
    kernels over the fresh ppermuted rows) must reproduce the single-device
    run exactly like the blocking schedule does."""
    cfg = _overlap_cfg(_cfg(physics), *mesh_shape)
    state, forcing, grid = initialize(cfg)
    ref = jax.block_until_ready(
        make_chunk_runner(cfg, N_STEPS)(state, grid, forcing))

    mesh = make_mesh(mesh_lat=mesh_shape[0], mesh_lon=mesh_shape[1])
    run = make_packed_sharded_runner(cfg, mesh, grid, n_steps=N_STEPS)
    s, g, f = shard_inputs(mesh, state, grid, forcing)
    out = jax.block_until_ready(run(s, g, f))
    for name in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=1e-13, err_msg=f"{name} mesh={mesh_shape}")
    assert int(out.step) == N_STEPS


def test_overlap_matches_blocking_schedule():
    """Overlapped vs blocking schedule on the same mesh. Not bitwise: the
    seam-strip kernels are distinct compiled programs from the main kernel,
    so XLA FMA/fusion choices differ at the ulp level per substep
    (dist/packed_halo.py numerical note), amplified a few decades by 4
    steps of advection."""
    cfg = _cfg(True)
    state, forcing, grid = initialize(cfg)
    mesh = make_mesh(mesh_lat=2, mesh_lon=2)
    s, g, f = shard_inputs(mesh, state, grid, forcing)
    out_b = jax.block_until_ready(
        make_packed_sharded_runner(cfg, mesh, grid, n_steps=N_STEPS)(s, g, f))
    cfg_o = _overlap_cfg(cfg, 2, 2)
    out_o = jax.block_until_ready(
        make_packed_sharded_runner(cfg_o, mesh, grid,
                                   n_steps=N_STEPS)(s, g, f))
    for name in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(out_o, name)), np.asarray(getattr(out_b, name)),
            rtol=1e-12, atol=1e-13, err_msg=name)


def test_overlap_refuses_thin_shards():
    cfg = _overlap_cfg(_cfg(False), 4, 2)      # ny_l = 4 < NY_S + NY_N
    state, forcing, grid = initialize(cfg)
    mesh = make_mesh(mesh_lat=4, mesh_lon=2)
    with pytest.raises(ValueError, match="halo_overlap"):
        make_packed_sharded_runner(cfg, mesh, grid, n_steps=1)


def test_packed_sharded_stretched_sigma():
    """Stretched (non-uniform) sigma x shard_map: the per-level VERT operand
    must reach every shard's kernels unchanged (it is replicated, not
    sharded) — sharded == unsharded on a 2x2 mesh."""
    import dataclasses

    cfg = _cfg(physics=True)
    cfg = cfg.replace(grid=dataclasses.replace(cfg.grid, sigma_stretch=1.3))
    state, forcing, grid = initialize(cfg)
    ref = jax.block_until_ready(
        make_chunk_runner(cfg, N_STEPS)(state, grid, forcing))

    mesh = make_mesh(mesh_lat=2, mesh_lon=2)
    run = make_packed_sharded_runner(cfg, mesh, grid, n_steps=N_STEPS)
    s, g, f = shard_inputs(mesh, state, grid, forcing)
    out = jax.block_until_ready(run(s, g, f))
    for name in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=1e-13, err_msg=name)
