"""TPU-only numerics regression gates (opt-in: CLIMATE_TPU_RUN_TPU=1).

These run on the REAL TPU backend (the default test suite pins CPU via
conftest), guarding against backend-lowering numerics bugs that CPU tests
structurally cannot catch. Motivating incident (round 4, docs/STATUS.md):
the packed-layout radiation's log-depth cumulative sweeps lowered to
numerically wrong TPU code at the 0.25-deg production shape only —
~1e-3-relative flux errors at the scan tree-merge levels that refrigerated
the boundary layer at -6 K/day — while every CPU test (and the 1-deg
shape) was clean. The fix made the shared core's sweeps sequential
``lax.scan``s; this gate pins packed == standard ON DEVICE at the exact
shape that broke.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CLIMATE_TPU_RUN_TPU") != "1",
    reason="real-TPU numerics gates are opt-in (CLIMATE_TPU_RUN_TPU=1; "
           "needs the TPU backend + ~10 min incl. device transfers)")


FIELDS_ABS_TOL = {
    # Pinned fp32 program-level bounds for packed-pallas vs jnp after the
    # gate's step counts, measured on v5e (round 5) with 5-10x headroom:
    # #3/110 steps: u 2.3e-3, v 2.7e-3, colp 0.13 Pa, pott 9.8e-4 K,
    # qv 2e-7, dpottdt_rad 1.7e-8 K/s, lwflx 1.9e-3 W/m2; #5/12 steps is
    # smaller across the board. The round-4 radiation miscompile produced
    # 7.6e-4 K/s heating errors — 3,000x the dpottdt_rad bound here, so a
    # recurrence at either shape fails this gate in minutes instead of
    # needing a climate autopsy.
    "u": 0.02, "v": 0.02, "colp": 1.0, "pott": 0.01,
    "qv": 2e-6, "qc": 2e-6, "tsurf": 0.01, "rain": 1e-5,
    "soil_moist": 1e-7, "dpottdt_rad": 2e-7, "swflx_sfc": 0.05,
    "lwflx_sfc": 0.05,
}


def _device_max_diffs(a, b):
    """Per-field max|a-b| computed ON DEVICE (a 0.25-deg field is 132 MB;
    the axon tunnel moves device->host at ~1.9 MB/s, so fetching fields to
    compare on the host takes minutes each — fetch only scalars)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def diffs(x, y):
        return {nm: jnp.max(jnp.abs(getattr(x, nm) - getattr(y, nm)))
                for nm in FIELDS_ABS_TOL}

    return {k: float(v) for k, v in jax.device_get(diffs(a, b)).items()}


@pytest.mark.parametrize("baseline,n_steps,rad_every", [(3, 110, None),
                                                        (5, 12, 4)])
def test_full_model_packed_matches_jnp_on_device(baseline, n_steps,
                                                 rad_every):
    """VERDICT r4 next #1: the full fused step (dynamics + physics
    epilogue + interval-cached radiation) packed-pallas vs jnp ON THE REAL
    TPU at both production shapes. The round-4 miscompile proved CPU
    equality tests are structurally blind to TPU lowering bugs; this gate
    pins the whole model, not just radiation. #3 runs the EXACT production
    program (hourly cadence = 105 steps; 110 steps span a mid-run
    radiation refresh); #5 keeps the production shapes with a 4-step
    cadence so 12 steps span three refreshes."""
    import dataclasses

    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("needs a real accelerator backend")

    from climate_model_tpu.core.config import baseline_config
    from climate_model_tpu.core.init import initialize
    from climate_model_tpu.model import make_chunk_runner

    cfg = baseline_config(baseline)
    cfg = cfg.replace(sharding=dataclasses.replace(cfg.sharding,
                                                   mesh_lat=1, mesh_lon=1))
    if rad_every is not None:
        cfg = cfg.replace(physics=dataclasses.replace(
            cfg.physics, rad_every_steps=rad_every, rad_every_hours=0.0))
    assert n_steps > cfg.physics.rad_every_steps
    state, forcing, grid = initialize(cfg)
    out_p = jax.block_until_ready(
        jax.jit(make_chunk_runner(cfg, n_steps))(state, grid, forcing))
    out_j = jax.block_until_ready(
        jax.jit(make_chunk_runner(cfg.replace(backend="jnp"), n_steps))(
            state, grid, forcing))
    diffs = _device_max_diffs(out_p, out_j)
    for name, tol in FIELDS_ABS_TOL.items():
        assert diffs[name] < tol, (name, diffs[name], tol)


def test_sharded_packed_matches_unsharded_on_device():
    """The sharded kernel VARIANT (wall_mask=True + wrap_lon=False + ghost
    refresh collectives) on the real chip: a 1x1 shard_map mesh runs the
    same program a pod shard runs, against the unsharded packed path at
    the #3 production shape. First run pays a one-time Mosaic compile of
    the variant (~10-15 min); cached afterwards."""
    import dataclasses

    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("needs a real accelerator backend")

    from climate_model_tpu.core.config import baseline_config
    from climate_model_tpu.core.init import initialize
    from climate_model_tpu.dist.mesh import make_mesh
    from climate_model_tpu.dist.packed_halo import make_packed_sharded_runner
    from climate_model_tpu.dist.sharding import shard_inputs
    from climate_model_tpu.model import make_chunk_runner

    n_steps = 8
    cfg = baseline_config(3)
    cfg = cfg.replace(sharding=dataclasses.replace(
        cfg.sharding, mesh_lat=1, mesh_lon=1, mode="shard_map"))
    state, forcing, grid = initialize(cfg)
    ref = jax.block_until_ready(
        jax.jit(make_chunk_runner(cfg, n_steps))(state, grid, forcing))
    mesh = make_mesh(cfg)
    s, g, f = shard_inputs(mesh, state, grid, forcing)
    run = make_packed_sharded_runner(cfg, mesh, grid, n_steps=n_steps)
    out = jax.block_until_ready(run(s, g, f))
    diffs = _device_max_diffs(out, ref)
    # same math, different program (wall-mask operand, ghost-refresh
    # permutes): fp32 program-level differences only
    for name in FIELDS_ABS_TOL:
        assert diffs[name] < FIELDS_ABS_TOL[name], (name, diffs[name])


@pytest.mark.parametrize("baseline", [3, 5])
def test_packed_radiation_matches_standard_on_device(baseline):
    import dataclasses

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        pytest.skip("needs a real accelerator backend")

    from climate_model_tpu.core.config import baseline_config
    from climate_model_tpu.core.init import initialize
    from climate_model_tpu.kernels.fused_substep import (GX, HALO,
                                                         pick_block_rows)
    from climate_model_tpu.kernels.packing import pack_aux, pack_full
    from climate_model_tpu.physics.packed import compute_radiation_packed
    from climate_model_tpu.physics.radiation import compute_radiation

    cfg = baseline_config(baseline)
    cfg = cfg.replace(sharding=dataclasses.replace(cfg.sharding,
                                                   mesh_lat=1, mesh_lon=1))
    state, forcing, grid = initialize(cfg)
    gc = cfg.grid
    out = jax.block_until_ready(jax.jit(
        lambda s, g, f: compute_radiation(s, g, f, cfg))(state, grid,
                                                         forcing))
    bj = pick_block_rows(gc.nz, gc.ny, gc.nx, same_base=False, with_rad=True,
                         itemsize=4, with_phys=True)
    aux = pack_aux(forcing, grid, bj, jnp.float32)
    ps = pack_full(state, bj)
    rad_p, sw_p, lw_p = jax.block_until_ready(jax.jit(
        lambda a, b: compute_radiation_packed(a, b, cfg, gc.nz))(ps, aux))
    rows, lanes = slice(HALO, HALO + gc.ny), slice(GX, GX + gc.nx)
    np.testing.assert_allclose(
        np.asarray(rad_p)[rows, :, lanes].transpose(1, 0, 2),
        np.asarray(out.dpottdt_rad), rtol=0, atol=1e-7,
        err_msg="dpottdt_rad packed vs standard on device")
    np.testing.assert_allclose(
        np.asarray(sw_p)[rows, 0, lanes], np.asarray(out.swflx_sfc),
        rtol=0, atol=1e-3, err_msg="swflx_sfc")
    np.testing.assert_allclose(
        np.asarray(lw_p)[rows, 0, lanes], np.asarray(out.lwflx_sfc),
        rtol=0, atol=1e-3, err_msg="lwflx_sfc")
