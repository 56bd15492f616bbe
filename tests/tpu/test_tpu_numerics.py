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
