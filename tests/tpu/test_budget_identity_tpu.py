"""Budget identities at PRODUCTION resolution on the real TPU (opt-in:
CLIMATE_TPU_RUN_TPU=1; VERDICT r4 next #4 asked for the water identity at a
#3 chunk on device).

The fp64 CPU gate (tests/integration/test_budget_identity.py) proves the
identities are exact in exact-ish arithmetic; this gate proves they SURVIVE
the fp32 production dtype and the TPU lowering at the 360x180x32 shape —
the round-4 radiation miscompile showed shape-specific TPU lowerings can
corrupt math that is exact everywhere else.

fp32 noise floor, measured: the global water total W ~ 7e15 kg is an fp32
tree-reduction over 2.1M cells, so each W evaluation carries ~1e-7*W ~ 7e8
kg of roundoff, while the per-step surface increment is ~1.5e11 kg — the
identity can only be asserted to ~1% per step but to ~1e-7 of W, and
averaging over the chunk tightens the increment-relative bound ~10x.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CLIMATE_TPU_RUN_TPU") != "1",
    reason="real-TPU budget gate is opt-in (CLIMATE_TPU_RUN_TPU=1)")


def test_water_identity_production_shape():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("needs a real accelerator backend")

    from climate_model_tpu.bench.budget import make_budget_scan
    from climate_model_tpu.core.config import baseline_config
    from climate_model_tpu.core.init import initialize

    import dataclasses
    cfg = baseline_config(3).replace(backend="jnp")
    cfg = cfg.replace(sharding=dataclasses.replace(cfg.sharding,
                                                   mesh_lat=1, mesh_lon=1))
    n_steps = 120    # > one hourly radiation interval (105 steps at 1 deg)
    assert n_steps > cfg.physics.rad_every_steps
    state, forcing, grid = initialize(cfg)
    run = jax.jit(make_budget_scan(cfg, n_steps))
    out, rec = jax.block_until_ready(run(state, grid, forcing))
    rec = {k: np.asarray(v, np.float64) for k, v in rec.items()}
    W = rec["w_total"][-1]
    evap = rec["w_srf_expect"]
    assert np.isfinite(W) and evap.min() > 0

    # surface identity per step: exact up to the fp32 reduction noise of
    # the two W evaluations it differences (~1e-7 * W each)
    resid = np.abs(rec["w_srf"] - evap)
    assert resid.max() < 1e-6 * W, (resid.max(), W)
    # chunk-integrated: the noise averages down; the identity holds to
    # ~0.5% of the accumulated evaporation
    assert abs((rec["w_srf"] - evap).sum()) < 5e-3 * evap.sum()
    # total leak (clip + diffusion non-conservation + turbulence roundoff)
    # over the chunk: under 2% of evaporation at production resolution
    leak = rec["w_dyn"] + rec["w_trb"] + rec["w_mic"]
    assert abs(leak.sum()) < 0.02 * evap.sum(), (leak.sum(), evap.sum())

    # energy: surface identity + microphysics exactness survive fp32/TPU
    E = rec["e_total"][-1]
    e_resid = np.abs(rec["e_srf"] - rec["e_srf_expect"])
    assert e_resid.max() < 1e-6 * E
    assert np.max(np.abs(rec["e_mic"])) < 1e-6 * E
