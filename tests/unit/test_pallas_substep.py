"""Fused Pallas substep kernel vs the jnp operators (interpret mode, fp64).

SURVEY.md §7.2 step 7: every Pallas kernel is interchangeable with its jnp
reference form and is unit-tested against it (the jnp forms are themselves
oracle-tested, so equality here closes the chain to docs/NUMERICS.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate_model_tpu.core.config import GridConfig, ModelConfig, NumericsConfig
from climate_model_tpu.core.grid import make_grid
from climate_model_tpu.core.init import initial_state_np
from climate_model_tpu.dycore.tendencies import proceed, tendencies
from climate_model_tpu.kernels.fused_substep import GEO_FIELDS, make_fused_substep

from .test_dycore_vs_oracle import _jnp_state


def _geo(grid):
    return jnp.stack([getattr(grid, f) for f in GEO_FIELDS], axis=1)


def _setup(nx=32, ny=16, nz=8, seed=0):
    cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, nz=nz), dtype="float64",
                      numerics=NumericsConfig())
    st, fo, grid_np = initial_state_np(cfg)
    r = np.random.default_rng(seed)
    st["u"] += r.normal(0, 1.0, st["u"].shape)
    v = st["v"] + r.normal(0, 1.0, st["v"].shape)
    v[:, 0, :] = 0.0
    st["v"] = v
    st["pott"] += r.normal(0, 1.0, st["pott"].shape)
    st["qv"] = np.abs(st["qv"])
    grid = make_grid(cfg.grid, cfg.numerics, dtype=jnp.float64)
    state, forcing = _jnp_state(st, fo, cfg)
    return cfg, state, forcing, grid, grid_np


@pytest.mark.parametrize("bj", [4, 8])
def test_predictor_matches_jnp(bj):
    cfg, state, forcing, grid, grid_np = _setup()
    dt = float(grid_np.dt)
    t1 = tendencies(state, state.colp, dt, grid, forcing, cfg)
    ref = proceed(state, t1, dt)

    sub = make_fused_substep(
        grid.nz, grid.ny, grid.nx, bj=bj, same_base=True,
        dt=dt, dy=float(grid_np.dy), ptop=grid.ptop, with_rad=False,
        dtype=jnp.float64, interpret=True)
    u, v, pott, qv, qc, colp = sub(state.u, state.v, state.pott, state.qv,
                                   state.qc, state.colp, forcing.hsurf,
                                   _geo(grid))
    for name, got in [("u", u), ("v", v), ("pott", pott), ("qv", qv),
                      ("qc", qc), ("colp", colp)]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(getattr(ref, name)),
            rtol=1e-11, atol=1e-11, err_msg=f"{name} bj={bj}")


def test_runtime_dt_same_program():
    """dt is a RUNTIME SMEM operand of the fused kernel (round 3): the SAME
    cached kernel program (lru_cache key excludes dt) must serve different
    timestep values — the adaptive-dt contract on backend='pallas'."""
    cfg, state, forcing, grid, grid_np = _setup()
    dt0 = float(grid_np.dt)
    kw = dict(dy=float(grid_np.dy), ptop=grid.ptop, with_rad=False,
              dtype=jnp.float64, interpret=True)
    geo = _geo(grid)
    for dt in (dt0, 0.37 * dt0):     # second call hits the cached program
        t1 = tendencies(state, state.colp, dt, grid, forcing, cfg)
        ref = proceed(state, t1, dt)
        sub = make_fused_substep(grid.nz, grid.ny, grid.nx, bj=8,
                                 same_base=True, dt=dt, **kw)
        out = sub(state.u, state.v, state.pott, state.qv, state.qc,
                  state.colp, forcing.hsurf, geo)
        for name, got in zip(("u", "v", "pott", "qv", "qc", "colp"), out):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(getattr(ref, name)),
                rtol=1e-11, atol=1e-11, err_msg=f"{name} dt={dt}")


def test_corrector_matches_jnp():
    cfg, state, forcing, grid, grid_np = _setup()
    dt = float(grid_np.dt)
    # jnp Matsuno step
    t1 = tendencies(state, state.colp, dt, grid, forcing, cfg)
    pred = proceed(state, t1, dt)
    t2 = tendencies(pred, state.colp, dt, grid, forcing, cfg)
    ref = proceed(state, t2, dt)

    kw = dict(dt=dt, dy=float(grid_np.dy), ptop=grid.ptop, with_rad=False,
              dtype=jnp.float64, interpret=True)
    sub_p = make_fused_substep(grid.nz, grid.ny, grid.nx, bj=8,
                               same_base=True, **kw)
    sub_c = make_fused_substep(grid.nz, grid.ny, grid.nx, bj=8,
                               same_base=False, **kw)
    geo = _geo(grid)
    p = sub_p(state.u, state.v, state.pott, state.qv, state.qc, state.colp,
              forcing.hsurf, geo)
    out = sub_c(p[0], p[1], p[2], p[3], p[4], p[5], forcing.hsurf, geo,
                state.u, state.v, state.pott, state.qv, state.qc, state.colp)
    for name, got in zip(("u", "v", "pott", "qv", "qc", "colp"), out):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(getattr(ref, name)),
            rtol=1e-10, atol=1e-10, err_msg=name)


def test_with_radiation_source_and_diffusion():
    cfg, state, forcing, grid, grid_np = _setup()
    cfg = cfg.replace(
        physics=cfg.physics.__class__(radiation=True),
        numerics=cfg.numerics.__class__(diff_uv=5e4, diff_pott=5e4,
                                        diff_moist=2e4))
    # rebuild the grid so its kdiff_* geo columns (the kernel's coefficient
    # source) carry the new coefficients
    grid = make_grid(cfg.grid, cfg.numerics, dtype=jnp.float64)
    rad = jnp.asarray(
        np.random.default_rng(1).normal(0, 1e-5, state.pott.shape))
    state = state.replace(dpottdt_rad=rad)
    dt = float(grid_np.dt)
    t1 = tendencies(state, state.colp, dt, grid, forcing, cfg)
    ref = proceed(state, t1, dt)

    sub = make_fused_substep(
        grid.nz, grid.ny, grid.nx, bj=8, same_base=True,
        dt=dt, dy=float(grid_np.dy), ptop=grid.ptop, with_rad=True,
        with_diff=True,
        dtype=jnp.float64, interpret=True)
    out = sub(state.u, state.v, state.pott, state.qv, state.qc, state.colp,
              forcing.hsurf, _geo(grid), rad)
    for name, got in zip(("u", "v", "pott", "qv", "qc", "colp"), out):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(getattr(ref, name)),
            rtol=1e-10, atol=1e-10, err_msg=name)


def test_backend_pallas_full_step_matches_jnp():
    """cfg.backend='pallas' end-to-end (dynamics_step_fn dispatch) over
    several Matsuno steps equals the jnp backend."""
    from climate_model_tpu.dycore.stepper import dynamics_step_fn

    cfg, state, forcing, grid, grid_np = _setup()
    step_jnp = dynamics_step_fn(cfg)
    step_pal = dynamics_step_fn(cfg.replace(backend="pallas"))
    a, b = state, state
    for _ in range(3):
        a = step_jnp(a, grid, forcing)
        b = step_pal(b, grid, forcing)
    for name in ("u", "v", "colp", "pott", "qv", "qc"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, name)), np.asarray(getattr(a, name)),
            rtol=1e-10, atol=1e-10, err_msg=name)


def test_packed_full_model_matches_std(monkeypatch):
    """Packed-state scan (fused kernels + packed physics; the
    CLIMATE_TPU_PACKED_SCAN=1 path) vs the standard jnp full model, all
    physics on."""
    monkeypatch.setenv("CLIMATE_TPU_PACKED_SCAN", "1")
    from climate_model_tpu.core.config import PhysicsConfig
    from climate_model_tpu.core.init import initialize
    from climate_model_tpu.model import make_chunk_runner, make_step_fn

    cfg = ModelConfig(
        grid=GridConfig(nx=32, ny=16, nz=8), dtype="float64",
        physics=PhysicsConfig(microphysics=True, radiation=True,
                              surface=True, turbulence=True,
                              rad_every_steps=2))
    state, forcing, grid = initialize(cfg)

    ref = state
    step = make_step_fn(cfg)
    for _ in range(4):
        ref = step(ref, grid, forcing)

    run = make_chunk_runner(cfg.replace(backend="pallas"), 4)
    out = run(state, grid, forcing)
    for name in ("u", "v", "colp", "pott", "qv", "qc", "tsurf", "rain",
                 "dpottdt_rad", "swflx_sfc", "lwflx_sfc"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-9, atol=1e-10, err_msg=name)
    assert int(out.step) == 4


def test_packed_scan_chunk_boundaries(monkeypatch):
    """Two 2-step packed-scan chunks (pack/unpack round-trip between them)
    equal one 4-step chunk: the chunk boundary is bit-transparent."""
    monkeypatch.setenv("CLIMATE_TPU_PACKED_SCAN", "1")
    from climate_model_tpu.core.config import PhysicsConfig
    from climate_model_tpu.core.init import initialize
    from climate_model_tpu.model import make_chunk_runner

    cfg = ModelConfig(
        grid=GridConfig(nx=32, ny=16, nz=8), dtype="float64",
        backend="pallas",
        physics=PhysicsConfig(microphysics=True, radiation=True,
                              surface=True, turbulence=True,
                              rad_every_steps=2))
    state, forcing, grid = initialize(cfg)
    run2 = make_chunk_runner(cfg, 2)
    run4 = make_chunk_runner(cfg, 4)
    a = run2(run2(state, grid, forcing), grid, forcing)
    b = run4(state, grid, forcing)
    for name in ("u", "v", "colp", "pott", "qv", "qc", "tsurf", "rain"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name)
