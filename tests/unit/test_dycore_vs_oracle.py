"""jnp dycore operators vs the NumPy oracle (docs/NUMERICS.md spec).

SURVEY.md §4 unit strategy: per-operator golden tests on the real IC plus
randomized perturbations, fp64 on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from climate_model_tpu.core.grid import make_grid
from climate_model_tpu.core.init import initial_state_np
from climate_model_tpu.core.state import Forcing, State
from climate_model_tpu.dycore import operators as ops
from climate_model_tpu.dycore import oracle_numpy as oracle
from climate_model_tpu.dycore import tendencies as tnd


def _setup(cfg, seed=0, perturb=True):
    st, fo, grid_np = initial_state_np(cfg)
    if perturb:
        r = np.random.default_rng(seed)
        st["u"] = st["u"] + r.normal(0, 1.0, st["u"].shape)
        v = st["v"] + r.normal(0, 1.0, st["v"].shape)
        v[:, 0, :] = 0.0
        st["v"] = v
        st["pott"] = st["pott"] + r.normal(0, 1.0, st["pott"].shape)
        st["qv"] = np.abs(st["qv"] + r.normal(0, 1e-4, st["qv"].shape))
        st["qc"] = np.abs(r.normal(0, 1e-5, st["qc"].shape))
    grid = make_grid(cfg.grid, cfg.numerics, dtype=jnp.float64)
    return st, fo, grid_np, grid


def _jnp_state(st, fo, cfg):
    nz, ny, nx = cfg.grid.nz, cfg.grid.ny, cfg.grid.nx
    z3 = jnp.zeros((nz, ny, nx))
    z2 = jnp.zeros((ny, nx))
    state = State(
        u=jnp.asarray(st["u"]), v=jnp.asarray(st["v"]),
        colp=jnp.asarray(st["colp"]), pott=jnp.asarray(st["pott"]),
        qv=jnp.asarray(st["qv"]), qc=jnp.asarray(st["qc"]),
        tsurf=jnp.asarray(st["tsurf"]), rain=z2,
        soil_moist=jnp.asarray(st["soil_moist"]),
        dpottdt_rad=z3, swflx_sfc=z2, lwflx_sfc=z2,
        t=jnp.zeros(()), step=jnp.zeros((), jnp.int32))
    forcing = Forcing(hsurf=jnp.asarray(fo["hsurf"]),
                      land_mask=jnp.asarray(fo["land_mask"]),
                      albedo=jnp.asarray(fo["albedo"]),
                      evap_eff=jnp.asarray(fo["evap_eff"]))
    return state, forcing


def test_diagnostics_match(small_cfg):
    st, fo, grid_np, grid = _setup(small_cfg)
    d_np = oracle.diagnose(st["colp"], st["pott"], fo["hsurf"], grid_np)
    d_jx = ops.diagnose(jnp.asarray(st["colp"]), jnp.asarray(st["pott"]),
                        jnp.asarray(fo["hsurf"]), grid)
    for name in ("pvb", "pvtf", "pvtfvb", "phi", "phivb", "tair"):
        np.testing.assert_allclose(np.asarray(getattr(d_jx, name)), d_np[name],
                                   rtol=1e-12, atol=1e-9, err_msg=name)


def test_continuity_match(small_cfg):
    st, fo, grid_np, grid = _setup(small_cfg)
    dt = float(grid_np.dt)
    c_np = oracle.continuity(st["u"], st["v"], st["colp"], st["colp"], dt,
                             grid_np)
    c_jx = ops.continuity(jnp.asarray(st["u"]), jnp.asarray(st["v"]),
                          jnp.asarray(st["colp"]), jnp.asarray(st["colp"]),
                          dt, grid)
    for name in ("uflx", "vflx", "dcolpdt", "colp_new", "wwind"):
        np.testing.assert_allclose(np.asarray(getattr(c_jx, name)), c_np[name],
                                   rtol=1e-11, atol=1e-11, err_msg=name)


def test_full_tendencies_match(small_cfg):
    st, fo, grid_np, grid = _setup(small_cfg)
    state, forcing = _jnp_state(st, fo, small_cfg)
    dt = float(grid_np.dt)

    t_np = oracle.tendencies(st, st["colp"], dt, grid_np, fo["hsurf"])
    t_jx = tnd.tendencies(state, state.colp, dt, grid, forcing, small_cfg)
    for name in ("dcolpdt", "dpottdt", "dqvdt", "dqcdt", "dudt", "dvdt"):
        np.testing.assert_allclose(
            np.asarray(getattr(t_jx, name)), t_np[name],
            rtol=1e-10, atol=1e-8, err_msg=name)


def test_matsuno_step_match(small_cfg):
    st, fo, grid_np, grid = _setup(small_cfg)
    state, forcing = _jnp_state(st, fo, small_cfg)
    dt = float(grid_np.dt)

    from climate_model_tpu.dycore.stepper import step_matsuno
    s_np = dict(st)
    for _ in range(3):
        s_np = oracle.step_matsuno(s_np, dt, grid_np, fo["hsurf"])
    s_jx = state
    for _ in range(3):
        s_jx = step_matsuno(s_jx, grid, forcing, small_cfg)
    for name in ("u", "v", "colp", "pott", "qv", "qc"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_jx, name)), s_np[name],
            rtol=1e-9, atol=1e-8, err_msg=name)


def test_uniform_tracer_invariant(small_cfg):
    """NUMERICS.md conservation property: a horizontally/vertically uniform
    tracer is exactly invariant under flux-form advection."""
    st, fo, grid_np, grid = _setup(small_cfg)
    st["qv"] = np.full_like(st["qv"], 3.21e-3)
    state, forcing = _jnp_state(st, fo, small_cfg)
    from climate_model_tpu.dycore.stepper import step_matsuno
    out = step_matsuno(state, grid, forcing, small_cfg)
    np.testing.assert_allclose(np.asarray(out.qv), 3.21e-3, rtol=1e-12)


def test_mass_conservation(small_cfg):
    st, fo, grid_np, grid = _setup(small_cfg)
    state, forcing = _jnp_state(st, fo, small_cfg)
    from climate_model_tpu.dycore.stepper import step_matsuno
    area = np.asarray(grid.area)[:, None]
    m0 = float(np.sum(np.asarray(state.colp) * area))
    s = state
    for _ in range(5):
        s = step_matsuno(s, grid, forcing, small_cfg)
    m1 = float(np.sum(np.asarray(s.colp) * area))
    assert abs(m1 - m0) / m0 < 1e-13


def test_rest_state_stays_at_rest():
    """Isothermal atmosphere at rest over flat terrain: discrete PGF balance
    (NUMERICS.md conservation property #4)."""
    from climate_model_tpu.core.config import GridConfig, ModelConfig
    cfg = ModelConfig(grid=GridConfig(nx=16, ny=10, nz=4), dtype="float64")
    st, fo, grid_np = initial_state_np(cfg, kind="aquaplanet", u_jet=0.0,
                                       colp_pert=0.0)
    grid = make_grid(cfg.grid, cfg.numerics, dtype=jnp.float64)
    state, forcing = _jnp_state(st, fo, cfg)
    from climate_model_tpu.dycore.stepper import step_matsuno
    s = state
    for _ in range(3):
        s = step_matsuno(s, grid, forcing, cfg)
    assert float(jnp.max(jnp.abs(s.u))) < 1e-10
    assert float(jnp.max(jnp.abs(s.v))) < 1e-10
