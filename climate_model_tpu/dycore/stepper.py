"""Time integration: Matsuno predictor-corrector, Euler, RK4; scan driver.

TPU-native rebuild of the reference ``matsuno.py`` + ``RK4.py`` (SURVEY.md
§2.1 [C]). Design departure (SURVEY.md §7.1): fixed dt from the CFL bound at
init, whole-run stepping inside ``lax.scan`` chunks with no per-step host
sync; physics are composed around the dynamics step in model.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.grid import Grid
from ..core.state import Forcing, State
from . import boundaries as bc
from .tendencies import proceed, tendencies


def step_matsuno(state: State, grid: Grid, forcing: Forcing,
                 cfg: ModelConfig) -> State:
    """Matsuno (Euler-backward) predictor-corrector (reference
    ``step_matsuno`` [P]): predictor = Euler estimate with tendencies at t_n;
    corrector re-evaluates tendencies at the predicted state and advances
    from the ORIGINAL t_n state."""
    dt = grid.dt
    moist = cfg.numerics.moisture_tendency
    t1 = tendencies(state, state.colp, dt, grid, forcing, cfg)
    pred = proceed(state, t1, dt, moisture=moist)
    t2 = tendencies(pred, state.colp, dt, grid, forcing, cfg)
    return proceed(state, t2, dt, moisture=moist)


def step_euler(state: State, grid: Grid, forcing: Forcing,
               cfg: ModelConfig) -> State:
    dt = grid.dt
    t1 = tendencies(state, state.colp, dt, grid, forcing, cfg)
    return proceed(state, t1, dt, moisture=cfg.numerics.moisture_tendency)


def step_rk4(state: State, grid: Grid, forcing: Forcing,
             cfg: ModelConfig) -> State:
    """Classical RK4 on the conserved variables
    y = (COLP, COLP_u*u, COLP_v*v, COLP*POTT, COLP*QV, COLP*QC)
    (reference ``RK4.py`` [C]; the reference's mass-weighted update is exactly
    d(COLP*X)/dt integration, so RK4 composes linearly in y)."""
    dt = grid.dt
    moist = cfg.numerics.moisture_tendency

    def to_conserved(s: State):
        cu = 0.5 * (bc.west(s.colp) + s.colp)[None]
        cv = 0.5 * (bc.south_clamp(s.colp) + s.colp)[None]
        return (s.colp, cu * s.u, cv * s.v, s.colp[None] * s.pott,
                s.colp[None] * s.qv, s.colp[None] * s.qc)

    def from_conserved(y, template: State) -> State:
        colp, U, V, P, Qv, Qc = y
        cu = 0.5 * (bc.west(colp) + colp)[None]
        cv = 0.5 * (bc.south_clamp(colp) + colp)[None]
        s = template.replace(
            colp=colp, u=U / cu, v=bc.enforce_v_walls(V / cv),
            pott=P / colp[None])
        if moist:
            s = s.replace(qv=jnp.maximum(Qv / colp[None], 0.0),
                          qc=jnp.maximum(Qc / colp[None], 0.0))
        return s

    def f(y):
        s = from_conserved(y, state)
        t = tendencies(s, s.colp, dt, grid, forcing, cfg)
        return (t.dcolpdt, t.dudt, t.dvdt, t.dpottdt, t.dqvdt, t.dqcdt)

    y0 = to_conserved(state)
    axpy = lambda a, ydot: tuple(yi + a * di for yi, di in zip(y0, ydot))
    k1 = f(y0)
    k2 = f(axpy(0.5 * dt, k1))
    k3 = f(axpy(0.5 * dt, k2))
    k4 = f(axpy(dt, k3))
    y1 = tuple(
        yi + (dt / 6.0) * (a + 2.0 * b + 2.0 * c_ + d)
        for yi, a, b, c_, d in zip(y0, k1, k2, k3, k4)
    )
    return from_conserved(y1, state)


_STEPPERS = {"matsuno": step_matsuno, "euler": step_euler, "rk4": step_rk4}


def _fused_matsuno_step_fn(cfg: ModelConfig):
    """Matsuno stepper on the fused Pallas substep kernel
    (kernels/fused_substep.py): pack the state into the kernel's
    (lat, k, lon) lane-padded layout once, run predictor + corrector as ONE
    kernel launch each chained in packed space, unpack once; physics
    sources/splits stay jnp around it."""
    from ..core.grid import make_grid
    from ..kernels.fused_substep import (GEO_FIELDS, make_fused_substep_packed,
                                        make_vert, pack_aux2, pack_geo,
                                        pack_prog, pack_radf,
                                        pick_block_rows, unpack_prog)

    gc, num = cfg.grid, cfg.numerics
    grid_np = make_grid(gc, num, np_mode=True)
    nz, ny, nx = gc.nz, gc.ny, gc.nx
    itemsize = jnp.dtype(cfg.dtype).itemsize
    # corrector (same_base=False) has the larger footprint; use one bj for both
    bj = pick_block_rows(nz, ny, nx, same_base=False,
                         with_rad=cfg.physics.radiation, itemsize=itemsize)
    kw = dict(dy=float(grid_np.dy), ptop=gc.ptop,
              with_rad=cfg.physics.radiation,
              with_diff=bool(num.diff_uv or num.diff_pott or num.diff_moist),
              dtype=jnp.dtype(cfg.dtype),
              # Mosaic compiles on TPU only; CPU (tests/virtual devices)
              # runs the same kernel through the pallas interpreter.
              interpret=jax.default_backend() == "cpu")
    pred_k = make_fused_substep_packed(nz, ny, nx, bj=bj, same_base=True, **kw)
    corr_k = make_fused_substep_packed(nz, ny, nx, bj=bj, same_base=False, **kw)
    with_rad = cfg.physics.radiation

    def step(state: State, grid: Grid, forcing: Forcing) -> State:
        geo_p = pack_geo(jnp.stack([getattr(grid, f) for f in GEO_FIELDS],
                                   axis=1), bj)
        vert = make_vert(grid.sigma_vb, grid.dsigma, jnp.dtype(cfg.dtype))
        z2 = jnp.zeros_like(state.colp)
        aux2 = pack_aux2(forcing.hsurf, z2, z2, z2, bj)
        rad_p = ((pack_radf(z2, z2, state.dpottdt_rad, bj),)
                 if with_rad else ())
        base = pack_prog(state.u, state.v, state.pott, state.qv, state.qc,
                         state.colp, state.tsurf, state.rain,
                         state.soil_moist, bj)
        p = pred_k(base, *rad_p, aux2, geo_p, vert, grid.dt)
        out = corr_k(p, base, *rad_p, aux2, geo_p, vert, grid.dt)
        u, v, pott, qv, qc, colp = unpack_prog(out, nz, ny, nx)[:6]
        return state.replace(u=u, v=v, pott=pott, qv=qv, qc=qc, colp=colp)

    return step


def dynamics_step_fn(cfg: ModelConfig):
    """Select the dynamics stepper for ``cfg`` (reference namelist
    ``i_time_stepping`` [C]; ``cfg.backend`` replaces the reference's
    ``i_comp_mode`` CPU/CUDA switch) with the static config bound:
    returns ``step(state, grid, forcing) -> state``."""
    ts = cfg.numerics.time_stepping
    if cfg.backend == "pallas":
        if ts != "matsuno":
            raise ValueError("backend='pallas' supports matsuno only")
        if not (cfg.numerics.wind_tendency and cfg.numerics.colp_tendency
                and cfg.numerics.temperature_tendency
                and cfg.numerics.moisture_tendency):
            raise ValueError("backend='pallas' requires all tendencies on "
                             "(per-term switches are a jnp-backend debug "
                             "feature)")
        return _fused_matsuno_step_fn(cfg)
    try:
        raw = _STEPPERS[ts]
    except KeyError:
        raise ValueError(
            f"unknown time_stepping {ts!r}; "
            f"choose from {sorted(_STEPPERS)}") from None

    def step(state: State, grid: Grid, forcing: Forcing) -> State:
        return raw(state, grid, forcing, cfg)

    return step


def run_scan(step_fn, state: State, grid: Grid, forcing: Forcing,
             n_steps: int) -> State:
    """Run ``n_steps`` of ``step_fn`` under ``lax.scan`` (hot loop #0 of the
    reference driver, SURVEY.md §3.1, without per-step host sync)."""
    def body(s, _):
        return step_fn(s, grid, forcing), None

    final, _ = jax.lax.scan(body, state, None, length=n_steps)
    return final
