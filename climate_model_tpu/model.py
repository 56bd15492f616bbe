"""Full model step: dynamics + operator-split physics + time bookkeeping.

TPU-native rebuild of the reference driver loop in ``solver.py`` (SURVEY.md
§3.1 hot loop #0: dt -> dynamics step -> radiation on its interval -> surface
-> microphysics/turbulence -> diagnostics). Design departures (§7.1): the
whole step is one jitted pure function ``step(state, grid, forcing) ->
state``; the radiation interval is a branchless on-device ``lax.cond`` on the
step counter instead of a host-side ``if``; runs are driven in ``lax.scan``
chunks with diagnostics fetched every chunk (io/metrics.py).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from .core.config import ModelConfig
from .core.grid import Grid
from .core.state import Forcing, State
from .dycore.stepper import dynamics_step_fn, run_scan
from .physics.microphysics import microphysics_step
from .physics.radiation import radiation_step
from .physics.surface import surface_step
from .physics.turbulence import turbulence_step


def make_step_fn(cfg: ModelConfig) -> Callable[[State, Grid, Forcing], State]:
    """Build the full per-step function for ``cfg`` (all switches static)."""
    from .core.config import check_rad_resolved
    check_rad_resolved(cfg)
    dyn_step = dynamics_step_fn(cfg)
    phys = cfg.physics

    any_split = phys.surface or phys.turbulence or phys.microphysics

    def step(state: State, grid: Grid, forcing: Forcing) -> State:
        dt = grid.dt
        if phys.radiation:
            # Refresh the cached radiative heating on its interval; the
            # cache feeds the POTT tendency inside the dynamics step.
            state = radiation_step(state, grid, forcing, cfg)
        state = dyn_step(state, grid, forcing)
        if any_split:
            # COLP is fixed for the rest of the step: compute the Exner/
            # pressure diagnostics once and share across the physics splits
            # (exact — only POTT-dependent pieces are recomputed inside).
            from .dycore.operators import diagnose_pressure
            press = diagnose_pressure(state.colp, grid)
        if phys.surface:
            state = surface_step(state, grid, forcing, cfg, dt, press=press)
        if phys.turbulence:
            state = turbulence_step(state, grid, forcing, cfg, dt, press=press)
        if phys.microphysics:
            state = microphysics_step(state, grid, forcing, cfg, dt,
                                      press=press)
        return state.replace(t=state.t + dt, step=state.step + 1)

    return step


def check_pallas_dtype(cfg: ModelConfig) -> None:
    """float64 + backend='pallas' is valid ONLY in interpret mode (the CPU
    test path that fp64-equality-checks the kernels against the jnp
    operators); Mosaic has no f64, so on a real TPU the lowering would fail
    deep inside compilation — refuse loudly up front instead (VERDICT r3
    hygiene: this combination was previously un-guarded)."""
    if cfg.dtype == "float64" and jax.default_backend() != "cpu":
        raise ValueError(
            "backend='pallas' supports float64 only in interpret mode on "
            "CPU (the kernel test path); TPU Mosaic has no f64 — use "
            "backend='jnp' for float64 runs, or dtype='float32' here")


def phys_epilogue_tuple(cfg: ModelConfig):
    """Static physics-epilogue parameters for the fused corrector kernel
    (kernels/fused_substep.py ``phys=``), or None if no split physics is on."""
    phys = cfg.physics
    if not (phys.surface or phys.turbulence or phys.microphysics):
        return None
    return (phys.surface, phys.turbulence, phys.microphysics,
            phys.drag_coef, phys.soil_heat_capacity,
            phys.ocean_heat_capacity, phys.qc_autoconv_time,
            phys.qc_autoconv_threshold, phys.diff_coef_scalar,
            phys.diff_coef_momentum,
            phys.surface and phys.soil_moisture, phys.soil_moist_cap,
            phys.turbulence and phys.convection, phys.conv_diffusivity,
            phys.conv_rh_crit)


def make_packed_step_fn(cfg: ModelConfig, bj: int):
    """Full model step on the PACKED state layout (kernels/packing.py):
    fused Pallas dycore substeps chain in packed space, and the fast physics
    (surface + turbulence + microphysics) run as an EPILOGUE inside the
    corrector kernel — one HBM pass per substep for the entire model step.
    Radiation refreshes its cache packed (interval cond)."""
    from .core.config import check_rad_resolved
    check_rad_resolved(cfg)
    from .core.grid import make_grid
    from .kernels.fused_substep import make_fused_substep_packed
    from .kernels.packing import PackedAux, PackedState
    from .physics.packed import radiation_step_packed

    gc, num, phys = cfg.grid, cfg.numerics, cfg.physics
    grid_np = make_grid(gc, num, np_mode=True)
    nz, ny, nx = gc.nz, gc.ny, gc.nx
    phys_tuple = phys_epilogue_tuple(cfg)
    kw = dict(dy=float(grid_np.dy), ptop=gc.ptop,
              with_rad=phys.radiation,
              with_diff=bool(num.diff_uv or num.diff_pott or num.diff_moist),
              dtype=jnp.dtype(cfg.dtype),
              interpret=jax.default_backend() == "cpu",
              # same kernel program as the lat-sharded path (mask in AUX2
              # slot 4, built by pack_aux) -> sharded == unsharded bitwise
              wall_mask=True)
    pred_k = make_fused_substep_packed(nz, ny, nx, bj=bj, same_base=True, **kw)
    corr_k = make_fused_substep_packed(nz, ny, nx, bj=bj, same_base=False,
                                       phys=phys_tuple, **kw)
    corr_radf = phys.radiation or phys_tuple is not None

    def step(ps: PackedState, aux: PackedAux, dt) -> PackedState:
        """``dt`` is a runtime scalar (grid.dt leaf): the kernels take it as
        an SMEM operand, so adaptive-dt chunk reruns never recompile."""
        if phys.radiation:
            ps = radiation_step_packed(ps, aux, cfg, nz)
        pred_args = (ps.prog,) + ((ps.radf,) if phys.radiation else ())
        p = pred_k(*pred_args, aux.aux2, aux.geo, aux.vert, dt)
        corr_args = (p, ps.prog) + ((ps.radf,) if corr_radf else ())
        prog = corr_k(*corr_args, aux.aux2, aux.geo, aux.vert, dt)
        return ps.replace(prog=prog, t=ps.t + dt, step=ps.step + 1)

    return step


def make_chunk_runner(cfg: ModelConfig, n_steps: int):
    """``run(state, grid, forcing) -> state`` advancing ``n_steps``.

    jnp backend: plain scan of the full step. pallas backend: the
    whole-scan packed-state path (the default — kernels stay in the packed
    layout across the scan and the fast physics run as an epilogue inside
    the corrector kernel; 2.41 ms/step vs 2.64 for per-step packing at 1 deg
    fp32 on v5e). CLIMATE_TPU_PACKED_SCAN=0 selects the older per-step
    pack/unpack path (fused kernels with XLA transposes around each dynamics
    step and jnp physics splits); both are mathematically identical
    (tests/unit/test_pallas_substep.py).
    """
    import os
    packed_scan = os.environ.get("CLIMATE_TPU_PACKED_SCAN", "1") == "1"
    if cfg.backend != "pallas" or not packed_scan:
        step = make_step_fn(cfg)

        def run(state: State, grid: Grid, forcing: Forcing) -> State:
            return run_scan(step, state, grid, forcing, n_steps)

        return run

    # same static-config constraints as dynamics_step_fn's pallas branch
    if cfg.numerics.time_stepping != "matsuno":
        raise ValueError("backend='pallas' supports matsuno only")
    check_pallas_dtype(cfg)
    if not (cfg.numerics.wind_tendency and cfg.numerics.colp_tendency
            and cfg.numerics.temperature_tendency
            and cfg.numerics.moisture_tendency):
        raise ValueError("backend='pallas' requires all tendencies on "
                         "(per-term switches are a jnp-backend debug feature)")

    from .kernels.fused_substep import pick_block_rows
    from .kernels.packing import pack_aux, pack_full, unpack_full

    gc = cfg.grid
    nz, ny, nx = gc.nz, gc.ny, gc.nx
    phys = cfg.physics
    with_phys = phys.surface or phys.turbulence or phys.microphysics
    bj = pick_block_rows(nz, ny, nx, same_base=False,
                         with_rad=cfg.physics.radiation,
                         itemsize=jnp.dtype(cfg.dtype).itemsize,
                         with_phys=with_phys)
    pstep = make_packed_step_fn(cfg, bj)

    def run(state: State, grid: Grid, forcing: Forcing) -> State:
        aux = pack_aux(forcing, grid, bj, jnp.dtype(cfg.dtype))
        ps = pack_full(state, bj)

        def body(s, _):
            return pstep(s, aux, grid.dt), None

        ps, _ = jax.lax.scan(body, ps, None, length=n_steps)
        return unpack_full(ps, state, nz, ny, nx)

    return run


def make_run_fn(cfg: ModelConfig, n_steps: int, donate: bool = True):
    """Jitted ``run(state, grid, forcing) -> state`` advancing n_steps.

    The state buffers are donated so long scans update in place in HBM.
    """
    run_inner = make_chunk_runner(cfg, n_steps)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def run(state: State, grid: Grid, forcing: Forcing) -> State:
        return run_inner(state, grid, forcing)

    return run
