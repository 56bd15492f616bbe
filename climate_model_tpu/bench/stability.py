"""Stability probe: long-run blow-up detection across diffusion settings.

The reference validated stability by watching its per-step ``print_ts_info``
max-wind line (SURVEY.md §4 row 1); this harness formalizes that as a
CLI-drivable sweep. It exists because of the round-2 postmortem: a 1-deg
full-physics run went NaN at ~0.5 sim days; round-3 probes at production
resolution showed the current (bitwise-seam-fixed) kernel is bounded for
6+ sim days even with diffusion off, pinning the trigger on the pre-fix
tile-seam noise — but only BECAUSE this probe could run the production
grid cheaply on both backends. See docs/STATUS.md "Stability at production
resolution" for the full evidence trail.

``probe_stability`` advances a config in chunks and reports the max-wind
trajectory plus the first chunk (if any) where the state goes non-finite or
exceeds a wind blow-up threshold. It runs on whatever backend/platform the
config selects: CPU+jnp for cheap sweeps, TPU+pallas for production checks.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def probe_stability(cfg, steps: int = 2000, chunk: int = 100,
                    wind_limit: float = 300.0, verbose: bool = True) -> dict:
    """Run ``cfg`` for ``steps`` steps, watching for blow-up.

    Returns a dict with the per-chunk max-wind trajectory, the blow-up step
    (None if the run stayed bounded), and the config's diffusion settings.
    """
    import jax

    from ..core.init import initialize
    from ..model import make_run_fn

    state, forcing, grid = initialize(cfg)
    run = make_run_fn(cfg, chunk, donate=False)
    dt = float(grid.dt)

    trajectory = []
    blowup_step: Optional[int] = None
    t0 = time.time()
    done = 0
    while done < steps:
        state = jax.block_until_ready(run(state, grid, forcing))
        done += chunk
        u = np.asarray(state.u)
        v = np.asarray(state.v)
        pott = np.asarray(state.pott)
        max_u = float(np.abs(u).max())
        max_v = float(np.abs(v).max())
        jmax = np.unravel_index(np.abs(v).argmax(), v.shape)
        rec = dict(step=done, t_days=done * dt / 86400.0,
                   max_u=max_u, max_v=max_v,
                   v_argmax_kji=[int(x) for x in jmax],
                   pott_min=float(pott.min()), pott_max=float(pott.max()))
        trajectory.append(rec)
        if verbose:
            print(f"step {done:6d} t={rec['t_days']:7.3f}d "
                  f"max|u| {max_u:9.3f} max|v| {max_v:9.3f} "
                  f"at k={jmax[0]} j={jmax[1]} i={jmax[2]} "
                  f"pott [{rec['pott_min']:7.1f},{rec['pott_max']:7.1f}]",
                  flush=True)
        if not np.isfinite(max_u) or max_u > wind_limit \
                or not np.isfinite(max_v) or max_v > wind_limit:
            blowup_step = done
            break
    num = cfg.numerics
    return dict(metric="stability", steps_run=done, steps_target=steps,
                dt=dt, blowup_step=blowup_step,
                stable=blowup_step is None,
                diff_uv=num.diff_uv, diff_pott=num.diff_pott,
                diff_moist=num.diff_moist,
                grid=[cfg.grid.nx, cfg.grid.ny, cfg.grid.nz],
                wall_s=time.time() - t0, trajectory=trajectory)
