import sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from climate_model_tpu.core.config import GridConfig, ModelConfig, PhysicsConfig, NumericsConfig
from climate_model_tpu.core.init import initialize
from climate_model_tpu.model import make_run_fn

diff = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
cfg = ModelConfig(
    grid=GridConfig(nx=360, ny=180, nz=32),
    physics=PhysicsConfig(microphysics=True, radiation=True, surface=True,
                          turbulence=True, rad_every_steps=6),
    numerics=NumericsConfig(diff_uv=diff, diff_pott=diff, diff_moist=diff),
    dtype="float32", backend="pallas")
state, forcing, grid = initialize(cfg)
run = make_run_fn(cfg, 50, donate=False)
print(f"dt={float(grid.dt):.1f}s diff={diff}", flush=True)
for i in range(120):
    state = jax.block_until_ready(run(state, grid, forcing))
    u = np.asarray(state.u); v = np.asarray(state.v)
    mu, mv = np.abs(u).max(), np.abs(v).max()
    jv = np.unravel_index(np.abs(v).argmax(), v.shape)
    print(f"step {50*(i+1):5d} max|u| {mu:9.3f} max|v| {mv:9.3f} at k={jv[0]} j={jv[1]} i={jv[2]} "
          f"pott[{np.asarray(state.pott).min():7.1f},{np.asarray(state.pott).max():7.1f}] "
          f"qv_max {np.asarray(state.qv).max():.2e}", flush=True)
    if not np.isfinite(mu) or mu > 500: break
