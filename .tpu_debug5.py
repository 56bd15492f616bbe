"""1-degree single PREDICTOR substep with debug_slots on real TPU."""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from climate_model_tpu.core.config import GridConfig, ModelConfig
from climate_model_tpu.core.grid import make_grid
from climate_model_tpu.core.init import initialize
from climate_model_tpu.kernels.fused_substep import (GEO_FIELDS,
                                                     make_fused_substep,
                                                     pick_block_rows)
import sys
bj = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cfg = ModelConfig(grid=GridConfig(nx=360, ny=180, nz=32), dtype="float32")
state, forcing, grid = initialize(cfg)
grid_np = make_grid(cfg.grid, cfg.numerics, np_mode=True)
geo = jnp.stack([getattr(grid, f) for f in GEO_FIELDS], axis=1)
sub = make_fused_substep(32, 180, 360, bj=bj, same_base=True,
                         dt=float(grid_np.dt), dy=float(grid_np.dy),
                         ptop=grid.ptop, with_rad=False, dtype=jnp.float32,
                         interpret=False, debug_slots=True)
out = jax.block_until_ready(jax.jit(sub)(
    state.u, state.v, state.pott, state.qv, state.qc, state.colp,
    forcing.hsurf, geo))
names = ("u","v","pott","qv","qc","colp","DBG_u_in","DBG_pvtf_b","DBG_phi_top","DBG_sig_b")
for name, got in zip(names, out):
    a = np.asarray(got)
    fin = np.isfinite(a)
    print(f"bj={bj} {name}: nonfinite={(~fin).sum()}/{a.size} "
          f"range[{a[fin].min() if fin.any() else float('nan'):.4g}, "
          f"{a[fin].max() if fin.any() else float('nan'):.4g}]", flush=True)
u_in = np.asarray(out[6]); tru = np.asarray(state.u[-1])
d = np.abs(u_in - tru)
print(f"u_in vs true input: maxdiff={d.max():.3e}; bad rows:",
      sorted(set(np.argwhere(d > 1e-3)[:, 0].tolist()))[:20], flush=True)
