import os, sys
budget = sys.argv[1] if len(sys.argv) > 1 else None
if budget:
    os.environ["CLIMATE_TPU_VMEM_MB"] = budget
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from climate_model_tpu.core.config import GridConfig, ModelConfig, PhysicsConfig
from climate_model_tpu.core.init import initialize
from climate_model_tpu.model import make_run_fn

def probe(nx, ny, nz, steps, **pk):
    cfg = ModelConfig(grid=GridConfig(nx=nx, ny=ny, nz=nz),
                      physics=PhysicsConfig(rad_every_steps=6, **pk),
                      dtype="float32", backend="pallas")
    s, f, g = initialize(cfg)
    out = jax.block_until_ready(make_run_fn(cfg, steps, donate=False)(s, g, f))
    fields = ("u","v","colp","pott","qv","qc","tsurf","rain","soil_moist")
    nf = {n: int((~np.isfinite(np.asarray(getattr(out, n)))).sum()) for n in fields}
    u = np.asarray(out.u)
    umax = np.nanmax(np.abs(u)) if np.isfinite(u).any() else float("nan")
    print(f"[budget={budget}] {nx}x{ny}x{nz} {pk} steps={steps}: "
          + (" ".join(f"{n}:{v}" for n, v in nf.items() if v) or "FINITE")
          + f" max|u|={umax:.3f}", flush=True)

if budget:
    probe(360, 180, 32, 1)                       # small-bj variant of bug A
else:
    probe(128, 64, 16, 3)                        # 256-lane dyn-only (bug A: lanes?)
    probe(64, 32, 8, 10, surface=True)           # bug B toggles
    probe(64, 32, 8, 10, turbulence=True)
    probe(64, 32, 8, 10, microphysics=True)
    probe(64, 32, 8, 10, radiation=True)
