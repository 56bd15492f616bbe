import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from climate_model_tpu.kernels.fused_substep import pack_prog, unpack_prog

def roundtrip(nz, ny, nx, bj):
    r = np.random.default_rng(1)
    mk3 = lambda: jnp.asarray(r.normal(0, 1, (nz, ny, nx)), jnp.float32)
    mk2 = lambda: jnp.asarray(r.normal(0, 1, (ny, nx)), jnp.float32)
    fields = [mk3() for _ in range(5)] + [mk2() for _ in range(4)]
    @jax.jit
    def rt(*fs):
        prog = pack_prog(*fs[:5], *fs[5:], bj)
        return unpack_prog(prog, nz, ny, nx)
    out = jax.block_until_ready(rt(*fields))
    order = [0,1,2,3,4,5,6,7,8]  # u v pott qv qc colp tsurf rain soilm
    ins = fields[:5] + [fields[5], fields[6], fields[7], fields[8]]
    names = ("u","v","pott","qv","qc","colp","tsurf","rain","soilm")
    ok = True
    for n, a, b in zip(names, out, ins):
        d = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        if d != 0.0:
            ok = False
            print(f"  {nz}x{ny}x{nx} bj={bj} {n}: maxdiff {d:.3e}", flush=True)
    print(f"roundtrip {nz}x{ny}x{nx} bj={bj}: {'OK' if ok else 'CORRUPT'}", flush=True)

roundtrip(8, 32, 64, 8)
roundtrip(32, 180, 360, 32)
roundtrip(32, 180, 360, 36)
roundtrip(16, 180, 360, 32)
roundtrip(32, 128, 256, 32)
