"""Child process for the TRUE multi-process DCN test (run by
``test_multiprocess_dcn.py``, not collected by pytest).

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
connects them into one 8-device system (collectives ride Gloo here, ICI/DCN
on a real pod — same XLA program either way, SURVEY.md §2.2 comm-backend
row). Exercises the full production multi-host surface: global device_put,
shard_map+ppermute halo step, process_allgather, per-process checkpoint
shard saving + reassembling load, and the host-0 NetCDF writer.
"""

import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                            sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np
from jax.experimental import multihost_utils

from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           PhysicsConfig, ShardingConfig)
from climate_model_tpu.core.init import initialize
from climate_model_tpu.dist.halo import make_sharded_step_fn
from climate_model_tpu.dist.mesh import make_mesh
from climate_model_tpu.dist.sharding import shard_inputs
from climate_model_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from climate_model_tpu.io.netcdf import NCWriter
from climate_model_tpu.model import make_chunk_runner

cfg = ModelConfig(
    grid=GridConfig(nx=32, ny=16, nz=8), dtype="float64",
    physics=PhysicsConfig(microphysics=True),
    sharding=ShardingConfig(mesh_lat=2, mesh_lon=4, mode="shard_map"))
state, forcing, grid = initialize(cfg)

# unsharded reference, local to this process (init is fp64-deterministic,
# so every process computes the identical reference)
with jax.default_device(jax.local_devices()[0]):
    ref = jax.block_until_ready(
        jax.jit(make_chunk_runner(cfg, 5))(state, grid, forcing))

mesh = make_mesh(cfg)
s, g, f = shard_inputs(mesh, state, grid, forcing)
run = make_sharded_step_fn(cfg, mesh, g, n_steps=5)
out = jax.block_until_ready(jax.jit(run)(s, g, f))

u = multihost_utils.process_allgather(out.u, tiled=True)
colp = multihost_utils.process_allgather(out.colp, tiled=True)
qv = multihost_utils.process_allgather(out.qv, tiled=True)
np.testing.assert_allclose(u, np.asarray(ref.u), rtol=1e-12, atol=1e-12)
np.testing.assert_allclose(colp, np.asarray(ref.colp), rtol=1e-12, atol=1e-12)
np.testing.assert_allclose(qv, np.asarray(ref.qv), rtol=1e-12, atol=1e-15)

# per-process checkpoint shard saving (auto-detected via process_count) ...
ckpt = os.path.join(outdir, "restart.npz")
save_checkpoint(ckpt, out, cfg)
multihost_utils.sync_global_devices("ckpt saved")
assert os.path.exists(f"{ckpt}.p{pid}")
# ... reassembled bit-exactly on load (on every process)
back = load_checkpoint(ckpt, cfg)
np.testing.assert_array_equal(np.asarray(back.u), u)
np.testing.assert_array_equal(np.asarray(back.colp), colp)

# host-0 NetCDF writer (allgather is a collective: all processes join)
writer = NCWriter(outdir)
path = writer.write(out, g, f)
if pid == 0:
    assert path and os.path.exists(path)
    assert os.path.exists(os.path.join(outdir, "constants.nc"))
else:
    assert path is None

# --- GSPMD 'auto' mode: plain jit over globally-sharded inputs, XLA
# inserts the halo collectives itself (no shard_map) ---
auto = jax.jit(make_chunk_runner(cfg, 5))
out_auto = jax.block_until_ready(auto(s, g, f))
u_auto = multihost_utils.process_allgather(out_auto.u, tiled=True)
np.testing.assert_allclose(u_auto, np.asarray(ref.u), rtol=1e-12, atol=1e-12)

# --- packed fused-kernel path (interpret mode on CPU; Mosaic on a real
# slice): supertensor ghost refresh now rides CROSS-PROCESS collectives ---

from climate_model_tpu.dist.packed_halo import make_packed_sharded_runner

cfgp = cfg.replace(backend="pallas", dtype="float32")
statep, forcingp, gridp = initialize(cfgp)
sp, gp, fp = shard_inputs(mesh, statep, gridp, forcingp)
runp = make_packed_sharded_runner(cfgp, mesh, gp, n_steps=2)
outp = jax.block_until_ready(runp(sp, gp, fp))
u_p = multihost_utils.process_allgather(outp.u, tiled=True)
# local unsharded reference through the same packed-kernel scan
with jax.default_device(jax.local_devices()[0]):
    refp = jax.block_until_ready(
        jax.jit(make_chunk_runner(cfgp, 2))(statep, gridp, forcingp))
np.testing.assert_allclose(u_p, np.asarray(refp.u), rtol=0, atol=1e-6)

# --- halo-overlap schedule ACROSS REAL PROCESS BOUNDARIES (VERDICT r4
# next #5): the seam-strip kernels + concurrent lat collectives are
# exactly the code whose ppermutes cross DCN on a pod (mesh_lat=2 puts
# the lat seam between the two processes here). Must match the blocking
# schedule's unsharded reference to the same bound. ---
import dataclasses as _dc

cfgo = cfgp.replace(sharding=_dc.replace(cfgp.sharding, halo_overlap=True))
runo = make_packed_sharded_runner(cfgo, mesh, gp, n_steps=2)
outo = jax.block_until_ready(runo(sp, gp, fp))
u_o = multihost_utils.process_allgather(outo.u, tiled=True)
qv_o = multihost_utils.process_allgather(outo.qv, tiled=True)
# vs the BLOCKING schedule's output: the overlap schedule computes the
# seam rows in separate strip kernels, so its fp32 program reassociates
# FMAs differently — the documented bound is program-level fp32 noise
# (~1e-5 relative; exact equality holds at fp64, test_packed_sharded.py)
u_b = multihost_utils.process_allgather(outp.u, tiled=True)
qv_b = multihost_utils.process_allgather(outp.qv, tiled=True)
np.testing.assert_allclose(u_o, u_b, rtol=0, atol=3e-5)
np.testing.assert_allclose(qv_o, qv_b, rtol=0, atol=1e-8)
np.testing.assert_allclose(u_o, np.asarray(refp.u), rtol=0, atol=3e-5)

# --- the CLI driver itself on the live multi-process runtime: cmd_run's
# multihost surface (grid/forcing as jit arguments — a closed-over
# non-addressable array is a jit error; host-0-only logger + NetCDF;
# per-process checkpoint shards). --multihost is omitted only because this
# process already called jax.distributed.initialize.
import json

from climate_model_tpu.cli import main

rundir = os.path.join(outdir, "cli")
rc = main(["run", "--nx", "32", "--ny", "16", "--nz", "8",
           "--physics", "mic", "--days", "0.05", "--dtype", "float64",
           "--mesh-lat", "2", "--mesh-lon", "4",
           "--sharding-mode", "shard_map", "--out-every-hours", "0.2",
           "--out-dir", rundir])
assert rc == 0
multihost_utils.sync_global_devices("cli run done")
assert os.path.exists(os.path.join(rundir, f"restart.npz.p{pid}"))
recs = [json.loads(line)
        for line in open(os.path.join(rundir, "metrics.jsonl"))]
assert recs and not any(r["nan"] for r in recs)
assert os.path.exists(os.path.join(rundir, "out_0000.nc"))

print(f"CHILD{pid} OK", flush=True)
