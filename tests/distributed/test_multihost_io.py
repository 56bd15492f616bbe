"""Multi-host checkpoint save/resume round-trip (VERDICT r1 gap: a
multi-host save could not be read back).

Simulated on the 8-virtual-CPU-device mesh: ``save_checkpoint`` with the
multi-host path forced writes per-shard ``name@offsets`` entries; the test
splits them across two files to emulate two processes' saves, then
``load_checkpoint`` must reassemble the GLOBAL state bit-exactly
(SURVEY.md §3.4: per-host shard save / reassembling resume)."""

import dataclasses

import numpy as np
import pytest

from climate_model_tpu.core.config import (GridConfig, ModelConfig,
                                           PhysicsConfig, ShardingConfig)
from climate_model_tpu.core.init import initialize
from climate_model_tpu.core.state import State
from climate_model_tpu.io.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture()
def sharded_state():
    import jax
    from climate_model_tpu.dist.mesh import make_mesh
    from climate_model_tpu.dist.sharding import shard_inputs

    cfg = ModelConfig(
        grid=GridConfig(nx=32, ny=16, nz=8), dtype="float64",
        physics=PhysicsConfig(microphysics=True),
        sharding=ShardingConfig(mesh_lat=2, mesh_lon=4, mode="shard_map"))
    state, forcing, grid = initialize(cfg)
    # make every field non-trivial so bit-exactness is meaningful
    r = np.random.default_rng(7)
    state = state.replace(
        rain=np.abs(r.normal(0, 1e-3, (16, 32))),
        tsurf=290.0 + r.normal(0, 5.0, (16, 32)))
    mesh = make_mesh(cfg)
    state, grid, forcing = shard_inputs(mesh, state, grid, forcing)
    return cfg, state


def _savez_at(path, items):
    """np.savez that writes exactly ``path`` (savez appends .npz otherwise)."""
    import os
    tmp = str(path) + ".tmp.npz"
    np.savez(tmp, **items)
    os.replace(tmp, str(path))


def _split_two_hosts(tmp_path, base):
    """Rewrite <base>.p0 (all 8 shards) as two files with half the shard
    entries each, emulating two processes' saves."""
    p0 = str(base) + ".p0"
    with np.load(p0) as z:
        items = {k: z[k] for k in z.files}
    fp = items.pop("_fingerprint")
    array_keys = sorted(k for k in items if "@" in k)
    half = len(array_keys) // 2
    scalar_keys = [k for k in items if "@" not in k]
    a = {k: items[k] for k in array_keys[:half]}
    b = {k: items[k] for k in array_keys[half:]}
    for k in scalar_keys:          # replicated scalars saved by every host
        a[k] = items[k]
        b[k] = items[k]
    a["_fingerprint"] = fp
    b["_fingerprint"] = fp
    _savez_at(p0, a)
    _savez_at(str(base) + ".p1", b)


def test_multihost_roundtrip_bit_exact(tmp_path, sharded_state):
    cfg, state = sharded_state
    base = tmp_path / "restart.npz"
    save_checkpoint(str(base), state, cfg, _force_multi=True)
    assert (tmp_path / "restart.npz.p0").exists()
    _split_two_hosts(tmp_path, base)

    loaded = load_checkpoint(str(base), cfg)
    for f in dataclasses.fields(State):
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded, f.name)),
            np.asarray(getattr(state, f.name)), err_msg=f.name)


def test_multihost_missing_shards_refused(tmp_path, sharded_state):
    cfg, state = sharded_state
    base = tmp_path / "restart.npz"
    save_checkpoint(str(base), state, cfg, _force_multi=True)
    p0 = str(base) + ".p0"
    with np.load(p0) as z:
        items = {k: z[k] for k in z.files}
    # drop one colp shard -> coverage hole must be refused
    victim = next(k for k in items if k.startswith("colp@") and "," in k
                  and not k.endswith("@0,0"))
    del items[victim]
    _savez_at(p0, items)
    with pytest.raises(ValueError, match="do not cover"):
        load_checkpoint(str(base), cfg)


def test_multihost_fingerprint_refused(tmp_path, sharded_state):
    cfg, state = sharded_state
    base = tmp_path / "restart.npz"
    save_checkpoint(str(base), state, cfg, _force_multi=True)
    other = cfg.replace(grid=GridConfig(nx=32, ny=16, nz=4))
    with pytest.raises(ValueError, match="config mismatch"):
        load_checkpoint(str(base), other)
