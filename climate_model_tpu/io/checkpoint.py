"""Checkpoint / restart.

TPU-native rebuild of the reference restart mechanism (SURVEY.md §2.1 [C]:
pickle of the full model state every ``i_restart_nth_day``, bit-exact resume
via ``i_load_from_restart``). Design departure (SURVEY.md §7.1/§5): instead
of pickles, the state pytree is saved as an ``npz`` of exact arrays keyed by
a config fingerprint; resume is bit-exact (same bytes reloaded) and refuses a
mismatched config. Multi-host: each process saves only its addressable shards
under its process index (gather-free), mirroring per-host shard saving.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import jax
import numpy as np

from ..core.config import ModelConfig
from ..core.state import State


def _non_default_fields(obj) -> dict:
    """Dataclass -> {field: value} for fields that DIFFER from the class
    default. Hashing only the deltas makes the fingerprint stable under
    config-surface growth: adding a new switch with a default value (which
    by definition does not change what a saved run computed) no longer
    orphans every existing restart file (round 4 — adding the convection
    flag would otherwise have invalidated all committed checkpoints)."""
    out = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if f.default is not dataclasses.MISSING:
            if v == f.default:
                continue
        out[f.name] = v
    return out


def config_fingerprint(cfg: ModelConfig) -> str:
    """Hash of the config fields that define the STATE's shape and meaning:
    grid, physics, numerics, dtype. Deliberately EXCLUDES run length /
    output cadence / device layout — extending a run (``--days 8``
    after a 4-day save), resharding onto a different mesh or process count
    (load reassembles global arrays; callers re-shard), switching backend
    (jnp <-> pallas hold identical States), or retiming outputs are all
    legitimate resumes — and DEFAULT-VALUED fields (see
    ``_non_default_fields``), so adding config surface never orphans
    restarts. The reference's pickle restart checked nothing."""
    phys = _non_default_fields(cfg.physics)
    # rad_every_hours is config-surface sugar: resolve_rad_interval folds it
    # into rad_every_steps before any physics runs, so only the resolved
    # interval identifies the run (also keeps pre-knob fingerprints valid).
    phys.pop("rad_every_hours", None)
    sub = dict(grid=_non_default_fields(cfg.grid),
               physics=phys,
               numerics=_non_default_fields(cfg.numerics),
               dtype=cfg.dtype)
    blob = json.dumps(sub, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save_checkpoint(path: str, state: State, cfg: ModelConfig,
                    _force_multi: bool = None):
    """Write state pytree + config fingerprint. ``path`` is a .npz file.

    Multi-host (SURVEY.md §3.4 rebuild note: per-host shard saving): each
    process writes only its addressable shards to ``path.pN``, keyed
    ``name@start0,start1[,start2]`` (global offsets); ``load_checkpoint``
    reassembles from all shard files. Single-process saves the full arrays
    (np.asarray gathers across local devices)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    multi = jax.process_count() > 1 if _force_multi is None else _force_multi
    if multi:
        path = f"{path}.p{jax.process_index()}"
        leaves = {}
        for f in dataclasses.fields(state):
            arr = getattr(state, f.name)
            if hasattr(arr, "addressable_shards"):
                for sh in arr.addressable_shards:
                    key = f.name + "@" + ",".join(
                        f"{sl.start or 0}" for sl in sh.index) if sh.index \
                        else f.name
                    leaves[key] = np.asarray(sh.data)
            else:
                leaves[f.name] = np.asarray(arr)
    else:
        leaves = {f.name: np.asarray(getattr(state, f.name))
                  for f in dataclasses.fields(state)}
    leaves["_fingerprint"] = np.frombuffer(
        config_fingerprint(cfg).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"   # np.savez appends .npz unless present
    np.savez(tmp, **leaves)
    os.replace(tmp, path)


def _check_fingerprint(z, cfg: ModelConfig, path: str, force: bool = False):
    fp = bytes(z["_fingerprint"]).decode()
    want = config_fingerprint(cfg)
    if fp != want:
        if force:
            # physics-perturbation branch from a common spin-up (a core
            # climate-model workflow; CLI --force-resume): proceed loudly.
            print(f"WARNING: {path}: fingerprint {fp} != current {want}; "
                  "resuming anyway (--force-resume: branched experiment)",
                  flush=True)
            return
        raise ValueError(
            f"checkpoint {path}: config fingerprint {fp} != current {want}; "
            "refusing to resume with a different configuration (pass "
            "--force-resume to branch a perturbation experiment from this "
            "state on purpose)")


def load_checkpoint(path: str, cfg: ModelConfig,
                    force: bool = False) -> State:
    """Bit-exact resume; raises on config mismatch (the reference silently
    trusted the pickle; we verify). ``force=True`` downgrades the mismatch
    to a warning — the deliberate physics-perturbation-branch workflow.

    Accepts either a single-process checkpoint at ``path`` or a multi-host
    set ``path.p0..pN`` (SURVEY.md §3.4: per-host shard files): the shard
    files' ``name@offsets`` entries are reassembled into global arrays
    (callers re-shard via dist.sharding.shard_inputs, so resume works on a
    different process count than the save)."""
    if os.path.exists(path):
        with np.load(path) as z:
            _check_fingerprint(z, cfg, path, force)
            kw = {f.name: jax.numpy.asarray(z[f.name])
                  for f in dataclasses.fields(State)}
        return State(**kw)

    import glob
    shard_files = sorted(glob.glob(path + ".p*"))
    if not shard_files:
        raise FileNotFoundError(
            f"no checkpoint at {path} (nor shard files {path}.p*)")
    pieces: dict = {}
    for pf in shard_files:
        with np.load(pf) as z:
            _check_fingerprint(z, cfg, pf, force)
            for key in z.files:
                if key == "_fingerprint":
                    continue
                name, _, off = key.partition("@")
                starts = (tuple(int(x) for x in off.split(","))
                          if off else ())
                pieces.setdefault(name, []).append((starts, z[key]))

    kw = {}
    for f in dataclasses.fields(State):
        if f.name not in pieces:
            raise ValueError(f"checkpoint shard files miss field {f.name!r}")
        parts = pieces[f.name]
        if parts[0][0] == ():                      # replicated scalar
            kw[f.name] = jax.numpy.asarray(parts[0][1])
            continue
        nd = parts[0][1].ndim
        shape = tuple(max(st[d] + a.shape[d] for st, a in parts)
                      for d in range(nd))
        full = np.empty(shape, parts[0][1].dtype)
        seen = np.zeros(shape, bool)
        for st, a in parts:
            idx = tuple(slice(s, s + n) for s, n in zip(st, a.shape))
            full[idx] = a
            seen[idx] = True
        if not seen.all():
            raise ValueError(
                f"checkpoint shard files do not cover field {f.name!r} "
                f"(global shape {shape}); incomplete save?")
        kw[f.name] = jax.numpy.asarray(full)
    return State(**kw)
