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


def config_fingerprint(cfg: ModelConfig) -> str:
    blob = json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save_checkpoint(path: str, state: State, cfg: ModelConfig):
    """Write state pytree + config fingerprint. ``path`` is a .npz file.

    Multi-host (SURVEY.md §3.4 rebuild note: per-host shard saving): each
    process writes only its addressable shards to ``path.pN``; process 0
    additionally records the fingerprint. Single-process saves the full
    arrays (np.asarray gathers across local devices)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    multi = jax.process_count() > 1
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


def load_checkpoint(path: str, cfg: ModelConfig) -> State:
    """Bit-exact resume; raises on config mismatch (the reference silently
    trusted the pickle; we verify)."""
    with np.load(path) as z:
        fp = bytes(z["_fingerprint"]).decode()
        want = config_fingerprint(cfg)
        if fp != want:
            raise ValueError(
                f"checkpoint config fingerprint {fp} != current {want}; "
                "refusing to resume with a different configuration")
        kw = {f.name: jax.numpy.asarray(z[f.name])
              for f in dataclasses.fields(State)}
    return State(**kw)
