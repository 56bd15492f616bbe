"""Checkpoint / restart.

TPU-native rebuild of the reference restart mechanism (SURVEY.md §2.1 [C]:
pickle of the full model state every ``i_restart_nth_day``, bit-exact resume
via ``i_load_from_restart``). Design departure (SURVEY.md §7.1/§5): instead
of pickles, the state pytree is saved as an ``npz`` of exact arrays keyed by
a config-identity record; resume is bit-exact (same bytes reloaded) and
refuses a mismatched config. Multi-host: each process saves only its
addressable shards under its process index (gather-free), mirroring per-host
shard saving.

Identity record (round 5, ADVICE r4 medium): checkpoints store the FULL
field values of every identity-defining config field (``_config_json``);
load compares field by field over the fields PRESENT in the saved record.
This is robust in both directions the old delta-hash was not:

  * a retuned DEFAULT (e.g. the round-4 albedo/ocean_heat_capacity/
    qc_autoconv_threshold retunes) is detected — the saved blob carries the
    old value explicitly, so a resume cannot silently run different physics
    than produced the state;
  * config-surface GROWTH stays harmless — a new switch is simply absent
    from old records and skipped by the comparison, so adding a field never
    orphans existing restarts.

Checkpoints from before this record (legacy ``_fingerprint`` delta-hash
only) are still accepted via the exact legacy hash computation.
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

# Fields that select a RUNTIME POLICY rather than the state's physical
# identity — excluded from the identity record (and from the legacy hash):
#   rad_every_hours  config-surface sugar; resolve_rad_interval folds it into
#                    rad_every_steps (which IS identity) before anything runs.
#   adaptive_dt      dt-recompute policy: dt only SHRINKS below the init
#                    value under extreme winds (grid.adaptive_cfl_dt), so
#                    resuming a fixed-dt run with adaptive dt on (or vice
#                    versa) is a legitimate continuation — the reference
#                    recomputes dt every step as a matter of course.
_POLICY_FIELDS = {
    "physics": ("rad_every_hours",),
    "numerics": ("adaptive_dt",),
}


def _all_fields(obj, drop=()) -> dict:
    return {f.name: getattr(obj, f.name) for f in dataclasses.fields(obj)
            if f.name not in drop}


def config_identity(cfg: ModelConfig) -> dict:
    """FULL field values of the config sections that define the STATE's
    shape and meaning: grid, physics, numerics, dtype. Deliberately EXCLUDES
    run length / output cadence / device layout — extending a run
    (``--days 8`` after a 4-day save), resharding onto a different mesh or
    process count (load reassembles global arrays; callers re-shard),
    switching backend (jnp <-> pallas hold identical States), or retiming
    outputs are all legitimate resumes — and the runtime-policy fields in
    ``_POLICY_FIELDS``. The values round-trip through JSON so saved and
    current records compare exactly."""
    ident = dict(
        grid=_all_fields(cfg.grid),
        physics=_all_fields(cfg.physics, drop=_POLICY_FIELDS["physics"]),
        numerics=_all_fields(cfg.numerics, drop=_POLICY_FIELDS["numerics"]),
        dtype=cfg.dtype,
        # topography defines the forcing the state evolved over — a resume
        # with different mountains is a different experiment (round 5;
        # records saved before these fields existed skip the comparison)
        topo=cfg.topo, topo_file=cfg.topo_file)
    return json.loads(json.dumps(ident, sort_keys=True, default=str))


def config_fingerprint(cfg: ModelConfig) -> str:
    """Short hash of ``config_identity`` (display / audit; load compares
    the full record, not this hash, so a retuned default is detected even
    though it shifts every fingerprint)."""
    blob = json.dumps(config_identity(cfg), sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


# ---------------------------------------------------------------------------
# Legacy delta-hash (checkpoints saved before the full-value record).
# ---------------------------------------------------------------------------

def _non_default_fields(obj) -> dict:
    """Dataclass -> {field: value} for fields that DIFFER from the class
    default (the pre-round-5 fingerprint basis — kept verbatim so legacy
    checkpoints still verify)."""
    out = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if f.default is not dataclasses.MISSING:
            if v == f.default:
                continue
        out[f.name] = v
    return out


def _legacy_fingerprints(cfg: ModelConfig) -> set:
    """The set of pre-round-5 delta-hash fingerprints this config accepts.
    Two variants: adaptive_dt popped (it is a policy field now — presets
    #3-#5 default it ON since round 5, and flipping it must not orphan the
    fixed-dt committed runs) and adaptive_dt kept (checkpoints saved by
    adaptive runs under the old hash, e.g. the committed out_adapt/,
    included it when set)."""
    out = set()
    for keep_adaptive in (False, True):
        phys = _non_default_fields(cfg.physics)
        phys.pop("rad_every_hours", None)
        num = _non_default_fields(cfg.numerics)
        if not keep_adaptive:
            num.pop("adaptive_dt", None)
        sub = dict(grid=_non_default_fields(cfg.grid), physics=phys,
                   numerics=num, dtype=cfg.dtype)
        blob = json.dumps(sub, sort_keys=True, default=str)
        out.add(hashlib.sha256(blob.encode()).hexdigest()[:16])
    return out


# ---------------------------------------------------------------------------
# Save / load
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: State, cfg: ModelConfig,
                    _force_multi: bool = None):
    """Write state pytree + config-identity record. ``path`` is a .npz file.

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
    leaves["_config_json"] = np.frombuffer(
        json.dumps(config_identity(cfg), sort_keys=True).encode(),
        dtype=np.uint8)
    tmp = path + ".tmp.npz"   # np.savez appends .npz unless present
    np.savez(tmp, **leaves)
    os.replace(tmp, path)


def _config_mismatch(z, cfg: ModelConfig):
    """None if the saved record is compatible with ``cfg``; else a dict
    ``{"section.field": {"saved": v, "current": v}}`` naming every
    difference (legacy hash-only checkpoints yield a single
    ``"fingerprint"`` entry — the old format cannot name fields)."""
    if "_config_json" in z.files:
        saved = json.loads(bytes(z["_config_json"]).decode())
        cur = config_identity(cfg)
        diffs = {}
        for sec, body in saved.items():
            if not isinstance(body, dict):           # dtype (plain value)
                if body != cur.get(sec):
                    diffs[sec] = dict(saved=body, current=cur.get(sec))
                continue
            for name, v in body.items():
                # compare only fields present in BOTH records: removed or
                # newly-added config surface never orphans a checkpoint
                if sec in cur and name in cur[sec] and v != cur[sec][name]:
                    diffs[f"{sec}.{name}"] = dict(saved=v,
                                                  current=cur[sec][name])
        return diffs or None
    fp = bytes(z["_fingerprint"]).decode()
    if fp in _legacy_fingerprints(cfg):
        return None
    return {"fingerprint": dict(saved=fp,
                                current=sorted(_legacy_fingerprints(cfg)))}


def load_checkpoint_ex(path: str, cfg: ModelConfig, force: bool = False):
    """Bit-exact resume; returns ``(state, mismatch)`` where ``mismatch`` is
    None for a clean load. On a config mismatch: raises (naming the
    differing fields) unless ``force=True`` — the deliberate
    physics-perturbation-branch workflow (CLI ``--force-resume``) — which
    warns ONCE per load (not once per shard file; ADVICE r4) and returns
    the mismatch record so the caller can persist the branch provenance.

    Accepts either a single-process checkpoint at ``path`` or a multi-host
    set ``path.p0..pN`` (SURVEY.md §3.4: per-host shard files): the shard
    files' ``name@offsets`` entries are reassembled into global arrays
    (callers re-shard via dist.sharding.shard_inputs, so resume works on a
    different process count than the save)."""

    def check(z, pf, mismatch_seen):
        mm = _config_mismatch(z, cfg)
        if mm is None or mismatch_seen is not None:
            # shard files of one set share one saved record: report once
            return mm
        if not force:
            fields = ", ".join(f"{k}: saved {v['saved']!r} != current "
                               f"{v['current']!r}" for k, v in mm.items())
            raise ValueError(
                f"checkpoint {pf}: config mismatch ({fields}); refusing to "
                "resume with a different configuration (pass --force-resume "
                "to branch a perturbation experiment from this state on "
                "purpose)")
        print(f"WARNING: {pf}: config mismatch "
              f"({', '.join(sorted(mm))}); resuming anyway "
              "(--force-resume: branched experiment)", flush=True)
        return mm

    if os.path.exists(path):
        with np.load(path) as z:
            mismatch = check(z, path, None)
            kw = {f.name: jax.numpy.asarray(z[f.name])
                  for f in dataclasses.fields(State)}
        return State(**kw), mismatch

    import glob
    shard_files = sorted(glob.glob(path + ".p*"))
    if not shard_files:
        raise FileNotFoundError(
            f"no checkpoint at {path} (nor shard files {path}.p*)")
    pieces: dict = {}
    mismatch = None
    for i, pf in enumerate(shard_files):
        with np.load(pf) as z:
            mm = check(z, pf, mismatch if i else None)
            mismatch = mismatch or mm
            for key in z.files:
                if key in ("_fingerprint", "_config_json"):
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
    return State(**kw), mismatch


def load_checkpoint(path: str, cfg: ModelConfig,
                    force: bool = False) -> State:
    """``load_checkpoint_ex`` without the mismatch record (the common
    clean-resume call)."""
    state, _ = load_checkpoint_ex(path, cfg, force)
    return state
