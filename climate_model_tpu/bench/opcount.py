"""Fused-kernel op-count audit (VERDICT r4 next #3).

CLAUDE.md carried a round-2 projection of a ~1.0-1.1 ms/step ceiling for
config #3 "via algebraic element-work cuts"; seven structural probes later
(docs/STATUS.md round-3 log) the claim had never been closed with an actual
accounting. This module produces that accounting mechanically:

  * traces the interpret-mode fused kernel and walks the pallas_call's
    kernel jaxpr (recursing into jit/cond sub-jaxprs),
  * tallies VPU element-ops per source line — every arithmetic primitive
    weighted by its OUTPUT element count over the padded (rows, k, lanes)
    tile (the VPU runs padded lanes; that is the hardware cost),
  * groups lines into named term regions (diagnostics/scans, scalar
    advection, u/v momentum, physics epilogue stages),
  * measures algebraic REDUNDANCY by structural value-numbering: an eqn
    whose (primitive, params, operand value-numbers) was already computed
    is a duplicate the kernel pays for only if the compiler's CSE misses
    it — the count is the CEILING of what hand-CSE could save,
  * converts element-ops to a VPU time floor (1024 fp32 lanes/cycle at
    940 MHz on v5e — the same rate the round-2 micro-bench op model used)
    for comparison against measured per-kernel times.

Run: python -m climate_model_tpu.bench.opcount   (CPU, a few seconds)
"""

from __future__ import annotations

import collections
import dataclasses
import math

# (start, end, label) line ranges inside kernels/fused_substep.py; kept
# coarse on purpose — they only label the table, the counts come from the
# trace. Regenerate with --lines if the kernel is reorganized.
TERM_REGIONS = [
    ("pressure/Exner diagnostics", 546, 570),
    ("continuity + fused hydrostatic/flux scans", 571, 604),
    ("scalar advection batch (pott|qv|qc) + diffusion", 634, 680),
    ("u momentum", 681, 714),
    ("v momentum", 715, 776),
    ("epilogue: pressure of new colp", 777, 808),
    ("epilogue: surface", 821, 880),
    ("epilogue: turbulence", 881, 944),
    ("epilogue: microphysics", 945, 990),
]

ARITH = {
    "add", "sub", "mul", "div", "neg", "exp", "log", "pow", "sqrt", "rsqrt",
    "integer_pow", "max", "min", "gt", "lt", "ge", "le", "eq", "ne",
    "select_n", "and", "or", "not", "abs", "sign", "floor", "tanh",
    "logistic", "cumsum", "convert_element_type",
}
MOVES = {"slice", "concatenate", "broadcast_in_dim", "squeeze", "reshape",
         "transpose", "pad", "iota", "rev", "dynamic_slice"}


def _elems(aval) -> int:
    try:
        return int(math.prod(aval.shape)) if aval.shape else 1
    except Exception:
        return 0


def _src_line(eqn, filename_hint="fused_substep"):
    tb = eqn.source_info.traceback
    if tb is None:
        return None
    for frame in tb.frames:
        if filename_hint in frame.file_name:
            return frame.line_num
    return None


def _walk(jaxpr, visit):
    for eqn in jaxpr.eqns:
        sub = None
        for key in ("jaxpr", "call_jaxpr"):
            if key in eqn.params:
                sub = eqn.params[key]
        if eqn.primitive.name == "cond":
            for br in eqn.params["branches"]:
                _walk(br.jaxpr if hasattr(br, "jaxpr") else br, visit)
            continue
        if sub is not None and eqn.primitive.name not in ("pallas_call",):
            _walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub, visit)
            continue
        visit(eqn)


def _find_pallas_jaxpr(jaxpr):
    found = []

    def visit(eqn):
        if eqn.primitive.name == "pallas_call":
            found.append(eqn.params["jaxpr"])

    _walk(jaxpr, lambda e: visit(e))
    # _walk skips recursion into pallas_call itself, so visiting top-level
    # and jit-nested calls both land here
    if not found:
        raise ValueError("no pallas_call in trace")
    return found[0]


@dataclasses.dataclass
class Audit:
    region_elems: dict          # label -> arithmetic element-ops per tile
    region_moves: dict          # label -> data-movement element-ops
    redundant_elems: int        # duplicate-value arithmetic element-ops
    redundant_by_region: dict
    total_arith: int
    total_moves: int
    n_tiles: int
    vpu_floor_us_per_tile: float
    vpu_floor_ms_per_kernel: float

    def table(self) -> str:
        rows = ["%-48s %12s %8s %10s" % ("term region", "arith elems",
                                         "share", "dup elems")]
        for label, v in sorted(self.region_elems.items(),
                               key=lambda kv: -kv[1]):
            rows.append("%-48s %12d %7.1f%% %10d" % (
                label, v, 100.0 * v / max(self.total_arith, 1),
                self.redundant_by_region.get(label, 0)))
        rows.append("%-48s %12d %8s %10d" % (
            "TOTAL (arith)", self.total_arith, "",
            self.redundant_elems))
        rows.append("%-48s %12d" % ("data movement (slice/concat/bcast)",
                                    self.total_moves))
        rows.append("redundancy ceiling: %.2f%% of arithmetic element-ops"
                    % (100.0 * self.redundant_elems
                       / max(self.total_arith, 1)))
        rows.append("VPU time floor: %.1f us/tile x %d tiles = %.3f "
                    "ms/kernel-launch"
                    % (self.vpu_floor_us_per_tile, self.n_tiles,
                       self.vpu_floor_ms_per_kernel))
        return "\n".join(rows)


def audit_substep(baseline: int = 3, which: str = "corrector",
                  with_phys: bool = True) -> Audit:
    """Trace a fused substep kernel (``which`` = 'predictor' for the
    same-base Matsuno predictor, 'corrector' for the tendency + proceed
    [+ physics epilogue] kernel) at the given baseline's shapes and return
    the element-op accounting."""
    import jax
    import jax.numpy as jnp

    from ..core.config import baseline_config
    from ..model import phys_epilogue_tuple
    from ..kernels.fused_substep import (NGEO, NVERT, lane_pad,
                                         make_fused_substep_packed,
                                         pick_block_rows, prog_k, radf_k,
                                         row_pad)

    cfg = baseline_config(baseline)
    gc = cfg.grid
    nz, ny, nx = gc.nz, gc.ny, gc.nx
    same_base = which == "predictor"
    if same_base:
        with_phys = False
    # bj is picked for the corrector (the packed scan shares one tile
    # height across both kernels — model.py make_chunk_runner)
    bj = pick_block_rows(nz, ny, nx, same_base=False, with_rad=True,
                         itemsize=4, with_phys=with_phys or same_base)
    kern = make_fused_substep_packed(
        nz, ny, nx, bj=bj, same_base=same_base, dy=111000.0, ptop=gc.ptop,
        with_rad=True, with_diff=True, dtype=jnp.float32, interpret=True,
        phys=phys_epilogue_tuple(cfg) if with_phys else None)
    nyp, nxp = row_pad(ny, bj), lane_pad(nx)
    kp, kr = prog_k(nz), radf_k(nz)
    sh = jax.ShapeDtypeStruct
    args = [sh((nyp, kp, nxp), jnp.float32)]
    if not same_base:
        args.append(sh((nyp, kp, nxp), jnp.float32))
    args += [sh((nyp, kr, nxp), jnp.float32), sh((nyp, 8, nxp), jnp.float32),
             sh((nyp, 1, NGEO), jnp.float32),
             sh((1, nz + 1, NVERT), jnp.float32), sh((), jnp.float32)]
    closed = jax.make_jaxpr(kern)(*args)
    kjaxpr = _find_pallas_jaxpr(closed.jaxpr)

    region_elems = collections.defaultdict(int)
    region_moves = collections.defaultdict(int)
    red_by_region = collections.defaultdict(int)
    totals = dict(arith=0, moves=0, red=0)

    # structural value numbering for redundancy: number every produced var
    # by (prim, params-ish, operand numbers); a repeated key is a duplicate
    # computation (ceiling of hand-CSE savings — the compiler may already
    # catch it). Keys hold operand NUMBERS (ints), not nested keys — a
    # nested representation grows with the expression tree.
    val_num: dict = {}
    seen_exprs: dict = {}

    def label_of(line):
        if line is None:
            return "(outside kernel source)"
        for lab, a, b in TERM_REGIONS:
            if a <= line <= b:
                return lab
        return f"(line {line})"

    def visit(eqn):
        name = eqn.primitive.name
        out_elems = sum(_elems(v.aval) for v in eqn.outvars)
        line = _src_line(eqn)
        lab = label_of(line)
        opnds = []
        for v in eqn.invars:
            if hasattr(v, "val"):      # literal
                opnds.append(("lit", str(getattr(v, "val", None))))
            else:
                opnds.append(val_num.get(v, ("in", id(v))))
        key = (name, str(sorted(
            (k, str(w)) for k, w in eqn.params.items()
            if k not in ("jaxpr", "call_jaxpr", "branches"))), tuple(opnds))
        dup = key in seen_exprs
        if not dup:
            seen_exprs[key] = len(seen_exprs)
        num = seen_exprs[key]
        for i, v in enumerate(eqn.outvars):
            val_num[v] = (num, i)
        if name in ARITH:
            region_elems[lab] += out_elems
            totals["arith"] += out_elems
            if dup:
                red_by_region[lab] += out_elems
                totals["red"] += out_elems
        elif name in MOVES:
            region_moves[lab] += out_elems
            totals["moves"] += out_elems

    _walk(kjaxpr, visit)

    n_tiles = -(-ny // bj)
    # v5e VPU element-throughput peak: 4 ALUs x (8, 128) fp32 lanes at
    # 940 MHz. Data-movement eqns (slice/concat/broadcast) also execute on
    # the VPU as copies, so the floor counts arith + moves.
    vpu_rate = 4096 * 0.94e9
    floor_us = (totals["arith"] + totals["moves"]) / vpu_rate * 1e6
    return Audit(region_elems=dict(region_elems),
                 region_moves=dict(region_moves),
                 redundant_elems=totals["red"],
                 redundant_by_region=dict(red_by_region),
                 total_arith=totals["arith"], total_moves=totals["moves"],
                 n_tiles=n_tiles,
                 vpu_floor_us_per_tile=floor_us,
                 vpu_floor_ms_per_kernel=floor_us * n_tiles / 1e3)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    audits = {}
    for which, with_phys, label in (
            ("corrector", True, "corrector + physics epilogue"),
            ("corrector", False, "corrector (dynamics only)"),
            ("predictor", False, "predictor (same-base)")):
        a = audit_substep(3, which=which, with_phys=with_phys)
        audits[label] = a
        print(f"=== config #3 {label} ===")
        print(a.table())
        print()
    pred = audits["predictor (same-base)"]
    corr = audits["corrector + physics epilogue"]
    step_elems = sum((a.total_arith + a.total_moves) * a.n_tiles
                     for a in (pred, corr))
    floor_ms = (pred.vpu_floor_ms_per_kernel + corr.vpu_floor_ms_per_kernel)
    print(f"WHOLE STEP (pred + corr, radiation amortized out): "
          f"{step_elems/1e9:.2f}G VPU element-ops, "
          f"VPU-peak floor {floor_ms:.3f} ms/step")
