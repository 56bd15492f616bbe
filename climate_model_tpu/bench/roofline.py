"""Roofline model: HBM speed-of-light step-time estimate.

BASELINE.json's per-kernel criterion is "speed-of-light HBM-bandwidth per
chip" (SURVEY.md §6): every dycore kernel is a bandwidth-bound 2nd-order
stencil, so the per-step floor is (bytes that must move through HBM) / BW.

The byte model is a *documented estimate* used to report what fraction of
speed-of-light the measured throughput achieves (bench output field
``vs_baseline``; the reference publishes no numbers to compare against —
BASELINE.md).
"""

from __future__ import annotations

# Peak HBM bandwidth per chip [bytes/s] by TPU generation (public specs).
HBM_BW = {
    "v4": 1.228e12,
    "v5e": 8.19e11,
    "v5 lite": 8.19e11,
    "v5p": 2.765e12,
    "v6e": 1.64e12,
    "cpu": 5.0e10,      # rough single-socket figure for CPU sanity runs
}


def device_hbm_bw(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in HBM_BW.items():
        if key in kind:
            return bw
    if device.platform == "cpu":
        return HBM_BW["cpu"]
    return HBM_BW["v5e"]


def step_bytes_per_point(nz: int, dtype_bytes: int = 4,
                         stepper: str = "matsuno",
                         physics: bool = False,
                         rad_every_steps: int = 6) -> float:
    """Minimum HBM traffic per grid point per full model step.

    Counting unique (nz,ny,nx)-array traversals for ONE tendency+update pass
    assuming perfect fusion (each array read once from HBM, written once):

      reads:  u, v, pott, qv, qc            (5 prognostics)
              + colp-derived 2-D fields     (~0 per point, 1/nz each)
      intermediates that must round-trip HBM under perfect fusion: none —
      phi/pvtf/fluxes/wwind are recomputed in-register per tile.
      writes: u, v, pott, qv, qc            (5)

    => 10 traversals per pass. Matsuno does 2 passes; the corrector
    additionally re-reads the ORIGINAL (t_n) state for its mass-weighted
    update (+5): 25 traversals.

    Full physics (the production epilogue schedule, all four
    parameterizations; VERDICT r1 weak #5 calibration):
      + cached radiative heating read by both substeps' POTT tendency (+2)
      + surface/turbulence/microphysics consume the corrector's in-register
        updated fields (0 extra traversals — that is the point of the
        epilogue) but tsurf/rain round-trip as 2-D fields (~0)
      + the radiation recompute itself reads pott/qv/qc + writes the nz
        heating cache (~4 traversals) every ``rad_every_steps`` steps.
    """
    passes = {"euler": 10, "matsuno": 25, "rk4": 45}[stepper]
    if physics:
        passes += 2 + 4.0 / max(rad_every_steps, 1)
    return passes * dtype_bytes


def speed_of_light_gps(device, nz: int, dtype_bytes=4, stepper="matsuno",
                       physics=False, rad_every_steps=6) -> float:
    """Speed-of-light grid-points/s for a full model step on ``device``."""
    bw = device_hbm_bw(device)
    return bw / step_bytes_per_point(nz, dtype_bytes, stepper, physics,
                                     rad_every_steps)


# ---------------------------------------------------------------------------
# VPU (vector-op) roofline: count the kernel's traced vector work
# ---------------------------------------------------------------------------

# Fully-fused VPU element rate [elements/s], fp32: measured on v5e via a
# chained single-consumer elementwise probe (42 ns per (32,32,384) tile op,
# see docs/STATUS.md round-2 probe log). This is the IDEAL rate — every
# traced op consuming its operands in vector registers; materialization to
# VMEM costs ~10x more per element, so vs_vpu_roofline measures how far the
# kernel sits from perfect operand fusion.
VPU_ELEM_RATE = {
    "v5 lite": 9.4e12,
    "v5e": 9.4e12,
}

# HARDWARE VPU element-throughput peak [fp32 elements/s]: 4 ALUs x (8,128)
# lanes x 940 MHz on v5e. This is the rate the round-5 op-count audit
# (bench/opcount.py) prices element-work at; ``vs_vpu_peak`` in bench
# output is the measured fraction of THIS peak (0.61 at config #3), while
# ``vs_vpu_roofline`` is the fraction of the ideal perfectly-operand-fused
# rate above (a much higher bar; 0.25 at #3). README "Where the
# performance ceiling actually is" reconciles the two. CAVEAT: the element
# count prices every traced eqn, INCLUDING halo-row recompute and
# slice/concat moves Mosaic can partially elide into addressing — at small
# tile heights (bj=6 at 0.25 deg, halo amp 2.0) the over-count makes
# ``vs_vpu_peak`` exceed 1.0; it is a priced MODEL, not a hardware law.
# Read it comparatively across configs, not as an absolute utilization.
VPU_PEAK_RATE = {
    "v5 lite": 4096 * 0.94e9,
    "v5e": 4096 * 0.94e9,
}


def device_vpu_peak(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, r in VPU_PEAK_RATE.items():
        if key in kind:
            return r
    return 4096 * 0.94e9


def device_vpu_rate(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, r in VPU_ELEM_RATE.items():
        if key in kind:
            return r
    return 9.4e12


def pallas_kernel_elems(call, *example_args) -> int:
    """Total output elements across the traced eqns of a pallas_call's
    kernel body (per grid step): the element count the VPU roofline prices.
    Tracing only — no execution, backend-independent."""
    import jax
    import numpy as np

    jaxpr = jax.make_jaxpr(call)(*example_args)

    def find(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "pallas_call":
                return eqn.params["jaxpr"]
            for v in eqn.params.values():
                pass
        return None

    inner = find(jaxpr.jaxpr)
    if inner is None:
        return 0
    total = 0
    for e in inner.eqns:
        for v in e.outvars:
            aval = getattr(v, "aval", None)
            if aval is not None and hasattr(aval, "shape"):
                total += int(np.prod(aval.shape))
    return total
