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
                         physics: bool = False) -> float:
    """Minimum HBM traffic per grid point per full model step.

    Counting unique (nz,ny,nx)-array traversals for ONE tendency+update pass
    assuming perfect fusion (each array read once from HBM, written once):

      reads:  u, v, pott, qv, qc            (5 prognostics)
              + colp-derived 2-D fields     (~0 per point, 1/nz each)
      intermediates that must round-trip HBM under perfect fusion: none —
      phi/pvtf/fluxes/wwind are recomputed in-register per tile.
      writes: u, v, pott, qv, qc            (5)

    => 10 array-traversals per pass. Matsuno does 2 passes (predictor +
    corrector, the predicted state round-trips HBM): 20 traversals. Physics
    splits (microphysics + surface + turbulence) add ~1 extra fused pass: +8.
    This is the *optimistic floor*; XLA's actual fusion will move more.
    """
    passes = {"euler": 10, "matsuno": 20, "rk4": 45}[stepper]
    if physics:
        passes += 8
    return passes * dtype_bytes


def speed_of_light_gps(device, nz: int, dtype_bytes=4, stepper="matsuno",
                       physics=False) -> float:
    """Speed-of-light grid-points/s for a full model step on ``device``."""
    bw = device_hbm_bw(device)
    return bw / step_bytes_per_point(nz, dtype_bytes, stepper, physics)
