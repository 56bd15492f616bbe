#!/usr/bin/env python
"""Benchmark entry point (driver contract): prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures grid-points/s/chip for BASELINE config #3 (full physics columns at
1 deg, 360x180x32 — the single-chip headline config in BASELINE.md) on the
default device. NAMING CAUTION: ``vs_baseline`` is the fraction of the HBM
speed-of-light roofline, NOT a ratio against the reference implementation
(which publishes no benchmark numbers; see BASELINE.md and
climate_model_tpu/bench/roofline.py). The step is measured compute-bound at
61% of the VPU element-throughput peak (bench/opcount.py audit), so the
HBM fraction is structurally small for this op-mix.
"""

import json
import os
import sys

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from climate_model_tpu.bench.throughput import run_benchmark
    # steps=200: one scan is a single device dispatch; a short scan would
    # fold the host->device dispatch latency (~30 ms through the axon
    # tunnel) into the per-step number (profiling showed 20 steps reads
    # ~2.4 ms/step where the device is busy only ~1.15 ms/step).
    # repeats=5, best-of: step-time variance on this box is real (same
    # binary measured 1.37 and 1.59 ms/step an hour apart — docs/STATUS.md)
    result = run_benchmark(baseline=3, steps=200, dtype="float32",
                           repeats=5, backend="pallas")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
