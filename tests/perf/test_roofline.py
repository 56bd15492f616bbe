"""Perf harness tests (SURVEY.md §4 'Performance' row).

On CPU these only validate the harness plumbing and the byte model's
self-consistency; the real numbers come from `python bench.py` on TPU
(recorded by the driver in BENCH_r{N}.json).
"""

import jax
import pytest

from climate_model_tpu.bench.roofline import (device_hbm_bw,
                                              speed_of_light_gps,
                                              step_bytes_per_point)


def test_byte_model_monotonic():
    assert step_bytes_per_point(32, 4, "euler") \
        < step_bytes_per_point(32, 4, "matsuno") \
        < step_bytes_per_point(32, 4, "rk4")
    assert step_bytes_per_point(32, 4, "matsuno", physics=True) \
        > step_bytes_per_point(32, 4, "matsuno", physics=False)
    assert step_bytes_per_point(32, 8, "matsuno") \
        == 2 * step_bytes_per_point(32, 4, "matsuno")


def test_speed_of_light_positive():
    dev = jax.devices()[0]
    assert device_hbm_bw(dev) > 0
    assert speed_of_light_gps(dev, 32) > 0


def test_throughput_harness_runs_small():
    """End-to-end harness on a tiny grid (CPU): shape of the JSON record."""
    from climate_model_tpu.bench import throughput
    from climate_model_tpu.core.config import GridConfig, baseline_config

    # monkeypatch-free: shrink baseline 1 via replace on the harness's cfg
    import climate_model_tpu.bench.throughput as th

    orig = th.baseline_config

    def small(n):
        return orig(n).replace(grid=GridConfig(nx=16, ny=8, nz=4))

    th.baseline_config = small
    try:
        rec = th.run_benchmark(baseline=1, steps=3, repeats=1)
    finally:
        th.baseline_config = orig
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec
    assert rec["value"] > 0
