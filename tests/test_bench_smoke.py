"""CPU smoke test for bench.py's shared timing helpers.

Round-4 advisor HIGH: ``time_fixed_count_step`` referenced ``jax`` without
importing it (NameError), which silently broke scripts/microbench27.py and
microbench28.py — the theta/window pricing sweeps gating the flagship
switch.  This test actually CALLS the helper on the tiny fixture map so a
missing import (or any protocol regression) fails in CI instead of on the
chip."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_time_fixed_count_step_runs(house_map):
    import bench

    # shrink the protocol so the CPU run stays fast; restore after
    old = bench.WARMUP, bench.ITERS, bench.N_BEAMS
    bench.WARMUP, bench.ITERS, bench.N_BEAMS = 0, 1, 60
    try:
        ms = bench.time_fixed_count_step(
            house_map, 512, corr_window_cells=64)
    finally:
        bench.WARMUP, bench.ITERS, bench.N_BEAMS = old
    assert ms > 0.0
