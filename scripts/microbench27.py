"""Chip timing: full flagship step vs corr_theta_window_bins.

The fused gather kernel's fine-row span (and the corr field build's
region volume) scales linearly with the theta-window bin count; the
accuracy sweep (scripts/theta_sweep.py) measured RMSE FLAT from 32 down
to 8 bins on square + straight_line_spin (0.047-0.054 m everywhere,
2000 particles, 3 seeds).  This bench prices the candidate flagship
switch 32 -> 16 at the real operating points.

Usage: python scripts/microbench27.py  (TPU; uses bench.py's protocol)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench
from __graft_entry__ import _build_map


run_config = bench.time_fixed_count_step  # shared chained-timing protocol


def main():
    grid_map = _build_map()
    base = dict(
        corr_window_cells=128, likelihood_impl="corr",
        motion_validity="score", min_injection_prob=0.02,
    )
    for n, extra in ((1_000_000, dict(coarse_gate_escapees=0)),
                     (100_000, {})):
        for nbins in (32, 16, 8):
            ms = run_config(grid_map, n, corr_theta_window_bins=nbins,
                            **base, **extra)
            print(json.dumps({"n": n, "theta_bins": nbins,
                              "ms_per_scan": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
