"""Chip timing: tracking-program step vs corr_window_cells (and theta).

The spatial twin of scripts/microbench27.py: the corr field build's
region volume is (window + 2*max_range_cells)^2 * theta_bins and the
fused gather kernel's fine-table volume scales with window^2 *
theta_bins, so the staged SMALL program (filter/staged.py,
tracking_window_cells) can trade recovery headroom it does not need
(escapees fall to the coarse fallback -> anchor-mass escalation) for
per-scan cost.  Accuracy measured FLAT 128 -> 48 cells on
square/straight_line_spin (scripts/window_sweep.py, CPU twin).

Prices the SMALL operating point (default 131072 slots = the staged 1M
flagship's tracking capacity) across window x theta, with the ESS gate
on like the shipping staged config.

Usage: python scripts/microbench28.py [n_small]  (TPU; bench.py protocol)
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    base = dict(
        likelihood_impl="corr", motion_validity="score",
        min_injection_prob=0.02, resample_ess_threshold=0.9,
    )
    for win in (128, 96, 64, 48):
        for nbins in (32, 16):
            ms = run_config(grid_map, n, corr_window_cells=win,
                            corr_theta_window_bins=nbins, **base)
            print(json.dumps({"n": n, "window_cells": win,
                              "theta_bins": nbins,
                              "ms_per_scan": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
