"""Accuracy sweep over corr_theta_window_bins (tracking phase).

Motivation (round-4/5 perf work): the fused gather kernel's fine-field
row span — and therefore its chunk-loop iteration count — scales
linearly with the theta-window bin count (ops/fused_score_pallas.py:
rows = my * nbins + tbin_w), so halving the flagship's 32-bin window is
a direct ~2x cut to the dominant two-set scoring block at 1M IF tracking
accuracy is unchanged.  During converged tracking the heading posterior
spans a few degrees (bin width = 3 deg at corr_n_theta=120), so 32 bins
(+-48 deg) is far wider than the posterior needs; what it pays for is
MH-proposal headroom — proposal noise throws particles' headings off the
window center, and out-of-theta-window particles fall to the OPTIMISTIC
coarse fallback, which weakens selection.

This script measures that tradeoff: square + straight_line_spin scenario
RMSE at several theta windows, CPU-sized flagship twin.  Run with
PALLAS_AXON_POOL_IPS= python scripts/theta_sweep.py (CPU only).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np


def main():
    jax.config.update("jax_platforms", "cpu")
    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.eval.evaluator import evaluate_run
    from mcmh_localization_tpu.eval.runner import run_filter_on_bag
    from mcmh_localization_tpu.maps.grid_map import load_map
    from mcmh_localization_tpu.sim.simulator import simulate_bag
    from mcmh_localization_tpu.sim.trajectory import (
        SCENARIOS,
        fit_trajectory_to_map,
    )

    grid_map = load_map("/root/reference/app/maps/map_house.yaml")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seeds = (0, 1, 2)
    out = {}
    for scenario in ("square", "straight_line_spin"):
        gt = SCENARIOS[scenario](duration=20.0, rate=5.0)
        gt = fit_trajectory_to_map(grid_map, gt, min_clearance=0.15)
        bags = [
            simulate_bag(jax.random.PRNGKey(100 + s), grid_map, gt,
                         n_beams=180, max_range=5.0, rate=5.0,
                         name=scenario)
            for s in seeds
        ]
        for nbins in (32, 24, 16, 12, 8):
            cfg = FilterConfig(
                mode="AMHAMCL", num_particles=n, min_particles=n,
                max_particles=n, initialized=True,
                initial_pose=tuple(map(float, gt[0])),
                likelihood_impl="corr", corr_window_cells=128,
                corr_theta_window_bins=nbins,
                motion_validity="score", min_injection_prob=0.02,
            )
            rmses = []
            for s, bag in zip(seeds, bags):
                est, _infos, _wall = run_filter_on_bag(
                    bag, cfg, grid_map, jax.random.PRNGKey(s))
                res = evaluate_run(bag.times, est, np.asarray(bag.gt))
                rmses.append(res.rmse)
            out[f"{scenario}_theta{nbins}"] = {
                "mean": round(float(np.mean(rmses)), 4),
                "max": round(float(np.max(rmses)), 4),
            }
            print(json.dumps({f"{scenario}_theta{nbins}":
                              out[f"{scenario}_theta{nbins}"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
