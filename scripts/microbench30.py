"""Beam-row margin, second pass (VERDICT r4 item 5 follow-up): the fresh
round-5 bench printed raycast_field 1.595 ms (vs_baseline 1.0034 — noise
can sink it) and raycast_field_essgate 1.404 (1.14).  The gate saves only
0.19 ms at the beam point vs 0.60 ms at the corr point (same 100k
resample block), i.e. the peakier beam scores decay ESS faster and the
thr-0.9 gate fires most scans.  Price the two remaining levers on chip:

  * resample_ess_threshold 0.9 -> 0.8 / 0.7: fire the resample block
    less often.  Round-4 negative said thr <= 0.5 stalls post-kidnap
    convergence; 0.7-0.8 are unmeasured.  Accuracy for the winner is
    checked with the CPU square-scenario protocol (RESULTS.md
    "Benchmark-config accuracy") before any bench change.
  * corr_theta_window_bins 24 -> 16 at the beam point: the fine gather
    volume is linear in the theta window; at the CORR point this was
    in-step neutral (microbench27 — XLA overlaps the narrower build),
    the beam point has different phase overlap so it prices separately.

3 repeats per variant (tunnel spread recorded), bench protocol
(bench.time_fixed_count_step).  Usage: python scripts/microbench30.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import bench
    from mcmh_localization_tpu.maps import load_map

    grid_map = load_map("/root/reference/app/maps/map_house.yaml")
    base = dict(
        sensor_model="beam", beam_impl="field",
        beam_table_n_theta=96, corr_window_cells=64,
        corr_coarse_n_theta=24,
        motion_validity="score", min_injection_prob=0.02,
    )
    variants = {
        "plain_t24": dict(corr_theta_window_bins=24),
        "plain_t16": dict(corr_theta_window_bins=16),
        "gate09_t24": dict(corr_theta_window_bins=24,
                           resample_ess_threshold=0.9),
        "gate08_t24": dict(corr_theta_window_bins=24,
                           resample_ess_threshold=0.8),
        "gate07_t24": dict(corr_theta_window_bins=24,
                           resample_ess_threshold=0.7),
        "gate08_t16": dict(corr_theta_window_bins=16,
                           resample_ess_threshold=0.8),
    }
    for name, kw in variants.items():
        times = [
            bench.time_fixed_count_step(grid_map, 100_000, **base, **kw)
            for _ in range(3)
        ]
        print(json.dumps({
            "variant": name,
            "ms_per_scan": [round(t, 3) for t in times],
            "min": round(min(times), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
