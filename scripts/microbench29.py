"""Beam-field row margin pricing (VERDICT r4 item 5): the bench beam row
sits AT its 1.6 ms target (1.57-1.73 back-to-back, +-7% tunnel noise can
print <1.0).  The LUT build kernel is VPU-bound on its one-hot volume
(kp x nqp x C compare elements — ops/beam_field_pallas.py), and the build
is only ~0.25 ms of the row, so margin needs OPERATING-POINT levers:

  * window cells 96 -> 64: one-hot C 9216 -> 4096 (both exact CT=1024
    tiles) AND the particle-side fused-gather fine volume shrinks with
    the window area;
  * range-table bins 120 -> 96 (3 deg -> 3.75 deg ray quantization,
    kp still a multiple of GC=24): one-hot kp linear.

Prices each variant with bench.time_fixed_count_step at the bench beam
point (100k, 360 beams), 3 repeats to record the spread.  RMSE parity for
the winning variant is checked separately (square-scenario protocol,
RESULTS.md "Benchmark-config accuracy").

Usage: python scripts/microbench29.py
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
        motion_validity="score", min_injection_prob=0.02,
    )
    variants = {
        "current_120t_w96": dict(beam_table_n_theta=120,
                                 corr_window_cells=96,
                                 corr_theta_window_bins=24,
                                 corr_coarse_n_theta=30),
        "96t_w96": dict(beam_table_n_theta=96, corr_window_cells=96,
                        corr_theta_window_bins=24, corr_coarse_n_theta=24),
        "120t_w64": dict(beam_table_n_theta=120, corr_window_cells=64,
                         corr_theta_window_bins=24, corr_coarse_n_theta=30),
        "96t_w64": dict(beam_table_n_theta=96, corr_window_cells=64,
                        corr_theta_window_bins=24, corr_coarse_n_theta=24),
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
