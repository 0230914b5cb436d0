"""Rate-accurate replay / real-time duty-cycle demo (VERDICT r4 item 8,
Missing-2): drive OnlineLocalizer at wall-clock message rates — 5 Hz scans,
30 Hz odometry — the way `rosbag play --clock` paces the reference stack
(/root/reference/app/launch/test_algs.launch:40-44), and report the duty
cycle + deadline misses.

Unlike bench.py (which measures amortized chained steady-state ms/scan),
this exercises the UNBATCHED dispatch path end-to-end: every scan callback
is one enqueue through the remote-TPU tunnel (~3.6 ms floor), and — with
predict_batching="per_scan" (the recommended online config) — odometry
callbacks are host-side bookkeeping only.  A scan DEADLINE MISS means the
correct step (enqueue + device time + estimate fetch) did not finish within
the 200 ms scan period, i.e. the filter could not keep real time.

Usage: python scripts/pacing_demo.py [n_particles] [seconds] [--staged]
Prints one JSON line for RESULTS.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

SCAN_HZ = 5.0
ODOM_HZ = 30.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    staged = "--staged" in sys.argv

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.online import OnlineLocalizer
    from mcmh_localization_tpu.io.pgm import load_map_yaml
    from mcmh_localization_tpu.models.sensor import raycast

    grid_map = load_map_yaml("/root/reference/app/maps/map_house.yaml")
    config = FilterConfig(
        mode="AMHAMCL", num_particles=n, min_particles=max(n // 10, 1000),
        max_particles=n, initialized=True, initial_pose=(0.0, 0.0, 0.3),
        likelihood_impl="corr", corr_window_cells=128,
        corr_theta_window_bins=32, predict_batching="per_scan",
        estimate_mode="cluster",
    )
    loc = OnlineLocalizer(
        config, grid_map, seed=0, initial_pose=(0.0, 0.0, 0.3),
        staged=staged,
    )

    # circular tour (bench.py's closed circle): per-pose scans raycast
    # off the map; odometry integrates the same motion at 30 Hz
    n_beams = 360
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False).astype(
        np.float32)
    scan_period = 1.0 / SCAN_HZ
    odom_period = 1.0 / ODOM_HZ
    omega = 2 * np.pi / 40.0          # 40 s per lap
    v = 0.10                          # m/s

    import jax.numpy as jnp

    def scan_at(pose):
        r = raycast(jnp.asarray(pose[:2], jnp.float32),
                    jnp.asarray(angles + pose[2], jnp.float32),
                    grid_map, config.max_range, hit_unknown=True)
        rr = np.asarray(r)
        rr = rr + np.random.default_rng(0).normal(0, 0.01, rr.shape)
        return rr.astype(np.float32)

    # warm the jit caches OUTSIDE the timed window (a cold remote compile
    # is minutes and every scan would be a miss)
    pose = np.array([0.0, 0.0, 0.3], np.float64)
    loc.on_odom(*pose)
    loc.on_scan(scan_at(pose), angles)

    t0 = time.perf_counter()
    next_scan = t0 + scan_period
    next_odom = t0 + odom_period
    n_scans = n_miss = n_odom = 0
    lat = []
    while True:
        now = time.perf_counter()
        if now - t0 >= seconds:
            break
        if now >= next_odom:
            t_sim = now - t0
            th = 0.3 + omega * t_sim
            pose = np.array([
                (v / omega) * (np.sin(th) - np.sin(0.3)),
                (v / omega) * (np.cos(0.3) - np.cos(th)),
                ((th + np.pi) % (2 * np.pi)) - np.pi,
            ])
            loc.on_odom(*pose)
            n_odom += 1
            next_odom += odom_period
            continue
        if now >= next_scan:
            s0 = time.perf_counter()
            loc.on_scan(scan_at(pose), angles)
            est = loc.estimate()
            dt = time.perf_counter() - s0
            lat.append(dt)
            n_scans += 1
            if time.perf_counter() > next_scan + scan_period:
                n_miss += 1
            next_scan += scan_period
            continue
        time.sleep(min(next_scan, next_odom) - now)

    err = float(np.hypot(est["pose3"][0] - pose[0],
                         est["pose3"][1] - pose[1]))
    lat = np.asarray(lat) * 1e3
    print(json.dumps({
        "metric": "online_duty_cycle",
        "n_particles": n, "staged": staged, "seconds": seconds,
        "scan_hz": SCAN_HZ, "odom_hz": ODOM_HZ,
        "scans": n_scans, "odom_msgs": n_odom,
        "deadline_misses": n_miss,
        "scan_latency_ms": {
            "p50": round(float(np.percentile(lat, 50)), 2),
            "p95": round(float(np.percentile(lat, 95)), 2),
            "max": round(float(lat.max()), 2),
        },
        "duty_cycle_pct": round(100 * float(lat.sum()) / (1e3 * seconds), 2),
        "final_err_m": round(err, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
