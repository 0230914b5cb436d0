"""Headline benchmark: full flagship filter step throughput on one TPU chip.

Measures steady-state latency of the complete AMHAMCL scan update —
odometry proposal + double likelihood-field scoring + asymmetric MH +
augmented/KLD resampling — at 100k particles x 360 beams on the reference
384x384 map (the BASELINE.json operating point "particle-updates/sec/chip at
100k particles; ms/scan").

The reference never measured throughput (SURVEY.md §6); the baseline used
for ``vs_baseline`` is the BASELINE.json north-star target <2 ms/scan for
1M particles x 360 beams on a v5e-8, i.e. 125k particles/chip -> scaled to
this 100k-particle single-chip config: 1.6 ms.  vs_baseline = target_ms /
measured_ms (>1 means beating the target).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

N_PARTICLES = 100_000
N_BEAMS = 360
TARGET_MS = 2.0 * (N_PARTICLES / 125_000)  # north-star scaled per chip
WARMUP = 3
ITERS = 20


def main():
    import jax

    # Persistent compile cache: the driver's bench invocation reuses compiles
    # from development runs (XLA compile on this 1-core host is minutes).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import _correct, _predict
    from mcmh_localization_tpu.models.sensor import log_likelihood_field
    from __graft_entry__ import _build_map, _example_inputs

    grid_map = _build_map()
    config = FilterConfig(
        mode="AMHAMCL",
        num_particles=N_PARTICLES,
        min_particles=1000,
        max_particles=N_PARTICLES,
        initialized=True,
        initial_pose=(0.0, 0.0, 0.3),
        # steady-state tracking operating point: correlation field over a
        # 128-cell window around the particle cloud (README perf table)
        corr_window_cells=128,
    )
    log_field = log_likelihood_field(grid_map, config)

    @jax.jit
    def step(state, ranges, angles, delta):
        state = _predict(state, delta, grid_map, config)
        return _correct(state, ranges, angles, grid_map, log_field, config)

    state, ranges, angles, delta = _example_inputs(grid_map, config, N_BEAMS)

    for _ in range(WARMUP):
        state, _info = step(state, ranges, angles, delta)
    # scalar fetch: block_until_ready through the axon tunnel returns early,
    # so sync via a value fetch; successive steps are naturally dependency-
    # chained through `state`, serializing execution on device.
    float(state.w_slow)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, _info = step(state, ranges, angles, delta)
    float(state.w_slow)
    dt = (time.perf_counter() - t0) / ITERS

    ms = dt * 1e3
    print(
        json.dumps(
            {
                "metric": f"amhamcl_step_ms_{N_PARTICLES // 1000}k_particles_{N_BEAMS}beams_win128",
                "value": round(ms, 4),
                "unit": "ms/scan",
                "vs_baseline": round(TARGET_MS / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
