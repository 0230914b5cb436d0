"""Run a single bench.py operating point (default: the beam score-field
metric, the driver-parsed last line).  Usage:
    python scripts/bench_one.py [beam|flagship|1m|kld]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import (
        _correct, _predict, _sensor_table,
    )
    from __graft_entry__ import _build_map, _example_inputs
    import jax.numpy as jnp
    import numpy as np

    which = sys.argv[1] if len(sys.argv) > 1 else "beam"
    grid_map = _build_map()

    def run_config(n_particles, min_particles_override=None, **kw):
        config = FilterConfig(
            mode="AMHAMCL",
            num_particles=n_particles,
            min_particles=(min_particles_override or n_particles),
            max_particles=n_particles,
            initialized=True,
            initial_pose=(0.0, 0.0, 0.3),
            **kw,
        )
        log_field = _sensor_table(grid_map, config)

        @jax.jit
        def step(state, ranges, angles, delta):
            state = _predict(state, delta, grid_map, config)
            return _correct(state, ranges, angles, grid_map, log_field,
                            config)

        state, _r0, angles, _d0 = _example_inputs(grid_map, config,
                                                  bench.N_BEAMS)
        rot = np.pi / bench.SCAN_LEN
        delta = jnp.asarray([rot, 0.05, rot], dtype=jnp.float32)
        ranges_seq = bench._tracking_scans(
            grid_map, config, angles, delta, (0.0, 0.0, 0.3)
        )
        return bench._time_step(step, state, ranges_seq, angles, delta)

    flagship = dict(
        corr_window_cells=128, corr_theta_window_bins=32,
        likelihood_impl="corr", motion_validity="score",
        min_injection_prob=0.02,
    )
    if which == "beam":
        ms = run_config(
            100_000, sensor_model="beam", beam_impl="field",
            beam_table_n_theta=120,
            corr_window_cells=96, corr_theta_window_bins=24,
            corr_coarse_n_theta=30,
            motion_validity="score", min_injection_prob=0.02,
        )
        bench._emit("amhamcl_step_ms_100k_raycast_field", ms, 100_000)
    elif which == "flagship":
        ms = run_config(100_000, **flagship)
        bench._emit("amhamcl_step_ms_100k_win128", ms, 100_000)
    elif which == "1m":
        ms = run_config(1_000_000, coarse_gate_escapees=0, **flagship)
        bench._emit("amhamcl_step_ms_1m_win128", ms, 1_000_000)
    elif which == "kld":
        ms = run_config(1_000_000, min_particles_override=100_000,
                        kld_eval_window=0, coarse_gate_escapees=0,
                        **flagship)
        bench._emit("amhamcl_step_ms_1m_kld", ms, 1_000_000)
    else:
        raise SystemExit(f"unknown point {which!r}")


if __name__ == "__main__":
    main()
