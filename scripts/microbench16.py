"""Live-filter KLD diagnosis at the bench operating point (1M, min=100k).

Why did the exact escalation (eval_window=0) cost +12 ms/scan in the
round-3 bench (22.4 vs 10.2 fixed) when standalone microbench15 measured
3.7 ms converged?  Prints the count trace (does the stop fire? where?) and
times the step with ew=0 vs ew=131072.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.filter.step import _correct, _predict, _sensor_table
from __graft_entry__ import _build_map, _example_inputs
from bench import _tracking_scans, N_BEAMS, SCAN_LEN

flagship = dict(
    corr_window_cells=128, corr_theta_window_bins=32,
    likelihood_impl="corr", motion_validity="score",
    min_injection_prob=0.02,
)


def build(ew):
    grid_map = _build_map()
    config = FilterConfig(
        mode="AMHAMCL", num_particles=1_000_000, min_particles=100_000,
        max_particles=1_000_000, initialized=True,
        initial_pose=(0.0, 0.0, 0.3), kld_eval_window=ew, **flagship,
    )
    log_field = _sensor_table(grid_map, config)

    @jax.jit
    def step(state, ranges, angles, delta):
        state = _predict(state, delta, grid_map, config)
        return _correct(state, ranges, angles, grid_map, log_field, config)

    state, _r0, angles, _d0 = _example_inputs(grid_map, config, N_BEAMS)
    rot = np.pi / SCAN_LEN
    delta = jnp.asarray([rot, 0.05, rot], dtype=jnp.float32)
    ranges_seq = _tracking_scans(grid_map, config, angles, delta,
                                 (0.0, 0.0, 0.3))
    return step, state, ranges_seq, angles, delta


def trace_counts(ew, nsteps=48):
    step, state, ranges_seq, angles, delta = build(ew)
    counts = []
    for t in range(nsteps):
        state, info = step(state, ranges_seq[t % SCAN_LEN], angles, delta)
        counts.append(int(info.count))
    print(f"ew={ew}: counts {counts[:8]} ... {counts[-8:]}", flush=True)
    print(f"  min={min(counts)} max={max(counts)} "
          f"mean={sum(counts)/len(counts):.0f}", flush=True)


def time_steps(ew):
    step, state, ranges_seq, angles, delta = build(ew)

    @jax.jit
    def run_block(state):
        def body(s, ranges):
            s, _ = step(s, ranges, angles, delta)
            return s, None
        return jax.lax.scan(body, state, ranges_seq)[0]

    for _ in range(2):
        state = run_block(state)
    float(state.w_slow)
    t0 = time.perf_counter()
    for _ in range(4):
        state = run_block(state)
    float(state.w_slow)
    ms = (time.perf_counter() - t0) / (4 * SCAN_LEN) * 1e3
    print(f"ew={ew}: {ms:.3f} ms/scan", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    trace_counts(0)
    trace_counts(131072)
    time_steps(0)
    time_steps(131072)
