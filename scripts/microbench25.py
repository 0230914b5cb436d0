"""Where does the 2M corr scoring call's time go after index fusion?

Times the fused kernel standalone on a realistic converged-cloud index
distribution vs the full scorer (fused and select paths), at 1M/2M.

Usage: python scripts/microbench25.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

ITERS = 24
DISP = 3


def timed(name, phase_fn, iters=ITERS):
    @jax.jit
    def run(c):
        def body(carry, _):
            return phase_fn(carry), None

        return jax.lax.scan(body, c, None, length=iters)[0]

    c = run(jnp.float32(0.0)); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(DISP):
        c = run(c)
    float(c)
    per = ((time.perf_counter() - t0) * 1e3) / (DISP * iters)
    print(f"{name:56s} {per:9.3f} ms", flush=True)
    return per


def main():
    print("devices:", jax.devices(), flush=True)
    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import _sensor_table, _window_origin
    from mcmh_localization_tpu.models.corr_field import correlation_field_scores
    from mcmh_localization_tpu.ops.fused_score_pallas import (
        fused_window_score_gather,
    )
    from mcmh_localization_tpu.ops.gather_pallas import gather_rows_lanes
    from __graft_entry__ import _build_map, _example_inputs

    gm = _build_map()
    config = FilterConfig(
        mode="AMHAMCL", num_particles=1_000_000, min_particles=1_000_000,
        max_particles=1_000_000, initialized=True,
        initial_pose=(0.0, 0.0, 0.3), corr_window_cells=128,
        corr_theta_window_bins=32, likelihood_impl="corr",
        motion_validity="score", min_injection_prob=0.02,
    )
    log_field = _sensor_table(gm, config)
    state, ranges, angles, delta = _example_inputs(gm, config, 360)
    p = state.particles
    rng = np.random.default_rng(0)

    # realistic converged cloud: 0.3 m xy spread, full theta coverage
    n = p.shape[0]
    cloud = jnp.stack([
        p[:, 0] + jnp.asarray(rng.normal(0, 0.15, n), jnp.float32),
        p[:, 1] + jnp.asarray(rng.normal(0, 0.15, n), jnp.float32),
        jnp.asarray(rng.uniform(-0.4, 0.4, n), jnp.float32) + p[:, 2],
    ], axis=1)
    two = jnp.concatenate([cloud, cloud + 1e-4])

    # gather kernel standalone: bf16 (mean-agg prec), realistic rows
    table = jnp.asarray(
        rng.normal(size=(128 * 32 + 96 * 36, 128)).astype(np.float32)
    )
    for nn, label in ((1_000_000, "1M"), (2_000_000, "2M")):
        rows = jnp.asarray(
            (rng.integers(2000, 2640, nn)).astype(np.int32))  # 5-chunk span
        lanes = jnp.asarray(rng.integers(30, 90, nn).astype(np.int32))
        timed(f"[{label}] gather_rows_lanes bf16 tight-cloud",
              lambda c, rows=rows, lanes=lanes: jnp.sum(gather_rows_lanes(
                  table + c * 1e-30, rows, lanes,
                  precision="bf16")[:8]) * 1e-30 + c)

    def score(arr, impl, label):
        def f(c):
            st = state.replace(particles=cloud)
            wo = _window_origin(st, gm, config)
            s = correlation_field_scores(
                arr + c * 1e-30, ranges=ranges, angles=angles, grid_map=gm,
                config=config, log_field=log_field,
                n_theta=config.corr_n_theta, window_origin=wo,
                lookup_impl=impl)
            return c + jnp.sum(s[:8]) * 1e-30
        return timed(label, f)

    score(two, "fused", "[2M] corr scorer FUSED")
    score(two, "select", "[2M] corr scorer SELECT")
    score(cloud, "fused", "[1M] corr scorer FUSED")

    # fused kernel standalone at 2M (kernel-only floor)
    field_t = jnp.asarray(
        rng.normal(size=(128 * 32, 128)).astype(np.float32))
    cfield_t = jnp.asarray(
        rng.normal(size=(96 * 36, 96)).astype(np.float32))
    pt = two.T

    def fk(c):
        s = fused_window_score_gather(
            field_t, cfield_t, pt[0] + c * 1e-30, pt[1], pt[2],
            gm.origin[0], gm.origin[1], 1.0 / gm.resolution,
            jnp.int32(120), jnp.int32(130), jnp.int32(3),
            jnp.float32(360.0), jnp.float32(-50.0),
            n_theta=120, nbins=32, fh=128, fw=128, h=384, w=384,
            kc=36, hc=96, wc=96, res_c=0.2,
            theta_scale=120 / (2.0 * np.pi),
            fine_div=False, theta_div=False, clip_before_window=False,
            precision="bf16")
        return c + jnp.sum(s[:8]) * 1e-30
    timed("[2M] fused kernel standalone (incl table prep)", fk)


if __name__ == "__main__":
    main()
