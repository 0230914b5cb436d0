"""Primitive costs behind the resampling index machinery at 1M:
cumsum, scatter, cummax, plus corr-scoring internals (build vs gather)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

_RTT = None


def timed(name, fn, iters=10):
    global _RTT
    c = jnp.float32(0.0)
    c = fn(c); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = fn(c)
    float(c)
    per = ((time.perf_counter() - t0) * 1e3) / iters - (_RTT or 0)
    print(f"{name:52s} {per:9.3f} ms", flush=True)
    return per


def main():
    global _RTT
    N = 1_000_000
    print("devices:", jax.devices(), flush=True)
    f_id = jax.jit(lambda c: c + 1.0)
    c = f_id(jnp.float32(0)); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(20):
        c = f_id(c)
    float(c)
    _RTT = (time.perf_counter() - t0) * 1e3 / 20
    print(f"enqueue floor: {_RTT:.3f} ms", flush=True)

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.exponential(size=N).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=N).astype(np.float32))
    starts = jnp.asarray(np.sort(rng.integers(0, N, N)).astype(np.int32))

    timed("[1M] cumsum f32", jax.jit(lambda c: c + jnp.cumsum(w + c * 1e-30)[-1] * 1e-30))
    timed("[1M] cummax i32", jax.jit(
        lambda c: c + jax.lax.cummax((starts + (c * 1e30).astype(jnp.int32))).astype(jnp.float32)[-1] * 1e-30))
    timed("[1M] scatter-max i32 (sorted idx)", jax.jit(
        lambda c: c + jnp.full(N, -1, jnp.int32).at[starts].max(
            jnp.arange(N, dtype=jnp.int32) + (c * 1e30).astype(jnp.int32)
        ).astype(jnp.float32)[-1] * 1e-30))
    timed("[1M] scatter-set f32x3 (sorted idx)", jax.jit(
        lambda c: c + jnp.zeros((N, 3), jnp.float32).at[starts].set(
            jnp.stack([vals + c * 1e-30, vals, vals], 1))[0, 0] * 1e-30))
    timed("[1M] argsort f32 (for contrast)", jax.jit(
        lambda c: c + jnp.argsort(w + c * 1e-30)[-1].astype(jnp.float32) * 1e-30), iters=3)

    # corr scoring internals at 1M / 2M
    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import _sensor_table, _window_origin
    from mcmh_localization_tpu.models.corr_field import correlation_field_scores
    from __graft_entry__ import _build_map, _example_inputs

    gm = _build_map()
    config = FilterConfig(
        mode="AMHAMCL", num_particles=N, min_particles=N, max_particles=N,
        initialized=True, initial_pose=(0.0, 0.0, 0.3),
        corr_window_cells=128, corr_theta_window_bins=32,
        likelihood_impl="corr", motion_validity="score",
        min_injection_prob=0.02,
    )
    log_field = _sensor_table(gm, config)
    state, ranges, angles, delta = _example_inputs(gm, config, 360)
    p = state.particles

    def score_n(n_arr):
        @jax.jit
        def f(c):
            st = state.replace(particles=p + c * 1e-30)
            wo = _window_origin(st, gm, config)
            s = correlation_field_scores(
                n_arr + c * 1e-30, ranges=ranges, angles=angles, grid_map=gm,
                config=config, log_field=log_field,
                n_theta=config.corr_n_theta, window_origin=wo)
            return c + jnp.sum(s[:8]) * 1e-30
        return f

    timed("[128] corr scores (field build only)", score_n(p[:128]))
    timed("[1M] corr scores single-set", score_n(p))
    timed("[2M] corr scores two-set", score_n(jnp.concatenate([p, p + 1e-4])))


if __name__ == "__main__":
    main()
