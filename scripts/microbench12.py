"""Corr-scoring internals at 1M/2M with reliable per-iter floors:
index math vs gather kernel vs full scorer, +/- coarse fallback."""
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

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import _sensor_table, _window_origin
    from mcmh_localization_tpu.models.corr_field import correlation_field_scores
    from mcmh_localization_tpu.ops.gather_pallas import gather_rows_lanes
    from __graft_entry__ import _build_map, _example_inputs

    gm = _build_map()
    base = dict(
        mode="AMHAMCL", num_particles=1_000_000, min_particles=1_000_000,
        max_particles=1_000_000, initialized=True,
        initial_pose=(0.0, 0.0, 0.3), corr_window_cells=128,
        corr_theta_window_bins=32, likelihood_impl="corr",
        motion_validity="score", min_injection_prob=0.02,
    )
    config = FilterConfig(**base)
    cfg_nc = FilterConfig(**{**base, "corr_coarse_factor": 0})
    log_field = _sensor_table(gm, config)
    state, ranges, angles, delta = _example_inputs(gm, config, 360)
    p = state.particles
    rng = np.random.default_rng(0)

    # pure index math (everything per-particle except builds + gather)
    inv_res = 1.0 / float(jax.device_get(gm.resolution))
    def idxmath(pp):
        @jax.jit
        def f(c):
            q = pp + c * 1e-30
            mx = ((q[:, 0] + 4.8) * inv_res).astype(jnp.int32)
            my = ((q[:, 1] + 4.8) * inv_res).astype(jnp.int32)
            tb = (((q[:, 2] + jnp.pi) * (120 / (2 * jnp.pi))).astype(jnp.int32)
                  % 120)
            kr = (tb - 3) % 120
            cov = (kr < 32) & (mx >= 0) & (mx < 384) & (my >= 0) & (my < 384)
            rows = jnp.where(cov, jnp.clip(my, 0, 127) * 1 + kr * 128,
                             7000 + my // 4)
            lanes = jnp.where(cov, mx % 128, (mx // 4) % 128)
            return c + (jnp.sum(rows[:8] + lanes[:8])).astype(jnp.float32) * 1e-30
        return f
    timed("[1M] index math (full lookup prep)", idxmath(p))
    timed("[2M] index math (full lookup prep)",
          idxmath(jnp.concatenate([p, p + 1e-4])))

    # gather kernel alone, clustered rows (tracking window regime)
    table = jnp.asarray(rng.normal(size=(128 * 32 + 4096, 128)).astype(np.float32))
    for nn in (1_000_000, 2_000_000):
        rows = jnp.asarray(rng.integers(100, 4000, nn).astype(np.int32))
        lanes = jnp.asarray(rng.integers(0, 128, nn).astype(np.int32))
        timed(f"[{nn//1000}k] gather_rows_lanes split clustered",
              jax.jit(lambda c, rows=rows, lanes=lanes: jnp.sum(
                  gather_rows_lanes(table + c * 1e-30, rows, lanes,
                                    precision="split")[:8]) * 1e-30 + c))

    def score_cfg(cfg, n_arr, label):
        @jax.jit
        def f(c):
            st = state.replace(particles=p + c * 1e-30)
            wo = _window_origin(st, gm, cfg)
            s = correlation_field_scores(
                n_arr + c * 1e-30, ranges=ranges, angles=angles, grid_map=gm,
                config=cfg, log_field=log_field, n_theta=cfg.corr_n_theta,
                window_origin=wo)
            return c + jnp.sum(s[:8]) * 1e-30
        return timed(label, f)

    two = jnp.concatenate([p, p + 1e-4])
    score_cfg(config, p, "[1M] corr full (with coarse)")
    score_cfg(cfg_nc, p, "[1M] corr full (no coarse)")
    score_cfg(config, two, "[2M] corr full (with coarse)")
    score_cfg(cfg_nc, two, "[2M] corr full (no coarse)")

    # realistic CONVERGED cloud: ~0.5 m position spread (10 cells), full
    # theta-window heading spread — the regime where theta-major rows
    # visited one chunk per bin
    n = p.shape[0]
    wide = jnp.stack([
        p[:, 0] + jnp.asarray(rng.normal(0, 0.25, n), jnp.float32),
        p[:, 1] + jnp.asarray(rng.normal(0, 0.25, n), jnp.float32),
        p[:, 2] + jnp.asarray(rng.normal(0, 0.4, n), jnp.float32),
    ], axis=1)
    score_cfg(config, wide, "[1M] corr full wide-cloud (coarse)")
    score_cfg(cfg_nc, wide, "[1M] corr full wide-cloud (no coarse)")
    score_cfg(cfg_nc, jnp.concatenate([wide, wide + 1e-4]),
              "[2M] corr full wide-cloud (no coarse)")


if __name__ == "__main__":
    main()
