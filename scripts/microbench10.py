"""Phase breakdown of the 1M-particle flagship AMHAMCL step: where do the
94 ms go?  Times each phase standalone with dependency-chained carries."""
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
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
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
    from mcmh_localization_tpu.filter.step import (
        _correct, _predict, _sensor_table, _window_origin,
    )
    from mcmh_localization_tpu.models.motion import (
        invert_delta, motion_density, sample_motion,
    )
    from mcmh_localization_tpu.models.corr_field import (
        correlation_field_scores,
    )
    from mcmh_localization_tpu.filter.mh import asymmetric_mh
    from mcmh_localization_tpu.filter.estimate import estimate_pose
    from mcmh_localization_tpu.filter.init import init_uniform
    from mcmh_localization_tpu.ops.resampling import (
        kld_resample, softmax_weights, systematic_resample_particles,
    )
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
    key = jax.random.PRNGKey(3)
    p = state.particles
    w = jnp.full((N,), 1.0 / N, jnp.float32)

    # full step reference
    @jax.jit
    def full(c):
        st = state.replace(particles=p + c * 1e-30)
        st = _predict(st, delta, gm, config)
        st, _ = _correct(st, ranges, angles, gm, log_field, config)
        return c + jnp.sum(st.particles[:8]) * 1e-30
    timed(f"[{N//1000}k] FULL step", full)

    @jax.jit
    def predict(c):
        out = sample_motion(key, p + c * 1e-30, delta, config.alpha, gm,
                            retries=0)
        return c + jnp.sum(out[:8]) * 1e-30
    timed(f"[{N//1000}k] predict (sample_motion r=0)", predict)

    @jax.jit
    def score2(c):
        st = state.replace(particles=p + c * 1e-30)
        wo = _window_origin(st, gm, config)
        both = jnp.concatenate([st.particles, st.particles + 1e-4])
        s = correlation_field_scores(
            both, ranges=ranges, angles=angles, grid_map=gm, config=config,
            log_field=log_field, n_theta=config.corr_n_theta,
            window_origin=wo)
        return c + jnp.sum(s[:8]) * 1e-30
    timed(f"[{N//1000}k] two-set corr scoring (2N)", score2)

    @jax.jit
    def softm(c):
        s = p[:, 0] * 1e-3 + c * 1e-30
        return c + jnp.sum(softmax_weights(s, None)[:8]) * 1e-30
    timed(f"[{N//1000}k] softmax weights", softm)

    @jax.jit
    def trans(c):
        prev = p + c * 1e-30
        cur = p + 0.05
        fwd = motion_density(prev, cur, delta, config.alpha)
        bwd = motion_density(cur, prev, invert_delta(delta), config.alpha)
        return c + jnp.sum(fwd[:8] + bwd[:8]) * 1e-30
    timed(f"[{N//1000}k] MH transition densities", trans)

    @jax.jit
    def mh(c):
        prev = p + c * 1e-30
        cur = p + 0.05
        fwd = motion_density(prev, cur, delta, config.alpha)
        bwd = motion_density(cur, prev, invert_delta(delta), config.alpha)
        pp, ww, acc = asymmetric_mh(key, prev, cur, w, w, fwd, bwd)
        return c + jnp.sum(pp[:8]) * 1e-30
    timed(f"[{N//1000}k] MH total (dens + accept)", mh)

    @jax.jit
    def est(c):
        e = estimate_pose(p + c * 1e-30, w, None)
        return c + jnp.sum(e.mean) * 1e-30
    timed(f"[{N//1000}k] estimate (mean+cov)", est)

    @jax.jit
    def kld(c):
        s, n_kept = kld_resample(
            key, p + c * 1e-30, w, max_samples=N,
            min_particles=config.min_particles,
            bin_size_xy=config.kld_bin_size_xy,
            bin_size_theta=config.kld_bin_size_theta,
            epsilon=config.kld_epsilon, z=config.kld_z,
            count=jnp.int32(N))
        return c + jnp.sum(s[:8]) * 1e-30 + n_kept * 1e-30
    timed(f"[{N//1000}k] kld_resample", kld)

    from mcmh_localization_tpu.ops.take_pallas import take_rows_monotone
    from mcmh_localization_tpu.ops.resampling import (
        systematic_resample_indices,
    )

    idx0 = systematic_resample_indices(key, w, N)

    @jax.jit
    def takex(c):
        out = take_rows_monotone(p + c * 1e-30, idx0)
        return c + jnp.sum(out[:8]) * 1e-30
    timed(f"[{N//1000}k] take_rows_monotone (kernel)", takex)

    @jax.jit
    def takeg(c):
        out = (p + c * 1e-30)[idx0]
        return c + jnp.sum(out[:8]) * 1e-30
    timed(f"[{N//1000}k] particles[idx] (XLA)", takeg)

    for impl in ("mxu", "gather", "scan"):
        @jax.jit
        def rs(c, impl=impl):
            out = systematic_resample_particles(
                key, p + c * 1e-30, w, N, impl=impl)
            return c + jnp.sum(out[:8]) * 1e-30
        timed(f"[{N//1000}k] systematic_resample impl={impl}", rs)

    @jax.jit
    def iu(c):
        out = init_uniform(key, N, gm)
        return c + jnp.sum(out[:8]) * 1e-30 + c * 0
    timed(f"[{N//1000}k] init_uniform (injection branch)", iu)


if __name__ == "__main__":
    main()
