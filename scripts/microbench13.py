"""Round-3 phase breakdown with IN-DISPATCH scan loops: each phase runs
iters times under one lax.scan dispatch (carry-chained), so per-iteration
cost is clean of the ~3.6 ms tunnel enqueue and of XLA per-dispatch
overhead (microbench10's standalone timings go negative for cheap ops).

Usage: python scripts/microbench13.py [N]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

ITERS = 32
DISP = 3


def timed(name, phase_fn, iters=ITERS):
    """phase_fn: f32 carry -> f32 carry, run iters x inside one dispatch."""
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
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print("devices:", jax.devices(), flush=True)

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import (
        _correct, _predict, _sensor_table, _window_origin,
    )
    from mcmh_localization_tpu.models.motion import (
        invert_delta, motion_density, sample_motion,
    )
    from mcmh_localization_tpu.models.corr_field import (
        _bin_offsets, _build_field_dft, correlation_field_scores,
    )
    from mcmh_localization_tpu.filter.mh import asymmetric_mh
    from mcmh_localization_tpu.filter.estimate import estimate_pose
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
    kN = N // 1000

    def full(c):
        st = state.replace(particles=p + c * 1e-30)
        st = _predict(st, delta, gm, config)
        st, _ = _correct(st, ranges, angles, gm, log_field, config)
        return c + jnp.sum(st.particles[:8]) * 1e-30
    timed(f"[{kN}k] FULL step", full, iters=8)

    def predict(c):
        out = sample_motion(key, p + c * 1e-30, delta, config.alpha,
                            gm, retries=0)
        return c + jnp.sum(out[:8]) * 1e-30
    timed(f"[{kN}k] predict (sample_motion r=0)", predict)

    def rng_n3(c):
        eps = jax.random.normal(key, (N, 3), jnp.float32)
        return c + jnp.sum(eps[:4]) * 1e-30 + c * 1e-30
    timed(f"[{kN}k] random.normal (N,3)", rng_n3)

    def rng_3n(c):
        eps = jax.random.normal(key, (3, N), jnp.float32)
        return c + jnp.sum(eps[:, :4]) * 1e-30 + c * 1e-30
    timed(f"[{kN}k] random.normal (3,N)", rng_3n)

    def motion_3n(c):
        # prototype: (3, N) layout motion sampling, no (N, 3) arrays at all
        eps = jax.random.normal(key, (3, N), jnp.float32)
        pt = p.T + c * 1e-30
        r1 = delta[0] + eps[0] * 0.01
        t = delta[1] + eps[1] * 0.02
        r2 = delta[2] + eps[2] * 0.01
        heading = pt[2] + r1
        out = jnp.stack([pt[0] + t * jnp.cos(heading),
                         pt[1] + t * jnp.sin(heading),
                         heading + r2])
        return c + jnp.sum(out[:, :4]) * 1e-30
    timed(f"[{kN}k] predict prototype (3,N) layout", motion_3n)

    def score2(c):
        wo = _window_origin(state, gm, config)
        both = jnp.concatenate([p + c * 1e-30, p + 1e-4])
        s = correlation_field_scores(
            both, ranges=ranges, angles=angles, grid_map=gm, config=config,
            log_field=log_field, n_theta=config.corr_n_theta,
            window_origin=wo)
        return c + jnp.sum(s[:8]) * 1e-30
    timed(f"[{kN}k] two-set corr scoring (2N)", score2)

    def build_only(c):
        wo = _window_origin(state, gm, config)
        s = correlation_field_scores(
            p[:128] + c * 1e-30, ranges=ranges + c * 1e-30, angles=angles,
            grid_map=gm, config=config, log_field=log_field,
            n_theta=config.corr_n_theta, window_origin=wo)
        return c + jnp.sum(s[:8]) * 1e-30
    timed("[128] corr scores (fine+coarse builds)", build_only)

    # DFT fine build alone
    res = float(jax.device_get(gm.resolution))
    pad_cells = int(-(-config.max_range // res)) + 2
    lf32 = log_field.astype(jnp.float32)
    padded0 = jnp.pad(lf32, pad_cells)
    zrow = padded0.shape[0]
    valid = jnp.isfinite(ranges) & (ranges < config.max_range)
    safe_r = jnp.where(valid, ranges, 0.0)
    u = (safe_r * jnp.cos(angles)).astype(jnp.float32)
    v = (safe_r * jnp.sin(angles)).astype(jnp.float32)

    def dft_build(c):
        ox, oy = _bin_offsets(u + c * 1e-30, v, valid, 1.0 / res, 120,
                              pad_cells, zrow, bin_start=3, nbins=32)
        side = 128 + 2 * pad_cells
        region = jax.lax.dynamic_slice(padded0, (60, 60), (side, side))
        f = _build_field_dft(region, ox, oy, valid, 128, 128)
        return c + jnp.sum(f[:, 0, 0]) * 1e-30
    timed("[fine] DFT field build alone (32 bins)", dft_build)

    def softm(c):
        s = p[:, 0] * 1e-3 + c * 1e-30
        return c + jnp.sum(softmax_weights(s, None)[:8]) * 1e-30
    timed(f"[{kN}k] softmax weights", softm)

    def mh(c):
        prev = p + c * 1e-30
        cur = p + 0.05
        fwd = motion_density(prev, cur, delta, config.alpha)
        bwd = motion_density(cur, prev, invert_delta(delta), config.alpha)
        pp, ww, acc = asymmetric_mh(key, prev, cur, w, w, fwd, bwd)
        return c + jnp.sum(pp[:8]) * 1e-30
    timed(f"[{kN}k] MH total (dens + accept)", mh)

    def est(c):
        e = estimate_pose(p + c * 1e-30, w, None)
        return c + jnp.sum(e.mean) * 1e-30
    timed(f"[{kN}k] estimate (mean+cov)", est)

    def kld(c):
        s, n_kept = kld_resample(
            key, p + c * 1e-30, w, max_samples=N,
            min_particles=config.min_particles,
            bin_size_xy=config.kld_bin_size_xy,
            bin_size_theta=config.kld_bin_size_theta,
            epsilon=config.kld_epsilon, z=config.kld_z,
            count=jnp.int32(N))
        return c + jnp.sum(s[:8]) * 1e-30 + n_kept * 1e-30
    timed(f"[{kN}k] kld_resample", kld, iters=8)

    def rs(c):
        out = systematic_resample_particles(key, p + c * 1e-30, w, N,
                                            impl="mxu")
        return c + jnp.sum(out[:8]) * 1e-30
    timed(f"[{kN}k] systematic_resample mxu", rs)

    # ---- beam field: current dense build vs the LUT kernel
    cfg_beam = FilterConfig(
        mode="AMHAMCL", num_particles=N, min_particles=N, max_particles=N,
        initialized=True, initial_pose=(0.0, 0.0, 0.3),
        sensor_model="beam", beam_impl="field", beam_table_n_theta=360,
        corr_window_cells=128, corr_theta_window_bins=32,
        motion_validity="score", min_injection_prob=0.02,
    )
    tables = _sensor_table(gm, cfg_beam)
    from mcmh_localization_tpu.models.range_table import beam_field_scores

    def beam_scores_n(n_arr, label, impl, iters=ITERS):
        def f(c):
            wo = _window_origin(state, gm, cfg_beam,
                                n_theta=cfg_beam.beam_table_n_theta)
            s = beam_field_scores(
                n_arr + c * 1e-30, ranges=ranges, angles=angles,
                grid_map=gm, config=cfg_beam, table=tables,
                n_theta=cfg_beam.beam_table_n_theta, window_origin=wo,
                impl=impl)
            return c + jnp.sum(s[:8]) * 1e-30
        return timed(label, f, iters=iters)

    beam_scores_n(p[:128], "[128] beam field build DENSE", "dense", iters=8)
    beam_scores_n(p[:128], "[128] beam field build LUT kernel", "lut")
    beam_scores_n(p, f"[{kN}k] beam field full scoring LUT", "lut")


if __name__ == "__main__":
    main()
