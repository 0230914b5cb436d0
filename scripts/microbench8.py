"""Round-2b: decompose the remaining 1M-particle step cost.

Targets (chained timing, see microbench3): corr scoring with/without the
coarse fallback, the two gather calls separately, init_uniform's free-cell
row gather, the MH transition densities, softmax, cluster estimate.
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

_RTT_MS = None


def timed_chain(name, step_fn, iters=20):
    global _RTT_MS
    c = jnp.float32(0.0)
    try:
        c = step_fn(c)
        float(c)
    except Exception as e:
        print(f"{name:52s}   FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = step_fn(c)
    float(c)
    total_ms = (time.perf_counter() - t0) * 1e3
    per = (total_ms - (_RTT_MS or 0.0)) / iters
    print(f"{name:52s} {per:9.3f} ms", flush=True)
    return per


def main():
    global _RTT_MS
    print("devices:", jax.devices(), flush=True)
    f_id = jax.jit(lambda c: c + 1.0)
    c = f_id(jnp.float32(0)); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(20):
        c = f_id(c)
    float(c)
    _RTT_MS = (time.perf_counter() - t0) * 1e3
    print(f"{'empty chain (rtt+20 tiny)':52s} {_RTT_MS:9.3f} ms", flush=True)

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.models.corr_field import correlation_field_scores
    from mcmh_localization_tpu.models.motion import motion_density
    from mcmh_localization_tpu.filter.init import init_uniform
    from mcmh_localization_tpu.filter.estimate import (
        estimate_pose, estimate_pose_cluster,
    )
    from mcmh_localization_tpu.ops.resampling import softmax_weights
    from __graft_entry__ import _build_map, _example_inputs

    gm = _build_map()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    n = 1_000_000
    cfg = FilterConfig(
        mode="AMHAMCL", num_particles=n, min_particles=n,
        max_particles=n, initialized=True, initial_pose=(0.0, 0.0, 0.3),
        corr_window_cells=128, corr_theta_window_bins=32,
    )
    cfg_nc = cfg.replace(corr_coarse_factor=0)
    from mcmh_localization_tpu.models.sensor import log_likelihood_field
    lf = log_likelihood_field(gm, cfg)
    state, ranges, angles, delta = _example_inputs(gm, cfg, 360)
    p3 = state.particles
    w = jnp.ones(n) / n
    res = float(jax.device_get(gm.resolution))
    half = cfg.corr_window_cells // 2
    wo = (jnp.int32((0.0 + 10.0) / res) - half,
          jnp.int32((0.0 + 10.0) / res) - half,
          jnp.int32((0.3 + 3.14159) * cfg.corr_n_theta / 6.28318) - 16)

    timed_chain(
        "[1M] corr scores (fine+coarse)",
        jax.jit(lambda c, p3=p3: jnp.sum(correlation_field_scores(
            p3 + c * 1e-30, ranges, angles, gm, cfg,
            log_field=lf, n_theta=cfg.corr_n_theta,
            window_origin=wo)) * 1e-30),
    )
    timed_chain(
        "[1M] corr scores (fine only, coarse=0)",
        jax.jit(lambda c, p3=p3: jnp.sum(correlation_field_scores(
            p3 + c * 1e-30, ranges, angles, gm, cfg_nc,
            log_field=lf, n_theta=cfg.corr_n_theta,
            window_origin=wo)) * 1e-30),
    )
    timed_chain(
        "[2M] corr scores concat (fine+coarse)",
        jax.jit(lambda c, p3=p3: jnp.sum(correlation_field_scores(
            jnp.concatenate([p3, p3]) + c * 1e-30, ranges, angles, gm, cfg,
            log_field=lf, n_theta=cfg.corr_n_theta,
            window_origin=wo)) * 1e-30),
    )
    timed_chain(
        "[1M] init_uniform (free-cell row gather)",
        jax.jit(lambda c, n=n: jnp.sum(init_uniform(
            jax.random.fold_in(ks[3], jnp.int32(c * 1e30 + 1)), n, gm
        )) * 1e-30),
    )
    timed_chain(
        "[1M] motion_density fwd+bwd",
        jax.jit(lambda c, p3=p3: (
            jnp.sum(motion_density(p3 + c * 1e-30, p3, delta, cfg.alpha))
            + jnp.sum(motion_density(p3, p3 + c * 1e-30, delta, cfg.alpha))
        ) * 1e-30),
    )
    timed_chain(
        "[2M] softmax_weights",
        jax.jit(lambda c, w=w: jnp.sum(softmax_weights(
            jnp.concatenate([w, w]) + c * 1e-30)) * 1e-30),
    )
    timed_chain(
        "[1M] estimate_pose (global)",
        jax.jit(lambda c, p3=p3: jnp.sum(estimate_pose(
            p3 + c * 1e-30, w).mean) * 1e-30),
    )
    timed_chain(
        "[1M] estimate_pose_cluster",
        jax.jit(lambda c, p3=p3: jnp.sum(estimate_pose_cluster(
            p3 + c * 1e-30, w).mean) * 1e-30),
    )
    timed_chain(
        "[1M] exp(per_beam) w_avg",
        jax.jit(lambda c, w=w: jnp.sum(jnp.exp(w + c * 1e-30)) * 1e-30),
    )
    timed_chain(
        "[1M] roll axis0",
        jax.jit(lambda c, p3=p3: jnp.sum(jnp.roll(
            p3 + c * 1e-30, 137, axis=0)) * 1e-30),
    )


def main2():
    """New-code additions: retries-0 motion, full _correct, full step at the
    exact bench config (invoke with `python microbench8.py 2`)."""
    global _RTT_MS
    import time as _t
    f_id = jax.jit(lambda c: c + 1.0)
    c = f_id(jnp.float32(0)); float(c)
    t0 = _t.perf_counter()
    c = jnp.float32(0)
    for _ in range(20):
        c = f_id(c)
    float(c)
    _RTT_MS = (_t.perf_counter() - t0) * 1e3
    print(f"{'empty chain (rtt+20 tiny)':52s} {_RTT_MS:9.3f} ms", flush=True)

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import (
        _correct, _predict, _sensor_table,
    )
    from mcmh_localization_tpu.models.motion import sample_motion
    from mcmh_localization_tpu.models.corr_field import correlation_field_scores
    from __graft_entry__ import _build_map, _example_inputs

    gm = _build_map()
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    n = 1_000_000
    cfg = FilterConfig(
        mode="AMHAMCL", num_particles=n, min_particles=n, max_particles=n,
        initialized=True, initial_pose=(0.0, 0.0, 0.3),
        corr_window_cells=128, corr_theta_window_bins=32,
        likelihood_impl="corr", motion_validity="score",
        min_injection_prob=0.02,
    )
    lf = _sensor_table(gm, cfg)
    state, ranges, angles, delta = _example_inputs(gm, cfg, 360)
    p3 = state.particles
    res = float(jax.device_get(gm.resolution))
    half = cfg.corr_window_cells // 2
    wo = (jnp.int32((0.0 + 10.0) / res) - half,
          jnp.int32((0.0 + 10.0) / res) - half,
          jnp.int32((0.3 + 3.14159) * cfg.corr_n_theta / 6.28318) - 16)

    timed_chain(
        "[1M] motion sample retries=0",
        jax.jit(lambda c, p3=p3: jnp.sum(sample_motion(
            ks[0], p3 + c * 1e-30, delta, cfg.alpha, gm, retries=0
        )) * 1e-30),
    )
    timed_chain(
        "[2M] corr scores MERGED (fine+coarse)",
        jax.jit(lambda c, p3=p3: jnp.sum(correlation_field_scores(
            jnp.concatenate([p3, p3]) + c * 1e-30, ranges, angles, gm, cfg,
            log_field=lf, n_theta=cfg.corr_n_theta,
            window_origin=wo)) * 1e-30),
    )
    timed_chain(
        "[1M] corr scores MERGED (fine+coarse)",
        jax.jit(lambda c, p3=p3: jnp.sum(correlation_field_scores(
            p3 + c * 1e-30, ranges, angles, gm, cfg,
            log_field=lf, n_theta=cfg.corr_n_theta,
            window_origin=wo)) * 1e-30),
    )

    @jax.jit
    def corr_only(state, c):
        st = state.replace(particles=state.particles + c * 1e-30)
        st, info = _correct(st, ranges, angles, gm, lf, cfg)
        return jnp.sum(st.particles) * 1e-30

    timed_chain("[1M] _correct only (bench cfg)",
                lambda c, state=state: corr_only(state, c))

    @jax.jit
    def full(state, c):
        st = state.replace(particles=state.particles + c * 1e-30)
        st = _predict(st, delta, gm, cfg)
        st, info = _correct(st, ranges, angles, gm, lf, cfg)
        return jnp.sum(st.particles) * 1e-30

    timed_chain("[1M] FULL step (bench cfg)",
                lambda c, state=state: full(state, c))


if __name__ == "__main__":
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "2":
        print("devices:", jax.devices(), flush=True)
        main2()
