"""Round-2: full-step phase breakdown at 100k and 1M particles on the chip.

Chained timing (see microbench3).  Run after integrating the MXU gather
kernel to quantify each phase: motion, scoring (corr windowed), MH,
resampling, and the full step, at both operating points.
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
    from mcmh_localization_tpu.filter.step import _correct, _predict
    from mcmh_localization_tpu.models.sensor import log_likelihood_field
    from mcmh_localization_tpu.models.corr_field import correlation_field_scores
    from mcmh_localization_tpu.models.motion import sample_motion
    from mcmh_localization_tpu.ops.resampling import (
        kld_resample, systematic_resample_indices,
    )
    from __graft_entry__ import _build_map, _example_inputs

    gm = _build_map()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    for n in (100_000, 1_000_000):
        tag = f"{n//1000}k"
        cfg = FilterConfig(
            mode="AMHAMCL", num_particles=n, min_particles=1000,
            max_particles=n, initialized=True, initial_pose=(0.0, 0.0, 0.3),
            corr_window_cells=128,
            corr_theta_window_bins=32,
        )
        lf = log_likelihood_field(gm, cfg)
        state, ranges, angles, delta = _example_inputs(gm, cfg, 360)
        p3 = state.particles
        w = jnp.ones(n) / n

        timed_chain(
            f"[{tag}] motion sample (retries=4)",
            jax.jit(lambda c, p3=p3, cfg=cfg: jnp.sum(sample_motion(
                ks[0], p3 + c * 1e-30, delta, cfg.alpha, gm)) * 1e-30),
        )
        res = float(jax.device_get(gm.resolution))
        half = cfg.corr_window_cells // 2
        wo = (jnp.int32((0.0 + 10.0) / res) - half,
              jnp.int32((0.0 + 10.0) / res) - half,
              jnp.int32((0.3 + 3.14159) * cfg.corr_n_theta / 6.28318) - 16)
        timed_chain(
            f"[{tag}] corr scores windowed (1 call)",
            jax.jit(lambda c, p3=p3, cfg=cfg, lf=lf: jnp.sum(
                correlation_field_scores(
                    p3 + c * 1e-30, ranges, angles, gm, cfg,
                    log_field=lf, n_theta=cfg.corr_n_theta,
                    window_origin=wo)) * 1e-30),
        )
        timed_chain(
            f"[{tag}] systematic resample idx",
            jax.jit(lambda c, w=w, n=n: jnp.sum(systematic_resample_indices(
                ks[1], w + c * 1e-30, n)) * 1e-30),
        )
        timed_chain(
            f"[{tag}] resample idx + row gather",
            jax.jit(lambda c, w=w, n=n, p3=p3: jnp.sum(
                p3[systematic_resample_indices(ks[1], w + c * 1e-30, n)]
            ) * 1e-30),
        )
        timed_chain(
            f"[{tag}] kld_resample",
            jax.jit(lambda c, w=w, n=n, p3=p3, cfg=cfg: jnp.sum(kld_resample(
                ks[2], p3 + c * 1e-30, w, max_samples=n,
                min_particles=1000, bin_size_xy=0.2, bin_size_theta=0.17,
                epsilon=0.03, z=2.0)[0]) * 1e-30),
        )

        @jax.jit
        def step(state, c, cfg=cfg, lf=lf):
            st = state.replace(particles=state.particles + c * 1e-30)
            st = _predict(st, delta, gm, cfg)
            st, info = _correct(st, ranges, angles, gm, lf, cfg)
            return jnp.sum(st.particles) * 1e-30

        timed_chain(f"[{tag}] FULL AMHAMCL step win128",
                    lambda c, step=step, state=state: step(state, c))


if __name__ == "__main__":
    main()
