"""Per-op TPU microbenchmark: find where the step time goes.

Run on the real chip:  python scripts/microbench.py
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

N = 100_000
M = 384  # padded beams


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:10.3f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    # 0) dispatch overhead: trivial op
    x_small = jnp.ones((8, 128))
    timed("dispatch (tiny add)", jax.jit(lambda x: x + 1), x_small, iters=100)

    # 1) endpoint math: (N,1)x(1,M) outer products + trig
    parts = jax.random.uniform(ks[0], (N, 3), dtype=jnp.float32)
    u = jax.random.uniform(ks[1], (M,), dtype=jnp.float32)
    v = jax.random.uniform(ks[2], (M,), dtype=jnp.float32)

    @jax.jit
    def endpoints(parts, u, v):
        c = jnp.cos(parts[:, 2])[:, None]
        s = jnp.sin(parts[:, 2])[:, None]
        lx = parts[:, 0][:, None] + c * u[None, :] - s * v[None, :]
        ly = parts[:, 1][:, None] + s * u[None, :] + c * v[None, :]
        return lx, ly

    timed("endpoints (N x M trig+outer)", endpoints, parts, u, v)

    # 2) the gather: N*M random indices into a 147k table
    table = jax.random.uniform(ks[3], (384 * 384,), dtype=jnp.float32)
    idx = jax.random.randint(ks[4], (N, M), 0, 384 * 384)

    timed("gather N*M from 147k table", jax.jit(lambda t, i: jnp.take(t, i)), table, idx)

    # 3) full jnp likelihood path
    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.models.sensor import likelihood_field_scores
    from __graft_entry__ import _build_map

    gm = _build_map()
    cfg = FilterConfig()
    ranges = jax.random.uniform(ks[5], (360,), minval=0.3, maxval=4.0)
    angles = jnp.linspace(-np.pi, np.pi, 360)
    f = jax.jit(
        lambda p, r, a: likelihood_field_scores(p, r, a, gm, cfg)
    )
    timed("likelihood jnp (100k x 360)", f, parts, ranges, angles)

    # 3b) pallas likelihood
    from mcmh_localization_tpu.ops.likelihood_pallas import (
        likelihood_field_scores_pallas,
    )

    fp = jax.jit(
        lambda p, r, a: likelihood_field_scores_pallas(p, r, a, gm, cfg)
    )
    try:
        timed("likelihood pallas (100k x 360)", fp, parts, ranges, angles)
    except Exception as e:
        print("pallas likelihood FAILED:", type(e).__name__, str(e)[:500])

    # 4) sorts at N
    w = jax.random.uniform(ks[6], (N,))
    timed("argsort 100k", jax.jit(jnp.argsort), w)
    keys3 = jax.random.randint(ks[7], (3, N), 0, 1000)
    timed("lexsort 3x100k", jax.jit(lambda k: jnp.lexsort((k[0], k[1], k[2]))), keys3)

    # 5) searchsorted variants
    cum = jnp.cumsum(w) / jnp.sum(w)
    q = jnp.linspace(0, 0.999, N)
    timed(
        "searchsorted sort-method 100k/100k",
        jax.jit(lambda c, u: jnp.searchsorted(c, u, method="sort")), cum, q,
    )
    timed(
        "searchsorted scan-method (default)",
        jax.jit(lambda c, u: jnp.searchsorted(c, u)), cum, q,
    )

    # 6) motion sampling
    from mcmh_localization_tpu.models.motion import sample_motion

    fm = jax.jit(
        lambda k, p: sample_motion(k, p, jnp.array([0.01, 0.05, 0.01]),
                                   (0.002, 0.03, 0.08, 0.002), gm)
    )
    timed("sample_motion 100k (8 retries)", fm, ks[8], parts)

    # 7) full steps per mode
    from mcmh_localization_tpu.filter.step import _correct, _predict
    from mcmh_localization_tpu.models.sensor import log_likelihood_field
    from __graft_entry__ import _example_inputs

    for mode in ("MCL", "MHMCL", "AMHAMCL"):
        cfg2 = FilterConfig(
            mode=mode, num_particles=N, min_particles=1000, max_particles=N,
            initialized=True, initial_pose=(0.0, 0.0, 0.3),
        )
        lf = log_likelihood_field(gm, cfg2)

        @jax.jit
        def step(state, ranges, angles, delta, cfg2=cfg2, lf=lf):
            st = _predict(state, delta, gm, cfg2)
            return _correct(st, ranges, angles, gm, lf, cfg2)

        state, sr, sa, sd = _example_inputs(gm, cfg2, 360)
        timed(f"full step {mode} 100k", lambda s=state: step(s, sr, sa, sd))


if __name__ == "__main__":
    main()
