"""Round 2: why is the fused likelihood 274 ms when the raw gather is fast?

Variants: optimization_barrier isolation, PROMISE_IN_BOUNDS, flat indices.
Plus honest-scale checks (known-FLOP matmul, known-bandwidth copy).
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
M = 360


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:10.3f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)

    # honest scale checks
    a = jax.random.normal(ks[0], (4096, 4096), dtype=jnp.float32)
    t = timed("matmul 4096^3 f32 (expect ~2.8ms)", jax.jit(lambda a: a @ a), a)
    big = jax.random.normal(ks[1], (38_400_000,), dtype=jnp.float32)
    timed("copy 154MB (expect ~0.4ms)", jax.jit(lambda x: x + 1.0), big)

    table = jax.random.uniform(ks[2], (384 * 384,), dtype=jnp.float32)
    idx2d = jax.random.randint(ks[3], (N, M), 0, 384 * 384)
    idx1d = idx2d.reshape(-1)

    timed("raw take (N,M)", jax.jit(lambda t_, i: jnp.take(t_, i)), table, idx2d)
    timed("raw take flat (N*M,)", jax.jit(lambda t_, i: jnp.take(t_, i)), table, idx1d)
    timed(
        "take promise_in_bounds",
        jax.jit(lambda t_, i: jnp.take(t_, i, mode="promise_in_bounds")),
        table, idx2d,
    )

    # gather + elementwise producer/consumer FUSED (mimics likelihood)
    parts = jax.random.uniform(ks[4], (N, 3), dtype=jnp.float32)
    u = jax.random.uniform(ks[5], (M,), dtype=jnp.float32)
    v = jax.random.uniform(ks[6], (M,), dtype=jnp.float32)

    def endpoints_idx(parts, u, v):
        c = jnp.cos(parts[:, 2])[:, None]
        s = jnp.sin(parts[:, 2])[:, None]
        lx = parts[:, 0][:, None] + c * u[None, :] - s * v[None, :]
        ly = parts[:, 1][:, None] + s * u[None, :] + c * v[None, :]
        mx = ((lx + 10.0) * 20.0).astype(jnp.int32)
        my = ((ly + 10.0) * 20.0).astype(jnp.int32)
        return jnp.clip(my, 0, 383) * 384 + jnp.clip(mx, 0, 383), mx, my

    @jax.jit
    def fused(parts, u, v, table):
        idx, mx, my = endpoints_idx(parts, u, v)
        vals = jnp.take(table, idx)
        ok = (mx >= 0) & (mx < 384) & (my >= 0) & (my < 384)
        return jnp.sum(jnp.where(ok, vals, 0.0), axis=1)

    timed("fused endpoints+take+mask+sum", fused, parts, u, v, table)

    @jax.jit
    def barriered(parts, u, v, table):
        idx, mx, my = endpoints_idx(parts, u, v)
        idx = jax.lax.optimization_barrier(idx)
        vals = jnp.take(table, idx, mode="promise_in_bounds")
        vals = jax.lax.optimization_barrier(vals)
        ok = (mx >= 0) & (mx < 384) & (my >= 0) & (my < 384)
        return jnp.sum(jnp.where(ok, vals, 0.0), axis=1)

    timed("barriered take promise", barriered, parts, u, v, table)

    @jax.jit
    def barriered_clip(parts, u, v, table):
        idx, mx, my = endpoints_idx(parts, u, v)
        idx = jax.lax.optimization_barrier(idx)
        vals = jnp.take(table, idx)
        vals = jax.lax.optimization_barrier(vals)
        ok = (mx >= 0) & (mx < 384) & (my >= 0) & (my < 384)
        return jnp.sum(jnp.where(ok, vals, 0.0), axis=1)

    timed("barriered take clip-mode", barriered_clip, parts, u, v, table)

    # actual likelihood with barrier variant injected
    from mcmh_localization_tpu.config import FilterConfig
    from __graft_entry__ import _build_map

    gm = _build_map()
    cfg = FilterConfig()
    ranges = jax.random.uniform(ks[7], (M,), minval=0.3, maxval=4.0)
    angles = jnp.linspace(-np.pi, np.pi, M)
    from mcmh_localization_tpu.models.sensor import likelihood_field_scores

    timed(
        "likelihood jnp current",
        jax.jit(lambda p, r, a: likelihood_field_scores(p, r, a, gm, cfg)),
        parts, ranges, angles,
    )

    # sorts check at adaptive sizes
    w = jax.random.uniform(ks[8], (N,))
    from mcmh_localization_tpu.ops.resampling import (
        systematic_resample_indices,
        kld_resample,
    )

    timed(
        "systematic (sort-free) 100k",
        jax.jit(lambda k, w_: systematic_resample_indices(k, w_, N)),
        ks[9], w,
    )
    p3 = jax.random.uniform(ks[10], (N, 3), dtype=jnp.float32)
    timed(
        "kld_resample 100k (hash bins)",
        jax.jit(
            lambda k, p, w_: kld_resample(
                k, p, w_, max_samples=N, min_particles=1000,
                bin_size_xy=0.2, bin_size_theta=0.17, epsilon=0.03, z=2.0,
            )
        ),
        ks[11], p3, w,
    )


if __name__ == "__main__":
    main()
