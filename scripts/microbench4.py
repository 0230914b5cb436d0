"""Round 4: isolate scatter/cummax/cumsum; gather-variant hunt; small tables."""

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


def timed_chain(name, step_fn, iters=10):
    c = jnp.float32(0.0)
    c = step_fn(c)
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = step_fn(c)
    float(c)
    total_ms = (time.perf_counter() - t0) * 1e3
    print(f"{name:50s} {total_ms / iters:10.3f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    w = jax.random.uniform(ks[0], (N,))
    starts = jnp.sort(jax.random.randint(ks[1], (N,), 0, N))
    vals = jnp.arange(N, dtype=jnp.int32)

    timed_chain("cumsum 100k",
                jax.jit(lambda c: jnp.sum(jnp.cumsum(w + c * 0)) * 1e-30))
    timed_chain("cummax 100k",
                jax.jit(lambda c: jnp.sum(jax.lax.cummax(w + c * 0)) * 1e-30))
    timed_chain(
        "scatter-max 100k->100k",
        jax.jit(
            lambda c: jnp.sum(
                jnp.full(N, -1, jnp.int32).at[starts + (c * 0).astype(jnp.int32)]
                .max(vals, mode="drop")
            )
            * 1e-30
        ),
    )
    timed_chain(
        "ceil+clip+compare chain (bound calc)",
        jax.jit(
            lambda c: jnp.sum(
                jnp.clip(jnp.ceil((jnp.cumsum(w + c * 0)) * N - 0.5), 0, N)
            )
            * 1e-30
        ),
    )

    # gather variants
    table = jax.random.uniform(ks[2], (384 * 384,), dtype=jnp.float32)
    t2d = table.reshape(384, 384)
    mx = jax.random.randint(ks[3], (N, M), 0, 384)
    my = jax.random.randint(ks[4], (N, M), 0, 384)
    idx = my * 384 + mx

    timed_chain("gather flat (N,M) [repeat measure]",
                jax.jit(lambda c: jnp.sum(jnp.take(table + c, idx)) * 1e-30), iters=3)
    timed_chain("gather 2D t[my,mx]",
                jax.jit(lambda c: jnp.sum((t2d + c)[my, mx]) * 1e-30), iters=3)
    timed_chain(
        "gather rows-then-cols (take_along_axis)",
        jax.jit(
            lambda c: jnp.sum(
                jnp.take_along_axis(
                    jnp.take(t2d + c, my.reshape(-1), axis=0),
                    mx.reshape(-1, 1), axis=1,
                )
            )
            * 1e-30
        ),
        iters=3,
    )

    # small-table scaling: is there a size below which gathers get fast?
    for size in (256, 2048, 16384, 131072):
        small = jax.random.uniform(ks[5], (size,), dtype=jnp.float32)
        sidx = jax.random.randint(ks[6], (N, M), 0, size)
        timed_chain(
            f"gather (N,M) from {size}-entry table",
            jax.jit(lambda c, s=small, i=sidx: jnp.sum(jnp.take(s + c, i)) * 1e-30),
            iters=3,
        )

    # gather count scaling at fixed table
    for count in (100_000, 1_000_000, 10_000_000):
        gidx = jax.random.randint(ks[7], (count,), 0, 384 * 384)
        timed_chain(
            f"gather {count} elems from 147k table",
            jax.jit(lambda c, i=gidx: jnp.sum(jnp.take(table + c, i)) * 1e-30),
            iters=3,
        )

    # dense shifted-add: the correlation-field primitive
    L = jax.random.uniform(ks[8], (512, 512), dtype=jnp.float32)
    offs = np.stack(
        [np.random.default_rng(0).integers(0, 128, M),
         np.random.default_rng(1).integers(0, 128, M)], axis=1
    )

    @jax.jit
    def shifted_sum(c):
        Lp = L + c * 0
        acc = jnp.zeros((384, 384), dtype=jnp.float32)
        for j in range(M):
            oy, ox = int(offs[j, 0]), int(offs[j, 1])
            acc = acc + jax.lax.dynamic_slice(Lp, (oy, ox), (384, 384))
        return jnp.sum(acc) * 1e-30

    timed_chain("360 shifted adds of 384^2 (one theta-bin)", shifted_sum, iters=3)


if __name__ == "__main__":
    main()
