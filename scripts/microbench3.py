"""Round 3: trustworthy timings via data-dependency chaining.

block_until_ready through the axon tunnel returns early, so every timing is
enqueue cost, not execution.  Here each iteration's input depends on the
previous iteration's output (a scalar carry), so K iterations serialize on
device; one final scalar fetch syncs.  Cost model:
    total = K * exec + fetch_rtt  ->  exec ~ (total - rtt) / K
The reported number uses the measured rtt of an empty chain.
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

_RTT_MS = None


def timed_chain(name, step_fn, iters=20):
    """step_fn: jitted (carry_scalar) -> carry_scalar, doing real work."""
    global _RTT_MS
    c = jnp.float32(0.0)
    c = step_fn(c)  # warm/compile
    float(c)  # sync
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = step_fn(c)
    float(c)  # sync: forces the whole chain
    total_ms = (time.perf_counter() - t0) * 1e3
    per = (total_ms - (_RTT_MS or 0.0)) / iters
    print(f"{name:46s} {per:10.3f} ms", flush=True)
    return per


def main():
    global _RTT_MS
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    # rtt of an empty chain
    f_id = jax.jit(lambda c: c + 1.0)
    c = f_id(jnp.float32(0)); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(20):
        c = f_id(c)
    float(c)
    _RTT_MS = 0.0
    rtt_total = (time.perf_counter() - t0) * 1e3
    print(f"{'empty chain total (rtt+20 tiny)':46s} {rtt_total:10.3f} ms", flush=True)
    _RTT_MS = rtt_total  # subtract overhead baseline from everything

    a = jax.random.normal(ks[0], (4096, 4096), dtype=jnp.float32)
    timed_chain("matmul 4096^3 f32 (expect ~2.8ms)",
                jax.jit(lambda c: jnp.sum((a + c) @ a) * 1e-30))

    big = jax.random.normal(ks[1], (38_400_000,), dtype=jnp.float32)
    timed_chain("read 154MB (expect ~0.2ms)",
                jax.jit(lambda c: jnp.sum(big + c) * 1e-30))

    table = jax.random.uniform(ks[2], (384 * 384,), dtype=jnp.float32)
    idx2d = jax.random.randint(ks[3], (N, M), 0, 384 * 384)

    timed_chain("take (N,M) clip",
                jax.jit(lambda c: jnp.sum(jnp.take(table + c, idx2d)) * 1e-30))
    timed_chain(
        "at[].get promise_in_bounds",
        jax.jit(
            lambda c: jnp.sum((table + c).at[idx2d].get(mode="promise_in_bounds"))
            * 1e-30
        ),
    )

    parts = jax.random.uniform(ks[4], (N, 3), dtype=jnp.float32)
    u = jax.random.uniform(ks[5], (M,), dtype=jnp.float32)
    v = jax.random.uniform(ks[6], (M,), dtype=jnp.float32)

    def fused_like(c, mode):
        p = parts + c * 1e-30
        cc = jnp.cos(p[:, 2])[:, None]
        s = jnp.sin(p[:, 2])[:, None]
        lx = p[:, 0][:, None] + cc * u[None, :] - s * v[None, :]
        ly = p[:, 1][:, None] + s * u[None, :] + cc * v[None, :]
        mx = ((lx + 10.0) * 20.0).astype(jnp.int32)
        my = ((ly + 10.0) * 20.0).astype(jnp.int32)
        idx = jnp.clip(my, 0, 383) * 384 + jnp.clip(mx, 0, 383)
        if mode == "barrier":
            idx = jax.lax.optimization_barrier(idx)
        vals = table.at[idx].get(mode="promise_in_bounds")
        if mode == "barrier":
            vals = jax.lax.optimization_barrier(vals)
        ok = (mx >= 0) & (mx < 384) & (my >= 0) & (my < 384)
        return jnp.sum(jnp.where(ok, vals, 0.0)) * 1e-30

    timed_chain("fused endpoints+gather+mask+sum",
                jax.jit(lambda c: fused_like(c, "fused")))
    timed_chain("same with optimization_barrier",
                jax.jit(lambda c: fused_like(c, "barrier")))

    from mcmh_localization_tpu.config import FilterConfig
    from __graft_entry__ import _build_map
    from mcmh_localization_tpu.models.sensor import likelihood_field_scores

    gm = _build_map()
    cfg = FilterConfig()
    ranges = jax.random.uniform(ks[7], (M,), minval=0.3, maxval=4.0)
    angles = jnp.linspace(-np.pi, np.pi, M)
    timed_chain(
        "likelihood_field_scores (current)",
        jax.jit(
            lambda c: jnp.sum(
                likelihood_field_scores(parts + c * 1e-30, ranges, angles, gm, cfg)
            )
            * 1e-30
        ),
    )

    # sorts & resampling
    w = jax.random.uniform(ks[8], (N,))
    timed_chain("argsort 100k",
                jax.jit(lambda c: jnp.sum(jnp.argsort(w + c * 1e-30)) * 1e-30))

    from mcmh_localization_tpu.ops.resampling import (
        kld_resample,
        systematic_resample_indices,
    )

    timed_chain(
        "systematic (sort-free) 100k",
        jax.jit(
            lambda c: jnp.sum(
                systematic_resample_indices(ks[9], w + c * 1e-30, N)
            )
            * 1e-30
        ),
    )
    p3 = jax.random.uniform(ks[10], (N, 3), dtype=jnp.float32)
    timed_chain(
        "kld_resample 100k (auto bins)",
        jax.jit(
            lambda c: jnp.sum(
                kld_resample(
                    ks[11], p3 + c * 1e-30, w, max_samples=N, min_particles=1000,
                    bin_size_xy=0.2, bin_size_theta=0.17, epsilon=0.03, z=2.0,
                )[0]
            )
            * 1e-30
        ),
    )

    from mcmh_localization_tpu.models.motion import sample_motion

    timed_chain(
        "sample_motion 100k (8 retries)",
        jax.jit(
            lambda c: jnp.sum(
                sample_motion(
                    ks[12], p3 + c * 1e-30, jnp.array([0.01, 0.05, 0.01]),
                    (0.002, 0.03, 0.08, 0.002), gm,
                )
            )
            * 1e-30
        ),
    )

    # full steps
    from mcmh_localization_tpu.filter.step import _correct, _predict
    from mcmh_localization_tpu.models.sensor import log_likelihood_field
    from __graft_entry__ import _example_inputs

    for mode in ("MCL", "MHMCL", "AMHAMCL"):
        cfg2 = FilterConfig(
            mode=mode, num_particles=N, min_particles=1000, max_particles=N,
            initialized=True, initial_pose=(0.0, 0.0, 0.3),
        )
        lf = log_likelihood_field(gm, cfg2)
        state, sr, sa, sd = _example_inputs(gm, cfg2, 360)

        def stepsum(c, cfg2=cfg2, lf=lf, state=state, sr=sr, sa=sa, sd=sd):
            st = state.replace(
                particles=state.particles + c * 1e-30
            )
            st = _predict(st, sd, gm, cfg2)
            st, info = _correct(st, sr, sa, gm, lf, cfg2)
            return jnp.sum(st.particles) * 1e-30

        timed_chain(f"full step {mode} 100k", jax.jit(stepsum))


if __name__ == "__main__":
    main()
