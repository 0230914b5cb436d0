"""Motion-noise generation cost at scale: threefry f32 vs threefry bf16
vs rbg, standalone AND inside the full predict chain (XLA may overlap
bit generation with the trig — the round-3 rbg finding).

Usage: python scripts/microbench24.py [N]
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

ITERS = 48
DISP = 3


def timed(name, phase_fn, iters=ITERS):
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
    print(f"{name:52s} {per:9.3f} ms", flush=True)
    return per


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print("devices:", jax.devices(), "N", n, flush=True)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    from mcmh_localization_tpu.models.motion import fast_normal

    def k_of(c):
        return jax.random.fold_in(key, (c * 1e30).astype(jnp.int32))

    timed("threefry normal (N,3) f32",
          lambda c: c + jnp.sum(
              jax.random.normal(k_of(c), (n, 3))[:2]) * 1e-30)
    timed("threefry normal (N,3) bf16",
          lambda c: c + jnp.sum(
              jax.random.normal(k_of(c), (n, 3), jnp.bfloat16)[:2]
          ).astype(jnp.float32) * 1e-30)
    timed("threefry normal (3,N) f32",
          lambda c: c + jnp.sum(
              jax.random.normal(k_of(c), (3, n))[:, :2]) * 1e-30)
    timed("rbg normal (N,3) f32",
          lambda c: c + jnp.sum(fast_normal(k_of(c), (n, 3))[:2]) * 1e-30)

    def chain(noise_fn):
        def f(c):
            eps = noise_fn(k_of(c))
            heading = p[:, 2] + 0.1 + eps[:, 0] * 0.01
            t_hat = 0.05 + eps[:, 1] * 0.01
            out = jnp.stack([
                p[:, 0] + t_hat * jnp.cos(heading),
                p[:, 1] + t_hat * jnp.sin(heading),
                heading + 0.1 + eps[:, 2] * 0.01,
            ], axis=-1)
            return c + jnp.sum(out[:2]) * 1e-30
        return f

    timed("predict chain threefry f32",
          chain(lambda k: jax.random.normal(k, (n, 3))))
    timed("predict chain threefry bf16",
          chain(lambda k: jax.random.normal(
              k, (n, 3), jnp.bfloat16).astype(jnp.float32)))
    timed("predict chain rbg f32",
          chain(lambda k: fast_normal(k, (n, 3))))


if __name__ == "__main__":
    main()
