"""FilterState (N,3)-vs-(3,N) layout decision microbench (CLAUDE.md
roadmap #4 / round-2 verdict #8): time the layout-sensitive per-step
primitives at 1M particles in both layouts on the chip.

The hypothesis: (N, 3) f32 arrays tile as (8, 128) with the minor dim 3
padded, so elementwise passes touch ~42x the useful bytes; (3, N) rows
are lane-dense.  If XLA's layout assignment already sidesteps this for
fused elementwise chains, the refactor buys nothing — measure, decide,
record.

Usage: python scripts/microbench23.py [N]
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
    p_n3 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    p_3n = jnp.asarray(np.ascontiguousarray(np.asarray(p_n3).T))
    q_n3 = p_n3 + 0.5
    q_3n = p_3n + 0.5
    mask = jnp.asarray(rng.random(n) < 0.7)
    cols = [p_3n[0], p_3n[1], p_3n[2]]

    # anchor-collapse where (step.py scoring prologue)
    timed("[N,3] where(mask[:,None], p, p[0])",
          lambda c: c + jnp.sum(jnp.where(
              mask[:, None], p_n3 + c * 1e-30, p_n3[0])[:2]) * 1e-30)
    timed("[3,N] where(mask[None,:], p, p[:,:1])",
          lambda c: c + jnp.sum(jnp.where(
              mask[None, :], p_3n + c * 1e-30, p_3n[:, :1])[:, :2]) * 1e-30)

    # MH accept-select (filter/mh.py)
    timed("[N,3] where(acc[:,None], q, p)",
          lambda c: c + jnp.sum(jnp.where(
              mask[:, None], q_n3 + c * 1e-30, p_n3)[:2]) * 1e-30)
    timed("[3,N] where(acc[None,:], q, p)",
          lambda c: c + jnp.sum(jnp.where(
              mask[None, :], q_3n + c * 1e-30, p_3n)[:, :2]) * 1e-30)

    # motion-update shape: 3 computed columns -> state array
    def stack_last(c):
        x = p_3n[0] + c * 1e-30
        y = p_3n[1] * 1.01
        t = p_3n[2] * 0.99
        return c + jnp.sum(jnp.stack([x, y, t], axis=-1)[:2]) * 1e-30

    def stack_first(c):
        x = p_3n[0] + c * 1e-30
        y = p_3n[1] * 1.01
        t = p_3n[2] * 0.99
        return c + jnp.sum(jnp.stack([x, y, t], axis=0)[:, :2]) * 1e-30

    timed("cols -> stack axis=-1 (N,3)", stack_last)
    timed("cols -> stack axis=0 (3,N)", stack_first)

    # scorer prologue transpose
    timed("[N,3] -> transpose to (3,N)",
          lambda c: c + jnp.sum((p_n3 + c * 1e-30).T[:, :2]) * 1e-30)

    # full motion proposal chain in both layouts (sin/cos + fused noise)
    key = jax.random.PRNGKey(0)

    def motion_n3(c):
        eps = jax.random.normal(key, (n, 3))
        heading = p_n3[:, 2] + 0.1 + eps[:, 0] * 0.01
        t_hat = 0.05 + eps[:, 1] * 0.01
        out = jnp.stack([
            p_n3[:, 0] + c * 1e-30 + t_hat * jnp.cos(heading),
            p_n3[:, 1] + t_hat * jnp.sin(heading),
            heading + 0.1 + eps[:, 2] * 0.01,
        ], axis=-1)
        return c + jnp.sum(out[:2]) * 1e-30

    def motion_3n(c):
        eps = jax.random.normal(key, (3, n))
        heading = p_3n[2] + 0.1 + eps[0] * 0.01
        t_hat = 0.05 + eps[1] * 0.01
        out = jnp.stack([
            p_3n[0] + c * 1e-30 + t_hat * jnp.cos(heading),
            p_3n[1] + t_hat * jnp.sin(heading),
            heading + 0.1 + eps[2] * 0.01,
        ], axis=0)
        return c + jnp.sum(out[:, :2]) * 1e-30

    timed("motion chain (N,3)", motion_n3)
    timed("motion chain (3,N)", motion_3n)


if __name__ == "__main__":
    main()
