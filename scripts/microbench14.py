"""Layout decision for FilterState.particles (round-3 roadmap #4 /
verdict #8): measure elementwise passes over (N, 3) vs (3, N) arrays.

On TPU a (N, 3) f32 array tiles as (8, 128) with the minor dim padded
3 -> 128: 42x the bytes of the logical data.  Every elementwise pass over
it is memory-bound on padding.  (3, N) stores 3 sublanes x N lanes
(padded 8 x N): ~16x less traffic.

Also times the kld jitter-add (the resampling phase's (N,3) passes) both
ways, and lax.cond escalation overhead for the exact-KLD design.
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
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    pn3 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    p3n = jnp.asarray(np.asarray(pn3).T.copy())
    key = jax.random.PRNGKey(0)
    kN = N // 1000

    def scan_floor(c):
        return c + 1.0
    timed(f"[{kN}k] scan-iteration floor (c+1)", scan_floor)

    def pass_n3(c):
        q = pn3 * 1.000001 + c * 1e-30
        return c + jnp.sum(q[:4]) * 1e-30
    timed(f"[{kN}k] one elementwise pass (N,3)", pass_n3)

    def pass_3n(c):
        q = p3n * 1.000001 + c * 1e-30
        return c + jnp.sum(q[:, :4]) * 1e-30
    timed(f"[{kN}k] one elementwise pass (3,N)", pass_3n)

    def three_pass_n3(c):
        q = pn3 + c * 1e-30
        q = q * 1.000001
        q = q + 0.5
        q = jnp.sin(q)
        return c + jnp.sum(q[:4]) * 1e-30
    timed(f"[{kN}k] chained 3-op pass (N,3)", three_pass_n3)

    def three_pass_3n(c):
        q = p3n + c * 1e-30
        q = q * 1.000001
        q = q + 0.5
        q = jnp.sin(q)
        return c + jnp.sum(q[:, :4]) * 1e-30
    timed(f"[{kN}k] chained 3-op pass (3,N)", three_pass_3n)

    def jitter_n3(c):
        noise = jax.random.normal(key, (N, 3), jnp.float32) * 0.01
        q = pn3 + noise + c * 1e-30
        return c + jnp.sum(q[:4]) * 1e-30
    timed(f"[{kN}k] jitter add (N,3)", jitter_n3)

    def jitter_3n(c):
        noise = jax.random.normal(key, (3, N), jnp.float32) * 0.01
        q = p3n + noise + c * 1e-30
        return c + jnp.sum(q[:, :4]) * 1e-30
    timed(f"[{kN}k] jitter add (3,N)", jitter_3n)

    def transpose_to_3n(c):
        q = (pn3 + c * 1e-30).T
        return c + jnp.sum(q[:, :4]) * 1e-30
    timed(f"[{kN}k] transpose (N,3)->(3,N)", transpose_to_3n)

    # KLD hash bin-count scatter at several prefix sizes (the escalation
    # design: cheap stage on converged clouds, full-N only when needed)
    from mcmh_localization_tpu.ops.resampling import _first_occurrence_hash

    for s in (131072, N):
        bx = jnp.asarray(rng.integers(-200, 200, s).astype(np.int32))
        by = jnp.asarray(rng.integers(-200, 200, s).astype(np.int32))
        bt = jnp.asarray(rng.integers(-16, 16, s).astype(np.int32))

        def hashcount(c, bx=bx, by=by, bt=bt):
            nb = _first_occurrence_hash(bx + (c * 1e30).astype(jnp.int32),
                                        by, bt)
            return c + jnp.sum(nb[:8]).astype(jnp.float32) * 1e-30
        timed(f"[{s//1000}k] KLD hash first-occurrence", hashcount,
              iters=8 if s > 200_000 else ITERS)

    # cond-escalation overhead: big operand captured by an untaken branch
    bx = jnp.asarray(rng.integers(-200, 200, N).astype(np.int32))
    by = jnp.asarray(rng.integers(-200, 200, N).astype(np.int32))
    bt = jnp.asarray(rng.integers(-16, 16, N).astype(np.int32))

    def esc_taken_cheap(c):
        nb = _first_occurrence_hash(bx[:131072] + (c * 1e30).astype(jnp.int32),
                                    by[:131072], bt[:131072])
        k1 = jnp.sum(nb)

        def full(_):
            nb2 = _first_occurrence_hash(bx, by, bt)
            return jnp.sum(nb2)

        k = jax.lax.cond(k1 > 0, lambda _: k1, full, operand=None)
        return c + k.astype(jnp.float32) * 1e-30
    timed(f"[{kN}k] escalating KLD, stage-1 stop (cond untaken)",
          esc_taken_cheap, iters=8)


if __name__ == "__main__":
    main()
