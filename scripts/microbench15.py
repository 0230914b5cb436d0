"""KLD escalation diagnosis at 1M/min=100k: where did 24 ms come from?

Times kld_resample standalone under chained scan (converged vs diffuse
cloud, eval_window=131072 vs escalation=0), plus the pieces: prefix
expand, full expand, stage-1 hash, cond overhead.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from mcmh_localization_tpu.ops import resampling as rs

ITERS = 16
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
    print(f"{name:58s} {per:9.3f} ms", flush=True)
    return per


def main():
    N = 1_000_000
    MIN = 100_000
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # converged tracking cloud: sigma ~0.15 m, theta ~0.2 rad
    conv = jnp.asarray(np.stack([
        rng.normal(0, 0.15, N), rng.normal(0, 0.15, N),
        rng.normal(0.3, 0.2, N)], 1).astype(np.float32))
    # diffuse cloud: uniform over the house map extent
    diff = jnp.asarray(np.stack([
        rng.uniform(-10, 9, N), rng.uniform(-10, 9, N),
        rng.uniform(-np.pi, np.pi, N)], 1).astype(np.float32))
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    key = jax.random.PRNGKey(0)
    kw = dict(max_samples=N, min_particles=MIN, bin_size_xy=0.2,
              bin_size_theta=np.deg2rad(10.0), epsilon=0.03, z=2.0)

    # report stopping points first (same as the timed calls)
    for nm, cloud in (("conv", conv), ("diff", diff)):
        for ew in (131072, 0):
            _, k = jax.jit(
                lambda c, e=ew: rs.kld_resample(key, c, w, eval_window=e, **kw)
            )(cloud)
            print(f"n_kept[{nm}, ew={ew}] = {int(k)}", flush=True)

    def mk(cloud, ew):
        def f(c):
            s, k = rs.kld_resample(
                jax.random.fold_in(key, (c * 1e30).astype(jnp.int32)),
                cloud, w, eval_window=ew, **kw)
            return c + k.astype(jnp.float32) * 1e-30 + s[0, 0] * 1e-30
        return f

    timed("[1M] kld eval_window=131072, converged", mk(conv, 131072))
    timed("[1M] kld escalation ew=0,   converged", mk(conv, 0))
    timed("[1M] kld eval_window=131072, diffuse", mk(diff, 131072))
    timed("[1M] kld escalation ew=0,   diffuse", mk(diff, 0), iters=6)

    # pieces
    def prefix_expand(c):
        d = rs.systematic_resample_particles(
            jax.random.fold_in(key, (c * 1e30).astype(jnp.int32)),
            conv, w, 200_000, count=jnp.int32(N))
        return c + d[0, 0] * 1e-30
    timed("[1M] prefix expand (200k of 1M stride)", prefix_expand)

    def full_expand(c):
        d = rs.systematic_resample_particles(
            jax.random.fold_in(key, (c * 1e30).astype(jnp.int32)),
            conv, w, N)
        return c + d[0, 0] * 1e-30
    timed("[1M] full expand (1M)", full_expand)

    def stage1_eval(c):
        sub = conv[:200_000] + c * 1e-30
        bx = (sub[:, 0] / 0.2).astype(jnp.int32)
        by = (sub[:, 1] / 0.2).astype(jnp.int32)
        bt = (sub[:, 2] / 0.17).astype(jnp.int32)
        nb = rs._first_occurrence_hash(bx, by, bt, bits=rs._hash_bits_for(200_000))
        return c + jnp.sum(nb[:8]).astype(jnp.float32) * 1e-30
    timed("[200k] stage-1 hash first-occurrence", stage1_eval)


if __name__ == "__main__":
    main()
