"""expand_sorted take-dot mode A/B on chip: HIGHEST f32 dot (6 MXU
passes) vs exact triple-bf16 decomposition (3 passes), at 1M.

Usage: python scripts/microbench26.py [N]
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

ITERS = 24
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
    from mcmh_localization_tpu.ops import rank_pallas as rp
    from mcmh_localization_tpu.ops.resampling import (
        systematic_resample_particles,
    )

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    w = jnp.asarray(rng.exponential(size=n).astype(np.float32))
    w = w / jnp.sum(w)
    key = jax.random.PRNGKey(0)

    outs = {}
    for mode in ("highest", "triple"):
        rp.EXPAND_DOT = mode
        rp._expand_kernel_call.clear_cache()

        def f(c):
            out = systematic_resample_particles(key, p + c * 1e-30, w, n,
                                                impl="mxu")
            return c + jnp.sum(out[:8]) * 1e-30
        timed(f"systematic_resample mxu [{mode}]", f)

        outs[mode] = np.asarray(
            systematic_resample_particles(key, p, w, n, impl="mxu")
        )
    rp.EXPAND_DOT = "triple"
    same = np.array_equal(outs["highest"], outs["triple"])
    print("bitwise equal on chip:", same, flush=True)


if __name__ == "__main__":
    main()
