"""lut_field kernel tile-shape sweep (GC x CT) at the beam bench point:
kp=120 table bins, nq=51, B=24 window bins, C=96x96 cells, int8 mode.

Usage: python scripts/microbench22.py
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
    print(f"{name:44s} {per:9.3f} ms", flush=True)
    return per


def main():
    print("devices:", jax.devices(), flush=True)
    from mcmh_localization_tpu.ops import beam_field_pallas as bfp

    kp, nq, b, c = 120, 51, 24, 96 * 96
    rng = np.random.default_rng(0)
    qt = jnp.asarray(rng.integers(0, nq, (kp, c)).astype(np.int8))
    s = jnp.asarray(rng.normal(size=(b, kp, nq)).astype(np.float32))

    for gc in (8, 24, 40, 120):
        # q_ref row slices must stay provably 8-aligned: GC % 8 == 0
        if kp % gc or gc % 8:
            continue
        for ct in (512, 1024, 2048):
            bfp.GC, bfp.CT = gc, ct

            def f(cc):
                out = bfp.lut_field(qt, s + cc * 1e-30, nq, precision="int8")
                return cc + jnp.sum(out[:2, :2]) * 1e-30

            # jit cache must not reuse the old tile shapes
            bfp.lut_field.clear_cache()
            timed(f"GC={gc:3d} CT={ct:4d}", f)
    bfp.GC, bfp.CT = 8, 512


if __name__ == "__main__":
    main()
