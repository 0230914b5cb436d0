"""Beam LUT field-build kernel variants, chained on-chip timing.

The shipped kernel (ops/beam_field_pallas.py) does, per 512-cell tile and
per GC=8-row chunk: build a (GC*nqp, ct) one-hot, concat [oh; oh] for the
hi/lo split, dot (32, 2*GC*nqp) @ (2*GC*nqp, ct).  M=32 of 128 MXU rows.

Variants:
  v0_base       shipped kernel (precision="split")
  v1_planes     hi/lo S planes stacked on M (M=64), single oh (no concat)
  v2_planes_i8  v1 + int8 one-hot and int8 quantized S planes, int32 acc
  v3_gc16       v1 with GC=16 (fewer, larger chunks)

All variants checked against the f32 einsum reference for max abs error.
Bench point: kp=360, nq=101 (nqp=128), B=32, C=128*128 cells.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmh_localization_tpu.ops.beam_field_pallas import lut_field

CT = 512

K_TAB, NQ, B, WIN = 360, 101, 32, 128
C = WIN * WIN
ITERS = 16
DISP = 3


def _kernel_planes(s_ref, q_ref, out_ref, *, kp, nqp, ct, gc, acc_dtype):
    chunks = kp // gc
    cw = gc * nqp
    qio = jax.lax.broadcasted_iota(jnp.int32, (gc, nqp, ct), 1)
    out_ref[:] = jnp.zeros_like(out_ref)
    oh_dtype = s_ref.dtype

    def body(c, carry):
        q = q_ref[pl.ds(c * gc, gc), :].astype(jnp.int32)
        oh = (q[:, None, :] == qio).astype(oh_dtype).reshape(cw, ct)
        sv = s_ref[:, pl.ds(c * cw, cw)]          # (2*bp, cw) planes-on-M
        out_ref[:, :] += jnp.dot(sv, oh, preferred_element_type=acc_dtype)
        return carry

    jax.lax.fori_loop(0, chunks, body, 0)


def planes_field(qt, s, nq, gc=8, int8=False):
    """(B, C) via plane-stacked kernel.  s: (B, K, nq) f32."""
    k, c = qt.shape
    b = s.shape[0]
    nqp = -(-nq // 64) * 64
    kp = -(-k // gc) * gc
    bp = -(-b // 8) * 8
    cp = -(-c // CT) * CT
    qt_p = jnp.pad(qt, ((0, kp - k), (0, cp - c)))
    s_p = jnp.pad(s.astype(jnp.float32),
                  ((0, bp - b), (0, kp - k), (0, nqp - nq)))

    if int8:
        amax = jnp.maximum(jnp.max(jnp.abs(s_p)), 1e-20)
        s1 = amax / 127.0
        hi = jnp.clip(jnp.round(s_p / s1), -127, 127)
        resid = s_p - hi * s1
        s2 = s1 / 254.0
        lo = jnp.clip(jnp.round(resid / s2), -127, 127)
        s2_stack = jnp.concatenate(
            [hi.reshape(bp, kp * nqp), lo.reshape(bp, kp * nqp)], axis=0
        ).astype(jnp.int8)
        acc = jnp.int32
    else:
        s_hi = s_p.astype(jnp.bfloat16)
        s_lo = (s_p - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        s2_stack = jnp.concatenate(
            [s_hi.reshape(bp, kp * nqp), s_lo.reshape(bp, kp * nqp)], axis=0
        )
        acc = jnp.float32

    out = pl.pallas_call(
        functools.partial(_kernel_planes, kp=kp, nqp=nqp, ct=CT, gc=gc,
                          acc_dtype=acc),
        grid=(cp // CT,),
        in_specs=[
            pl.BlockSpec((2 * bp, kp * nqp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, CT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * bp, CT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * bp, cp), acc),
        )(s2_stack, qt_p)
    if int8:
        res = out[:bp].astype(jnp.float32) * s1 \
            + out[bp:].astype(jnp.float32) * s2
    else:
        res = out[:bp] + out[bp:]
    return res[:b, :c]


def timed(name, fn, s0, iters=ITERS):
    @jax.jit
    def run(c):
        def body(carry, _):
            s = s0 + carry * 1e-30
            out = fn(s)
            return carry + jnp.sum(out[:2, :2]) * 1e-30, None
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
    rng = np.random.default_rng(0)
    qt = jnp.asarray(rng.integers(0, NQ, (K_TAB, C)), jnp.int8)
    # realistic S magnitudes: ~1 beam/bin of log-mixture values in [-14, 1]
    s_np = rng.uniform(-14.0, 1.0, (B, K_TAB, NQ)).astype(np.float32)
    s0 = jnp.asarray(s_np)

    # correctness reference (f64 on cpu is overkill; f32 einsum via take)
    ref = np.take_along_axis(
        np.broadcast_to(s_np[:, :, None, :], (B, K_TAB, 1, NQ)),
        np.broadcast_to(np.asarray(qt, np.int64)[None, :, :, None],
                        (B, K_TAB, C, 1)), axis=3,
    )[..., 0].sum(axis=1)

    def check(name, out):
        err = np.max(np.abs(np.asarray(out) - ref))
        rel = err / np.max(np.abs(ref))
        print(f"  {name}: max abs err {err:.4e}  (rel {rel:.2e})", flush=True)

    variants = [
        ("v0_base split", lambda s: lut_field(qt, s, NQ, precision="split")),
        ("v1_planes bf16", lambda s: planes_field(qt, s, NQ, gc=8)),
        ("v2_planes int8", lambda s: planes_field(qt, s, NQ, gc=8, int8=True)),
        ("v3_planes bf16 gc16", lambda s: planes_field(qt, s, NQ, gc=16)),
        ("v4_planes int8 gc16",
         lambda s: planes_field(qt, s, NQ, gc=16, int8=True)),
    ]
    for name, fn in variants:
        try:
            out = jax.jit(fn)(s0)
            check(name, out)
            timed(name, fn, s0)
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
