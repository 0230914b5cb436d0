"""Round-2 probe: how fast CAN per-particle random access go on this v5e?

XLA lowers jnp.take to a ~7.5 ns/element serial loop (microbench3).  The
round-2 design question is whether Mosaic exposes anything faster:

  a. jnp.take_along_axis along the SUBLANE dim inside a Pallas kernel
     (tpu.dynamic_gather: per-lane vertical permute within a tile)
  b. same along the LANE dim (128-way crossbar shuffle)
  c. taller-table sublane gather (multi-tile select chains)
  d. one-hot matmul gather (MXU)
  e. XLA take_along_axis outside Pallas for the same shapes

Timing: dependency-chained (see microbench3 docstring) — only chained
numbers are trustworthy through the axon tunnel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1_000_000  # gathers per call
_RTT_MS = None


def timed_chain(name, step_fn, iters=20):
    global _RTT_MS
    c = jnp.float32(0.0)
    try:
        c = step_fn(c)
        float(c)
    except Exception as e:
        print(f"{name:52s}   FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = step_fn(c)
    float(c)
    total_ms = (time.perf_counter() - t0) * 1e3
    per = (total_ms - (_RTT_MS or 0.0)) / iters
    ns_per = per * 1e6 / N
    print(f"{name:52s} {per:9.3f} ms  ({ns_per:6.3f} ns/elem)", flush=True)
    return per


# ---------------------------------------------------------------------------
# Pallas gather kernels.  Indices arrive as (N/128, 128) int32; table small.
# Grid over row-blocks of BLK sublanes.
# ---------------------------------------------------------------------------
BLK = 512  # sublanes per program


def _gather_sublane_kernel(table_ref, idx_ref, out_ref):
    # out[s, l] = table[idx[s, l], l]   (axis=0 gather within (H,128) table)
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)


def make_gather_sublane(table_h):
    table = jax.random.uniform(jax.random.PRNGKey(1), (table_h, 128),
                               dtype=jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(2), (N // 128, 128), 0, table_h)

    @jax.jit
    def run(c):
        out = pl.pallas_call(
            _gather_sublane_kernel,
            grid=(N // 128 // BLK,),
            in_specs=[
                pl.BlockSpec((table_h, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        )(table + c * 1e-30, idx)
        return jnp.sum(out) * 1e-30

    return run


def _gather_lane_kernel(table_ref, idx_ref, out_ref):
    # out[s, l] = table[s % 8 ... broadcast row, idx[s, l]] along lanes
    t = table_ref[:]  # (8, 128)
    tb = jnp.broadcast_to(t[:1, :], idx_ref.shape)  # single row broadcast
    out_ref[:] = jnp.take_along_axis(tb, idx_ref[:], axis=1)


def make_gather_lane():
    table = jax.random.uniform(jax.random.PRNGKey(3), (8, 128),
                               dtype=jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(4), (N // 128, 128), 0, 128)

    @jax.jit
    def run(c):
        out = pl.pallas_call(
            _gather_lane_kernel,
            grid=(N // 128 // BLK,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        )(table + c * 1e-30, idx)
        return jnp.sum(out) * 1e-30

    return run


def _gather2d_kernel(table_ref, yidx_ref, xidx_ref, out_ref, *, table_h):
    # out[s,l] = table[y[s,l], x[s,l]] for a (H, 128)-lane table:
    # lane-shuffle each sublane-group after a sublane gather
    t = table_ref[:]                       # (H, 128)
    y = yidx_ref[:]
    x = xidx_ref[:]
    rows = jnp.take_along_axis(t, y, axis=0)       # wrong lanes, right rows?
    out_ref[:] = jnp.take_along_axis(rows, x, axis=1)


def make_gather2d(table_h):
    table = jax.random.uniform(jax.random.PRNGKey(5), (table_h, 128),
                               dtype=jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(6), (N // 128, 128), 0, table_h)
    x = jax.random.randint(jax.random.PRNGKey(7), (N // 128, 128), 0, 128)

    @jax.jit
    def run(c):
        out = pl.pallas_call(
            functools.partial(_gather2d_kernel, table_h=table_h),
            grid=(N // 128 // BLK,),
            in_specs=[
                pl.BlockSpec((table_h, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        )(table + c * 1e-30, y, x)
        return jnp.sum(out) * 1e-30

    return run


def make_onehot_matmul(table_n):
    # gather[i] = onehot(idx_i) @ table, table (T,) -> batched matmul
    table = jax.random.uniform(jax.random.PRNGKey(8), (table_n,),
                               dtype=jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(9), (N,), 0, table_n)

    @jax.jit
    def run(c):
        oh = jax.nn.one_hot(idx, table_n, dtype=jnp.bfloat16)
        out = oh @ (table + c * 1e-30).astype(jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32)) * 1e-30

    return run


def make_xla_take(table_n):
    table = jax.random.uniform(jax.random.PRNGKey(10), (table_n,),
                               dtype=jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(11), (N,), 0, table_n)

    @jax.jit
    def run(c):
        return jnp.sum((table + c * 1e-30).at[idx].get(
            mode="promise_in_bounds")) * 1e-30

    return run


def make_xla_take_along_lane(table_h):
    # out[i, l] = table[idx[i, l], l]: XLA take_along_axis, vectorizable?
    table = jax.random.uniform(jax.random.PRNGKey(12), (table_h, 128),
                               dtype=jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(13), (N // 128, 128), 0,
                             table_h)

    @jax.jit
    def run(c):
        t = jnp.broadcast_to(table + c * 1e-30, (N // 128, table_h, 128))
        out = jnp.take_along_axis(t, idx[:, None, :], axis=1)[:, 0, :]
        return jnp.sum(out) * 1e-30

    return run


def main():
    global _RTT_MS
    print("devices:", jax.devices(), flush=True)
    f_id = jax.jit(lambda c: c + 1.0)
    c = f_id(jnp.float32(0)); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(20):
        c = f_id(c)
    float(c)
    _RTT_MS = (time.perf_counter() - t0) * 1e3
    print(f"{'empty chain (rtt+20 tiny)':52s} {_RTT_MS:9.3f} ms", flush=True)

    timed_chain("XLA flat take 1M from 147k table", make_xla_take(384 * 384))
    timed_chain("XLA flat take 1M from 8-entry table", make_xla_take(8))
    timed_chain("XLA take_along_axis lanewise (H=8)",
                make_xla_take_along_lane(8))
    timed_chain("pallas sublane gather (table 8x128)", make_gather_sublane(8))
    timed_chain("pallas sublane gather (table 512x128)",
                make_gather_sublane(512))
    timed_chain("pallas sublane gather (table 1024x128)",
                make_gather_sublane(1024))
    timed_chain("pallas lane gather (128 lanes)", make_gather_lane())
    timed_chain("pallas 2d gather (512x128 table)", make_gather2d(512))
    timed_chain("onehot-matmul gather (T=128)", make_onehot_matmul(128))
    timed_chain("onehot-matmul gather (T=512)", make_onehot_matmul(512))


if __name__ == "__main__":
    main()
