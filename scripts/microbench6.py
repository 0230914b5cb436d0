"""Round-2 probe #2: candidate fast-gather kernels + resampler primitives.

microbench5 found: pallas lane-dim dynamic_gather ~free; onehot-matmul flat
gather 0.45 ns/elem; XLA take 15 ns/elem (147k table).

Probes here:
  1. XLA flat-take crossover: T = 32 / 128 / 1024 / 16384
  2. pallas "rowmm" 2D-table gather: out[e] = T[row[e], lane[e]] via chunked
     one-hot matmul over rows (MXU) + take_along_axis over lanes, with a
     per-chunk @pl.when skip when no element in the tile needs the chunk.
     Tables: 384x128 (occupancy-like), 2048x128 (theta-window field-like).
  3. same with clustered rows (tracking regime) to measure the chunk-skip win
  4. monotone (sorted) row gather (N,3) — the resample gather, XLA
  5. scatter .at[].max, cummax, associative_scan fill, hash scatter-min
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1_000_000
_RTT_MS = None


def timed_chain(name, step_fn, iters=20, n=N):
    global _RTT_MS
    c = jnp.float32(0.0)
    try:
        c = step_fn(c)
        float(c)
    except Exception as e:
        print(f"{name:52s}   FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = step_fn(c)
    float(c)
    total_ms = (time.perf_counter() - t0) * 1e3
    per = (total_ms - (_RTT_MS or 0.0)) / iters
    print(f"{name:52s} {per:9.3f} ms  ({per * 1e6 / n:6.3f} ns/elem)",
          flush=True)
    return per


# ---------------------------------------------------------------------------
# rowmm gather: grid over index tiles of (SUB, 128); rows chunked by RC=128.
# ---------------------------------------------------------------------------
SUB = 32          # sublanes of indices per program (32*128 = 4096 elements)
RC = 128          # row-chunk


def _rowmm_kernel(tbl_ref, row_ref, lane_ref, out_ref, *, chunks, skip):
    rows = row_ref[:]                      # (SUB, 128) int32
    lanes = lane_ref[:]                    # (SUB, 128) int32
    e_rows = rows.reshape(SUB * 128, 1)    # element-major
    acc = jnp.zeros((SUB * 128, 128), dtype=jnp.float32)

    def body(c, acc):
        local = e_rows - c * RC
        oh = ((local >= 0) & (local < RC) &
              (local == jax.lax.broadcasted_iota(
                  jnp.int32, (1, RC), 1))).astype(jnp.bfloat16)
        part = jnp.dot(oh, tbl_ref[pl.ds(c * RC, RC), :].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return acc + part

    if skip:
        cid = rows >> 7  # RC = 128
        lo = jnp.min(cid)
        hi = jnp.max(cid)
        acc = jax.lax.fori_loop(lo, hi + 1, body, acc)
    else:
        acc = jax.lax.fori_loop(0, chunks, body, acc)

    # final lane gather must be 2D with FULL-shape indices (Mosaic lowers
    # gather only when indices.shape == in.shape + (1,)); broadcast the lane
    # index across the row and keep column 0
    flat_lanes = jnp.broadcast_to(
        lanes.reshape(SUB * 128, 1), (SUB * 128, 128)
    )
    picked = jnp.take_along_axis(acc, flat_lanes, axis=1)  # (SUB*128, 128)
    out_ref[:] = picked[:, 0:1].reshape(SUB, 128)


def make_rowmm(rows_n, clustered=False, skip=False):
    tbl = jax.random.uniform(jax.random.PRNGKey(1), (rows_n, 128),
                             dtype=jnp.float32)
    if clustered:
        base = jax.random.randint(jax.random.PRNGKey(2), (N // 128, 1), 0,
                                  max(rows_n - 64, 1))
        off = jax.random.randint(jax.random.PRNGKey(3), (N // 128, 128), 0, 64)
        row = jnp.minimum(base + off, rows_n - 1)
    else:
        row = jax.random.randint(jax.random.PRNGKey(2), (N // 128, 128), 0,
                                 rows_n)
    lane = jax.random.randint(jax.random.PRNGKey(4), (N // 128, 128), 0, 128)
    chunks = rows_n // RC

    @jax.jit
    def run(c):
        out = pl.pallas_call(
            functools.partial(_rowmm_kernel, chunks=chunks, skip=skip),
            grid=(N // 128 // SUB,),
            in_specs=[
                pl.BlockSpec((rows_n, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        )(tbl + c * 1e-30, row, lane)
        return jnp.sum(out) * 1e-30

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


def make_monotone_row_gather():
    parts = jax.random.uniform(jax.random.PRNGKey(12), (N, 3),
                               dtype=jnp.float32)
    idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(13), (N,), 0, N))

    @jax.jit
    def run(c):
        return jnp.sum((parts + c * 1e-30)[idx]) * 1e-30

    return run


def make_scatter_max():
    starts = jnp.sort(jax.random.randint(jax.random.PRNGKey(14), (N,), 0, N))
    vals = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def run(c):
        seg = jnp.full(N, -1, dtype=jnp.int32)
        seg = seg.at[starts + c.astype(jnp.int32) * 0].max(vals, mode="drop")
        return jnp.sum(seg.astype(jnp.float32)) * 1e-30

    return run


def make_assoc_fill():
    vals = jax.random.uniform(jax.random.PRNGKey(15), (N, 4))
    valid = jax.random.uniform(jax.random.PRNGKey(16), (N,)) < 0.3

    @jax.jit
    def run(c):
        v = vals + c * 1e-30

        def op(a, b):
            av, am = a
            bv, bm = b
            return jnp.where(bm[..., None], bv, av), am | bm

        out, _ = jax.lax.associative_scan(op, (v, valid))
        return jnp.sum(out) * 1e-30

    return run


def make_cummax():
    seg = jax.random.randint(jax.random.PRNGKey(17), (N,), -1, N)

    @jax.jit
    def run(c):
        return jnp.sum(
            jax.lax.cummax(seg + c.astype(jnp.int32) * 0).astype(jnp.float32)
        ) * 1e-30

    return run


def make_hash_scatter_min(bits=18):
    slot = jax.random.randint(jax.random.PRNGKey(18), (N,), 0, 1 << bits)

    @jax.jit
    def run(c):
        table = jnp.full(1 << bits, N, dtype=jnp.int32)
        table = table.at[slot + c.astype(jnp.int32) * 0].min(
            jnp.arange(N, dtype=jnp.int32))
        return jnp.sum(table.astype(jnp.float32)) * 1e-30

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

    timed_chain("XLA flat take T=32", make_xla_take(32))
    timed_chain("XLA flat take T=128", make_xla_take(128))
    timed_chain("XLA flat take T=1024", make_xla_take(1024))
    timed_chain("XLA flat take T=16384", make_xla_take(16384))
    timed_chain("rowmm 2D gather 384x128 (occupancy)", make_rowmm(384))
    timed_chain("rowmm 2D gather 2048x128 (field)", make_rowmm(2048))
    timed_chain("rowmm 2048x128 skip, random rows",
                make_rowmm(2048, skip=True))
    timed_chain("rowmm 2048x128 skip, clustered rows",
                make_rowmm(2048, clustered=True, skip=True))
    timed_chain("rowmm 384x128 skip, clustered",
                make_rowmm(384, clustered=True, skip=True))
    timed_chain("monotone row gather (N,3) XLA", make_monotone_row_gather())
    timed_chain("scatter at[].max 1M", make_scatter_max())
    timed_chain("cummax 1M", make_cummax())
    timed_chain("assoc_scan fill-forward (N,4)", make_assoc_fill())
    timed_chain("hash scatter-min 1M -> 256k", make_hash_scatter_min())


if __name__ == "__main__":
    main()
