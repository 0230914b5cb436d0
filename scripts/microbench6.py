"""Round-2 probe #2: build the real fast-gather kernel candidates.

microbench5 found: pallas lane-dim dynamic_gather ~free; onehot-matmul
0.45 ns/elem; XLA take 15 ns/elem (147k table) but ~0 for 8-entry tables.

Here:
  1. pallas 2D-table gather via transposed lane-gather + chunk select-scan
     (table (C*128, 128): out[e] = T[row[e], lane[e]])   <- the design bet
  2. XLA flat-take crossover: T = 32 / 128 / 1024 / 16384
  3. monotone (sorted) row gather (N,3) — the resample gather
  4. scatter .at[].max of N int32 (resampler's segment scatter)
  5. associative_scan fill-forward over (N, 4)
  6. hash scatter-min (KLD first-occurrence) at N=1M
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
# 1. 2D-table gather kernel: T is (C, 128, 128) "chunks"; element e wants
#    T[chunk[e], sub[e], lane[e]].  Work in transposed space per index tile:
#    out_t[l, s] = chunk_c_t[l, rsub_t[l, s]] summed over matching chunks.
# ---------------------------------------------------------------------------
IDXTILE = 256  # sublanes of indices per program step (x 128 lanes)


def _gather2d_kernel(tbl_ref, row_ref, lane_ref, out_ref, *, chunks):
    rows = row_ref[:]          # (IDXTILE, 128) int32, in [0, chunks*128)
    lanes = lane_ref[:]        # (IDXTILE, 128) int32, in [0, 128)
    sub = rows & 127           # row within chunk
    cid = rows >> 7            # chunk id
    acc = jnp.zeros(rows.shape, dtype=tbl_ref.dtype)
    # first gather the right LANE within each (sub-resolved later) row?
    # No: compose the two lane-gathers in transposed space:
    #   step 1 (transposed): rowvals_t[l, s] = T_c^T[l, sub[s, l]]
    #   step 2: that already used lane l = lanes? Not yet.
    # Simpler exact composition per chunk c:
    #   A = take_along_axis(T_c, sub, axis=0)  -- sublane gather (may fail)
    # so instead: transpose T_c once (static), transpose sub, lane-gather,
    # transpose back, then second lane-gather with lanes.
    for c in range(chunks):
        tc_t = tbl_ref[c].T                      # (128, 128) lanes-major
        sub_t = sub.T                            # (128, IDXTILE)
        rv_t = jnp.take_along_axis(
            jnp.broadcast_to(tc_t[:, None, :], (128, 1, 128))[:, 0, :],
            sub_t, axis=1)                       # rv_t[l, s] = T_c[sub[s,l], l]
        rv = rv_t.T                              # rv[s, l] = T_c[sub[s,l], l]
        # we want T_c[sub[s,l], lanes[s,l]] — second lane gather ON rv rows?
        # rv[s, :] holds T_c[sub[s, :], :] diagonal-style; not separable.
        # Fall back: lane-gather FIRST: B[s,l] = T_c[s mod?..]
        acc = acc + jnp.where(cid == c, rv, 0.0)
    out_ref[:] = acc


# The separable-composition subtlety: T[sub[s,l], lane[s,l]] requires both
# indices per element.  Correct 2-pass trick: pass 1 gathers along LANES with
# `lanes`, giving P[s,l] = T_c[s', lanes[s,l]] for row s' = s (wrong row);
# that's also not separable.  The WORKING exact method: linearize to a
# (chunks*128,128)->(128,128)-chunked 1-D problem per lane:
#   Pre-shuffle the TABLE so the lane axis is the element's own lane.
# => do it the other way: gather row-first is impossible separably, so
#    use ONE-HOT MATMUL for the row and lane-gather for the column:
#    R = onehot(rows, C*128) @ T.reshape(C*128, 128)   (MXU)
#    out[e] = R[e, lanes[e]]                           (lane gather)
def _rowmm_lanegather_kernel(tbl_ref, row_ref, lane_ref, out_ref, *, rows_n):
    rows = row_ref[:]                            # (IDXTILE, 128)
    lanes = lane_ref[:]
    flat_rows = rows.reshape(IDXTILE * 128 // 128, 128)  # same shape
    # build one-hot in pieces to bound register pressure: (IDXTILE*128, rows_n)
    # is too big; process in groups of 8 sublanes (1024 elements).
    acc = jnp.zeros((IDXTILE, 128), dtype=tbl_ref.dtype)
    tbl = tbl_ref[:]                             # (rows_n, 128)
    G = 512  # elements per matmul group along sublane axis of idx tile
    for g in range(0, IDXTILE * 128, G * 128 // 128):
        pass
    # simpler: one matmul over the whole tile: elements axis = IDXTILE*128
    e_rows = rows.reshape(-1)                    # can't: 1D iota issues; keep 2D
    # one-hot via broadcast compare: (IDXTILE*128, rows_n) bf16
    oh = (rows.reshape(IDXTILE * 128, 1) ==
          jax.lax.broadcasted_iota(jnp.int32, (1, rows_n), 1)
          ).astype(jnp.bfloat16)
    R = jnp.dot(oh, tbl.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)  # (IDXTILE*128, 128)
    R = R.reshape(IDXTILE, 128, 128)
    # out[s,l] = R[s, l, lanes[s,l]] -> take_along_axis axis=2
    out_ref[:] = jnp.take_along_axis(R, lanes[:, :, None].astype(jnp.int32),
                                     axis=2)[:, :, 0]


def make_gather2d_rowmm(chunks):
    rows_n = chunks * 128
    tbl = jax.random.uniform(jax.random.PRNGKey(1), (rows_n, 128),
                             dtype=jnp.float32)
    row = jax.random.randint(jax.random.PRNGKey(2), (N // 128, 128), 0, rows_n)
    lane = jax.random.randint(jax.random.PRNGKey(3), (N // 128, 128), 0, 128)

    @jax.jit
    def run(c):
        out = pl.pallas_call(
            functools.partial(_rowmm_lanegather_kernel, rows_n=rows_n),
            grid=(N // 128 // IDXTILE,),
            in_specs=[
                pl.BlockSpec((rows_n, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((IDXTILE, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((IDXTILE, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((IDXTILE, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        )(tbl + c * 1e-30, row, lane)
        return jnp.sum(out) * 1e-30

    return run


# lane-gather select-scan: out[s,l] = T[row[s,l], lane[s,l]] where the table
# is pre-TRANSPOSED per chunk: Tt[c] = T[c*128:(c+1)*128].T  (lane=row idx).
# per chunk: g_c[s,l] = take_along_axis over lanes of Tt_rows selected by...
# Exact separable trick: first use lane-gather with ROW index into Tt:
#   A_c[s,l] = Tt_c[lane[s,l]??]  -- needs in[s, idx]: source sublane = s.
# Source sublane must equal output sublane; our source "sublane" after
# transpose is the table COLUMN = element's lane index... which varies per
# element.  So pure lane-gather composition can't do scattered 2D exactly;
# keep rowmm as the exact kernel and ALSO try the diagonal trick:
#   B_c = take_along_axis(Tt_c_broadcast rows aligned to lane[s,l]) ...
# (skipped — rowmm number decides.)


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
    timed_chain("pallas rowmm+lanegather 2D (3 chunks=384 rows)",
                make_gather2d_rowmm(3))
    timed_chain("pallas rowmm+lanegather 2D (24 chunks)",
                make_gather2d_rowmm(24))
    timed_chain("pallas rowmm+lanegather 2D (120 chunks)",
                make_gather2d_rowmm(120))
    timed_chain("monotone row gather (N,3)", make_monotone_row_gather())
    timed_chain("scatter at[].max 1M", make_scatter_max())
    timed_chain("cummax 1M", make_cummax())
    timed_chain("assoc_scan fill-forward (N,4)", make_assoc_fill())
    timed_chain("hash scatter-min 1M -> 256k", make_hash_scatter_min())


if __name__ == "__main__":
    main()
