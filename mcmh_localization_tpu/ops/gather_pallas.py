"""Fast small-table random gather — the TPU per-particle lookup primitive.

XLA lowers ``table[idx]`` to a serial ~7 ns/element loop on TPU — the single
slowest primitive in the filter (motion validity lookups, correlation-field
lookups; replaces the gathers behind parallel_utils.py:85-149's per-beam
table reads and :369-413's validity checks at scale).

This kernel reformulates the gather as MXU work, measured ~1.1-1.4 ns/elem
on v5e (scripts/microbench6.py lineage):

    out[e] = T[row[e], lane[e]]
           = sum_r  onehot[r, e] * T[r, lane[e]]
    D      = T^T @ OH          # (128, E): D[l, e] = T[row[e], l]   (MXU)
    out[e] = sum_l D[l, e] * [l == lane[e]]                         (VPU)

Everything stays in Mosaic-friendly NATURAL layout: index tiles (SUB, 128)
flatten to (1, E) along lanes (supported), one-hots are broadcast compares
against iota, and the row dimension is processed in 128-row chunks with a
per-tile dynamic [min, max] chunk window — clustered indices (a tracking
filter's cloud) touch only 1-2 chunks regardless of table height.

Precision: the table transits the MXU in bfloat16.  ``precision="split"``
(default) writes the table as hi + lo bf16 planes STACKED along the
contraction dimension — the one-hot pattern repeats over both planes, so a
single dot per chunk sums hi + lo (Mosaic miscompiles two dots inside one
fori body; one wider dot sidesteps it) — giving ~1e-3 relative error,
required for correlation-field values (|v| up to 1e4, where raw bf16's
8-bit mantissa would distort log-weights by O(1)).  ``precision="bf16"``
is exact for 0/1 tables (occupancy masks).

Out-of-range rows contribute no one-hot mass and return 0.0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RC = 128   # row chunk (one-hot matmul K dimension)


def _pick_sub(chunks: int, split: bool) -> int:
    """Index-tile sublanes per program, sized so the resident table
    (bf16, x2 when split) plus per-tile buffers stay well under VMEM."""
    table_mb = 128 * chunks * RC * 2 * (2 if split else 1) / 2 ** 20
    # per-tile buffers ~ (oh bf16 + d f32 + mask bf16) = 8 bytes/lane-elem
    return 32 if table_mb > 4.0 else 64


def _kernel(tt_ref, rows_ref, lanes_ref, out_ref, acc_ref, *,
            chunks, split, sub):
    e = sub * 128
    cw = 2 * RC if split else RC  # contraction width per chunk
    rows_flat = rows_ref[:].reshape(1, e)
    lanes_flat = lanes_ref[:].reshape(1, e)
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (128, e), 0) == lanes_flat
    ).astype(jnp.float32)
    # one-hot repeats over the hi and lo half of the chunk (riota % RC), so
    # ONE dot per chunk accumulates hi + lo
    riota = jax.lax.broadcasted_iota(jnp.int32, (cw, e), 0) % RC
    row_chunk = rows_flat // RC

    acc_ref[:] = jnp.zeros((128, e), jnp.float32)

    def chunk_body(c, carry):
        # predicated skip: a tile whose rows split into distant clusters
        # (e.g. fine-field rows + coarse-fallback rows in the merged-table
        # gather) would otherwise pay for every chunk BETWEEN the clusters —
        # the [min, max] window alone degraded 1M-particle lookups ~10x
        @pl.when(jnp.any(row_chunk == c))
        def _():
            oh = (riota + c * RC == rows_flat).astype(jnp.bfloat16)
            acc_ref[:, :] += jnp.dot(
                tt_ref[:, pl.ds(c * cw, cw)], oh,
                preferred_element_type=jnp.float32,
            )

        return carry

    # dynamic chunk window bounds the scan; pl.when skips the gaps inside
    lo = jnp.clip(jnp.min(rows_flat) // RC, 0, chunks - 1)
    hi = jnp.clip(jnp.max(rows_flat) // RC, 0, chunks - 1)
    jax.lax.fori_loop(lo, hi + 1, chunk_body, 0)
    picked = jnp.sum(acc_ref[:] * mask, axis=0, keepdims=True)
    out_ref[:] = picked.reshape(sub, 128)


@functools.partial(
    jax.jit, static_argnames=("precision", "interpret")
)
def gather_rows_lanes(
    table: jnp.ndarray,      # (R, 128) float32
    rows: jnp.ndarray,       # (N,) int32 in [0, R)
    lanes: jnp.ndarray,      # (N,) int32 in [0, 128)
    precision: str = "split",
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i] = table[rows[i], lanes[i]], (N,) float32."""
    r, w = table.shape
    assert w == 128, "core gather expects a 128-lane table"
    n = rows.shape[0]

    rpad = (-r) % RC
    table = jnp.pad(table, ((0, rpad), (0, 0)))
    chunks = (r + rpad) // RC

    split = precision == "split"
    sub = _pick_sub(chunks, split)
    tt = table.T  # (128, R')
    tt_hi = tt.astype(jnp.bfloat16)
    if split:
        tt_lo = (tt - tt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # per-chunk [hi | lo] stacking along the contraction dim
        r2 = chunks * RC
        tt_k = jnp.concatenate(
            [tt_hi.reshape(128, chunks, 1, RC),
             tt_lo.reshape(128, chunks, 1, RC)], axis=2,
        ).reshape(128, 2 * r2)
    else:
        tt_k = tt_hi

    npad = (-n) % (sub * 128)
    # edge-pad so padding doesn't widen the dynamic chunk window
    rows_p = jnp.pad(rows.astype(jnp.int32), (0, npad), mode="edge")
    lanes_p = jnp.pad(lanes.astype(jnp.int32), (0, npad), mode="edge")
    m = (n + npad) // 128
    rows2 = rows_p.reshape(m, 128)
    lanes2 = lanes_p.reshape(m, 128)

    cw = 2 * RC if split else RC
    out = pl.pallas_call(
        functools.partial(_kernel, chunks=chunks, split=split, sub=sub),
        grid=(m // sub,),
        in_specs=[
            pl.BlockSpec((128, chunks * cw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, sub * 128), jnp.float32)],
        interpret=interpret,
    )(tt_k, rows2, lanes2)
    return out.reshape(-1)[:n]


# Below the crossover the XLA serial gather's fixed cost wins; above it the
# kernel's ~5x per-element advantage dominates (v5e measurement).
_MIN_N = 16384
# The kernel holds the whole (transposed, bf16[, +lo-plane]) table resident
# in VMEM (~16 MB/core on v5e); beyond this budget Mosaic spills and the
# kernel runs SLOWER than the serial XLA gather (observed 866 vs ~270
# ms/scan on the 113 MB folded raycast table) — fall back instead.
_MAX_TABLE_BYTES = 10 * 2 ** 20


def _table_bytes(rows: int, precision: str) -> int:
    per = 4 if precision == "split" else 2  # bf16 hi [+ lo]
    return ((rows + RC - 1) // RC) * RC * 128 * per


def _use_kernel(n: int, interpret, rows: int = 0,
                precision: str = "split") -> bool:
    if interpret is True:
        return True  # tests force the (interpret-mode) kernel off-TPU
    if rows and _table_bytes(rows, precision) > _MAX_TABLE_BYTES:
        return False
    return jax.default_backend() == "tpu" and n >= _MIN_N


def gather_2d(
    table: jnp.ndarray,      # (H, W) float32
    y: jnp.ndarray,          # (N,) int32
    x: jnp.ndarray,          # (N,) int32
    precision: str = "split",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """out[i] = table[y[i], x[i]]; indices assumed in-bounds (clip upstream).

    Wide tables fold column chunks into the row index:
    rows = y * ceil(W/128) + x // 128, lanes = x % 128.
    """
    h, w = table.shape
    n = y.shape[0]
    if not _use_kernel(n, interpret, rows=h * (-(-w // 128)),
                       precision=precision):
        return (
            table.reshape(-1)
            .at[y * w + x]
            .get(mode="promise_in_bounds")
            .astype(jnp.float32)
        )
    folded, cw = _fold_2d(table)
    rows = y * cw + x // 128
    lanes = x % 128
    return gather_rows_lanes(
        folded, rows, lanes, precision=precision,
        interpret=bool(interpret),
    )


def gather_3d(
    table: jnp.ndarray,      # (K, H, W) float32
    k: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    precision: str = "split",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """out[i] = table[k[i], y[i], x[i]] via 2D folding of the leading axes."""
    kk, h, w = table.shape
    return gather_2d(
        table.reshape(kk * h, w), k * h + y, x,
        precision=precision, interpret=interpret,
    )


def _fold_2d(table: jnp.ndarray):
    """(H, W) -> ((H*cw, 128) folded table, cw) with cw = ceil(W/128):
    element (y, x) lives at row y*cw + x//128, lane x%128."""
    h, w = table.shape
    cw = -(-w // 128)
    padded = jnp.pad(table.astype(jnp.float32), ((0, 0), (0, cw * 128 - w)))
    return padded.reshape(h * cw, 128), cw


def gather_2d_select(
    table_a: jnp.ndarray,    # (Ha, Wa) float32
    ya: jnp.ndarray, xa: jnp.ndarray,
    table_b: jnp.ndarray,    # (Hb, Wb) float32
    yb: jnp.ndarray, xb: jnp.ndarray,
    use_a: jnp.ndarray,      # (N,) bool
    precision: str = "split",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """out[i] = table_a[ya, xa] if use_a[i] else table_b[yb, xb].

    ONE gather pass over the two tables stacked row-wise — half the kernel
    invocations and half the gathered elements of two masked gather_2d calls
    (the per-particle fine-field/coarse-fallback lookup pattern in
    models/corr_field.py).  Indices assumed in-bounds per their table.
    """
    n = ya.shape[0]
    fa, cwa = _fold_2d(table_a)
    fb, cwb = _fold_2d(table_b)
    ra = ya * cwa + xa // 128
    rb = fa.shape[0] + yb * cwb + xb // 128
    rows = jnp.where(use_a, ra, rb)
    lanes = jnp.where(use_a, xa % 128, xb % 128)
    combined = jnp.concatenate([fa, fb], axis=0)
    if not _use_kernel(n, interpret, rows=combined.shape[0],
                       precision=precision):
        return (
            combined.reshape(-1)
            .at[rows * 128 + lanes]
            .get(mode="promise_in_bounds")
            .astype(jnp.float32)
        )
    return gather_rows_lanes(
        combined, rows, lanes, precision=precision,
        interpret=bool(interpret),
    )
