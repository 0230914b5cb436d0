"""Monotone row-take kernel — the resampling "expansion" gather.

Systematic resampling ends with ``particles[idx]`` where ``idx`` is
NONDECREASING (each input particle occupies a contiguous run of output
slots).  XLA lowers that gather to a serial ~4 ns/element loop on TPU —
~12 ms for (1M, 3) — the single largest cost of the resampling path
(replaces the expansion behind parallel_utils.py:416-446 at scale).

Monotonicity makes the access pattern WINDOWED: output tile
``[tE, (t+1)E)`` only reads source rows ``[idx[tE], idx[(t+1)E-1]]``, a
span that averages E rows (the draw is measure-preserving).  Each grid
step therefore:

  1. DMAs a (WB, 128) window of the source column (particle p lives at
     row p//128, lane p%128) from HBM into VMEM, starting at the tile's
     first index — a *dynamic* start, which manual ``make_async_copy``
     supports where BlockSpec index maps cannot (block-granular only).
  2. Resolves the take in-VMEM via the one-hot MXU trick of
     ops/gather_pallas.py: D = W^T @ onehot(window_row), then a lane-mask
     reduction picks lane p%128.

The dot runs in float32 with HIGHEST precision: one-hot entries are exact
1.0 and the accumulation sums one nonzero term, so copies are BITWISE
EXACT — required for resampling (duplicated particles must be identical;
tests assert equality with ``particles[idx]``).

Tiles whose span exceeds the window fall back to the XLA gather via
``lax.cond`` (both branches compiled; only the taken one executes).  In a
particle filter that needs adversarially spiky weights concentrated on
index-scattered particles — rare, and still correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WB = 128       # window rows (x128 lanes = 16384 source elements)
SUB = 64       # output tile sublanes (x128 = 8192 elements per grid step)


def _kernel(src_hbm, rows_ref, out_ref, win, sem, *, r0):
    e = SUB * 128
    rows = rows_ref[:].reshape(1, e)
    # monotone rows: the tile's window starts at its first index's row
    rb = jnp.clip(rows_ref[0, 0] // 128, 0, r0 - WB)
    cp = pltpu.make_async_copy(src_hbm.at[pl.ds(rb, WB), :], win, sem)
    cp.start()
    cp.wait()
    rl = rows - rb * 128                      # local offsets [0, WB*128)
    rr = rl // 128
    ll = rl % 128
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (WB, e), 0) == rr
    ).astype(jnp.float32)
    d = jax.lax.dot_general(
        win[:], oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (128, e): d[l, e] = win[rr[e], l]
    lane_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (128, e), 0) == ll
    ).astype(jnp.float32)
    out_ref[:] = jnp.sum(d * lane_mask, axis=0).reshape(SUB, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _take_column(
    col: jnp.ndarray,   # (R0, 128) f32 source column layout
    rows2: jnp.ndarray,  # (M, 128) int32 padded monotone indices
    interpret: bool = False,
) -> jnp.ndarray:
    r0 = col.shape[0]
    m = rows2.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, r0=r0),
        grid=(m // SUB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WB, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(col, rows2)


def take_rows_monotone(
    src: jnp.ndarray,    # (N, C) float32
    idx: jnp.ndarray,    # (M,) int32, NONDECREASING, in [0, N)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``src[idx]`` for monotone idx — bitwise-equal, ~6x faster at 1M.

    Falls back to the XLA gather when any output tile's index span exceeds
    the kernel window (or off-TPU).
    """
    n, c = src.shape
    m = idx.shape[0]
    # interpret=True makes the kernel path ELIGIBLE off-TPU (interpret
    # mode, for tests); the per-tile span check below still routes
    # adversarial inputs to the XLA gather in every mode
    use = (interpret is True) or (
        jax.default_backend() == "tpu" and m >= 4 * SUB * 128
    )
    if not use:
        return src[idx]

    e = SUB * 128
    mpad = (-m) % e
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, mpad), mode="edge")
    rows2 = idx_p.reshape(-1, 128)
    mt = rows2.shape[0]

    # per-tile span check (margin 127 for the //128 window-base rounding)
    tile_first = idx_p[::e]
    tile_last = idx_p[e - 1::e]
    fits = jnp.all(tile_last - tile_first < WB * 128 - 127)

    r0 = max(-(-n // 128), WB)  # at least one full kernel window
    cols = []
    # pad the flattened column to the (R0, 128) layout
    for ci in range(c):
        flat = jnp.pad(src[:, ci], (0, r0 * 128 - n))
        cols.append(flat.reshape(r0, 128))

    def kernel_path(_):
        outs = [
            _take_column(col, rows2, interpret=bool(interpret))
            for col in cols
        ]
        return jnp.stack([o.reshape(-1)[:m] for o in outs], axis=1)

    def xla_path(_):
        return src[idx]

    return jax.lax.cond(fits, kernel_path, xla_path, operand=None)
