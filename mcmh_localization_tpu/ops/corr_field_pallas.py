"""Pallas kernel for the correlation-field build — the TPU hot op.

XLA's version of ``build_correlation_field`` materializes a (M, H, W) slice
stack per theta-bin (~1.6 ms/bin measured on v5e).  This kernel keeps the
zero-padded log-likelihood table resident in VMEM (~3 MB for the 384^2
reference map) and accumulates the M shifted slices in place, so HBM
traffic is one table read + one field write per bin.

Mosaic requires dynamic vector loads to be tile-aligned (sublane multiple
of 8, lane multiple of 128), so each beam's arbitrary (oy, ox) offset is
split into an aligned base load of a (h+8, w+128) window plus two dynamic
rotates (``tpu.dynamic_rotate`` via pltpu.roll) for the fine remainder.

Invalid beams are pre-pointed at a guaranteed all-zero band appended below
the padded table, so they contribute 0 with no in-kernel branching.

Grid: one step per theta-bin; offsets arrive via scalar prefetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128  # lane alignment


def _sublane(dtype) -> int:
    """Min sublane tile: 8 for f32, 16 for bf16 (Mosaic tiling constraints)."""
    import jax.numpy as _jnp

    return 16 if dtype == _jnp.bfloat16 else 8


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def corr_field_pallas(
    padded: jnp.ndarray,   # (Hp, Wp) zero-padded log-field (see corr_field.py)
    ox: jnp.ndarray,       # (K, M) int32 slice starts (pad offset included)
    oy: jnp.ndarray,       # (K, M) int32; invalid beams point at the zero band
    h: int,
    w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(K, h, w) float32: per-bin summed shifted slices.

    Requires padded.shape >= (max(oy)+h+SUB, max(ox)+w+LANE).
    """
    k = ox.shape[0]
    sub = _sublane(padded.dtype)
    hw = h + sub
    ww = w + LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, h, w), lambda kk, *_: (kk, 0, 0)),
    )

    def kernel(ox_ref, oy_ref, padded_hbm, out_ref):
        kk = pl.program_id(0)

        def inner(padded_vmem, sem):
            cp = pltpu.make_async_copy(padded_hbm, padded_vmem, sem)
            cp.start()
            cp.wait()
            m = ox_ref.shape[1]
            out_ref[0, :, :] = jnp.zeros((h, w), dtype=padded_vmem.dtype)

            def body(j, _):
                oyj = oy_ref[kk, j]
                oxj = ox_ref[kk, j]
                by = pl.multiple_of((oyj // sub) * sub, sub)
                bx = pl.multiple_of((oxj // LANE) * LANE, LANE)
                ry = oyj - by   # [0, sub)
                rx = oxj - bx   # [0, 128)
                win = padded_vmem[pl.ds(by, hw), pl.ds(bx, ww)]
                # want out[i, l] = win[i + ry, l + rx]: circular-rotate rows
                # up by ry and lanes left by rx, then take the leading block
                win = pltpu.roll(win, hw - ry, axis=0)
                win = pltpu.roll(win, ww - rx, axis=1)
                out_ref[0, :, :] += win[:h, :w]
                return 0

            jax.lax.fori_loop(0, m, body, 0)

        pl.run_scoped(
            inner,
            pltpu.VMEM(padded.shape, padded.dtype),
            pltpu.SemaphoreType.DMA,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, h, w), padded.dtype),
        interpret=interpret,
    )(ox, oy, padded)
