"""Pallas TPU kernel for the likelihood-field scorer — HOT LOOP #1.

The jnp path (models/sensor.py) computes endpoints with two outer products
and scores them with one XLA gather from the per-map log-likelihood table.
At large particle counts the gather dominates: XLA lowers it to a serial
per-element dynamic-slice loop.  This kernel keeps the whole log-field
table resident in VMEM (a 384^2 map is 576 KB; tables up to ~3k x 3k cells
fit the ~16 MB budget) and streams particle tiles through it, so the gather
never touches HBM and the endpoint math fuses into the same kernel.

Semantics are identical to likelihood_field_scores
(parallel_utils.py:85-149 behavior): stride subsampling, valid = finite &
r < max_range, out-of-map beams count in the denominator but contribute 0,
-50 blind penalty.

Layout: particles tile (TILE_N) on sublanes, padded beams (M_pad, multiple
of 128) on lanes.  The kernel emits (TILE_N, 128) lane-group partial sums;
the final cross-lane reduction happens outside in XLA (a (N, 128) -> (N,)
sum, trivially fused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.models.sensor import BLIND_SCORE, log_likelihood_field

TILE_N = 512     # particles per grid step
LANES = 128


def _cdiv(a, b):
    return -(-a // b)


def _kernel(scal_ref, parts_ref, u_ref, v_ref, valid_ref, field_ref, out_ref):
    """One particle tile against all beams.

    scal_ref: (6,) SMEM [origin_x, origin_y, inv_resolution, width, height, _]
    parts_ref: (TILE_N, 3) VMEM particle poses
    u_ref/v_ref/valid_ref: (1, M_pad) VMEM beam endpoint offsets + validity
    field_ref: (H*W,) VMEM log-likelihood table (flat)
    out_ref: (TILE_N, LANES) VMEM lane-group partial sums
    """
    ox = scal_ref[0]
    oy = scal_ref[1]
    inv_res = scal_ref[2]
    width = scal_ref[3].astype(jnp.int32)
    height = scal_ref[4].astype(jnp.int32)

    x = parts_ref[:, 0:1]          # (TILE_N, 1)
    y = parts_ref[:, 1:2]
    theta = parts_ref[:, 2:3]
    c = jnp.cos(theta)
    s = jnp.sin(theta)

    u = u_ref[0, :][None, :]       # (1, M_pad)
    v = v_ref[0, :][None, :]
    valid = valid_ref[0, :][None, :] > 0

    lx = x + c * u - s * v         # (TILE_N, M_pad)
    ly = y + s * u + c * v
    mx = ((lx - ox) * inv_res).astype(jnp.int32)
    my = ((ly - oy) * inv_res).astype(jnp.int32)
    in_map = (mx >= 0) & (mx < width) & (my >= 0) & (my < height)
    idx = (
        jnp.clip(my, 0, height - 1) * width + jnp.clip(mx, 0, width - 1)
    )

    vals = jnp.take(field_ref[:], idx)  # VMEM-resident table gather
    contrib = jnp.where(valid & in_map, vals, 0.0)

    m_pad = contrib.shape[1]
    out_ref[:, :] = jnp.sum(
        contrib.reshape(TILE_N, m_pad // LANES, LANES), axis=1
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_scores(particles, u, v, valid_f, field_flat, scalars, interpret=False):
    n = particles.shape[0]
    m_pad = u.shape[0]
    n_tiles = _cdiv(n, TILE_N)
    n_padded = n_tiles * TILE_N
    parts = jnp.pad(particles, ((0, n_padded - n), (0, 0)))

    partial = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_N, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_padded, LANES), jnp.float32),
        interpret=interpret,
    )(scalars, parts, u[None, :], v[None, :], valid_f[None, :], field_flat)
    return jnp.sum(partial, axis=1)[:n]


def likelihood_field_scores_pallas(
    particles: jnp.ndarray,
    ranges: jnp.ndarray,
    angles: jnp.ndarray,
    grid_map,
    config: FilterConfig,
    log_field: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for models.sensor.likelihood_field_scores."""
    if log_field is None:
        log_field = log_likelihood_field(grid_map, config)
    if config.step > 1:
        ranges = ranges[:: config.step]
        angles = angles[:: config.step]

    valid = jnp.isfinite(ranges) & (ranges < config.max_range)
    safe_r = jnp.where(valid, ranges, 0.0)
    u = safe_r * jnp.cos(angles)
    v = safe_r * jnp.sin(angles)

    m = u.shape[0]
    m_pad = _cdiv(m, LANES) * LANES
    pad = m_pad - m
    u = jnp.pad(u, (0, pad)).astype(jnp.float32)
    v = jnp.pad(v, (0, pad)).astype(jnp.float32)
    valid_f = jnp.pad(valid.astype(jnp.float32), (0, pad))

    scalars = jnp.stack(
        [
            grid_map.origin[0].astype(jnp.float32),
            grid_map.origin[1].astype(jnp.float32),
            (1.0 / grid_map.resolution).astype(jnp.float32),
            jnp.float32(grid_map.width),
            jnp.float32(grid_map.height),
            jnp.float32(0.0),
        ]
    )

    totals = _pallas_scores(
        particles.astype(jnp.float32), u, v, valid_f,
        log_field.reshape(-1), scalars, interpret=interpret,
    )
    count = jnp.sum(valid)
    if config.score_aggregation == "sum":
        score = totals
    else:
        score = totals / jnp.maximum(count, 1)
    return jnp.where(count > 0, score, BLIND_SCORE).astype(jnp.float32)
