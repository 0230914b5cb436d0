"""Particle initialization.

Replaces ``generate_valid_particles`` (parallel_utils.py:450-465) and
``initialize_gaussian_parallel``/``validate_samples``
(parallel_utils.py:594-615), dispatched from ``initialize_particles``
(amcmh_localizer.py:179-197).

TPU-first design: uniform free-space init samples a free CELL uniformly from
the precomputed free-cell table and jitters uniformly within the cell —
exactly the uniform-over-free-space distribution the reference gets from its
50x oversample-and-reject, but with a static shape and no chance of
returning fewer particles than asked (the reference can,
parallel_utils.py:462-465).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_uniform(key: jax.Array, n: int, grid_map) -> jnp.ndarray:
    """(n, 3) poses uniform over free space, theta ~ U(-pi, pi)."""
    k_cell, k_off, k_theta = jax.random.split(key, 3)
    f = grid_map.free_xy.shape[0]
    cells = jax.random.randint(k_cell, (n,), 0, f)
    xy = grid_map.free_xy[cells]
    jitter = jax.random.uniform(
        k_off, (n, 2), minval=-0.5, maxval=0.5
    ) * grid_map.resolution
    theta = jax.random.uniform(k_theta, (n,), minval=-jnp.pi, maxval=jnp.pi)
    return jnp.concatenate([xy + jitter, theta[:, None]], axis=1).astype(jnp.float32)


def init_gaussian(
    key: jax.Array,
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    n: int,
    grid_map,
    clearance: float = 1.0,
    invalid_to_zero: bool = True,
) -> jnp.ndarray:
    """(n, 3) poses ~ N(mean, cov), validated against the map.

    Matches initialize_gaussian_parallel + validate_samples
    (parallel_utils.py:594-615): a sample is kept iff its cell is in-bounds
    and the distance field there is < ``clearance`` (the reference's
    ``distance_map[my, mx] < 1.0`` test — note this asks the pose to be
    *near* structure, a reference quirk).  Invalid samples become (0, 0, 0)
    when ``invalid_to_zero`` (reference behavior, :613); otherwise they are
    replaced by redrawn uniform free-space poses (corrected behavior).
    """
    k_n, k_u = jax.random.split(key)
    chol = jnp.linalg.cholesky(jnp.asarray(cov, dtype=jnp.float32))
    eps = jax.random.normal(k_n, (n, 3), dtype=jnp.float32)
    samples = jnp.asarray(mean, dtype=jnp.float32)[None, :] + eps @ chol.T

    mx, my = grid_map.world_to_grid(samples[:, 0], samples[:, 1])
    ok = grid_map.in_bounds(mx, my) & (
        grid_map.distance_at(mx, my, fill=jnp.inf) < clearance
    )
    if invalid_to_zero:
        fallback = jnp.zeros_like(samples)
    else:
        fallback = init_uniform(k_u, n, grid_map)
    return jnp.where(ok[:, None], samples, fallback)
