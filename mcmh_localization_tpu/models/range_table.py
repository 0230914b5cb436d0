"""Precomputed ray-cast range table — the TPU-native beam sensor model.

Replaces the per-(particle, beam) DDA march of
``compute_likelihoods_raycast`` + ``raycast`` (parallel_utils.py:151-201,
4-29).  A literal port would perform N x M x S random map lookups per scan
(3.6e9 at 100k particles x 360 beams x 100 steps) — random-access gathers
serialize at ~7.5 ns/element on TPU, so that formulation can never be fast
on this hardware.

TPU-first redesign (the classic range-LUT trick, cf. range_libc/CDDT, here
built densely so the *construction* is also gather-free):

  1. ONCE PER MAP, build ``R[k, cy, cx]`` = the reference-semantics raycast
     distance from the center of cell (cy, cx) along theta-bin center k.
     Key insight: from a CELL CENTER, the cell visited at march step i is
     ``(cy + dy_i, cx + dx_i)`` with offsets ``d*_i = floor(0.5 +
     i*step*cos/sin(theta_k)/res)`` INDEPENDENT of the cell — so one march
     step for ALL cells of a bin is a single shifted read of the occupancy
     grid (dense dynamic_slice), and the whole table is K x S shifted reads
     + first-event masking.  No random access anywhere.
  2. PER SCAN, the predicted range for (particle n, beam j) is one lookup
     ``R[bin(theta_n + a_j), cell_n]`` — N x M gathers through the MXU
     gather kernel (ops/gather_pallas.py), laid out CELL-MAJOR so a
     tracking cloud's lookups stay inside a few 128-row chunks.

Approximation vs the reference (documented): the ray heading is quantized
to ``n_theta`` bins and the ray origin to the particle's cell center — the
same quantization class as the correlation field (models/corr_field.py),
exact when poses sit at cell centers and headings at bin centers.  One
genuine edge difference: the reference's ``int()`` truncation maps
world positions in (-1, 0) cells to index 0 instead of out-of-map
(parallel_utils.py:377-378 toward-zero truncation); the table build uses
floor semantics there.  Rays that terminate inside the map (any walled
environment) are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.models.sensor import (
    BLIND_SCORE,
    LOG_FLOOR,
    RAY_STEP,
)


def build_range_table(
    grid_map,
    n_theta: int,
    max_range: float,
    step: float = RAY_STEP,
    hit_unknown: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(n_theta, H, W) raycast ranges from every cell center.

    Matches ``models.sensor.raycast`` (and therefore parallel_utils.py:4-29)
    at cell centers and bin-center angles: march i = 1..S in ``step``-meter
    increments; leaving the map returns max_range, the first cell with
    occupancy > 50 returns i*step (``hit_unknown`` also stops on unknown
    cells, the simulator convention).  Built once per (map, config); the
    build is dense shifted reads — see module docstring.
    """
    occ = grid_map.occupancy
    h, w = occ.shape
    res = float(jax.device_get(grid_map.resolution))
    n_steps = int(max_range / step)
    pad = int(np.ceil(max_range / res)) + 2

    # (K, S) integer cell offsets, concrete at trace time
    thetas = (
        -np.pi + (np.arange(n_theta) + 0.5) * (2.0 * np.pi / n_theta)
    )
    dists = (np.arange(1, n_steps + 1) * step)
    dx = np.floor(0.5 + np.outer(np.cos(thetas), dists) / res).astype(np.int32)
    dy = np.floor(0.5 + np.outer(np.sin(thetas), dists) / res).astype(np.int32)
    dx = jnp.asarray(dx + pad)  # slice starts into the padded grid
    dy = jnp.asarray(dy + pad)

    hit_grid = (occ > 50) | (hit_unknown & (occ != 0))
    hit_p = jnp.pad(hit_grid, pad, constant_values=False)
    in_p = jnp.pad(
        jnp.ones((h, w), dtype=bool), pad, constant_values=False
    )
    d_steps = jnp.asarray(dists, dtype=jnp.float32)

    def one_bin(dxy):
        dx_k, dy_k = dxy

        def body(i, carry):
            done, result = carry
            oy = dy_k[i]
            ox = dx_k[i]
            hit = jax.lax.dynamic_slice(hit_p, (oy, ox), (h, w))
            inb = jax.lax.dynamic_slice(in_p, (oy, ox), (h, w))
            event = hit | ~inb
            # first event wins: hit -> i*step, exit -> max_range
            d_evt = jnp.where(hit, d_steps[i], jnp.float32(max_range))
            result = jnp.where(~done & event, d_evt, result)
            return done | event, result

        init = (
            jnp.zeros((h, w), dtype=bool),
            jnp.full((h, w), max_range, dtype=jnp.float32),
        )
        _, result = jax.lax.fori_loop(0, n_steps, body, init)
        return result

    table = jax.lax.map(one_bin, (dx, dy))
    return table.astype(dtype)


def table_cell_major(table: jnp.ndarray) -> jnp.ndarray:
    """(K, H, W) -> (H*W, K): one row per cell, theta bins on the fast axis.

    The scan-time lookup gathers all M beams of a particle from its single
    cell row, so a spatially clustered (tracking) cloud touches few 128-row
    chunks of the folded table — the regime the MXU gather kernel's dynamic
    chunk window exploits (ops/gather_pallas.py)."""
    k, h, w = table.shape
    return table.transpose(1, 2, 0).reshape(h * w, k)


def beam_field_scores(
    particles: jnp.ndarray,
    ranges: jnp.ndarray,
    angles: jnp.ndarray,
    grid_map,
    config: FilterConfig,
    table: jnp.ndarray,      # (K, H, W) range table (build_range_table)
    n_theta: int,
    window_origin: tuple,    # (oy0, ox0[, kstart]) cell/bin coords, traced
) -> jnp.ndarray:
    """Per-particle beam-model scores via a per-scan SCORE FIELD — the
    fully gather-free TPU formulation of ``compute_likelihoods_raycast``
    (parallel_utils.py:151-201).

    The table-lookup path still pays N x M random gathers per scan (36M at
    100k x 360 — measured 866 ms/scan on v5e).  But the beam model's
    per-beam term only depends on the particle through (cell, theta-bin):

        score[k, cy, cx] = sum_j log p(r_j | R[bin(c_k + a_j), cy, cx])

    so the whole scan collapses to DENSE elementwise work over
    (window-bins x win x win) cells — VPU-friendly shifted adds exactly
    like the correlation field (models/corr_field.py) — followed by ONE
    field lookup per particle.  Heading is quantized to the particle's
    theta-bin CENTER (the same quantization class as the corr scorer;
    agrees with ``raycast_table_scores`` exactly when headings sit at bin
    centers — tests/test_range_table.py).

    Requires a spatial window (``corr_window_cells``); a theta window
    (``corr_theta_window_bins``) cuts the build by K/bins.  In-map
    particles escaping the window take BLIND_SCORE (document: no coarse
    fallback for the beam model; use beam_impl="table" for global
    relocalization configs).
    """
    from mcmh_localization_tpu.models.sensor import INVALID_SCORE
    from mcmh_localization_tpu.ops.gather_pallas import gather_2d

    max_range = config.max_range
    sigma = config.sigma_hit
    if config.step > 1:
        ranges = ranges[:: config.step]
        angles = angles[:: config.step]
    valid = jnp.isfinite(ranges) & (ranges < max_range)
    count = jnp.sum(valid)
    safe_r = jnp.where(valid, ranges, 0.0)

    k_tab, h, w = table.shape
    win = min(config.corr_window_cells, h, w)
    oy0 = jnp.clip(jnp.asarray(window_origin[0], jnp.int32), 0, h - win)
    ox0 = jnp.clip(jnp.asarray(window_origin[1], jnp.int32), 0, w - win)
    tw = config.corr_theta_window_bins
    use_theta_win = bool(tw) and len(window_origin) == 3
    nbins = min(tw, n_theta) if use_theta_win else n_theta
    kstart = (
        jnp.asarray(window_origin[2], jnp.int32) if use_theta_win
        else jnp.int32(0)
    )

    # (K, win, win) window of the precomputed table: ONE dynamic slice
    rw = jax.lax.dynamic_slice(table, (0, oy0, ox0), (k_tab, win, win))

    # global table bin per (window bin, beam): headings at bin CENTERS
    dtheta = 2.0 * jnp.pi / n_theta
    centers = (kstart + jnp.arange(nbins) + 0.5) * dtheta - jnp.pi
    g = (
        jnp.floor((centers[:, None] + angles[None, :] + jnp.pi) / dtheta)
        .astype(jnp.int32) % n_theta
    )  # (nbins, M)

    inv_sqrt = 1.0 / (jnp.sqrt(2.0 * jnp.pi) * sigma)
    z_floor = config.z_rand / max_range

    def one_bin(g_k):
        rows = rw[g_k]  # (M, win, win): M row gathers of dense slabs
        ph = inv_sqrt * jnp.exp(
            -0.5 * ((safe_r[:, None, None] - rows) / sigma) ** 2
        )
        lp = jnp.log(jnp.maximum(config.z_hit * ph + z_floor, LOG_FLOOR))
        return jnp.sum(jnp.where(valid[:, None, None], lp, 0.0), axis=0)

    field = jax.lax.map(one_bin, g)  # (nbins, win, win)

    score_validity = config.motion_validity == "score"
    if score_validity:
        # fold motion validity into the field (same trick as the corr
        # scorer): non-free window cells score INVALID, no per-proposal
        # map lookups
        occ_win = jax.lax.dynamic_slice(
            grid_map.occupancy, (oy0, ox0), (win, win)
        )
        pen_total = INVALID_SCORE * jnp.maximum(count, 1).astype(jnp.float32)
        field = field + pen_total * jnp.where(occ_win == 0, 0.0, 1.0)[None]

    # ---- one lookup per particle
    mx, my = grid_map.world_to_grid(particles[:, 0], particles[:, 1])
    in_map = grid_map.in_bounds(mx, my)
    tbin = (
        ((particles[:, 2] + jnp.pi) / dtheta).astype(jnp.int32) % n_theta
    )
    if use_theta_win:
        k_rel = (tbin - kstart) % n_theta
        in_theta = k_rel < nbins
        tbin = jnp.where(in_theta, k_rel, 0)
    else:
        in_theta = jnp.ones(particles.shape[0], dtype=bool)
    mxw = jnp.clip(mx, 0, w - 1) - ox0
    myw = jnp.clip(my, 0, h - 1) - oy0
    in_window = (mxw >= 0) & (mxw < win) & (myw >= 0) & (myw < win)
    covered = in_window & in_theta
    prec = "bf16" if config.score_aggregation == "mean" else "split"
    # theta-minor rows: converged clouds are spatially tight but spread
    # over theta bins — pack (y, bin) rows so the gather kernel visits few
    # 128-row chunks (see models/corr_field.py lookup comment)
    field_t = field.transpose(1, 0, 2).reshape(win * nbins, win)
    totals = gather_2d(
        field_t,
        jnp.clip(myw, 0, win - 1) * nbins + tbin,
        jnp.clip(mxw, 0, win - 1),
        precision=prec,
    )
    totals = jnp.where(in_map & covered, totals, 0.0)
    if config.score_aggregation == "sum":
        score = totals
    else:
        score = totals / jnp.maximum(count, 1)
    # out-of-map: reference zero-contribution (or invalid pen under
    # score-validity); in-map window escapees: blind penalty
    score = jnp.where(in_map & ~covered, BLIND_SCORE, score)
    if score_validity:
        pen = (
            INVALID_SCORE * jnp.maximum(count, 1).astype(jnp.float32)
            if config.score_aggregation == "sum"
            else jnp.float32(INVALID_SCORE)
        )
        score = jnp.where(in_map, score, pen)
    return jnp.where(count > 0, score, BLIND_SCORE).astype(jnp.float32)


def raycast_table_scores(
    particles: jnp.ndarray,
    ranges: jnp.ndarray,
    angles: jnp.ndarray,
    grid_map,
    config: FilterConfig,
    table_cm: jnp.ndarray,   # (H*W, K) cell-major range table
    n_theta: int,
) -> jnp.ndarray:
    """Per-particle beam-model log-likelihood via the range table, (N,).

    Same mixture and aggregation semantics as
    ``sensor.raycast_beam_scores`` (parallel_utils.py:151-201): only beams
    with finite r < max_range count; per-beam
    log(max(z_hit*N(r - r_pred; sigma_hit) + z_rand/max_range, 1e-6));
    blind scans score BLIND_SCORE.
    """
    max_range = config.max_range
    sigma = config.sigma_hit
    valid = jnp.isfinite(ranges) & (ranges < max_range)
    count = jnp.sum(valid)
    safe_r = jnp.where(valid, ranges, 0.0)

    n = particles.shape[0]
    m = ranges.shape[0]
    mx, my = grid_map.world_to_grid(particles[:, 0], particles[:, 1])
    in_map = grid_map.in_bounds(mx, my)
    cell = (
        jnp.clip(my, 0, grid_map.height - 1) * grid_map.width
        + jnp.clip(mx, 0, grid_map.width - 1)
    )  # (N,)

    dtheta = 2.0 * jnp.pi / n_theta
    # floor (not toward-zero truncation): theta + a spans [-2pi, 2pi]
    k_nj = (
        jnp.floor((particles[:, 2][:, None] + angles[None, :] + jnp.pi)
                  / dtheta).astype(jnp.int32) % n_theta
    )  # (N, M)

    from mcmh_localization_tpu.ops.gather_pallas import gather_2d

    # ranges <= max_range: bf16 relative error (~0.4%) is below the table's
    # own RAY_STEP quantization — no hi/lo split needed
    r_pred = gather_2d(
        table_cm,
        jnp.broadcast_to(cell[:, None], (n, m)).reshape(-1),
        k_nj.reshape(-1),
        precision="bf16",
    ).reshape(n, m)

    inv_sqrt = 1.0 / (jnp.sqrt(2.0 * jnp.pi) * sigma)
    prob_hit = inv_sqrt * jnp.exp(
        -0.5 * ((safe_r[None, :] - r_pred) / sigma) ** 2
    )
    prob = config.z_hit * prob_hit + config.z_rand / max_range
    logp = jnp.log(jnp.maximum(prob, LOG_FLOOR))
    totals = jnp.sum(jnp.where(valid[None, :] & in_map[:, None], logp, 0.0),
                     axis=1)
    # out-of-map particles keep the reference's zero-contribution score
    if config.score_aggregation == "sum":
        score = totals
    else:
        score = totals / jnp.maximum(count, 1)
    return jnp.where(count > 0, score, BLIND_SCORE).astype(jnp.float32)
