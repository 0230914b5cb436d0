"""Correlation-field likelihood scorer — the gather-free TPU path.

Motivation (measured on v5e): XLA lowers per-element table gathers to a
~7.5 ns/element serial loop, so the exact likelihood-field scorer costs
~270 ms at 100k particles x 360 beams; random-access gathers are the single
worst primitive on TPU.  This module restructures the sensor model so the
per-beam random access disappears:

  1. Per scan, build a correlation field F[k, cy, cx]: the summed per-beam
     log-likelihood a pose in cell (cy, cx) with heading in theta-bin k
     would get — F_k = sum_j shift(L, offset_j(theta_k)), dense shifted
     adds of the log-likelihood table (pure VPU streaming, no random
     access; Pallas kernel in ops/corr_field_pallas.py keeps the table in
     VMEM).  Cost is independent of the particle count.
  2. Score all N particles with ONE lookup each into F — N gathers
     instead of N x M.

Approximation vs the exact scorer (documented): heading is quantized to
``n_theta`` bins and the endpoint cell is particle-cell + offset-cell
(double truncation) rather than trunc of the continuous endpoint — both on
the order of the reference's own 5 cm cell quantization for reasonable
n_theta.  Exact semantics remain available via likelihood_impl="jnp";
filter-level RMSE is indistinguishable (tests/test_corr_field.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.models.sensor import (
    BLIND_SCORE,
    INVALID_SCORE,
    log_likelihood_field,
)


def _bin_offsets(u, v, valid, inv_res, n_theta, pad_cells, zero_band_row,
                 bin_start=0, nbins=None):
    """(nbins, M) int32 slice-start offsets per theta-bin; invalid beams
    point at the all-zero band.  ``bin_start`` (traced ok) selects a
    contiguous circular window of ``nbins`` of the n_theta global bins."""
    if nbins is None:
        nbins = n_theta
    # bin CENTERS (left edges would give a systematic half-bin heading bias
    # that steadily drags tracking; lookup uses floor-to-bin below)
    thetas = (
        (bin_start + jnp.arange(nbins, dtype=jnp.float32) + 0.5)
        * (2.0 * jnp.pi / n_theta)
        - jnp.pi
    )
    c = jnp.cos(thetas)[:, None]
    s = jnp.sin(thetas)[:, None]
    ox = ((c * u[None, :] - s * v[None, :]) * inv_res).astype(jnp.int32) + pad_cells
    oy = ((s * u[None, :] + c * v[None, :]) * inv_res).astype(jnp.int32) + pad_cells
    ox = jnp.clip(ox, 0, 2 * pad_cells)
    oy = jnp.clip(oy, 0, 2 * pad_cells)
    ox = jnp.where(valid[None, :], ox, 0)
    oy = jnp.where(valid[None, :], oy, zero_band_row)
    return ox, oy


def _build_field_xla(padded, ox, oy, h, w):
    """XLA fallback: per-bin vmapped dynamic slices + sum."""

    def one_bin(ox_k, oy_k):
        def one_beam(oxj, oyj):
            return jax.lax.dynamic_slice(padded, (oyj, oxj), (h, w))

        return jnp.sum(jax.vmap(one_beam)(ox_k, oy_k), axis=0)

    return jax.lax.map(lambda o: one_bin(o[0], o[1]), (ox, oy))


def _build_field_conv(region, ox, oy, valid, ksize, fh, fw):
    """Field build as ONE MXU cross-correlation (the fast TPU path).

    F[k, y, x] = sum_j region[y + oy[k,j], x + ox[k,j]] is exactly a VALID
    2-D correlation of ``region`` with a per-bin sparse "stamp" counting how
    many beams land on each offset.  The stamp scatter is nbins*M tiny
    updates; the correlation is one lax.conv with the bins on the output-
    channel axis — MXU work instead of the Pallas builder's per-beam dynamic
    rotates (which cost ~0.25 ms/bin; the conv does all bins in ~1 ms).

    region: (fh + ksize - 1, fw + ksize - 1); ox/oy: (nbins, M) in
    [0, ksize); invalid beams contribute weight 0 (no zero-band needed).
    """
    nbins, m = ox.shape
    w = jnp.where(valid, 1.0, 0.0).astype(jnp.float32)
    stamp = jnp.zeros((nbins, ksize, ksize), jnp.float32)
    kidx = jnp.broadcast_to(jnp.arange(nbins)[:, None], (nbins, m))
    stamp = stamp.at[kidx, jnp.clip(oy, 0, ksize - 1),
                     jnp.clip(ox, 0, ksize - 1)].add(
        jnp.broadcast_to(w[None, :], (nbins, m))
    )
    # bf16 MXU conv with an f32-accurate hi+lo region split on the batch
    # axis (a raw f32 conv runs ~60x slower off the MXU).  Stamp counts are
    # integers but bf16 is only integer-exact up to 256 (8 mantissa bits) —
    # a wall-hugging scan can collapse >256 beams onto one offset cell, so
    # counts are decomposed into ceil(M/256) saturating planes of <=256
    # each (exact; conv is linear in the rhs, planes stack on the output-
    # channel axis and sum back)
    r32 = region.astype(jnp.float32)
    r_hi = r32.astype(jnp.bfloat16)
    r_lo = (r32 - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    lhs = jnp.stack([r_hi, r_lo])[:, None]          # (2, 1, H, W)
    nplanes = max(-(-m // 256), 1)
    planes = [
        jnp.clip(stamp - 256.0 * i, 0.0, 256.0) for i in range(nplanes)
    ]
    rhs = jnp.concatenate(planes)[:, None].astype(jnp.bfloat16)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    out = out[0] + out[1]                            # hi + lo region planes
    out = sum(out[i * nbins:(i + 1) * nbins] for i in range(nplanes))
    return out[:, :fh, :fw]


def _coarse_field(u, v, valid, log_field, grid_map, config, res):
    """Coarse full-map fallback FIELD, (kc, hc, wc).

    The gather is merged with the fine-field lookup into ONE kernel pass
    by the caller (ops/gather_pallas.py::gather_2d_select), halving the
    per-particle lookup traffic vs gathering both fields separately; the
    per-particle indices live in ``_coarse_indices`` so the caller can
    gate THIS build behind an escapee-count predicate (~0.3 ms/scan DFT
    build skipped in steady-state tracking).

    Gives out-of-window (but in-map) particles an honest smoothed score so
    augmented-MCL injection can recover a kidnapped robot while the fine
    field only covers the window (VERDICT round-1: out-of-window particles
    scored -50 and died instantly, neutralizing the recovery of
    amcmh_localizer.py:496-527).

    The coarse log field is the f x f block MAX of the fine log field: an
    optimistic (admissible) bound — "somewhere in this block the fit is this
    good".  Mean pooling was tried first and systematically handicaps
    out-of-window hypotheses against the in-window cluster's fine scores,
    so a kidnapped-robot's injected true-pose particles could never win;
    max pooling keeps them alive until the window migrates and fine scoring
    calibrates them.  Build cost: corr_coarse_n_theta small dense fields,
    independent of particle count.
    """
    f = config.corr_coarse_factor
    kc = config.corr_coarse_n_theta
    h, w = log_field.shape
    hc, wc = -(-h // f), -(-w // f)
    lf = jnp.pad(
        log_field.astype(jnp.float32),
        ((0, hc * f - h), (0, wc * f - w)),
        constant_values=-13.815511,  # log(1e-6), the probability floor
    )
    coarse_lf = lf.reshape(hc, f, wc, f).max(axis=(1, 3))

    res_c = f * res  # concrete: res is a python float at trace time
    pad_c = int(-(-config.max_range // res_c)) + 2
    padded = jnp.pad(coarse_lf, pad_c)
    zero_band_row = padded.shape[0]
    ox, oy = _bin_offsets(u, v, valid, 1.0 / res_c, kc, pad_c, zero_band_row)
    if jax.default_backend() == "tpu":
        # stamp-DFT build (see _build_field_dft): the conv formulation pays
        # O(ksize^2) MXU work per output cell (~2.7 ms for 36 x 96^2 with
        # ksize 55 on v5e); the DFT pays O(S) per cell at S=256 (~0.3 ms)
        field = _build_field_dft(padded, ox, oy, valid, hc, wc)
    else:
        padded = jnp.pad(padded, ((0, hc), (0, 0)))
        field = _build_field_xla(padded, ox, oy, hc, wc)

    if config.motion_validity == "score":
        # blocks with NO free cell get the invalid-pose penalty; blocks with
        # any free cell stay optimistic, consistent with the max-pooling
        free = jnp.pad(
            grid_map.occupancy == 0,
            ((0, hc * f - h), (0, wc * f - w)),
            constant_values=False,
        )
        any_free = free.reshape(hc, f, wc, f).any(axis=(1, 3))
        count = jnp.sum(valid).astype(jnp.float32)
        field = field + (INVALID_SCORE * jnp.maximum(count, 1.0)) * jnp.where(
            any_free, 0.0, 1.0
        )[None]
    return field.astype(jnp.float32)


def _coarse_indices(px, py, pth, grid_map, config, res):
    """Per-particle (theta-bin, row, col) indices into the coarse field —
    cheap per-particle math kept OUTSIDE the gated field build so the
    fused select-gather always has a valid index set."""
    f = config.corr_coarse_factor
    kc = config.corr_coarse_n_theta
    h, w = grid_map.occupancy.shape
    hc, wc = -(-h // f), -(-w // f)
    res_c = f * res
    mx = ((px - grid_map.origin[0]) / res_c).astype(jnp.int32)
    my = ((py - grid_map.origin[1]) / res_c).astype(jnp.int32)
    tbin = (
        ((pth + jnp.pi) * (kc / (2.0 * jnp.pi))).astype(jnp.int32)
        % kc
    )
    return tbin, jnp.clip(my, 0, hc - 1), jnp.clip(mx, 0, wc - 1)


def _build_field_dft(region, ox, oy, valid, fh, fw):
    """Field build as a DFT-domain cross-correlation — pure MXU matmuls.

    F[k, y, x] = sum_j region[y + oy[k,j], x + ox[k,j]]
               = real(IDFT2( DFT2(region) * conj(DFT2(stamp_k)) ))

    Round-3 formulation (~5.5x fewer matmul flops than the round-2 full
    S x S version, and scatter-free):

    * HALF SPECTRUM: region and stamps are real, so their 2-D DFTs are
      Hermitian (X[S-u, S-v] = conj(X[u, v])) and the product P inherits
      the symmetry.  Only Sh = S/2 + 1 frequency ROWS are computed
      end-to-end; the final inverse-u transform folds each conjugate pair
      with weights alpha = [1, 2, ..., 2, 1] (rfft-style).
    * SUPPORT TRIMMING: the stamp occupies [0, ksize)^2, the region
      [0, hr) x [0, wr), and the output only [0, fh) x [0, fw) — every
      matmul contracts over the occupied rows/cols instead of the padded
      (S, S) square.
    * SCATTER-FREE STAMPS: the (nbins, ksize, ksize) beam-count images are
      built as batched one-hot matmuls (counts stay exact via f32
      accumulation); the round-2 `.at[].add` scatter of nbins x M updates
      was a measurable per-scan fixed cost on TPU.
    * the region transform is computed ONCE for all bins;
    * NO per-element trig beyond the data-independent (S, S) angle table
      (a direct NUDFT was tried first: its (nbins, M, S) phase tables cost
      ~7 ms of transcendentals per scan once the window origin is traced).

    ksize (stamp support) is inferred as hr - fh + 1: both callers size the
    region as output + stamp support - 1.  DFT size S >= fh + ksize - 1
    guarantees the evaluated lags never wrap, so the circular correlation
    equals the linear one on [0, fh) x [0, fw).
    """
    hr, wr = region.shape
    ksize = hr - fh + 1
    s = max(-(-hr // 128) * 128, -(-wr // 128) * 128)  # MXU-friendly size
    sh = s // 2 + 1
    nbins, m = ox.shape

    n_grid = jnp.arange(s, dtype=jnp.float32)
    ang = (2.0 * jnp.pi / s) * jnp.outer(n_grid, n_grid)  # (S, S)
    ct = jnp.cos(ang)
    st = jnp.sin(ang)
    # D[v, x] = ct - i*st; D_h = first Sh rows (u axis)

    # ---- region spectrum R_hat (Sh, wr-trimmed -> full v)
    r32 = region.astype(jnp.float32)
    a_r = ct[:sh, :hr] @ r32          # (Sh, wr)  real(D_h @ R)
    a_i = (-st[:sh, :hr]) @ r32       # imag
    cvr = ct[:, :wr]                  # (S, wr)   right-side D[v, x]
    cvi = st[:, :wr]
    rr = a_r @ cvr.T + a_i @ cvi.T    # R_hat = A @ D[:, :wr]^T
    ri = a_i @ cvr.T - a_r @ cvi.T

    # ---- stamps via one-hot matmuls: C[k] = OHY[k] @ (w * OHX[k])
    w = jnp.where(valid, 1.0, 0.0).astype(jnp.float32)
    oyc = jnp.clip(oy, 0, ksize - 1)  # invalid beams carry weight 0
    oxc = jnp.clip(ox, 0, ksize - 1)
    kio = jnp.arange(ksize, dtype=jnp.int32)
    ohy = (oyc[:, None, :] == kio[None, :, None]).astype(jnp.float32)
    ohx = (oxc[:, :, None] == kio[None, None, :]).astype(jnp.float32)
    stamp = jnp.einsum("ksj,kjt->kst", ohy, ohx * w[None, :, None])

    # ---- stamp spectra S_hat (nbins, Sh, S)
    c_r = jnp.einsum("us,ksv->kuv", ct[:sh, :ksize], stamp)
    c_i = jnp.einsum("us,ksv->kuv", -st[:sh, :ksize], stamp)
    ckr = ct[:, :ksize]               # (S, ksize)
    cki = st[:, :ksize]
    srr = jnp.matmul(c_r, ckr.T) + jnp.matmul(c_i, cki.T)
    sri = jnp.matmul(c_i, ckr.T) - jnp.matmul(c_r, cki.T)

    # ---- P_k = R_hat * conj(S_hat_k)   (nbins, Sh, S)
    pr = rr[None] * srr + ri[None] * sri
    pi = ri[None] * srr - rr[None] * sri

    # ---- inverse along v (only x < fw needed): Q = P @ E, E[v,x]=e^{+ivx}
    exr = ct[:, :fw]                  # (S, fw)
    exi = st[:, :fw]
    qr = jnp.matmul(pr, exr) - jnp.matmul(pi, exi)
    qi = jnp.matmul(pr, exi) + jnp.matmul(pi, exr)

    # ---- inverse along u with Hermitian fold (only y < fh needed)
    alpha = jnp.full((sh,), 2.0, jnp.float32).at[0].set(1.0).at[sh - 1].set(1.0)
    eyr = ct[:fh, :sh] * alpha[None, :]   # (fh, Sh)
    eyi = st[:fh, :sh] * alpha[None, :]
    f = jnp.matmul(eyr, qr) - jnp.matmul(eyi, qi)
    return f / (s * s)


def _shard_bins(builder, ox, oy, axis):
    """Run a per-bin field ``builder(ox_l, oy_l)`` on this device's slice of
    the theta bins and all_gather the full stack — the theta-bin-sharded
    multi-chip build (build cost is embarrassingly parallel over bins;
    requires nbins %% n_devices == 0, guarded in parallel/distributed.py)."""
    ndev = jax.lax.psum(1, axis)
    axd = jax.lax.axis_index(axis)
    kd = ox.shape[0] // ndev
    ox_l = jax.lax.dynamic_slice_in_dim(ox, axd * kd, kd, 0)
    oy_l = jax.lax.dynamic_slice_in_dim(oy, axd * kd, kd, 0)
    return jax.lax.all_gather(builder(ox_l, oy_l), axis, axis=0, tiled=True)


def correlation_field_scores(
    particles: jnp.ndarray,
    ranges: jnp.ndarray,
    angles: jnp.ndarray,
    grid_map,
    config: FilterConfig,
    log_field: jnp.ndarray | None = None,
    n_theta: int = 180,
    field_impl: str = "auto",  # "auto" | "pallas" | "xla"
    window_origin: tuple | None = None,  # (oy0, ox0) cell coords, traced ok
    shard_bins_axis: str | None = None,  # shard_map axis: theta-sharded build
    lookup_impl: str = "auto",  # "auto" | "fused" | "select"
) -> jnp.ndarray:
    """Per-particle scores via one field lookup each; same normalization and
    blind penalty as the exact scorer (parallel_utils.py:144-147).

    When called twice with identical (ranges, angles) inside one jit trace
    (the previous + proposed sets of a scan update), XLA CSE merges the two
    field builds into one.

    NOTE: ``grid_map`` must be a concrete (non-traced) map — the static pad
    size derives from its resolution at trace time, which holds for the
    step-factory pattern where the map is a closure constant.
    """
    if log_field is None:
        log_field = log_likelihood_field(grid_map, config)
    if config.step > 1:
        ranges = ranges[:: config.step]
        angles = angles[:: config.step]
    valid = jnp.isfinite(ranges) & (ranges < config.max_range)

    h, w = log_field.shape
    res = float(jax.device_get(grid_map.resolution))
    pad_cells = int(-(-config.max_range // res)) + 2
    inv_res = 1.0 / grid_map.resolution
    safe_r = jnp.where(valid, ranges, 0.0)
    u = (safe_r * jnp.cos(angles)).astype(jnp.float32)
    v = (safe_r * jnp.sin(angles)).astype(jnp.float32)

    # zero-pad + append an all-zero band of height h for invalid beams, plus
    # tile-alignment margins for the Pallas kernel's aligned window loads
    padded0 = jnp.pad(log_field, pad_cells)  # no margins (conv builder)
    zero_band_row = padded0.shape[0]
    padded = jnp.pad(padded0, ((0, h + 16), (0, 128)))

    # theta window: build only corr_theta_window_bins bins starting at the
    # traced global-bin offset window_origin[2] (cloud mean heading); the
    # cos/sin in _bin_offsets are periodic so no wrapping is needed
    win = config.corr_window_cells
    use_window = bool(win) and win < min(h, w) and window_origin is not None
    tw = config.corr_theta_window_bins
    use_theta_win = (
        bool(tw) and use_window and len(window_origin) == 3
    )
    nbins = tw if use_theta_win else n_theta
    kstart = (
        jnp.asarray(window_origin[2], jnp.int32) if use_theta_win else 0
    )
    ox, oy = _bin_offsets(
        u, v, valid, inv_res, n_theta, pad_cells, zero_band_row,
        bin_start=kstart, nbins=nbins,
    )

    # window-limited build: the field only covers (win x win) cells at
    # window_origin
    if use_window:
        oy0, ox0 = window_origin[0], window_origin[1]
        oy0 = jnp.clip(jnp.asarray(oy0, jnp.int32), 0, h - win)
        ox0 = jnp.clip(jnp.asarray(ox0, jnp.int32), 0, w - win)
        fh = fw = win
    else:
        fh, fw = h, w

    if field_impl == "auto":
        # dft (MXU cross-correlation via DFT matmuls) is the fast TPU
        # builder; the Pallas roll builder pays ~0.25 ms/bin in dynamic
        # rotates, XLA's conv lowering chokes on the large sparse stamp,
        # and the XLA slice builder materializes (M, h, w) stacks
        if jax.default_backend() == "tpu":
            field_impl = "dft" if use_window else "pallas"
        else:
            field_impl = "xla"

    if field_impl in ("dft", "conv"):
        ksize = 2 * pad_cells + 1
        if use_window:
            side = win + 2 * pad_cells
            region = jax.lax.dynamic_slice(padded0, (oy0, ox0), (side, side))
        else:
            region = padded0

        def _builder(ox_b, oy_b):
            if field_impl == "dft":
                return _build_field_dft(region, ox_b, oy_b, valid, fh, fw)
            return _build_field_conv(region, ox_b, oy_b, valid, ksize, fh, fw)

        if shard_bins_axis is not None:
            field = _shard_bins(_builder, ox, oy, shard_bins_axis)
        else:
            field = _builder(ox, oy)
    elif use_window:
        # Pallas/XLA builders read a pre-sliced region with margins and an
        # all-zero band for invalid beams (the kernel's aligned window loads)
        region_h = 2 * pad_cells + win + 16
        region_w = 2 * pad_cells + win + 128
        region = jax.lax.dynamic_slice(padded, (oy0, ox0), (region_h, region_w))
        zero_band_local = region_h
        region = jnp.pad(region, ((0, win + 16), (0, 0)))
        is_zero_band = oy >= zero_band_row
        oy = jnp.where(is_zero_band, zero_band_local, oy)
        padded = region

    if field_impl in ("dft", "conv"):
        pass  # built above
    elif shard_bins_axis is not None:
        if field_impl == "pallas":
            from mcmh_localization_tpu.ops.corr_field_pallas import (
                corr_field_pallas,
            )

            def _pb(ox_l, oy_l):
                return corr_field_pallas(padded, ox_l, oy_l, fh, fw)
        else:
            def _pb(ox_l, oy_l):
                return _build_field_xla(padded, ox_l, oy_l, fh, fw)
        field = _shard_bins(_pb, ox, oy, shard_bins_axis)
    elif field_impl == "pallas":
        from mcmh_localization_tpu.ops.corr_field_pallas import corr_field_pallas

        field = corr_field_pallas(padded, ox, oy, fh, fw)
    else:
        field = _build_field_xla(padded, ox, oy, fh, fw)

    count = jnp.sum(valid)
    score_validity = config.motion_validity == "score"
    if score_validity:
        # fold motion validity into the field: non-free cells score
        # INVALID_SCORE, replacing the motion model's retries x N validity
        # lookups (motion_validity="score"; see config.py) with one dense
        # (win x win) add broadcast over theta bins
        if use_window:
            occ_win = jax.lax.dynamic_slice(
                grid_map.occupancy, (oy0, ox0), (fh, fw)
            )
        else:
            occ_win = grid_map.occupancy
        pen_total = INVALID_SCORE * jnp.maximum(count, 1).astype(jnp.float32)
        field = field + pen_total * jnp.where(
            occ_win == 0, 0.0, 1.0
        )[None].astype(field.dtype)

    # ONE transpose to (3, N): the per-particle index math then runs on
    # dense lane-major rows instead of the (N, 3) minor-dim-3 padded layout
    # (~3x fewer VPU passes, measured scripts/microbench11 lineage)
    pt = particles.T
    px, py, pth = pt[0], pt[1], pt[2]
    mx = ((px - grid_map.origin[0]) * inv_res).astype(jnp.int32)
    my = ((py - grid_map.origin[1]) * inv_res).astype(jnp.int32)
    tbin = (
        ((pth + jnp.pi) * (n_theta / (2.0 * jnp.pi)))
        .astype(jnp.int32) % n_theta
    )
    if use_theta_win:
        k_rel = (tbin - kstart) % n_theta
        in_theta = k_rel < nbins
        tbin = jnp.where(in_theta, k_rel, 0)
    else:
        in_theta = jnp.ones(particles.shape[0], dtype=bool)
    in_map = grid_map.in_bounds(mx, my)
    if use_window:
        mxw = mx - ox0
        myw = my - oy0
        in_window = (mxw >= 0) & (mxw < fw) & (myw >= 0) & (myw < fh)
        mxc = jnp.clip(mxw, 0, fw - 1)
        myc = jnp.clip(myw, 0, fh - 1)
    else:
        in_window = jnp.ones_like(in_map)
        mxc = jnp.clip(mx, 0, fw - 1)
        myc = jnp.clip(my, 0, fh - 1)
    # ONE lookup/particle via the MXU gather kernel (clustered rows when
    # tracking -> 1-2 chunk visits; ops/gather_pallas.py)
    from mcmh_localization_tpu.ops.gather_pallas import (
        gather_2d,
        gather_2d_select,
    )

    covered = in_window & in_theta
    # "mean" aggregation divides by the beam count, so bf16 field error
    # (~0.4% relative) lands ~0.05 absolute on per-beam log scores — the
    # same order as the corr quantization itself, for half the MXU flops;
    # "sum" keeps raw magnitudes (|v| ~ 1e3+) and needs the hi/lo split
    prec = "bf16" if config.score_aggregation == "mean" else "split"

    # THETA-MINOR row layout (row = y*nbins + tbin, not tbin*fh + y): the
    # MXU gather kernel's cost is linear in 128-row chunks VISITED per
    # index tile; a converged cloud is spatially tight but spreads over
    # many theta bins, so theta-major rows visit one chunk PER BIN while
    # theta-minor rows pack (y-spread x nbins) consecutive rows into a few
    # chunks.  The (nbins, fh, fw) -> (fh, nbins, fw) transpose is ~2 MB.
    field_t = field.astype(jnp.float32).transpose(1, 0, 2).reshape(
        fh * nbins, fw
    )
    rows_fine_y = myc * nbins + tbin
    use_coarse = use_window and config.corr_coarse_factor > 0
    if use_coarse:
        # fine lookup for covered particles, coarse-fallback lookup for the
        # rest — ONE fused gather pass over both fields stacked (always:
        # gating the WHOLE coarse path behind lax.cond was measured
        # net-negative — the cond operands materialize at the branch
        # boundary and XLA loses fusion, ~4 ms at 2M vs ~1 ms saved, v5e).
        # Only the coarse FIELD build is gated, on the escapee count, via
        # a 0-or-1-iteration while_loop (lax.cond is SPECULATED by XLA —
        # both sides execute; see ops/resampling.py::kld_resample and the
        # beam twin in models/range_table.py): in steady-state tracking
        # the only escapees are proposal-noise tails below
        # config.coarse_gate_escapees, which take BLIND_SCORE (the
        # no-fallback semantics) while the ~0.3 ms DFT build is skipped.
        f_c = config.corr_coarse_factor
        kc = config.corr_coarse_n_theta
        hmap, wmap = log_field.shape
        hc, wc = -(-hmap // f_c), -(-wmap // f_c)
        ck, cy, cx = _coarse_indices(px, py, pth, grid_map, config, res)

        def _build_coarse(_):
            return _coarse_field(u, v, valid, log_field, grid_map, config,
                                 res)

        def _blind_fill(_):
            fill = BLIND_SCORE * (
                jnp.maximum(count, 1).astype(jnp.float32)
                if config.score_aggregation == "mean" else jnp.float32(1.0)
            )
            return jnp.broadcast_to(fill, (kc, hc, wc)).astype(jnp.float32)

        if config.coarse_gate_escapees == 0:
            # ungated: always build.  The gate's escapee count is the one
            # remaining XLA index pass once the fused lookup computes its
            # indices in-VMEM (~0.75 ms at 2M — more than the gated build
            # it would skip); see config.py::coarse_gate_escapees
            cfield = _build_coarse(None)
        else:
            n_esc = jnp.sum(in_map & ~covered)

            def _wcond(carry):
                done, _ = carry
                return jnp.logical_not(done)

            def _wbody(carry):
                return jnp.bool_(True), _build_coarse(None)

            _, cfield = jax.lax.while_loop(
                _wcond, _wbody,
                (n_esc < config.coarse_gate_escapees, _blind_fill(None)),
            )

        # fused index-math + select-gather kernel: rows/lanes/masks are
        # computed from the raw (px, py, pth) columns INSIDE the gather
        # kernel (ops/fused_score_pallas.py) — the XLA-side index ops
        # above feed only the coarse-build gate and get DCE'd otherwise
        from mcmh_localization_tpu.ops.fused_score_pallas import (
            fused_lookup_supported,
            fused_window_score_gather,
        )

        if lookup_impl == "auto":
            use_fused = (
                jax.default_backend() == "tpu"
                and fused_lookup_supported(
                    fh, nbins, fw, hc, kc, wc, prec, n=particles.shape[0]
                )
            )
        else:
            use_fused = lookup_impl == "fused"
        if use_fused:
            cfield_t = cfield.transpose(1, 0, 2).reshape(hc * kc, wc)
            denom = (
                jnp.float32(1.0) if config.score_aggregation == "sum"
                else jnp.maximum(count, 1).astype(jnp.float32)
            )
            if score_validity:
                fill = (
                    INVALID_SCORE
                    * jnp.maximum(count, 1).astype(jnp.float32)
                    if config.score_aggregation == "sum"
                    else jnp.float32(INVALID_SCORE)
                )
            else:
                fill = jnp.float32(0.0)
            score = fused_window_score_gather(
                field_t, cfield_t, px, py, pth,
                grid_map.origin[0], grid_map.origin[1], inv_res,
                ox0, oy0,
                kstart if use_theta_win else jnp.int32(0),
                denom, fill,
                n_theta=n_theta, nbins=nbins, fh=fh, fw=fw,
                h=h, w=w, kc=kc, hc=hc, wc=wc,
                res_c=float(f_c * res),
                theta_scale=n_theta / (2.0 * jnp.pi),
                fine_div=False, theta_div=False,
                clip_before_window=False, precision=prec,
                interpret=jax.default_backend() != "tpu",
            )
            return jnp.where(count > 0, score, BLIND_SCORE).astype(
                jnp.float32
            )

        def _with_coarse(_):
            cfield_t = cfield.transpose(1, 0, 2).reshape(hc * kc, wc)
            t = gather_2d_select(
                field_t, rows_fine_y, mxc,
                cfield_t, cy * kc + ck, cx,
                use_a=covered, precision=prec,
            )
            return jnp.where(in_map, t, 0.0)

        if jax.default_backend() == "tpu":
            totals = _with_coarse(None)
        else:
            # off-TPU, skip even the fused select-gather when nothing
            # escaped (interpret-mode kernels are slow in tests)
            def _fine_only(_):
                # no escapees on this branch: covered == scoreable
                t = gather_2d(field_t, rows_fine_y, mxc, precision=prec)
                return jnp.where(in_map & covered, t, 0.0)

            totals = jax.lax.cond(
                jnp.any(in_map & ~covered), _with_coarse, _fine_only,
                operand=None,
            )
    else:
        totals = gather_2d(field_t, rows_fine_y, mxc, precision=prec)
        totals = jnp.where(in_map & covered, totals, 0.0)

    if config.score_aggregation == "sum":
        score = totals
    else:
        score = totals / jnp.maximum(count, 1)
    # out-of-map keeps the reference's zero-contribution score; in-map
    # particles that escaped the WINDOW score via the coarse full-map field
    # (honest smoothed score -> kidnapped-robot recovery works), or take the
    # blind penalty when the coarse fallback is disabled (scores are mostly
    # negative, so they must not outscore real ones)
    if not use_coarse:
        score = jnp.where(in_map & ~covered, BLIND_SCORE, score)
    if score_validity:
        # out-of-map poses are invalid too (the reference's motion model
        # would have rejected them, parallel_utils.py:383-386)
        pen = (
            INVALID_SCORE * jnp.maximum(count, 1).astype(jnp.float32)
            if config.score_aggregation == "sum"
            else jnp.float32(INVALID_SCORE)
        )
        score = jnp.where(in_map, score, pen)
    return jnp.where(count > 0, score, BLIND_SCORE).astype(jnp.float32)


# retained for API compatibility with earlier revisions / direct use
@functools.partial(jax.jit, static_argnames=("n_theta", "pad_cells"))
def build_correlation_field(
    log_field, u, v, valid, inv_res, n_theta: int, pad_cells: int
):
    """(n_theta, H, W) field via the XLA path (offsets derived internally)."""
    h, w = log_field.shape
    padded = jnp.pad(log_field, pad_cells)
    zero_band_row = padded.shape[0]
    padded = jnp.pad(padded, ((0, h), (0, 0)))
    ox, oy = _bin_offsets(u, v, valid, inv_res, n_theta, pad_cells, zero_band_row)
    return _build_field_xla(padded, ox, oy, h, w)
