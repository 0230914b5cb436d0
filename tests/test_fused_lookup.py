"""Fused index-math + select-gather kernel (ops/fused_score_pallas.py).

Validates, in interpret mode on CPU:
  * the in-kernel index math reproduces the documented XLA-side semantics
    BITWISE (vs a numpy replica feeding the plain gather kernel with the
    same table prep);
  * the full scorers (corr + beam) produce the same scores through the
    fused path as through the unfused select path (replaces the lookup
    tail of parallel_utils.py:85-201's reimplementations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmh_localization_tpu.ops.fused_score_pallas import (
    fused_window_score_gather,
)
from mcmh_localization_tpu.ops.gather_pallas import (
    _fold_2d,
    gather_rows_lanes,
)


def _spec_rows_lanes(px, py, pth, *, orx, ory, fine_scale, fine_div,
                     theta_scale, theta_div, n_theta, nbins, kstart,
                     h, w, fh, fw, ox0, oy0, kc, hc, wc, res_c,
                     clip_before_window, coarse_base):
    """Numpy replica of the kernel's documented index semantics (f32 ops)."""
    px = px.astype(np.float32)
    py = py.astype(np.float32)
    pth = pth.astype(np.float32)
    if fine_div:
        fx = (px - np.float32(orx)) / np.float32(fine_scale)
        fy = (py - np.float32(ory)) / np.float32(fine_scale)
    else:
        fx = (px - np.float32(orx)) * np.float32(fine_scale)
        fy = (py - np.float32(ory)) * np.float32(fine_scale)
    mx = fx.astype(np.int32)
    my = fy.astype(np.int32)
    tbf = pth + np.float32(np.pi)
    if theta_div:
        tb = tbf / np.float32(theta_scale)
    else:
        tb = tbf * np.float32(theta_scale)
    tbin = tb.astype(np.int32) % n_theta
    k_rel = (tbin - kstart) % n_theta
    in_theta = k_rel < nbins
    tbin_w = np.where(in_theta, k_rel, 0)
    in_map = (mx >= 0) & (mx < w) & (my >= 0) & (my < h)
    if clip_before_window:
        mxw = np.clip(mx, 0, w - 1) - ox0
        myw = np.clip(my, 0, h - 1) - oy0
    else:
        mxw = mx - ox0
        myw = my - oy0
    in_window = (mxw >= 0) & (mxw < fw) & (myw >= 0) & (myw < fh)
    covered = in_window & in_theta
    rows_a = np.clip(myw, 0, fh - 1) * nbins + tbin_w
    lanes_a = np.clip(mxw, 0, fw - 1)
    cx = np.clip(
        ((px - np.float32(orx)) / np.float32(res_c)).astype(np.int32),
        0, wc - 1,
    )
    cy = np.clip(
        ((py - np.float32(ory)) / np.float32(res_c)).astype(np.int32),
        0, hc - 1,
    )
    ck = (
        (tbf * np.float32(kc / (2.0 * np.pi))).astype(np.int32) % kc
    )
    rows_b = coarse_base + cy * kc + ck
    rows = np.where(covered, rows_a, rows_b)
    lanes = np.where(covered, lanes_a, cx)
    return rows, lanes, in_map


@pytest.mark.parametrize(
    "fine_div,theta_div,clip_before", [(False, False, False),
                                       (True, True, True)]
)
def test_fused_matches_spec_bitwise(fine_div, theta_div, clip_before):
    """Fused kernel == numpy index spec -> plain gather kernel, bitwise
    (same table prep, same bf16-split gather core)."""
    rng = np.random.default_rng(0)
    n_theta, nbins, fh, fw = 120, 24, 64, 64
    h = w = 384
    kc, hc, wc = 30, 96, 96
    res, res_c = 0.05, 0.2
    orx, ory = -9.6, -9.6
    ox0, oy0, kstart = 150, 140, 97

    field_t = jnp.asarray(
        (rng.normal(size=(fh * nbins, fw)) * 800).astype(np.float32)
    )
    cfield_t = jnp.asarray(
        (rng.normal(size=(hc * kc, wc)) * 800).astype(np.float32)
    )
    n = 4096
    # mixture: in-window cluster, escapees elsewhere in map, out-of-map
    px = np.concatenate([
        rng.uniform(-2.3, -1.5, n // 2),     # near the window
        rng.uniform(-9.5, 9.0, n // 4),      # anywhere in map
        rng.uniform(-30.0, 30.0, n - n // 2 - n // 4),  # often out of map
    ]).astype(np.float32)
    py = np.concatenate([
        rng.uniform(-2.8, -2.0, n // 2),
        rng.uniform(-9.5, 9.0, n // 4),
        rng.uniform(-30.0, 30.0, n - n // 2 - n // 4),
    ]).astype(np.float32)
    pth = rng.uniform(-np.pi, np.pi, n).astype(np.float32)

    fine_scale = np.float32(1.0 / res) if not fine_div else np.float32(res)
    theta_scale = (
        np.float32(2.0 * np.pi / n_theta) if theta_div
        else np.float32(n_theta / (2.0 * np.pi))
    )
    denom, fill = np.float32(37.0), np.float32(-123.0)

    out = np.asarray(fused_window_score_gather(
        field_t, cfield_t,
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pth),
        jnp.float32(orx), jnp.float32(ory), jnp.float32(fine_scale),
        jnp.int32(ox0), jnp.int32(oy0), jnp.int32(kstart),
        jnp.float32(denom), jnp.float32(fill),
        n_theta=n_theta, nbins=nbins, fh=fh, fw=fw, h=h, w=w,
        kc=kc, hc=hc, wc=wc, res_c=res_c,
        theta_scale=float(theta_scale),
        fine_div=fine_div, theta_div=theta_div,
        clip_before_window=clip_before,
        interpret=True,
    ))

    fa, _ = _fold_2d(field_t)
    fb, _ = _fold_2d(cfield_t)
    combined = jnp.concatenate([fa, fb], axis=0)
    rows, lanes, in_map = _spec_rows_lanes(
        px, py, pth, orx=orx, ory=ory, fine_scale=fine_scale,
        fine_div=fine_div, theta_scale=theta_scale, theta_div=theta_div,
        n_theta=n_theta, nbins=nbins, kstart=kstart, h=h, w=w,
        fh=fh, fw=fw, ox0=ox0, oy0=oy0, kc=kc, hc=hc, wc=wc,
        res_c=res_c, clip_before_window=clip_before,
        coarse_base=fa.shape[0],
    )
    picked = np.asarray(gather_rows_lanes(
        combined, jnp.asarray(rows), jnp.asarray(lanes), interpret=True
    ))
    ref = np.where(in_map, picked / denom, fill).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("regime", ["all_covered", "all_escapee"])
def test_fused_split_windows_degenerate_tiles(regime):
    """The kernel walks TWO disjoint chunk windows (fine rows for covered
    particles, coarse rows for escapees); a tile with none of one kind must
    run ZERO iterations of that window (empty fori via lo>hi sentinels) and
    still match the spec bitwise.  Regression for the split-window rewrite:
    fh*nbins=72 is NOT chunk-aligned, so the coarse_base pad row range is
    exercised too."""
    rng = np.random.default_rng(7)
    n_theta, nbins, fh, fw = 16, 8, 9, 40   # fh*nbins = 72, not %128
    h = w = 300
    kc, hc, wc = 12, 30, 50
    res, res_c = 0.05, 0.4
    orx = ory = 0.0
    ox0, oy0, kstart = 20, 30, 2

    field_t = jnp.asarray(
        (rng.normal(size=(fh * nbins, fw)) * 10).astype(np.float32))
    cfield_t = jnp.asarray(
        (rng.normal(size=(hc * kc, wc)) * 10).astype(np.float32))
    n = 1024
    if regime == "all_covered":
        # inside the window AND the theta band [kstart, kstart+nbins)
        px = rng.uniform(ox0 * res + 0.01, (ox0 + fw) * res - 0.01, n)
        py = rng.uniform(oy0 * res + 0.01, (oy0 + fh) * res - 0.01, n)
        pth = rng.uniform(
            (kstart + 0.1) * 2 * np.pi / n_theta - np.pi,
            (kstart + nbins - 0.1) * 2 * np.pi / n_theta - np.pi, n)
    else:
        # in-map but entirely outside the spatial window
        px = rng.uniform((ox0 + fw + 2) * res, (w - 1) * res, n)
        py = rng.uniform(0.01, (h - 1) * res, n)
        pth = rng.uniform(-np.pi, np.pi, n)
    px = px.astype(np.float32)
    py = py.astype(np.float32)
    pth = pth.astype(np.float32)

    theta_scale = np.float32(n_theta / (2.0 * np.pi))
    denom, fill = np.float32(4.0), np.float32(-9.0)
    out = np.asarray(fused_window_score_gather(
        field_t, cfield_t,
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pth),
        jnp.float32(orx), jnp.float32(ory), jnp.float32(1.0 / res),
        jnp.int32(ox0), jnp.int32(oy0), jnp.int32(kstart),
        jnp.float32(denom), jnp.float32(fill),
        n_theta=n_theta, nbins=nbins, fh=fh, fw=fw, h=h, w=w,
        kc=kc, hc=hc, wc=wc, res_c=res_c, theta_scale=float(theta_scale),
        fine_div=False, theta_div=False, clip_before_window=False,
        interpret=True,
    ))

    fa, _ = _fold_2d(field_t)
    fb, _ = _fold_2d(cfield_t)
    combined = jnp.concatenate([fa, fb], axis=0)
    rows, lanes, in_map = _spec_rows_lanes(
        px, py, pth, orx=orx, ory=ory, fine_scale=np.float32(1.0 / res),
        fine_div=False, theta_scale=theta_scale, theta_div=False,
        n_theta=n_theta, nbins=nbins, kstart=kstart, h=h, w=w,
        fh=fh, fw=fw, ox0=ox0, oy0=oy0, kc=kc, hc=hc, wc=wc,
        res_c=res_c, clip_before_window=False, coarse_base=fa.shape[0],
    )
    picked = np.asarray(gather_rows_lanes(
        combined, jnp.asarray(rows), jnp.asarray(lanes), interpret=True))
    ref = np.where(in_map, picked / denom, fill).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


def _scorer_pair(house_map, scorer, particles, **kw):
    s_sel = np.asarray(scorer(particles, lookup_impl="select", **kw))
    s_fus = np.asarray(scorer(particles, lookup_impl="fused", **kw))
    return s_sel, s_fus


def test_corr_scorer_fused_matches_select(house_map):
    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.models.corr_field import (
        correlation_field_scores,
    )
    from mcmh_localization_tpu.models.sensor import (
        log_likelihood_field,
        raycast,
    )

    config = FilterConfig(
        mode="AMHAMCL", num_particles=256, initialized=True,
        initial_pose=(1.0, -1.0, 0.5), max_range=5.0,
        corr_window_cells=64, corr_theta_window_bins=24,
        likelihood_impl="corr", motion_validity="score",
        coarse_gate_escapees=1,
        # "sum" selects the split-precision gather (~1e-5 relative), so the
        # fused-vs-select comparison isolates the index math rather than
        # bf16 rounding
        score_aggregation="sum",
    )
    log_field = log_likelihood_field(house_map, config)
    angles = jnp.linspace(-np.pi, np.pi, 60, endpoint=False)
    ranges = raycast(jnp.asarray([1.0, -1.0]), 0.5 + angles, house_map, 5.0)

    rng = np.random.default_rng(3)
    particles = np.stack([
        np.concatenate([rng.normal(1.0, 0.3, 160),
                        rng.uniform(-9, 9, 64),
                        rng.uniform(-40, 40, 32)]),
        np.concatenate([rng.normal(-1.0, 0.3, 160),
                        rng.uniform(-9, 9, 64),
                        rng.uniform(-40, 40, 32)]),
        rng.uniform(-np.pi, np.pi, 256),
    ], axis=1).astype(np.float32)

    # window centered near the cluster
    inv_res = 1.0 / float(house_map.resolution)
    ox0 = int((1.0 - float(house_map.origin[0])) * inv_res) - 32
    oy0 = int((-1.0 - float(house_map.origin[1])) * inv_res) - 32
    wo = (oy0, ox0, 40)

    def scorer(p, lookup_impl):
        return correlation_field_scores(
            jnp.asarray(p), ranges, angles, house_map, config,
            log_field=log_field, n_theta=config.corr_n_theta,
            window_origin=wo, lookup_impl=lookup_impl,
        )

    s_sel, s_fus = _scorer_pair(house_map, scorer, particles)
    err = np.abs(s_fus - s_sel) / np.maximum(np.abs(s_sel), 1.0)
    assert err.max() < 2e-3, (err.max(), s_sel[:4], s_fus[:4])


def test_beam_scorer_fused_matches_select(house_map):
    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.models.range_table import (
        beam_field_scores,
        make_beam_tables,
    )
    from mcmh_localization_tpu.models.sensor import raycast

    config = FilterConfig(
        mode="AMHAMCL", num_particles=256, initialized=True,
        initial_pose=(1.0, -1.0, 0.5), max_range=5.0,
        sensor_model="beam", beam_impl="field", beam_table_n_theta=60,
        corr_window_cells=64, corr_theta_window_bins=24,
        corr_coarse_n_theta=30, motion_validity="score",
        coarse_gate_escapees=1, score_aggregation="sum",
    )
    tables = make_beam_tables(house_map, config)
    angles = jnp.linspace(-np.pi, np.pi, 45, endpoint=False)
    ranges = raycast(jnp.asarray([1.0, -1.0]), 0.5 + angles, house_map, 5.0)

    rng = np.random.default_rng(4)
    particles = np.stack([
        np.concatenate([rng.normal(1.0, 0.3, 160),
                        rng.uniform(-9, 9, 64),
                        rng.uniform(-40, 40, 32)]),
        np.concatenate([rng.normal(-1.0, 0.3, 160),
                        rng.uniform(-9, 9, 64),
                        rng.uniform(-40, 40, 32)]),
        rng.uniform(-np.pi, np.pi, 256),
    ], axis=1).astype(np.float32)

    inv_res = 1.0 / float(house_map.resolution)
    ox0 = int((1.0 - float(house_map.origin[0])) * inv_res) - 32
    oy0 = int((-1.0 - float(house_map.origin[1])) * inv_res) - 32
    wo = (oy0, ox0, 20)

    def scorer(p, lookup_impl):
        return beam_field_scores(
            jnp.asarray(p), ranges, angles, house_map, config,
            table=tables, n_theta=config.beam_table_n_theta,
            window_origin=wo, interpret=True, lookup_impl=lookup_impl,
        )

    s_sel, s_fus = _scorer_pair(house_map, scorer, particles)
    err = np.abs(s_fus - s_sel) / np.maximum(np.abs(s_sel), 1.0)
    assert err.max() < 2e-3, (err.max(), s_sel[:4], s_fus[:4])
