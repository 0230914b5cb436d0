"""Correlation-field scorer: statistical agreement with the exact scorer."""

import jax
import jax.numpy as jnp
import numpy as np

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.filter.step import make_model
from mcmh_localization_tpu.models.corr_field import correlation_field_scores
from mcmh_localization_tpu.models.sensor import likelihood_field_scores, raycast


def _scan_at(house_map, pose, m=180):
    angles = jnp.linspace(-np.pi, np.pi, m)
    r = raycast(pose[:2], pose[2] + angles, house_map, 5.0, hit_unknown=True)
    return r, angles


def test_corr_scores_close_to_exact(house_map, default_config):
    pose = jnp.array([1.0, 1.0, 0.4])
    ranges, angles = _scan_at(house_map, pose)
    rng = np.random.default_rng(0)
    particles = jnp.asarray(
        np.stack(
            [rng.uniform(-3, 3, 400), rng.uniform(-3, 3, 400),
             rng.uniform(-np.pi, np.pi, 400)], axis=1
        ).astype(np.float32)
    )
    exact = np.asarray(
        likelihood_field_scores(particles, ranges, angles, house_map, default_config)
    )
    corr = np.asarray(
        correlation_field_scores(
            particles, ranges, angles, house_map, default_config, n_theta=360
        )
    )
    # high rank correlation + small absolute deviation
    rho = np.corrcoef(exact, corr)[0, 1]
    assert rho > 0.98, rho
    assert np.mean(np.abs(exact - corr)) < 0.15


def test_corr_prefers_true_pose(house_map, default_config):
    pose = jnp.array([1.0, 1.0, 0.4])
    ranges, angles = _scan_at(house_map, pose)
    gx, gy = jnp.meshgrid(jnp.linspace(-1, 1, 15), jnp.linspace(-1, 1, 15))
    parts = jnp.stack(
        [1.0 + gx.ravel(), 1.0 + gy.ravel(), jnp.full(225, 0.4)], axis=1
    )
    s = np.asarray(
        correlation_field_scores(
            parts, ranges, angles, house_map, default_config, n_theta=360
        )
    )
    best = np.asarray(parts[int(s.argmax())])
    assert abs(best[0] - 1.0) < 0.2 and abs(best[1] - 1.0) < 0.2


def test_corr_blind(house_map, default_config):
    parts = jnp.zeros((3, 3))
    ranges = jnp.full(32, jnp.inf)
    angles = jnp.linspace(-np.pi, np.pi, 32)
    s = np.asarray(
        correlation_field_scores(
            parts, ranges, angles, house_map, default_config, n_theta=16
        )
    )
    np.testing.assert_allclose(s, -50.0)


def test_corr_filter_tracks(house_map):
    from tests.test_filter import _simulate, _square_trajectory, _wrap

    poses = _square_trajectory(18)
    scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)
    cfg = FilterConfig(
        mode="MHAMCL", num_particles=300, min_particles=64, max_particles=400,
        initialized=True, initial_pose=(1.0, -1.0, np.pi / 2), max_range=5.0,
        likelihood_impl="corr", corr_n_theta=120,
    )
    model = make_model(cfg, house_map)
    state = model.init(jax.random.PRNGKey(0))
    state, infos = model.run(state, scans, angles, deltas)
    est = np.asarray(infos.estimate.mean)
    true = _wrap(poses[-1])
    err = np.hypot(est[-1, 0] - true[0], est[-1, 1] - true[1])
    assert err < 0.3, err


def test_pallas_field_matches_xla(house_map, default_config):
    from mcmh_localization_tpu.models.corr_field import (
        _bin_offsets, _build_field_xla,
    )
    from mcmh_localization_tpu.ops.corr_field_pallas import corr_field_pallas
    import jax

    pose = jnp.array([1.0, 1.0, 0.4])
    ranges, angles = _scan_at(house_map, pose, m=90)
    cfg = default_config
    valid = jnp.isfinite(ranges) & (ranges < cfg.max_range)
    L = jnp.asarray(np.random.default_rng(0).normal(size=(192, 192)).astype(np.float32))
    res = float(jax.device_get(house_map.resolution))
    pad = int(-(-cfg.max_range // res)) + 2
    inv_res = 1.0 / house_map.resolution
    safe_r = jnp.where(valid, ranges, 0.0)
    u = (safe_r * jnp.cos(angles)).astype(jnp.float32)
    v = (safe_r * jnp.sin(angles)).astype(jnp.float32)
    padded = jnp.pad(L, pad)
    zrow = padded.shape[0]
    padded = jnp.pad(padded, ((0, 192 + 8), (0, 128)))
    ox, oy = _bin_offsets(u, v, valid, inv_res, 24, pad, zrow)
    ref = np.asarray(_build_field_xla(padded, ox, oy, 192, 192))
    got = np.asarray(corr_field_pallas(padded, ox, oy, 192, 192, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_corr_windowed_matches_full_for_contained_cloud(house_map, default_config):
    # a cloud well inside the window must score identically windowed vs full
    pose = jnp.array([1.0, 1.0, 0.4])
    ranges, angles = _scan_at(house_map, pose, m=90)
    rng = np.random.default_rng(3)
    particles = jnp.asarray(
        np.stack([1.0 + rng.normal(0, 0.3, 200), 1.0 + rng.normal(0, 0.3, 200),
                  rng.uniform(-np.pi, np.pi, 200)], axis=1).astype(np.float32)
    )
    cfg = default_config.replace(corr_window_cells=96)
    full = np.asarray(
        correlation_field_scores(particles, ranges, angles, house_map, cfg, n_theta=64)
    )
    # window centered at the cloud
    import jax
    res = float(jax.device_get(house_map.resolution))
    ox0 = int((1.0 - (-4.8)) / res) - 48
    oy0 = int((1.0 - (-4.8)) / res) - 48
    win = np.asarray(
        correlation_field_scores(
            particles, ranges, angles, house_map, cfg, n_theta=64,
            window_origin=(oy0, ox0),
        )
    )
    np.testing.assert_allclose(win, full, rtol=1e-5, atol=1e-5)


def test_corr_windowed_filter_tracks(house_map):
    from tests.test_filter import _simulate, _square_trajectory, _wrap

    poses = _square_trajectory(18)
    scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)
    cfg = FilterConfig(
        mode="MHAMCL", num_particles=256, min_particles=64, max_particles=320,
        initialized=True, initial_pose=(1.0, -1.0, np.pi / 2), max_range=5.0,
        likelihood_impl="corr", corr_n_theta=120, corr_window_cells=128,
    )
    model = make_model(cfg, house_map)
    state = model.init(jax.random.PRNGKey(0))
    state, infos = model.run(state, scans, angles, deltas)
    est = np.asarray(infos.estimate.mean)
    true = _wrap(poses[-1])
    err = np.hypot(est[-1, 0] - true[0], est[-1, 1] - true[1])
    assert err < 0.3, err


def test_corr_windowed_large_map(default_config):
    # 1024^2 map: windowed corr keeps the working set small and stays
    # consistent with the exact scorer for a contained cloud
    import numpy as np_
    from mcmh_localization_tpu.maps.grid_map import build_grid_map

    h = w = 1024
    occ = np_.zeros((h, w), dtype=np_.int8)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = 100
    rng = np_.random.default_rng(0)
    for _ in range(40):  # scatter pillars for structure
        r, c = rng.integers(10, h - 14, 2)
        occ[r:r + 4, c:c + 4] = 100
    m = build_grid_map(occ, 0.05, (-25.6, -25.6), edt_impl="scipy")

    pose = jnp.array([0.0, 0.0, 0.2])
    angles = jnp.linspace(-np.pi, np.pi, 120)
    ranges = raycast(pose[:2], pose[2] + angles, m, 5.0, hit_unknown=True)
    particles = jnp.asarray(
        np_.stack([rng.normal(0, 0.4, 150), rng.normal(0, 0.4, 150),
                   rng.uniform(-np.pi, np.pi, 150)], axis=1).astype(np_.float32)
    )
    cfg = default_config.replace(corr_window_cells=128)
    oy0 = int((0.0 + 25.6) / 0.05) - 64
    exact = np.asarray(
        likelihood_field_scores(particles, ranges, angles, m, cfg)
    )
    win = np.asarray(
        correlation_field_scores(
            particles, ranges, angles, m, cfg, n_theta=360,
            window_origin=(oy0, oy0),
        )
    )
    rho = np.corrcoef(exact, win)[0, 1]
    assert rho > 0.97, rho


def test_corr_bin_center_alignment(house_map, default_config):
    """Regression: the field must be built at theta-bin CENTERS.  For
    particles whose heading sits exactly on a bin center, corr scores must
    match the exact scorer almost perfectly (same cell quantization); with
    edge-built fields this shows a systematic half-bin heading bias that
    drags tracking (caught on map_house at 100k particles)."""
    n_theta = 72
    bin_w = 2 * np.pi / n_theta
    theta_c = -np.pi + (10 + 0.5) * bin_w  # center of bin 10
    pose = jnp.array([1.0, 1.0, theta_c])
    ranges, angles = _scan_at(house_map, pose, m=120)
    rng = np.random.default_rng(7)
    particles = jnp.asarray(
        np.stack([1.0 + rng.normal(0, 0.2, 100), 1.0 + rng.normal(0, 0.2, 100),
                  np.full(100, theta_c)], axis=1).astype(np.float32)
    )
    exact = np.asarray(
        likelihood_field_scores(particles, ranges, angles, house_map, default_config)
    )
    corr = np.asarray(
        correlation_field_scores(
            particles, ranges, angles, house_map, default_config, n_theta=n_theta
        )
    )
    # residual +-1-cell double-truncation noise is fine; a half-bin heading
    # bias is not: it shows up as a large MEAN deviation and low correlation
    d = corr - exact
    assert np.abs(d).mean() < 0.04, np.abs(d).mean()
    assert np.abs(d.mean()) < 0.02, d.mean()


def test_corr_coarse_fallback_scores_out_of_window(house_map, default_config):
    # with the coarse fallback on (default), an out-of-window particle at the
    # TRUE pose must outscore an out-of-window particle inside a wall, and
    # both must beat the blind -50 (VERDICT round-1 weakness #4)
    pose = jnp.array([1.0, 1.0, 0.4])
    ranges, angles = _scan_at(house_map, pose, m=90)
    # gate=1: this test scores TWO escapees, below the default build gate
    # (coarse_gate_escapees=8; gate semantics covered by
    # tests/test_range_table.py::test_beam_coarse_build_gate)
    cfg = default_config.replace(corr_window_cells=64,
                                 coarse_gate_escapees=1)
    # window centered far away from both test particles
    res = 0.05
    ox0 = int((-3.0 - (-4.8)) / res) - 32
    oy0 = int((-3.0 - (-4.8)) / res) - 32
    parts = jnp.array(
        [
            [1.0, 1.0, 0.4],     # true pose (out of window)
            [-4.75, 2.0, 0.4],   # on/near the west wall (out of window)
            [-3.0, -3.0, 0.4],   # inside the window
        ],
        dtype=jnp.float32,
    )
    s = np.asarray(
        correlation_field_scores(
            parts, ranges, angles, house_map, cfg, n_theta=64,
            window_origin=(oy0, ox0),
        )
    )
    assert s[0] > -50.0 and s[1] > -50.0  # finite coarse scores
    assert s[0] > s[1], s                  # true pose wins among coarse
    # disabling the fallback restores the blind penalty
    s_off = np.asarray(
        correlation_field_scores(
            parts, ranges, angles, house_map,
            cfg.replace(corr_coarse_factor=0), n_theta=64,
            window_origin=(oy0, ox0),
        )
    )
    assert s_off[0] == -50.0 and s_off[1] == -50.0


def test_kidnapped_recovery_windowed(house_map):
    """A windowed-corr AMCL filter tracking at pose A is kidnapped (robot
    teleports to B; odometry doesn't see it).  The fit collapse must drive
    augmented-MCL injection (textbook w_avg signal, ref_compat_w_avg=False),
    injected particles near B must survive via the coarse max-pooled
    fallback, and the cluster estimate must re-localize
    (reference recovery path: amcmh_localizer.py:496-527)."""
    from tests.test_filter import _simulate

    t_a, t_b = 30, 60
    ts_a = np.linspace(0, 1.5 * np.pi, t_a)
    ts_b = np.linspace(0, 3 * np.pi, t_b)
    p_a = np.stack(
        [2.5 + 0.8 * np.cos(ts_a), 2.5 + 0.8 * np.sin(ts_a),
         _wrap_arr(ts_a + np.pi / 2)], axis=1
    ).astype(np.float32)
    p_b = np.stack(
        [-2.5 + 0.8 * np.cos(ts_b), -2.5 + 0.8 * np.sin(ts_b),
         _wrap_arr(ts_b + np.pi / 2)], axis=1
    ).astype(np.float32)
    poses = np.concatenate([p_a, p_b])
    scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)
    deltas = np.array(deltas)
    deltas[t_a] = deltas[t_a + 1]  # odometry is blind to the teleport
    cfg = FilterConfig(
        mode="AMCL", num_particles=1500, min_particles=200, max_particles=2500,
        initialized=True, initial_pose=tuple(map(float, p_a[0])),
        max_range=5.0,
        likelihood_impl="corr", corr_n_theta=90, corr_window_cells=96,
        estimate_mode="cluster",
        alpha_slow=0.05, alpha_fast=0.7,
        # the procedural house is near-symmetric and this scenario's
        # kidnap target is ambiguous under 5 m scans: which mode wins the
        # post-recovery competition is path-dependent (a 4.8 m window
        # cannot cover both modes 4 m apart; the losing mode drains
        # slowly via coarse-vs-fine score equilibrium).  Pin the
        # resampling path to the reference stop rule so the validated
        # trajectory stays deterministic; the every_sample rule has its
        # own golden/regression tests in tests/test_resampling.py.
        ref_compat_kld_newbin_stop=True,
    )
    model = make_model(cfg, house_map)
    state = model.init(jax.random.PRNGKey(4))
    _, infos = model.run(state, scans, angles, jnp.asarray(deltas))
    est = np.asarray(infos.estimate.mean)
    errs = np.hypot(est[:, 0] - poses[:, 0], est[:, 1] - poses[:, 1])
    p_rand = np.asarray(infos.p_random)
    assert np.mean(errs[t_a - 5:t_a]) < 0.5, errs[t_a - 5:t_a]  # tracking pre-kidnap
    assert errs[t_a] > 3.0, errs[t_a]                           # lost at kidnap
    assert p_rand[t_a:t_a + 10].max() > 0.2                     # injection fired
    assert np.mean(errs[-8:]) < 0.5, errs[-12:]                 # re-localized


def _wrap_arr(a):
    return (np.asarray(a) + np.pi) % (2 * np.pi) - np.pi


def test_global_localization_cluster_windowed(house_map):
    """Uniform-init global localization under the WINDOWED flagship config,
    judged on the published CLUSTER estimate (round-2 verdict #9: the
    multimodal phase must not be judged by the weighted mean's
    meters-high average; the estimate itself must converge).  The window
    centers on the (initially meaningless) cloud mean, so early scoring
    runs almost entirely through the coarse fallback field; as the true
    mode wins, the window migrates onto it and fine scoring takes over.
    Records time-to-localize (first step whose cluster estimate stays
    within 0.5 m through the end).  Reference estimate being improved on:
    amcmh_localizer.py:584-597 (weighted mean only)."""
    from tests.test_filter import _simulate, _square_trajectory

    poses = np.asarray([_wrap_arr(p) for p in _square_trajectory(48)])
    scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)
    cfg = FilterConfig(
        mode="AMHAMCL", num_particles=4000, min_particles=500,
        max_particles=4000, initialized=False, max_range=5.0,
        likelihood_impl="corr", corr_n_theta=90, corr_window_cells=96,
        corr_coarse_factor=4, corr_coarse_n_theta=36,
        estimate_mode="cluster",
        alpha1=0.02, alpha2=0.02, alpha3=0.05, alpha4=0.01,
    )
    model = make_model(cfg, house_map)
    state = model.init(jax.random.PRNGKey(7))
    _, infos = model.run(state, scans, angles, deltas)
    est = np.asarray(infos.estimate.mean)
    errs = np.hypot(est[:, 0] - poses[:, 0], est[:, 1] - poses[:, 1])
    ok = errs < 0.5
    # time-to-localize: first index from which the estimate never leaves
    # the 0.5 m ball (np.argmin on the reversed cumulative AND)
    stays = np.logical_and.accumulate(ok[::-1])[::-1]
    assert stays.any(), f"never localized; tail errors {errs[-8:]}"
    t_loc = int(np.argmax(stays))
    assert t_loc <= len(poses) - 8, (t_loc, errs[-8:])
    assert np.mean(errs[-6:]) < 0.35, errs[-6:]
    print(f"[global-loc] time-to-localize: {t_loc} steps, "
          f"final err {errs[-1]:.3f} m")


def test_corr_theta_window_matches_full(house_map, default_config):
    # particles with headings inside the theta window score exactly as the
    # full-theta windowed build; a heading outside it falls to the coarse
    # fallback (finite, > blind)
    pose = jnp.array([1.0, 1.0, 0.4])
    ranges, angles = _scan_at(house_map, pose, m=90)
    rng = np.random.default_rng(9)
    parts = jnp.asarray(
        np.stack([
            1.0 + rng.normal(0, 0.2, 128),
            1.0 + rng.normal(0, 0.2, 128),
            0.4 + rng.normal(0, 0.05, 128),
        ], axis=1).astype(np.float32)
    )
    res = 0.05
    ox0 = int((1.0 + 4.8) / res) - 48
    oy0 = int((1.0 + 4.8) / res) - 48
    n_theta = 64
    # gate=1: the flipped-heading check below scores ONE escapee
    cfg = default_config.replace(corr_window_cells=96,
                                 coarse_gate_escapees=1)
    full = np.asarray(correlation_field_scores(
        parts, ranges, angles, house_map, cfg, n_theta=n_theta,
        window_origin=(oy0, ox0)))
    # theta window of 16 bins centered on the cloud's heading bin
    kmid = int((0.4 + np.pi) * n_theta / (2 * np.pi)) % n_theta
    kstart = (kmid - 8) % n_theta
    cfg_tw = cfg.replace(corr_theta_window_bins=16)
    tw = np.asarray(correlation_field_scores(
        parts, ranges, angles, house_map, cfg_tw, n_theta=n_theta,
        window_origin=(oy0, ox0, kstart)))
    np.testing.assert_allclose(tw, full, rtol=1e-4, atol=1e-4)
    # a particle whose heading is opposite the window -> coarse fallback
    flipped = parts.at[0, 2].set(0.4 + np.pi)
    s = np.asarray(correlation_field_scores(
        flipped, ranges, angles, house_map, cfg_tw, n_theta=n_theta,
        window_origin=(oy0, ox0, kstart)))
    assert s[0] > -50.0
    full_flip = np.asarray(correlation_field_scores(
        flipped, ranges, angles, house_map, cfg, n_theta=n_theta,
        window_origin=(oy0, ox0)))
    assert s[0] != full_flip[0]  # coarse, not the fine value


def test_corr_theta_window_filter_tracks(house_map):
    from tests.test_filter import _simulate, _square_trajectory, _wrap

    poses = _square_trajectory(18)
    scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)
    cfg = FilterConfig(
        mode="AMHAMCL", num_particles=256, min_particles=64, max_particles=320,
        initialized=True, initial_pose=(1.0, -1.0, np.pi / 2), max_range=5.0,
        likelihood_impl="corr", corr_n_theta=120, corr_window_cells=128,
        corr_theta_window_bins=24,
    )
    model = make_model(cfg, house_map)
    state = model.init(jax.random.PRNGKey(0))
    state, infos = model.run(state, scans, angles, deltas)
    est = np.asarray(infos.estimate.mean)
    true = _wrap(poses[-1])
    err = np.hypot(est[-1, 0] - true[0], est[-1, 1] - true[1])
    assert err < 0.3, err


def test_conv_builder_matches_xla(house_map, default_config):
    # the MXU cross-correlation builder is numerically equivalent to the
    # dynamic-slice builder (same offsets, float-assoc tolerance)
    from mcmh_localization_tpu.models.corr_field import (
        _bin_offsets, _build_field_conv, _build_field_xla,
    )

    pose = jnp.array([1.0, 1.0, 0.4])
    ranges, angles = _scan_at(house_map, pose, m=60)
    cfg = default_config
    valid = jnp.isfinite(ranges) & (ranges < cfg.max_range)
    L = jnp.asarray(
        np.random.default_rng(1).normal(size=(64, 64)).astype(np.float32)
    )
    pad = 20
    inv_res = 1.0 / house_map.resolution
    safe_r = jnp.where(valid, ranges, 0.0)
    u = (safe_r * jnp.cos(angles)).astype(jnp.float32)
    v = (safe_r * jnp.sin(angles)).astype(jnp.float32)
    # clip offsets into the stamp (test ranges exceed the small pad)
    padded0 = jnp.pad(L, pad)
    zrow = padded0.shape[0]
    ox, oy = _bin_offsets(u, v, valid, inv_res * 0.2, 12, pad, zrow)
    got = np.asarray(
        _build_field_conv(padded0, ox, oy, valid, 2 * pad + 1, 64, 64)
    )
    padded = jnp.pad(padded0, ((0, 64), (0, 0)))
    ref = np.asarray(_build_field_xla(padded, ox, oy, 64, 64))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dft_builder_matches_xla(house_map, default_config):
    # the DFT-matmul builder equals the dynamic-slice builder
    from mcmh_localization_tpu.models.corr_field import (
        _bin_offsets, _build_field_dft, _build_field_xla,
    )

    pose = jnp.array([1.0, 1.0, 0.4])
    ranges, angles = _scan_at(house_map, pose, m=60)
    cfg = default_config
    valid = jnp.isfinite(ranges) & (ranges < cfg.max_range)
    L = jnp.asarray(
        np.random.default_rng(2).normal(size=(64, 64)).astype(np.float32)
    )
    pad = 20
    inv_res = 1.0 / house_map.resolution
    safe_r = jnp.where(valid, ranges, 0.0)
    u = (safe_r * jnp.cos(angles)).astype(jnp.float32)
    v = (safe_r * jnp.sin(angles)).astype(jnp.float32)
    padded0 = jnp.pad(L, pad)
    zrow = padded0.shape[0]
    ox, oy = _bin_offsets(u, v, valid, inv_res * 0.2, 12, pad, zrow)
    got = np.asarray(_build_field_dft(padded0, ox, oy, valid, 64, 64))
    padded = jnp.pad(padded0, ((0, 64), (0, 0)))
    ref = np.asarray(_build_field_xla(padded, ox, oy, 64, 64))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)


def test_coarse_cond_branch_equivalence(house_map):
    """With every particle inside the window, the gated fine-only branch
    must produce scores identical to forcing the merged coarse gather
    (the lax.cond optimization cannot change results)."""
    import jax.numpy as jnp
    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.models.corr_field import (
        correlation_field_scores,
    )
    from mcmh_localization_tpu.models.sensor import (
        log_likelihood_field, raycast,
    )

    cfg = FilterConfig(
        likelihood_impl="corr", corr_n_theta=24, corr_window_cells=64,
        corr_coarse_factor=4, corr_coarse_n_theta=8, max_range=3.0,
    )
    lf = log_likelihood_field(house_map, cfg)
    rng = np.random.default_rng(4)
    n = 96
    # cloud tight around map center -> all in a window at (64, 64)
    particles = jnp.asarray(np.stack([
        rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
        rng.uniform(-np.pi, np.pi, n)], 1).astype(np.float32))
    angles = jnp.linspace(-np.pi, np.pi, 24).astype(jnp.float32)
    ranges = raycast(particles[0, :2], particles[0, 2] + angles,
                     house_map, 3.0)
    wo = (64, 64)
    a = correlation_field_scores(
        particles, ranges=ranges, angles=angles, grid_map=house_map,
        config=cfg, log_field=lf, n_theta=24, window_origin=wo)
    # forcing the coarse path by disabling the gate is equivalent to one
    # escapee particle being present; scores of the ORIGINAL particles
    # must not change
    far = jnp.asarray([[3.5, 3.5, 0.0]], jnp.float32)  # in-map, far away
    b = correlation_field_scores(
        jnp.concatenate([particles, far]), ranges=ranges, angles=angles,
        grid_map=house_map, config=cfg, log_field=lf, n_theta=24,
        window_origin=wo)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b)[:n],
                               rtol=1e-6, atol=1e-6)
    # gate=0 (ungated, always-build — config.py): in-window scores are
    # unchanged, and the far escapee coarse-scores above BLIND
    from mcmh_localization_tpu.models.sensor import BLIND_SCORE

    c = correlation_field_scores(
        jnp.concatenate([particles, far]), ranges=ranges, angles=angles,
        grid_map=house_map, config=cfg.replace(coarse_gate_escapees=0),
        log_field=lf, n_theta=24, window_origin=wo)
    np.testing.assert_allclose(np.asarray(c)[:n], np.asarray(a),
                               rtol=1e-6, atol=1e-6)
    assert np.asarray(c)[n] > BLIND_SCORE


def test_conv_builder_exact_over_256_beam_pileup():
    """>256 beams collapsing onto one offset cell must stay exact in the
    bf16 conv builder (counts are decomposed into <=256 planes)."""
    import jax.numpy as jnp
    from mcmh_localization_tpu.models.corr_field import (
        _build_field_conv, _build_field_xla,
    )

    rng = np.random.default_rng(7)
    m = 257  # odd count > 256: NOT bf16-representable (old code rounded)
    ksize = 9
    fh = fw = 16
    region = jnp.asarray(
        rng.normal(size=(fh + ksize - 1, fw + ksize - 1)).astype(np.float32)
    )
    # all beams on ONE offset -> stamp count 257 (not bf16-exact raw)
    ox = jnp.full((2, m), 4, jnp.int32)
    oy = jnp.full((2, m), 4, jnp.int32)
    valid = jnp.ones((m,), bool)
    got = np.asarray(_build_field_conv(region, ox, oy, valid, ksize, fh, fw))
    # golden: 257 * region window; tolerance = the hi/lo REGION split's
    # ~1.5e-5 relative (16 mantissa bits), far below the ~4e-3 a rounded
    # bf16 count would cause
    want = 257.0 * np.asarray(region)[4:4 + fh, 4:4 + fw]
    np.testing.assert_allclose(got[0], want, rtol=3e-5)
    np.testing.assert_allclose(got[1], want, rtol=3e-5)
