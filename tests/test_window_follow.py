"""Window-follow (window_center="anchor"): the corr/beam score-field window
centers on the top-weight cluster instead of the cloud mean, so ONE windowed
flagship config survives global localization, kidnap, and tracking phases
(round-4; the reference needs no window policy because it scores the full
map every scan, parallel_utils.py:85-149)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.filter.state import make_state
from mcmh_localization_tpu.filter.step import (
    _window_origin,
    advance_anchor,
    make_model,
    refresh_anchor,
)


def _state_with(particles, weights=None, anchor=None, key=0):
    n = particles.shape[0]
    st = make_state(jnp.asarray(particles), n, jax.random.PRNGKey(key), n)
    if weights is not None:
        w = jnp.asarray(weights, jnp.float32)
        st = st.replace(weights=w / jnp.sum(w))
    if anchor is not None:
        st = st.replace(anchor=jnp.asarray(anchor, jnp.float32))
    return st


def _bimodal(n=400, a=(2.0, 2.0, 0.5), b=(-2.0, -2.0, -1.0), frac_a=0.5):
    rng = np.random.default_rng(0)
    na = int(n * frac_a)
    pa = rng.normal(0, 0.1, (na, 3)) + np.asarray(a)
    pb = rng.normal(0, 0.1, (n - na, 3)) + np.asarray(b)
    return np.concatenate([pa, pb]).astype(np.float32)


def test_window_centers_on_anchor_not_mean(house_map):
    """On a bimodal cloud, the anchor-mode window covers the anchor mode;
    the mean-mode window sits between modes (covering neither)."""
    parts = _bimodal()
    w = np.full(400, 1e-3)
    w[:200] = 1.0  # mode A dominates
    cfg = FilterConfig(
        mode="MCL", num_particles=400, likelihood_impl="corr",
        corr_window_cells=48, window_center="anchor",
    )
    st = _state_with(parts, w, anchor=(2.0, 2.0, 0.5))
    oy0, ox0 = _window_origin(st, house_map, cfg)
    res = float(house_map.resolution)
    cx = float(house_map.origin[0]) + (float(ox0) + 24) * res
    cy = float(house_map.origin[1]) + (float(oy0) + 24) * res
    assert abs(cx - 2.0) < 0.2 and abs(cy - 2.0) < 0.2, (cx, cy)

    cfg_mean = cfg.replace(window_center="mean")
    oy0m, ox0m = _window_origin(st, house_map, cfg_mean)
    cxm = float(house_map.origin[0]) + (float(ox0m) + 24) * res
    assert abs(cxm) < 0.5, cxm  # mean sits between the +-2 modes


def test_refresh_anchor_rejects_lone_outlier():
    """A single top-weight particle with negligible cluster mass must NOT
    steal the anchor from the tracked mode (coarse max-pooled scores are
    optimistic; one lucky escapee flickered the beam kidnap test)."""
    parts = _bimodal(401, frac_a=0.0)
    parts[-1] = (4.0, 4.0, 2.0)  # lone outlier
    w = np.full(401, 1.0)
    w[-1] = 5.0  # highest single weight, tiny cluster mass
    cfg = FilterConfig(mode="MCL", num_particles=401)
    mask = jnp.ones(401, bool)
    anchor = jnp.asarray([-2.0, -2.0, -1.0], jnp.float32)
    out, mass, _streak = refresh_anchor(
        jnp.asarray(parts), jnp.asarray(w / w.sum(), jnp.float32),
        anchor, jnp.int32(0), cfg, mask,
    )
    out = np.asarray(out)
    assert 0.0 <= float(mass) <= 1.0 + 1e-6
    assert np.allclose(out, np.asarray(anchor)), out


def test_refresh_anchor_migrates_to_heavier_mode():
    """A genuine competing mode (more total weight near the candidate than
    near the incumbent) takes the anchor."""
    parts = _bimodal(400, frac_a=0.5)
    w = np.full(400, 1e-3)
    w[:200] = 1.0  # mode A = (2, 2, .5) dominates
    cfg = FilterConfig(mode="MCL", num_particles=400)
    mask = jnp.ones(400, bool)
    anchor = jnp.asarray([-2.0, -2.0, -1.0], jnp.float32)  # stale mode B
    out, mass, _streak = refresh_anchor(
        jnp.asarray(parts), jnp.asarray(w / w.sum(), jnp.float32),
        anchor, jnp.int32(0), cfg, mask,
    )
    out = np.asarray(out)
    assert 0.0 <= float(mass) <= 1.0 + 1e-6
    assert np.hypot(out[0] - 2.0, out[1] - 2.0) < 0.5, out


def test_refresh_anchor_recenters_within_mode():
    """In-cluster candidates always adopt (kills deterministic-advance
    drift)."""
    rng = np.random.default_rng(3)
    parts = (rng.normal(0, 0.05, (200, 3)) + np.asarray([1.0, 1.0, 0.2])
             ).astype(np.float32)
    w = rng.uniform(0.5, 1.0, 200)
    cfg = FilterConfig(mode="MCL", num_particles=200)
    mask = jnp.ones(200, bool)
    anchor = jnp.asarray([1.1, 0.9, 0.25], jnp.float32)  # drifted, in-cluster
    out, mass, _streak = refresh_anchor(
        jnp.asarray(parts), jnp.asarray(w / w.sum(), jnp.float32),
        anchor, jnp.int32(0), cfg, mask,
    )
    out = np.asarray(out)
    assert 0.0 <= float(mass) <= 1.0 + 1e-6
    top = parts[int(np.argmax(w))]
    assert np.allclose(out, top, atol=1e-6), (out, top)


def test_advance_anchor_matches_deterministic_odometry():
    anchor = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    delta = jnp.asarray([0.1, 0.3, -0.05], jnp.float32)
    out = np.asarray(advance_anchor(anchor, delta))
    th1 = 0.5 + 0.1
    assert np.allclose(
        out, [1.0 + 0.3 * np.cos(th1), 2.0 + 0.3 * np.sin(th1), th1 - 0.05],
        atol=1e-6,
    )


def test_windowed_filter_rides_bimodal_start(house_map):
    """Filter-level: a deliberately BIMODAL init (half the particles at a
    wrong symmetric pose) under the windowed anchor-follow config resolves
    to the true mode — the regime the round-3 mean-centered window could
    not ride (VERDICT r3 weak #1)."""
    from tests.test_filter import _simulate

    ts = np.linspace(0, 2 * np.pi, 40)
    poses = np.stack(
        [2.2 + 0.7 * np.cos(ts), 2.2 + 0.7 * np.sin(ts),
         (ts + np.pi / 2 + np.pi) % (2 * np.pi) - np.pi], axis=1
    ).astype(np.float32)
    scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)
    cfg = FilterConfig(
        mode="AMHAMCL", num_particles=2000, min_particles=400,
        max_particles=2000, initialized=True,
        initial_pose=tuple(map(float, poses[0])), max_range=5.0,
        likelihood_impl="corr", corr_n_theta=90, corr_window_cells=96,
        estimate_mode="cluster", window_center="anchor",
    )
    model = make_model(cfg, house_map)
    state = model.init(jax.random.PRNGKey(11))
    # plant the decoy mode: half the cloud teleported to the point-symmetric
    # pose (the house is near-symmetric under 5 m scans)
    parts = np.array(state.particles)
    half = len(parts) // 2
    decoy = parts[:half].copy()
    decoy[:, 0] = -decoy[:, 0]
    decoy[:, 1] = -decoy[:, 1]
    decoy[:, 2] = ((decoy[:, 2] + 2 * np.pi) % (2 * np.pi)) - np.pi
    parts[:half] = decoy
    state = state.replace(particles=jnp.asarray(parts))
    _, infos = model.run(state, scans, angles, deltas)
    est = np.asarray(infos.estimate.mean)
    errs = np.hypot(est[:, 0] - poses[:, 0], est[:, 1] - poses[:, 1])
    assert np.mean(errs[-8:]) < 0.5, errs[-8:]


def test_anchor_hysteresis_commits_between_symmetric_modes():
    """Two persistent near-symmetric modes whose masses oscillate around
    parity (the measured 1M kidnap regime on map_house): without
    hysteresis the anchor flips mode whenever the challenger momentarily
    out-masses the incumbent; with anchor_hysteresis=2.0 it stays
    committed through the oscillation and only migrates on a sustained
    2x dominance."""
    import jax.numpy as jnp

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import refresh_anchor

    n = 400
    rng = np.random.default_rng(0)
    a = np.array([1.0, 1.0, 0.0])
    b = np.array([6.0, 1.0, 0.0])
    parts = np.concatenate([
        a + rng.normal(0, 0.05, (n // 2, 3)),
        b + rng.normal(0, 0.05, (n // 2, 3)),
    ]).astype(np.float32)
    mask = jnp.ones(n, bool)

    def run(hyst, ratios):
        cfg = FilterConfig(num_particles=n, max_particles=n,
                           anchor_hysteresis=hyst)
        anchor = jnp.asarray(a, jnp.float32)  # committed to mode A
        streak = jnp.int32(0)
        flips = 0
        prev_mode_a = True
        for r in ratios:  # r = mass(B) / mass(A)
            w = np.ones(n, np.float32)
            w[n // 2:] = r
            # argmax lands in the heavier mode
            w[n // 2:] *= 1.0 + 1e-3 * rng.random(n // 2)
            w[:n // 2] *= 1.0 + 1e-3 * rng.random(n // 2)
            w /= w.sum()
            anchor, _mass, streak = refresh_anchor(
                jnp.asarray(parts), jnp.asarray(w), anchor, streak, cfg,
                mask)
            mode_a = abs(float(anchor[0]) - a[0]) < 1.0
            flips += int(mode_a != prev_mode_a)
            prev_mode_a = mode_a
        return flips, prev_mode_a

    # mass ratio oscillating 0.8..1.3 around parity: no-hysteresis flips
    # repeatedly, hysteresis holds mode A throughout
    osc = [0.8, 1.2, 0.9, 1.3, 0.85, 1.25, 0.9, 1.2]
    flips0, _ = run(1.0, osc)
    flips2, ended_a = run(2.0, osc)
    assert flips0 >= 2, flips0
    assert flips2 == 0
    assert ended_a
    # sustained 2.5x dominance DOES migrate the committed anchor
    _, ended_a2 = run(2.0, [2.5, 2.5])
    assert not ended_a2


def test_estimate_mode_anchor_tracks(house_map):
    """estimate_mode="anchor" publishes the committed mode's cluster
    mean and tracks like "cluster" on a unimodal run (converged cloud:
    anchor == argmax mode)."""
    import jax

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import make_model
    from tests.test_filter import _simulate

    poses = [np.array([1.0, -1.0, 0.0])]
    for _ in range(24):
        p = poses[-1].copy()
        p[2] = ((p[2] + 0.06 + np.pi) % (2 * np.pi)) - np.pi
        p[0] += 0.05 * np.cos(p[2])
        p[1] += 0.05 * np.sin(p[2])
        poses.append(p)
    poses = np.asarray(poses, dtype=np.float32)
    scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)
    cfg = FilterConfig(
        mode="AMHAMCL", num_particles=800, min_particles=128,
        max_particles=800, initialized=True,
        initial_pose=(1.0, -1.0, 0.0), max_range=5.0,
        estimate_mode="anchor", anchor_hysteresis=2.0,
    )
    model = make_model(cfg, house_map)
    state, infos = model.run(model.init(jax.random.PRNGKey(0)), scans,
                             angles, deltas)
    est = np.asarray(infos.estimate.mean)
    errs = np.hypot(est[:, 0] - poses[:, 0], est[:, 1] - poses[:, 1])
    assert errs[-1] < 0.3, errs[-5:]


def test_anchor_score_margin_vetoes_mass_dominant_decoy():
    """Evidence veto (anchor_score_margin): a decoy holding 10x the mass
    but whose best particle scores BELOW the incumbent's best by the
    margin cannot steal the anchor; collapse the incumbent's fit (true
    kidnap) and migration fires immediately."""
    import jax.numpy as jnp

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import refresh_anchor

    n = 1000
    rng = np.random.default_rng(1)
    a = np.array([1.0, 1.0, 0.0])
    b = np.array([6.0, 1.0, 0.0])
    n_a = 50                      # truth: 5% of particles
    parts = np.concatenate([
        a + rng.normal(0, 0.05, (n_a, 3)),
        b + rng.normal(0, 0.05, (n - n_a, 3)),
    ]).astype(np.float32)
    mask = jnp.ones(n, bool)
    cfg = FilterConfig(num_particles=n, max_particles=n,
                       anchor_hysteresis=2.0, anchor_score_margin=0.02)

    def weights(s_truth, s_decoy):
        s = np.full(n, s_decoy)
        s[:n_a] = s_truth
        s += rng.normal(0, 1e-4, n)
        w = np.exp(s - s.max())
        return jnp.asarray((w / w.sum()).astype(np.float32))

    anchor = jnp.asarray(a, jnp.float32)
    # truth outscores the decoy by the measured ~0.038 gap: despite 19x
    # mass dominance, the veto holds the anchor on truth
    streak = jnp.int32(0)
    for _ in range(5):
        anchor, _m, streak = refresh_anchor(
            jnp.asarray(parts), weights(0.046, 0.008), anchor, streak, cfg,
            mask)
    assert abs(float(anchor[0]) - a[0]) < 1.0
    # true kidnap: incumbent fit collapses by whole log units -> migrate
    anchor, _m, streak = refresh_anchor(
        jnp.asarray(parts), weights(-2.0, 0.04), anchor, streak, cfg, mask)
    assert abs(float(anchor[0]) - b[0]) < 1.0


def test_refresh_anchor_debounced_commitment():
    """anchor_commit_scans=K (round-5): a different-mode challenger that
    wins the mass + evidence tests must do so K CONSECUTIVE scans before
    the anchor migrates — a 1-2 scan transient inversion (measured:
    rate-induced scan/odometry misalignment during the at-rate staged 1M
    runs, RESULTS.md duty cycle) cannot steal a committed anchor, while a
    sustained one (true kidnap) migrates exactly at scan K."""
    rng = np.random.default_rng(11)
    n = 400
    a = np.array([1.0, 1.0, 0.0])
    b = np.array([6.0, 1.0, 0.0])
    parts = jnp.asarray(np.concatenate([
        a + rng.normal(0, 0.05, (n // 2, 3)),
        b + rng.normal(0, 0.05, (n // 2, 3)),
    ]).astype(np.float32))
    mask = jnp.ones(n, bool)
    cfg = FilterConfig(num_particles=n, max_particles=n,
                       anchor_commit_scans=3)

    def weights(sa, sb):
        s = np.full(n, sa, np.float32)
        s[n // 2:] = sb
        s += 1e-3 * rng.random(n).astype(np.float32)
        w = np.exp(s - s.max())
        return jnp.asarray((w / w.sum()).astype(np.float32))

    anchor = jnp.asarray(a, jnp.float32)
    streak = jnp.int32(0)
    win_b = weights(-2.0, 0.05)   # decoy decisively outscores (kidnap-like)
    win_a = weights(0.05, -2.0)   # truth wins again (transient over)
    # 2-scan transient challenge, then truth recovers: no migration ever
    for w in (win_b, win_b, win_a):
        anchor, _m, streak = refresh_anchor(parts, w, anchor, streak, cfg,
                                            mask)
        assert abs(float(anchor[0]) - a[0]) < 1.0, anchor
    assert int(streak) == 0  # challenge streak reset by the truth scan
    # sustained challenge: holds for scans 1-2, migrates exactly at 3
    for i in range(1, 4):
        anchor, _m, streak = refresh_anchor(parts, win_b, anchor, streak,
                                            cfg, mask)
        on_a = abs(float(anchor[0]) - a[0]) < 1.0
        assert on_a == (i < 3), (i, anchor)
    assert int(streak) == 0  # consumed by the migration


def test_refresh_anchor_veto_scales_with_sum_aggregation():
    """anchor_score_margin is calibrated per-beam; under
    score_aggregation="sum" the log-weight gap is per-beam * n_beams, so
    the veto must compare against margin * score_scale — unscaled, a
    decoy winning by 0.001/beam over 360 beams (sum gap 0.36 log units)
    trivially clears a 0.02 margin and the veto degenerates to
    mass-only (the measured at-rate decoy capture)."""
    rng = np.random.default_rng(13)
    n = 400
    a = np.array([1.0, 1.0, 0.0])
    b = np.array([6.0, 1.0, 0.0])
    parts = jnp.asarray(np.concatenate([
        a + rng.normal(0, 0.05, (n // 2, 3)),
        b + rng.normal(0, 0.05, (n - n // 2, 3)),
    ]).astype(np.float32))
    mask = jnp.ones(n, bool)
    cfg = FilterConfig(num_particles=n, max_particles=n,
                       anchor_score_margin=0.02)

    def weights(per_beam_a, per_beam_b, n_beams=360):
        s = np.full(n, per_beam_a * n_beams, np.float64)
        s[n // 2:] = per_beam_b * n_beams  # sum-aggregated scores
        s += 1e-4 * rng.random(n)
        w = np.exp(s - s.max())
        return jnp.asarray((w / w.sum()).astype(np.float32))

    anchor = jnp.asarray(a, jnp.float32)
    # decoy out-masses (mass hysteresis 1.0 passes) and wins by a hair
    # (+0.001/beam).  Unscaled veto: migrates (documents the failure);
    # scaled veto: holds.
    w = weights(0.046, 0.047)
    out_unscaled, _m, _s = refresh_anchor(parts, w, anchor, jnp.int32(0),
                                          cfg, mask, score_scale=1.0)
    assert abs(float(out_unscaled[0]) - b[0]) < 1.0  # the bug, pinned
    out_scaled, _m, _s = refresh_anchor(parts, w, anchor, jnp.int32(0),
                                        cfg, mask, score_scale=360.0)
    assert abs(float(out_scaled[0]) - a[0]) < 1.0  # veto holds
    # a decisive per-beam gap (true kidnap scale) still migrates scaled
    out_kidnap, _m, _s = refresh_anchor(parts, weights(0.046, 0.10),
                                        anchor, jnp.int32(0), cfg, mask,
                                        score_scale=360.0)
    assert abs(float(out_kidnap[0]) - b[0]) < 1.0
