"""Headline benchmark: full flagship filter step throughput on one TPU chip.

Measures steady-state latency of the complete AMHAMCL scan update —
odometry proposal + double likelihood-field scoring + asymmetric MH +
augmented/KLD resampling — at several operating points on the reference
384x384 map (BASELINE.json: "particle-updates/sec/chip at 100k particles;
ms/scan").  The flagship config is the windowed + theta-windowed
correlation field with the coarse recovery fallback (the shipped tracking
configuration).

The reference never measured throughput (SURVEY.md §6); ``vs_baseline``
compares against the BASELINE.json north-star <2 ms/scan for 1M x 360 on a
v5e-8, i.e. 125k particles/chip, scaled linearly to each config's particle
count (>1 = beating the target).

Prints one JSON line per metric; the FIRST line is the headline — since
round 5 the RECOMMENDED configuration (1M-capacity KLD through the staged
runner, ESS-gated tracking program; metric name lineage from BENCH_r04's
staged row).
"""

from __future__ import annotations

import json
import time

import numpy as np

N_BEAMS = 360
WARMUP = 2
ITERS = 6
SCAN_LEN = 16  # steps per dispatch (amortizes the ~3.5 ms tunnel enqueue)


def _target_ms(n_particles: int) -> float:
    return 2.0 * (n_particles / 1_000_000) * 8.0  # north-star per chip


def _tracking_scans(grid_map, config, angles, delta, initial_pose):
    """(SCAN_LEN, M) scans raycast along the SCAN_LEN-periodic trajectory
    the fixed odometry delta traces (a closed circle when rot1 + rot2 =
    2*pi / SCAN_LEN).  Feeding per-pose scans makes the bench a REAL
    steady-state tracking workload: the fit stays good and augmented-MCL
    injection stays idle, as it does on a converged live filter.  (A fixed
    scan against an integrating pose degrades artificially and fires the
    injection machinery every step — that regime is what the kidnap tests
    cover, not what a steady-state throughput number should measure.)"""
    import jax
    import jax.numpy as jnp

    from mcmh_localization_tpu.models.sensor import raycast

    r1, tr, r2 = (float(delta[0]), float(delta[1]), float(delta[2]))
    poses = []
    x, y, th = initial_pose
    for _ in range(SCAN_LEN):
        poses.append((x, y, th))
        th = th + r1
        x = x + tr * np.cos(th)
        y = y + tr * np.sin(th)
        th = th + r2
    scans = [
        raycast(jnp.asarray([px, py]), pth + angles, grid_map,
                config.max_range, hit_unknown=True)
        for (px, py, pth) in poses
    ]
    return jax.numpy.stack(scans)


def _time_step(step, state, ranges_seq, angles, delta):
    """Steady-state ms/scan.  Each dispatch runs SCAN_LEN chained steps
    under lax.scan — the remote-tunnel enqueue here costs ~3.5 ms/dispatch
    (measured empty-chain floor), which would otherwise dominate the
    sub-10ms operating points; scanning amortizes it to <0.5 ms/scan.
    The trajectory is SCAN_LEN-periodic, so every dispatch replays the
    same per-pose scan sequence and the filter tracks indefinitely.
    Successive dispatches chain through `state`, serializing on device;
    sync is a scalar value fetch (block_until_ready returns early through
    the tunnel)."""
    import jax

    @jax.jit
    def run_block(state):
        def body(s, ranges):
            s, _info = step(s, ranges, angles, delta)
            return s, None

        return jax.lax.scan(body, state, ranges_seq)[0]

    for _ in range(WARMUP):
        state = run_block(state)
    float(state.w_slow)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state = run_block(state)
    float(state.w_slow)
    ms = (time.perf_counter() - t0) / (ITERS * SCAN_LEN) * 1e3
    # tracking-health diagnostic (stderr; the driver parses stdout JSON):
    # the circle stays within ~0.2 m of the start pose, so a diverged or
    # injection-storming run is visible instead of silently timed
    import numpy as _np
    import sys as _sys

    mean_xy = _np.asarray(jax.numpy.mean(state.particles[:, :2], axis=0))
    print(
        f"[bench] cloud mean after timing: ({mean_xy[0]:+.3f}, "
        f"{mean_xy[1]:+.3f}) m (start 0,0)", file=_sys.stderr,
    )
    return ms


def time_fixed_count_step(grid_map, n_particles, **config_kw):
    """ms/scan for one jitted predict+correct step at a FIXED particle
    count under the chained-timing protocol (_tracking_scans +
    _time_step).  Shared by the chip pricing sweeps
    (scripts/microbench27.py, scripts/microbench28.py) so the timing
    protocol lives in exactly one place."""
    import jax
    import numpy as _np

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import (
        _correct,
        _predict,
        _sensor_table,
    )
    from __graft_entry__ import _example_inputs

    config = FilterConfig(
        mode="AMHAMCL", num_particles=n_particles,
        min_particles=n_particles, max_particles=n_particles,
        initialized=True, initial_pose=(0.0, 0.0, 0.3), **config_kw,
    )
    log_field = _sensor_table(grid_map, config)

    @jax.jit
    def step(state, ranges, angles, delta):
        state = _predict(state, delta, grid_map, config)
        return _correct(state, ranges, angles, grid_map, log_field, config)

    state, _r0, angles, _d0 = _example_inputs(grid_map, config, N_BEAMS)
    rot = _np.pi / SCAN_LEN
    delta = jax.numpy.asarray([rot, 0.05, rot], dtype=jax.numpy.float32)
    ranges_seq = _tracking_scans(
        grid_map, config, angles, delta, (0.0, 0.0, 0.3))
    return _time_step(step, state, ranges_seq, angles, delta)


def _emit(metric, ms, n_particles, unit="ms/scan"):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(ms, 4),
                "unit": unit,
                "vs_baseline": round(_target_ms(n_particles) / ms, 4),
            }
        ),
        flush=True,
    )


def _init_watchdog(budget_s: float = 300.0):
    """Fail fast instead of hanging the driver: the remote-TPU backend
    init (device claim through the tunnel) can wedge indefinitely when
    the pool is unhealthy (measured: >2 h, even jax.devices() blocks in
    a C call that no signal interrupts).  A daemon thread hard-exits
    with a diagnostic if the first tiny device op doesn't complete in
    ``budget_s`` (a healthy claim + first-op round trip is seconds; the
    budget covers a slow remote compile).  Returns a callable that
    disarms the watchdog."""
    import os
    import sys
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(budget_s):
            print(
                f"[bench] FATAL: device init did not complete within "
                f"{budget_s:.0f}s — TPU tunnel/pool unhealthy; aborting "
                f"instead of hanging", file=sys.stderr, flush=True,
            )
            os._exit(2)

    threading.Thread(target=_watch, daemon=True).start()
    return done.set


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    disarm = _init_watchdog()
    import jax.numpy as _jnp

    float(_jnp.ones((8, 8)).sum())  # claim + first op under the watchdog
    disarm()

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import (
        _correct, _predict, _sensor_table,
    )
    from __graft_entry__ import _build_map, _example_inputs

    grid_map = _build_map()

    def run_config(n_particles, min_particles_override=None, **kw):
        # min_particles = N keeps the KLD count at the full N for every
        # timed step — an honest full-population throughput measurement
        # (with a small min, KLD collapses the active count within the
        # warmup steps and the run would time mostly padded slots).  The
        # kld-adaptive metric overrides this to exercise the adaptive path.
        config = FilterConfig(
            mode="AMHAMCL",
            num_particles=n_particles,
            min_particles=(min_particles_override or n_particles),
            max_particles=n_particles,
            initialized=True,
            initial_pose=(0.0, 0.0, 0.3),
            **kw,
        )
        log_field = _sensor_table(grid_map, config)

        @jax.jit
        def step(state, ranges, angles, delta):
            state = _predict(state, delta, grid_map, config)
            return _correct(state, ranges, angles, grid_map, log_field, config)

        state, _ranges0, angles, _delta0 = _example_inputs(
            grid_map, config, N_BEAMS
        )
        # closed circle: rot1 + rot2 = 2*pi / SCAN_LEN -> the trajectory is
        # SCAN_LEN-periodic (radius trans/(rot1+rot2) ~ 0.13 m, safely
        # inside the start room)
        import numpy as _np

        rot = _np.pi / SCAN_LEN
        delta = jax.numpy.asarray([rot, 0.05, rot], dtype=jax.numpy.float32)
        ranges_seq = _tracking_scans(
            grid_map, config, angles, delta, (0.0, 0.0, 0.3)
        )
        return _time_step(step, state, ranges_seq, angles, delta)

    flagship = dict(
        corr_window_cells=128,
        corr_theta_window_bins=32,
        likelihood_impl="corr",
        # score-based motion validity (no per-proposal map lookups) and
        # injection gating — the shipped tracking configuration; tracking
        # parity with reference semantics is asserted in
        # tests/test_motion_validity.py
        motion_validity="score",
        min_injection_prob=0.02,
    )

    # headline (FIRST line): the RECOMMENDED configuration — 1M-capacity
    # KLD semantics executed by the staged runner (filter/staged.py),
    # steady-state tracking in the ESS-gated SMALL program.  Promoted to
    # the headline in round 5 (VERDICT r4 item 2) after the chip-scale
    # accuracy gate: staged+essgate at the real 1M/131k operating point
    # matches the exact-scorer reference across 4 scenarios x 3 seeds
    # (scripts/essgate_chip_sweep.py; RESULTS.md), and the full staged
    # phase cycle (kidnap escalate + shrink-back) is demo'd 3/3 seeds at
    # 1M (scripts/kidnap_1m.py).
    from mcmh_localization_tpu.filter.staged import (
        make_staged_model, run_staged,
    )

    cfg_kld = FilterConfig(
        mode="AMHAMCL", num_particles=1_000_000, min_particles=100_000,
        max_particles=1_000_000, initialized=True,
        initial_pose=(0.0, 0.0, 0.3), kld_eval_window=0,
        coarse_gate_escapees=0, **flagship,
    )
    staged = make_staged_model(cfg_kld, grid_map,
                               tracking_ess_threshold=0.9)
    state_b = staged.big.init(jax.random.PRNGKey(0))
    rot_s = np.pi / SCAN_LEN
    delta_s = jax.numpy.asarray([rot_s, 0.05, rot_s],
                                dtype=jax.numpy.float32)
    angles_s = jax.numpy.linspace(-np.pi, np.pi, N_BEAMS,
                                  dtype=jax.numpy.float32)
    ranges_seq_s = _tracking_scans(grid_map, cfg_kld, angles_s, delta_s,
                                   (0.0, 0.0, 0.3))
    # settle: run the staged runner until it is IN the small program
    out = run_staged(staged, state_b,
                     np.tile(np.asarray(ranges_seq_s), (4, 1)), angles_s,
                     np.tile(np.asarray(delta_s), (4 * SCAN_LEN, 1)),
                     chunk=SCAN_LEN)
    assert out.modes[-1] == 1, "staged runner did not settle into tracking"
    import sys as _s
    print(f"[bench] staged settle: modes={out.modes.tolist()}",
          file=_s.stderr)
    ms_staged = _time_step(staged.small.step, out.state, ranges_seq_s,
                           angles_s, delta_s)
    _emit(f"amhamcl_step_ms_1m_kld_staged_tracking_{N_BEAMS}beams_win128",
          ms_staged, 1_000_000)

    # single-program flagship tracking config at 100k
    ms = run_config(100_000, **flagship)
    _emit(
        f"amhamcl_step_ms_100k_particles_{N_BEAMS}beams_win128", ms, 100_000
    )
    pps = 100_000 / (ms * 1e-3)
    pps_target = 100_000 / (_target_ms(100_000) * 1e-3)
    print(
        json.dumps(
            {
                "metric": "particle_updates_per_sec_per_chip_100k",
                "value": round(pps, 1),
                "unit": "particles/s",
                "vs_baseline": round(pps / pps_target, 4),
            }
        ),
        flush=True,
    )

    # 1M particles, same flagship config, one chip.  coarse_gate_escapees=0
    # = ungated coarse build: at 2M scored particles the gate's escapee
    # count is ~0.75 ms of XLA index math — more than the ~0.3 ms gated
    # DFT build it skips (config.py::coarse_gate_escapees; the 100k points
    # keep the default gate, where the ratio reverses)
    ms_1m = run_config(1_000_000, coarse_gate_escapees=0, **flagship)
    _emit(f"amhamcl_step_ms_1m_particles_{N_BEAMS}beams_win128", ms_1m,
          1_000_000)

    # KLD-ADAPTIVE at 1M capacity: min = N/10, so the full adaptive
    # machinery (hash bin counting, stopping rule, dynamic count) runs in
    # the timed path and the count actually adapts; ms/scan is over the
    # 1M-slot arrays whatever the active count settles to (that shrink is
    # KLD's purpose).  kld_eval_window=0 = the EXACT escalating
    # prefix-draw evaluation (ops/resampling.py), no one-sided deviation.
    # NOTE: this row times the SINGLE-program adaptive path (1M-slot
    # arrays at ~100k active); the staged runner's steady state is the
    # HEADLINE row (filter/staged.py — the shipped way to run 1M KLD).
    ms_kld = run_config(1_000_000, min_particles_override=100_000,
                        kld_eval_window=0, coarse_gate_escapees=0,
                        **flagship)
    _emit(f"amhamcl_step_ms_1m_kld_adaptive_{N_BEAMS}beams_win128", ms_kld,
          1_000_000)

    # 1M full-population flagship + the ESS resample gate (documented
    # deviation, config.py::resample_ess_threshold): steady-state ESS
    # decays ~3%/scan, so the whole resample block (KLD draws + fused
    # expand + injection) fires every ~3-4 scans instead of every scan
    ms_1m_gate = run_config(1_000_000, coarse_gate_escapees=0,
                            resample_ess_threshold=0.9, **flagship)
    _emit(f"amhamcl_step_ms_1m_particles_{N_BEAMS}beams_win128_essgate",
          ms_1m_gate, 1_000_000)

    ms_100k_gate = run_config(100_000, resample_ess_threshold=0.9,
                              **flagship)
    _emit(f"amhamcl_step_ms_100k_particles_{N_BEAMS}beams_win128_essgate",
          ms_100k_gate, 100_000)

    # exact-gather scorer at 100k (no corr approximation)
    ms_exact = run_config(100_000, likelihood_impl="jnp")
    _emit(f"amhamcl_step_ms_100k_particles_{N_BEAMS}beams_exact", ms_exact,
          100_000)

    # the reference's own operating point: 1500 particles, exact scorer
    ms_ref = run_config(1_500, likelihood_impl="jnp")
    _emit(f"amhamcl_step_ms_1500_particles_{N_BEAMS}beams_exact", ms_ref,
          1_500)

    # BASELINE.json config #3: 100k particles, ray-cast beam model — the
    # windowed per-scan SCORE-FIELD path (models/range_table.py::
    # beam_field_scores); the range-table build is a once-per-map precompute
    # outside the timed step
    # Operating point (measured on v5e, scripts/microbench19-21):
    # * 120-bin range table = 3 deg ray-heading quantization — EXACTLY the
    #   corr flagship's quantization class (corr_n_theta=120); the LUT
    #   build kernel is VPU-bound on its one-hot (kp x nq x cells compare
    #   elements), so table bins price in linearly (360 -> 120 saved
    #   ~0.6 ms/scan).  All 360 BEAMS are still scored.
    # * theta window 24 bins (+-36 deg): the circle trajectory turns
    #   22.5 deg/scan, so the two MH sets' mean headings sit +-11.25 deg
    #   off the pooled window center; +-16 deg left ~7% of particles
    #   outside the window every scan, forcing the coarse-fallback build
    #   that coarse_gate_escapees exists to skip.
    # * round-5 retune (scripts/microbench29.py, 3 repeats/variant):
    #   96 table bins (3.75 deg rays) + win 64 (3.2 m) measured
    #   1.452-1.481 vs the old 120t/w96's 1.520-1.544 — one-hot kp and
    #   window area price in — with BETTER square-scenario RMSE
    #   (0.011-0.025 vs 0.046-0.062 m, 3 seeds CPU protocol; the row's
    #   margin was VERDICT r4 item 5).  Coarse bins 24 (96 % 24 == 0).
    beam_kw = dict(
        sensor_model="beam", beam_impl="field",
        beam_table_n_theta=96,
        corr_window_cells=64, corr_theta_window_bins=24,
        corr_coarse_n_theta=24,
        motion_validity="score", min_injection_prob=0.02,
    )
    ms_beam = run_config(100_000, **beam_kw)
    _emit(f"amhamcl_step_ms_100k_particles_{N_BEAMS}beams_raycast_field",
          ms_beam, 100_000)

    # the beam model under the shipped tracking configuration (ESS-gated
    # resampling, the staged SMALL program's knob) — the margin row: the
    # resample block fires every ~3-4 scans, same gating as the corr
    # essgate rows above
    ms_beam_gate = run_config(100_000, resample_ess_threshold=0.9,
                              **beam_kw)
    _emit(
        f"amhamcl_step_ms_100k_particles_{N_BEAMS}beams_raycast_field_"
        "essgate", ms_beam_gate, 100_000,
    )


if __name__ == "__main__":
    main()
