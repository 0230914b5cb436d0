"""Beam-field step phase breakdown at the bench operating point
(100k x 360 beams, win128/tw32, int8 LUT kernel, coarse gate).

In-dispatch scan loops (carry-chained) as in microbench13.
Usage: python scripts/microbench21.py [N] [tw] [win] [n_theta] [coarse_k]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

ITERS = 24
DISP = 3


def timed(name, phase_fn, iters=ITERS):
    @jax.jit
    def run(c):
        def body(carry, _):
            return phase_fn(carry), None
        return jax.lax.scan(body, c, None, length=iters)[0]

    c = run(jnp.float32(0.0)); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(DISP):
        c = run(c)
    float(c)
    per = ((time.perf_counter() - t0) * 1e3) / (DISP * iters)
    print(f"{name:56s} {per:9.3f} ms", flush=True)
    return per


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    tw = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    win = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    n_theta = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    coarse_k = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    print("devices:", jax.devices(), "N", N, "tw", tw, "win", win,
          "n_theta", n_theta, "coarse_k", coarse_k, flush=True)

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import (
        _correct, _predict, _sensor_table, _window_origin,
    )
    from mcmh_localization_tpu.models.range_table import (
        _as_beam_tables, _beam_coarse_field, _beam_lut, _bin_lut_matrix,
        beam_field_scores,
    )
    from mcmh_localization_tpu.ops.beam_field_pallas import lut_field
    from __graft_entry__ import _build_map, _example_inputs
    from bench import _tracking_scans, N_BEAMS, SCAN_LEN

    gm = _build_map()
    extra = {}
    if coarse_k:
        extra["corr_coarse_n_theta"] = coarse_k
    config = FilterConfig(
        mode="AMHAMCL", num_particles=N, min_particles=N, max_particles=N,
        initialized=True, initial_pose=(0.0, 0.0, 0.3),
        sensor_model="beam", beam_impl="field",
        beam_table_n_theta=(n_theta or N_BEAMS),
        corr_window_cells=win, corr_theta_window_bins=tw,
        motion_validity="score", min_injection_prob=0.02,
        **extra,
    )
    log_field = _sensor_table(gm, config)
    tables = _as_beam_tables(log_field, config)
    state, ranges, angles, delta0 = _example_inputs(gm, config, N_BEAMS)
    rot = np.pi / SCAN_LEN
    delta = jnp.asarray([rot, 0.05, rot], dtype=jnp.float32)
    # settle into steady state so the window/cloud geometry is realistic
    ranges_seq = _tracking_scans(gm, config, angles, delta, (0.0, 0.0, 0.3))

    @jax.jit
    def step(state, ranges):
        st = _predict(state, delta, gm, config)
        return _correct(st, ranges, angles, gm, log_field, config)

    for t in range(24):
        state, _ = step(state, ranges_seq[t % SCAN_LEN])
    ranges = ranges_seq[0]
    p = state.particles

    def full(c):
        st = state.replace(particles=p + c * 1e-30)
        st = _predict(st, delta, gm, config)
        st, _ = _correct(st, ranges, angles, gm, log_field, config)
        return c + jnp.sum(st.particles[:8]) * 1e-30
    timed(f"FULL beam step", full, iters=8)

    def predict(c):
        st = state.replace(particles=p + c * 1e-30)
        st = _predict(st, delta, gm, config)
        return c + jnp.sum(st.particles[:8]) * 1e-30
    timed("predict", predict)

    wo = jax.jit(lambda st: _window_origin(
        st, gm, config, n_theta=config.beam_table_n_theta))(state)
    wo = tuple(int(x) for x in wo)
    print("window origin:", wo, flush=True)

    def score2(c):
        both = jnp.concatenate([p + c * 1e-30, p + 1e-4])
        s = beam_field_scores(
            both, ranges, angles, gm, config, log_field,
            config.beam_table_n_theta, window_origin=wo)
        return c + jnp.sum(s[:8]) * 1e-30
    timed("two-set beam scoring (2N) incl builds", score2)

    def score_tiny(c):
        s = beam_field_scores(
            p[:128] + c * 1e-30, ranges + c * 1e-30, angles, gm, config,
            log_field, config.beam_table_n_theta, window_origin=wo)
        return c + jnp.sum(s[:8]) * 1e-30
    timed("builds only (128 particles)", score_tiny)

    # fine lut_field alone at this config's shapes
    k_tab = config.beam_table_n_theta
    nq = int(tables.dvals.shape[0])
    qw = jax.lax.dynamic_slice(
        tables.qt, (0, wo[0], wo[1]), (k_tab, win, win)
    ).reshape(k_tab, win * win)
    valid = jnp.isfinite(ranges) & (ranges < config.max_range)
    safe_r = jnp.where(valid, ranges, 0.0)
    lp = _beam_lut(safe_r, valid, tables.dvals, config)
    dtheta = 2 * np.pi / k_tab
    centers = (wo[2] + jnp.arange(tw) + 0.5) * dtheta - np.pi
    g = (jnp.floor((centers[:, None] + angles[None, :] + np.pi) / dtheta)
         .astype(jnp.int32) % k_tab)
    s_mat = _bin_lut_matrix(g, lp, k_tab)

    def fine_build(c):
        f = lut_field(qw, s_mat + c * 1e-30, nq, precision="int8")
        return c + jnp.sum(f[:2, :2]) * 1e-30
    timed("fine lut_field (int8)", fine_build)

    def smat_build(c):
        sm = _bin_lut_matrix(g, lp + c * 1e-30, k_tab)
        return c + jnp.sum(sm[:2, :2, :2]) * 1e-30
    timed("S-matrix einsum", smat_build)

    count = jnp.sum(valid)

    def coarse_build(c):
        f = _beam_coarse_field(lp + c * 1e-30, count, angles, gm, tables,
                               config, k_tab, "int8", False)
        return c + jnp.sum(f[:2, :2, :2]) * 1e-30
    timed("coarse field build (int8)", coarse_build)


if __name__ == "__main__":
    main()
