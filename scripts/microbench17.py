"""Isolate the +11 ms in-filter cost of the KLD escalation cond.

Variants of kld_resample monkeypatched into the full 1M bench step:
  v0  unchanged escalation (cond stage-1 | full)        [22.5 ms observed]
  v1  stage-1 only, no cond (UNSOUND: pretends stop always fires)
  v2  cond kept, full branch replaced by a cheap dummy
  v3  full branch kept but WITHOUT re-running _first_stop on 1M
(v1 vs v0 = total cond+branch cost; v2 vs v1 = cond mechanics;
 v3 isolates the 1M hash scatter inside the untaken branch.)
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from mcmh_localization_tpu.ops import resampling as rs
from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.filter import step as step_mod
from __graft_entry__ import _build_map, _example_inputs
from bench import _tracking_scans, N_BEAMS, SCAN_LEN

orig_kld = rs.kld_resample

def make_variant(variant):
    def kld_v(key, particles, weights, max_samples, min_particles,
              bin_size_xy, bin_size_theta, epsilon, z, count=None,
              eval_window=0):
        if eval_window or min_particles >= max_samples:
            return orig_kld(key, particles, weights, max_samples,
                            min_particles, bin_size_xy, bin_size_theta,
                            epsilon, z, count=count, eval_window=eval_window)
        k_idx, k_noise, k_noise_tail = jax.random.split(key, 3)
        noise_std = jnp.asarray(rs.KLD_NOISE_STD, dtype=particles.dtype)
        stride = count if count is not None else jnp.int32(max_samples)
        w1 = max(rs._KLD_STAGE1, min_particles + min_particles // 4)

        def _first_stop(sub):
            bx = (sub[:, 0] / bin_size_xy).astype(jnp.int32)
            by = (sub[:, 1] / bin_size_xy).astype(jnp.int32)
            bt = (sub[:, 2] / bin_size_theta).astype(jnp.int32)
            bits = rs._hash_bits_for(sub.shape[0])
            nb = rs._first_occurrence_hash(bx, by, bt, bits=bits)
            kb = jnp.cumsum(nb)
            kf = rs._hash_debias(kb, bits)
            m = jnp.arange(sub.shape[0])
            req = rs._kld_chi2_bound(kf, epsilon, z)
            stop = nb & (kb > 1) & (m >= min_particles) & (m > req)
            return jnp.any(stop), jnp.argmax(stop).astype(jnp.int32)

        d1 = rs.systematic_resample_particles(
            k_idx, particles, weights, w1, count=stride)
        samples1 = d1 + jax.random.normal(k_noise, d1.shape, d1.dtype) * noise_std
        a1, f1 = _first_stop(samples1)

        def _stage1(_):
            pad = jnp.zeros((max_samples - w1, 3), samples1.dtype)
            return jnp.concatenate([samples1, pad]), f1

        if variant == "v1":
            return _stage1(None)[0], f1

        def _full_dummy(_):
            pad = jnp.zeros((max_samples - w1, 3), samples1.dtype)
            return jnp.concatenate([samples1, pad]), jnp.int32(max_samples)

        def _full_nostop(_):
            drawn = rs.systematic_resample_particles(
                k_idx, particles, weights, max_samples, count=stride)
            tail = jax.random.normal(
                k_noise_tail, (max_samples - w1, 3), drawn.dtype) * noise_std
            samples = jnp.concatenate([samples1, drawn[w1:] + tail])
            return samples, jnp.int32(max_samples)

        def _full(_):
            drawn = rs.systematic_resample_particles(
                k_idx, particles, weights, max_samples, count=stride)
            tail = jax.random.normal(
                k_noise_tail, (max_samples - w1, 3), drawn.dtype) * noise_std
            samples = jnp.concatenate([samples1, drawn[w1:] + tail])
            a2, f2 = _first_stop(samples)
            return samples, jnp.where(a2, f2, max_samples).astype(jnp.int32)

        if variant in ("v4", "v5"):
            pad = jnp.zeros((max_samples - w1, 3), samples1.dtype)

            def _cond(carry):
                return jnp.logical_not(carry[0])

            def _body(carry):
                done, _, _ = carry
                if variant == "v5":
                    # carry-dependent barrier: defeats while-loop LICM
                    k_i, k_t, _ = jax.lax.optimization_barrier(
                        (k_idx, k_noise_tail, done))
                else:
                    k_i, k_t = k_idx, k_noise_tail
                drawn = rs.systematic_resample_particles(
                    k_i, particles, weights, max_samples, count=stride)
                tail = jax.random.normal(
                    k_t, (max_samples - w1, 3), drawn.dtype) * noise_std
                samples = jnp.concatenate([samples1, drawn[w1:] + tail])
                a2, f2 = _first_stop(samples)
                n2 = jnp.where(a2, f2, max_samples).astype(jnp.int32)
                return jnp.bool_(True), samples, n2

            init = (a1, jnp.concatenate([samples1, pad]), f1)
            _, samples, n_kept = jax.lax.while_loop(_cond, _body, init)
            return samples, n_kept

        branch = {"v0": _full, "v2": _full_dummy, "v3": _full_nostop}[variant]
        return jax.lax.cond(a1, _stage1, branch, operand=None)

    return kld_v


def time_variant(variant):
    step_mod.kld_resample = make_variant(variant)
    grid_map = _build_map()
    config = FilterConfig(
        mode="AMHAMCL", num_particles=1_000_000, min_particles=100_000,
        max_particles=1_000_000, initialized=True, initial_pose=(0.0, 0.0, 0.3),
        kld_eval_window=0, corr_window_cells=128, corr_theta_window_bins=32,
        likelihood_impl="corr", motion_validity="score",
        min_injection_prob=0.02,
    )
    log_field = step_mod._sensor_table(grid_map, config)

    @jax.jit
    def step(state, ranges, angles, delta):
        state = step_mod._predict(state, delta, grid_map, config)
        return step_mod._correct(state, ranges, angles, grid_map, log_field,
                                 config)

    state, _r0, angles, _d0 = _example_inputs(grid_map, config, N_BEAMS)
    rot = np.pi / SCAN_LEN
    delta = jnp.asarray([rot, 0.05, rot], dtype=jnp.float32)
    ranges_seq = _tracking_scans(grid_map, config, angles, delta,
                                 (0.0, 0.0, 0.3))

    @jax.jit
    def run_block(state):
        def body(s, ranges):
            s, _ = step(s, ranges, angles, delta)
            return s, None
        return jax.lax.scan(body, state, ranges_seq)[0]

    for _ in range(2):
        state = run_block(state)
    float(state.w_slow)
    t0 = time.perf_counter()
    for _ in range(4):
        state = run_block(state)
    float(state.w_slow)
    ms = (time.perf_counter() - t0) / (4 * SCAN_LEN) * 1e3
    print(f"{variant}: {ms:.3f} ms/scan", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for v in ("v4", "v5"):
        time_variant(v)
