"""Which KLD escalation branch runs in the LIVE filter?

Builds a live converged 1M/min=100k state (24 real steps), then evaluates
the stage-1 stop (a1, f1) and the full stop standalone, with the live
stride count.  Also sweeps where the first new-bin-after-min lands.
"""
import os, sys, time
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

grid_map = _build_map()
config = FilterConfig(
    mode="AMHAMCL", num_particles=1_000_000, min_particles=100_000,
    max_particles=1_000_000, initialized=True, initial_pose=(0.0, 0.0, 0.3),
    kld_eval_window=0, corr_window_cells=128, corr_theta_window_bins=32,
    likelihood_impl="corr", motion_validity="score", min_injection_prob=0.02,
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
ranges_seq = _tracking_scans(grid_map, config, angles, delta, (0.0, 0.0, 0.3))

for t in range(24):
    state, info = step(state, ranges_seq[t % SCAN_LEN], angles, delta)
count = int(info.count)
print("live count:", count, flush=True)

# replicate _resample_kld's inputs: post-MH particles/weights BEFORE the
# resample of the NEXT step — approximate with the current state (uniform
# weights over count active) which is what the next draw sees
particles = state.particles
weights = state.weights

w1 = max(rs._KLD_STAGE1, config.min_particles + config.min_particles // 4)
key = jax.random.PRNGKey(123)
k_idx, k_noise, k_noise_tail = jax.random.split(key, 3)
noise_std = jnp.asarray(rs.KLD_NOISE_STD, jnp.float32)
stride = jnp.int32(count)


def first_stop(sub, min_particles):
    bx = (sub[:, 0] / config.kld_bin_size_xy).astype(jnp.int32)
    by = (sub[:, 1] / config.kld_bin_size_xy).astype(jnp.int32)
    bt = (sub[:, 2] / config.kld_bin_size_theta).astype(jnp.int32)
    bits = rs._hash_bits_for(sub.shape[0])
    nb = rs._first_occurrence_hash(bx, by, bt, bits=bits)
    kb = jnp.cumsum(nb)
    kf = rs._hash_debias(kb, bits)
    m = jnp.arange(sub.shape[0])
    req = rs._kld_chi2_bound(kf, config.kld_epsilon, config.kld_z)
    stop = nb & (kb > 1) & (m >= min_particles) & (m > req)
    return jnp.any(stop), jnp.argmax(stop).astype(jnp.int32), kb[-1]


@jax.jit
def stage1():
    d = rs.systematic_resample_particles(k_idx, particles, weights, w1,
                                         count=stride)
    s1 = d + jax.random.normal(k_noise, d.shape, jnp.float32) * noise_std
    return first_stop(s1, config.min_particles)


@jax.jit
def full():
    d = rs.systematic_resample_particles(k_idx, particles, weights,
                                         1_000_000, count=stride)
    s = d + jax.random.normal(k_noise_tail, d.shape, jnp.float32) * noise_std
    return first_stop(s, config.min_particles)

a1, f1, kb1 = stage1()
print(f"stage-1 (w1={w1}): any_stop={bool(a1)} first={int(f1)} "
      f"k_bins_end={int(kb1)}", flush=True)
a2, f2, kb2 = full()
print(f"full: any_stop={bool(a2)} first={int(f2)} k_bins_end={int(kb2)}",
      flush=True)

# where do new bins keep opening relative to count?  report new-bin m's
# around min_particles
d = rs.systematic_resample_particles(k_idx, particles, weights, w1,
                                     count=stride)
s1 = np.asarray(d + jax.random.normal(k_noise, d.shape, jnp.float32)
                * noise_std)
bx = (s1[:, 0] / config.kld_bin_size_xy).astype(np.int64)
by = (s1[:, 1] / config.kld_bin_size_xy).astype(np.int64)
bt = (s1[:, 2] / config.kld_bin_size_theta).astype(np.int64)
ids = (bx << 42) ^ (by << 21) ^ bt
seen = set()
new_ms = []
for m, i in enumerate(ids.tolist()):
    if i not in seen:
        seen.add(i)
        new_ms.append(m)
print("total distinct bins (numpy):", len(seen), flush=True)
tail = [m for m in new_ms if m > 90_000]
print("new-bin positions past 90k:", tail[:20], flush=True)
