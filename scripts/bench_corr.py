"""Time the full AMHAMCL step at 100k particles with the corr scorer vs the
exact jnp scorer, across theta-bin counts."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.filter.step import _correct, _predict
from mcmh_localization_tpu.models.sensor import log_likelihood_field
from __graft_entry__ import _build_map, _example_inputs

N = 100_000


def time_step(gm, cfg, iters=15):
    lf = log_likelihood_field(gm, cfg)

    @jax.jit
    def step(state, ranges, angles, delta):
        st = _predict(state, delta, gm, cfg)
        return _correct(st, ranges, angles, gm, lf, cfg)

    state, sr, sa, sd = _example_inputs(gm, cfg, 360)
    for _ in range(3):
        state, _ = step(state, sr, sa, sd)
    float(state.w_slow)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, sr, sa, sd)
    float(state.w_slow)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    gm = _build_map()
    base = dict(
        mode="AMHAMCL", num_particles=N, min_particles=1000, max_particles=N,
        initialized=True, initial_pose=(0.0, 0.0, 0.3),
    )
    for label, kw in (
        ("corr K=48", dict(likelihood_impl="corr", corr_n_theta=48)),
        ("corr K=96", dict(likelihood_impl="corr", corr_n_theta=96)),
        ("corr K=180", dict(likelihood_impl="corr", corr_n_theta=180)),
        ("exact jnp", dict(likelihood_impl="jnp")),
    ):
        cfg = FilterConfig(**base, **kw)
        ms = time_step(gm, cfg)
        print(f"AMHAMCL step 100k x 360 [{label:11s}] {ms:9.2f} ms/scan", flush=True)


if __name__ == "__main__":
    main()
