"""Isolate corr-scoring fixed cost (field builds) vs per-particle cost, and
the raw gather kernel at particle scale with clustered indices."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

_RTT = None
def timed(name, fn, iters=20):
    global _RTT
    c = jnp.float32(0.0)
    c = fn(c); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = fn(c)
    float(c)
    per = ((time.perf_counter()-t0)*1e3 - (_RTT or 0))/iters
    print(f"{name:56s} {per:9.3f} ms", flush=True)
    return per

def main():
    global _RTT
    print("devices:", jax.devices(), flush=True)
    f_id = jax.jit(lambda c: c + 1.0)
    c = f_id(jnp.float32(0)); float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(20): c = f_id(c)
    float(c)
    _RTT = (time.perf_counter()-t0)*1e3
    print(f"{'empty chain':56s} {_RTT:9.3f} ms", flush=True)

    from mcmh_localization_tpu.config import FilterConfig
    from mcmh_localization_tpu.filter.step import _sensor_table
    from mcmh_localization_tpu.models.corr_field import correlation_field_scores
    from mcmh_localization_tpu.ops.gather_pallas import gather_rows_lanes
    from __graft_entry__ import _build_map, _example_inputs

    gm = _build_map()
    n = 1_000_000
    cfg = FilterConfig(
        mode="AMHAMCL", num_particles=n, min_particles=n, max_particles=n,
        initialized=True, initial_pose=(0.0, 0.0, 0.3),
        corr_window_cells=128, corr_theta_window_bins=32,
        likelihood_impl="corr", motion_validity="score",
    )
    lf = _sensor_table(gm, cfg)
    state, ranges, angles, delta = _example_inputs(gm, cfg, 360)
    p3 = state.particles
    res = float(jax.device_get(gm.resolution))
    half = cfg.corr_window_cells // 2
    wo = (jnp.int32(10.0/res) - half, jnp.int32(10.0/res) - half,
          jnp.int32((0.3+3.14159)*cfg.corr_n_theta/6.28318) - 16)

    def score_n(m):
        pm = p3[:m]
        return jax.jit(lambda c, pm=pm: jnp.sum(correlation_field_scores(
            pm + c*1e-30, ranges, angles, gm, cfg, log_field=lf,
            n_theta=cfg.corr_n_theta, window_origin=wo))*1e-30)

    timed("[128] corr scores (fixed cost: builds)", score_n(128))
    timed("[100k] corr scores", score_n(100_000))
    timed("[1M] corr scores", score_n(n))

    # raw gather kernel: 7552-row table (fine+coarse size), clustered rows
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(7552, 128)).astype(np.float32))
    for nn in (1_000_000, 2_000_000):
        rows = jnp.asarray(
            rng.integers(1800, 1930, nn).astype(np.int32))  # ~1 chunk span
        lanes = jnp.asarray(rng.integers(0, 128, nn).astype(np.int32))
        timed(f"[{nn//1000}k] gather_rows_lanes bf16 clustered",
              jax.jit(lambda c, rows=rows, lanes=lanes: jnp.sum(
                  gather_rows_lanes(table + c*1e-30, rows, lanes,
                                    precision="bf16"))*1e-30))
        timed(f"[{nn//1000}k] gather_rows_lanes split clustered",
              jax.jit(lambda c, rows=rows, lanes=lanes: jnp.sum(
                  gather_rows_lanes(table + c*1e-30, rows, lanes,
                                    precision="split"))*1e-30))
    # bimodal rows: 99% in one chunk + 1% in a distant chunk (the merged
    # fine+coarse pattern) — exercises the pl.when chunk skip
    for nn in (1_000_000,):
        r1 = rng.integers(1800, 1930, nn).astype(np.int32)
        far = rng.integers(7000, 7100, nn).astype(np.int32)
        pick = rng.random(nn) < 0.01
        rows = jnp.asarray(np.where(pick, far, r1))
        lanes = jnp.asarray(rng.integers(0, 128, nn).astype(np.int32))
        timed(f"[{nn//1000}k] gather bf16 BIMODAL rows (1% far)",
              jax.jit(lambda c, rows=rows, lanes=lanes: jnp.sum(
                  gather_rows_lanes(table + c*1e-30, rows, lanes,
                                    precision="bf16"))*1e-30))
    # index-math only: everything in the 1M score except builds+gather
    mxmy = jax.jit(lambda c, p3=p3: jnp.sum(
        (((p3[:,0]+c*1e-30 - gm.origin[0]) / gm.resolution).astype(jnp.int32)
         % 120 + ((p3[:,2]+jnp.pi)*(120/(2*jnp.pi))).astype(jnp.int32) % 120
        ).astype(jnp.float32))*1e-30)
    timed("[1M] index math sample", mxmy)

if __name__ == "__main__":
    main()
