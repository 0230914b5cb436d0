"""Multi-robot batched filtering tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.parallel.batched import make_batched_model


def test_batched_three_robots_track(house_map):
    from tests.test_filter import _simulate, _square_trajectory, _wrap

    cfg = FilterConfig(
        mode="MHMCL", num_particles=128, initialized=True, max_range=5.0,
        initial_pose=(1.0, -1.0, np.pi / 2),
    )
    # three robots on phase-shifted square loops
    trajs = []
    for shift in (0, 2, 4):
        poses = _square_trajectory(12 + shift)[shift:]
        trajs.append(poses[:12])
    scans_all, deltas_all = [], []
    for poses in trajs:
        scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)
        scans_all.append(scans)
        deltas_all.append(deltas)
    ranges_seq = jnp.stack(scans_all, axis=1)   # (T, B, M)
    deltas_seq = jnp.stack(deltas_all, axis=1)  # (T, B, 3)

    model = make_batched_model(cfg, house_map, batch=3)
    starts = [jnp.asarray(_wrap(t[0])) for t in trajs]
    states = model.init(jax.random.PRNGKey(0), initial_poses=starts)
    assert states.particles.shape == (3, 128, 3)

    states, infos = model.run(states, ranges_seq, angles, deltas_seq)
    est = np.asarray(infos.estimate.mean)  # (T, B, 3)
    assert est.shape == (12, 3, 3)
    for b, poses in enumerate(trajs):
        true = _wrap(poses[-1])
        err = np.hypot(est[-1, b, 0] - true[0], est[-1, b, 1] - true[1])
        assert err < 0.35, (b, est[-1, b], true)


def test_batched_matches_individual(house_map):
    from tests.test_filter import _simulate, _square_trajectory

    cfg = FilterConfig(
        mode="MCL", num_particles=64, initialized=True, max_range=5.0,
        initial_pose=(1.0, -1.0, np.pi / 2),
    )
    poses = _square_trajectory(4)
    scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)

    from mcmh_localization_tpu.filter.step import make_model

    base = make_model(cfg, house_map)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)

    # individual runs
    outs = []
    for k in keys:
        s = base.init(k)
        for t in range(scans.shape[0]):
            s, info = base.step(s, scans[t], angles, deltas[t])
        outs.append(np.asarray(info.estimate.mean))

    # batched run with the same per-robot keys
    model = make_batched_model(cfg, house_map, batch=2)
    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[base.init(k) for k in keys]
    )
    ranges_seq = jnp.broadcast_to(scans[:, None], (scans.shape[0], 2, scans.shape[1]))
    deltas_seq = jnp.broadcast_to(deltas[:, None], (deltas.shape[0], 2, 3))
    states, infos = model.run(states, ranges_seq, angles, deltas_seq)
    est = np.asarray(infos.estimate.mean)
    for b in range(2):
        np.testing.assert_allclose(est[-1, b], outs[b], rtol=1e-4, atol=1e-5)
