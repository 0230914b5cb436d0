"""OnlineLocalizer facade tests: callback-style tracking at odom > scan rate."""

import jax
import numpy as np
import pytest

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.filter.online import OnlineLocalizer
from mcmh_localization_tpu.models.sensor import raycast
import jax.numpy as jnp


def test_online_localizer_tracks(house_map):
    cfg = FilterConfig(
        mode="MHAMCL", num_particles=300, min_particles=50, max_particles=400,
        initialized=True, initial_pose=(1.0, -1.0, 0.0), max_range=5.0,
    )
    loc = OnlineLocalizer(cfg, house_map, seed=0)
    angles = jnp.linspace(-np.pi, np.pi, 90)

    pose = np.array([1.0, -1.0, 0.0])
    est = None
    for t in range(30):
        # 3 odometry updates per scan (odom rate > scan rate, like ROS)
        for _ in range(3):
            pose = pose + [0.05 * np.cos(pose[2]), 0.05 * np.sin(pose[2]), 0.02]
            pose[2] = (pose[2] + np.pi) % (2 * np.pi) - np.pi
            loc.on_odom(*pose)
        scan = raycast(jnp.asarray(pose[:2]), pose[2] + angles, house_map,
                       5.0, hit_unknown=True)
        est = loc.on_scan(scan, angles)
    err = np.hypot(est["pose3"][0] - pose[0], est["pose3"][1] - pose[1])
    assert err < 0.3, (est["pose3"], pose)
    assert est["covariance"].shape == (36,)

    parts, weights = loc.particles()
    assert parts.shape[1] == 3
    assert len(parts) == len(weights) == int(loc.state.count)


def test_online_quaternion_odom(house_map):
    cfg = FilterConfig(
        mode="MCL", num_particles=100, initialized=True,
        initial_pose=(1.0, -1.0, 0.5), max_range=5.0,
    )
    loc = OnlineLocalizer(cfg, house_map, seed=1)
    yaw = 0.5
    loc.on_odom_quaternion(1.0, -1.0, 0, 0, np.sin(yaw / 2), np.cos(yaw / 2))
    assert loc._last_odom is not None
    np.testing.assert_allclose(loc._last_odom[2], yaw, atol=1e-6)


def test_online_set_initial_pose(house_map):
    cfg = FilterConfig(
        mode="MCL", num_particles=100, initialized=True,
        initial_pose=(1.0, -1.0, 0.0), max_range=5.0,
    )
    loc = OnlineLocalizer(cfg, house_map)
    loc.set_initial_pose(2.0, 1.0, 0.3)
    parts, _ = loc.particles()
    np.testing.assert_allclose(parts[:, 0].mean(), 2.0, atol=0.2)
    np.testing.assert_allclose(parts[:, 1].mean(), 1.0, atol=0.2)
