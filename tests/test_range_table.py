"""Range-table beam model (models/range_table.py): build parity with the
golden raycast, scoring parity with the dense DDA path, filter-level
tracking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmh_localization_tpu.config import FilterConfig
from mcmh_localization_tpu.models.range_table import (
    build_range_table,
    raycast_table_scores,
    table_cell_major,
)
from mcmh_localization_tpu.models.sensor import raycast, raycast_beam_scores


@pytest.fixture(scope="module")
def box_map():
    """Clean 64x64 box: wall ring at index 2/61, free interior."""
    from mcmh_localization_tpu.maps.grid_map import build_grid_map

    occ = np.full((64, 64), 0, dtype=np.int8)
    occ[2, 2:62] = 100
    occ[61, 2:62] = 100
    occ[2:62, 2] = 100
    occ[2:62, 61] = 100
    occ[30:34, 30:34] = 100  # center pillar
    return build_grid_map(occ, resolution=0.05, origin=(-1.6, -1.6),
                          edt_impl="scipy")


def test_range_table_matches_raycast(box_map):
    """Table entries == golden raycast from cell centers at bin centers
    (tests/reference_impl.py::ref_raycast backs `raycast` itself)."""
    k_bins = 16
    max_range = 2.0
    table = np.asarray(build_range_table(box_map, k_bins, max_range))
    rng = np.random.default_rng(0)
    # interior cells only (rays terminate on walls -> no boundary-trunc edge)
    ys = rng.integers(4, 60, 40)
    xs = rng.integers(4, 60, 40)
    thetas = -np.pi + (np.arange(k_bins) + 0.5) * (2 * np.pi / k_bins)
    mismatch = 0
    total = 0
    for y, x in zip(ys, xs):
        cx, cy = box_map.grid_to_world(jnp.int32(x), jnp.int32(y))
        pose = jnp.array([float(cx), float(cy)])
        r = np.asarray(
            raycast(pose, jnp.asarray(thetas, jnp.float32), box_map,
                    max_range)
        )
        t = table[:, y, x]
        mismatch += np.sum(np.abs(r - t) > 1e-5)
        total += k_bins
    # f32 (raycast) vs f64 (table offsets) trig can flip knife-edge cells
    assert mismatch / total < 0.02, (mismatch, total)


def test_table_scores_match_dense_at_centers(box_map):
    """Particles at cell centers with bin-center headings and bin-multiple
    beam angles: the table path reproduces the dense DDA scores."""
    k_bins = 16
    cfg = FilterConfig(max_range=2.0, sigma_hit=0.1,
                       beam_table_n_theta=k_bins)
    table_cm = table_cell_major(build_range_table(box_map, k_bins, 2.0))

    dth = 2 * np.pi / k_bins
    angles = jnp.asarray(np.arange(-4, 5) * dth, jnp.float32)  # bin multiples
    rng = np.random.default_rng(1)
    ys = rng.integers(6, 58, 32)
    xs = rng.integers(6, 58, 32)
    ks = rng.integers(0, k_bins, 32)
    cx, cy = box_map.grid_to_world(jnp.asarray(xs, jnp.int32),
                                   jnp.asarray(ys, jnp.int32))
    th = -np.pi + (ks + 0.5) * dth
    particles = jnp.stack(
        [cx, cy, jnp.asarray(th, jnp.float32)], axis=1
    )
    # a scan measured from the first particle's pose
    ranges = raycast(particles[0, :2], particles[0, 2] + angles, box_map, 2.0)

    s_table = np.asarray(
        raycast_table_scores(particles, ranges, angles, box_map, cfg,
                             table_cm, k_bins)
    )
    s_dense = np.asarray(
        raycast_beam_scores(particles, ranges, angles, box_map,
                            sigma_hit=cfg.sigma_hit, z_hit=cfg.z_hit,
                            z_rand=cfg.z_rand, max_range=2.0)
    )
    # identical r_pred except knife-edge cells; scores are means over beams
    np.testing.assert_allclose(s_table, s_dense, atol=0.35)
    assert np.mean(np.abs(s_table - s_dense) < 1e-3) > 0.9


def test_beam_table_filter_tracks(house_map):
    from mcmh_localization_tpu.filter.step import make_model
    from tests.test_filter import _simulate, _square_trajectory, _wrap

    poses = _square_trajectory(12)
    scans, angles, deltas = _simulate(house_map, poses, max_range=5.0)
    cfg = FilterConfig(
        mode="MCL", num_particles=300, initialized=True,
        initial_pose=(1.0, -1.0, np.pi / 2), max_range=5.0,
        sensor_model="beam", beam_impl="table", beam_table_n_theta=120,
        sigma_hit=0.2,
        alpha1=0.02, alpha2=0.02, alpha3=0.05, alpha4=0.01,
    )
    model = make_model(cfg, house_map)
    state = model.init(jax.random.PRNGKey(0))
    state, infos = model.run(state, scans, angles, deltas)
    est = np.asarray(infos.estimate.mean)
    true = _wrap(poses[-1])
    err = np.hypot(est[-1, 0] - true[0], est[-1, 1] - true[1])
    assert err < 0.3, err
