"""Pallas likelihood kernel vs the jnp reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcmh_localization_tpu.models.sensor import likelihood_field_scores
from mcmh_localization_tpu.ops.likelihood_pallas import (
    likelihood_field_scores_pallas,
)


def _case(house_map, default_config, n=700, m=360, seed=0):
    rng = np.random.default_rng(seed)
    particles = np.stack(
        [rng.uniform(-3.5, 3.5, n), rng.uniform(-3.5, 3.5, n),
         rng.uniform(-np.pi, np.pi, n)], axis=1
    ).astype(np.float32)
    angles = np.linspace(-np.pi, np.pi, m).astype(np.float32)
    ranges = rng.uniform(0.2, 6.0, m).astype(np.float32)
    ranges[rng.random(m) < 0.08] = np.inf
    return jnp.asarray(particles), jnp.asarray(ranges), jnp.asarray(angles)


def test_pallas_matches_jnp(house_map, default_config):
    particles, ranges, angles = _case(house_map, default_config)
    ref = likelihood_field_scores(particles, ranges, angles, house_map, default_config)
    got = likelihood_field_scores_pallas(
        particles, ranges, angles, house_map, default_config, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_matches_jnp_with_step(house_map, default_config):
    particles, ranges, angles = _case(house_map, default_config, n=100, m=180, seed=1)
    cfg = default_config.replace(step=4)
    ref = likelihood_field_scores(particles, ranges, angles, house_map, cfg)
    got = likelihood_field_scores_pallas(
        particles, ranges, angles, house_map, cfg, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_blind(house_map, default_config):
    particles = jnp.zeros((4, 3))
    ranges = jnp.full(64, jnp.inf)
    angles = jnp.linspace(-np.pi, np.pi, 64)
    got = likelihood_field_scores_pallas(
        particles, ranges, angles, house_map, default_config, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), -50.0)


def test_pallas_nonmultiple_tile(house_map, default_config):
    # n not a multiple of TILE_N, m not a multiple of 128
    particles, ranges, angles = _case(house_map, default_config, n=513, m=90, seed=2)
    ref = likelihood_field_scores(particles, ranges, angles, house_map, default_config)
    got = likelihood_field_scores_pallas(
        particles, ranges, angles, house_map, default_config, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
