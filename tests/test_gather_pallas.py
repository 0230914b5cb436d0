"""MXU gather kernel: exactness vs plain indexing (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmh_localization_tpu.ops.gather_pallas import (
    gather_2d,
    gather_3d,
    gather_rows_lanes,
)


@pytest.mark.parametrize("r,n", [(128, 8192), (384, 8192), (1000, 20000)])
def test_gather_rows_lanes_matches(r, n):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(r, 128)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, r, n).astype(np.int32))
    lanes = jnp.asarray(rng.integers(0, 128, n).astype(np.int32))
    out = np.asarray(
        gather_rows_lanes(table, rows, lanes, interpret=True)
    )
    ref = np.asarray(table)[np.asarray(rows), np.asarray(lanes)]
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_gather_split_precision_large_values():
    # corr-field magnitudes: |v| up to 1e4 — raw bf16 would err by O(30);
    # the hi+lo split must stay within ~1e-3 relative
    rng = np.random.default_rng(1)
    table = jnp.asarray(
        (rng.normal(size=(256, 128)) * 4000.0).astype(np.float32)
    )
    rows = jnp.asarray(rng.integers(0, 256, 8192).astype(np.int32))
    lanes = jnp.asarray(rng.integers(0, 128, 8192).astype(np.int32))
    out = np.asarray(gather_rows_lanes(table, rows, lanes, interpret=True))
    ref = np.asarray(table)[np.asarray(rows), np.asarray(lanes)]
    err = np.abs(out - ref) / np.maximum(np.abs(ref), 1.0)
    assert err.max() < 2e-3, err.max()


def test_gather_2d_wide_table():
    # W > 128 folds column chunks into rows
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(192, 384)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 192, 9000).astype(np.int32))
    x = jnp.asarray(rng.integers(0, 384, 9000).astype(np.int32))
    out = np.asarray(gather_2d(table, y, x, interpret=True))
    ref = np.asarray(table)[np.asarray(y), np.asarray(x)]
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_gather_3d_matches():
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(16, 64, 96)).astype(np.float32))
    k = jnp.asarray(rng.integers(0, 16, 8192).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 64, 8192).astype(np.int32))
    x = jnp.asarray(rng.integers(0, 96, 8192).astype(np.int32))
    out = np.asarray(gather_3d(table, k, y, x, interpret=True))
    ref = np.asarray(table)[np.asarray(k), np.asarray(y), np.asarray(x)]
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_gather_cpu_fallback_exact():
    # below crossover / on CPU: XLA take, bit-exact
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.normal(size=(64, 80)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 64, 500).astype(np.int32))
    x = jnp.asarray(rng.integers(0, 80, 500).astype(np.int32))
    out = np.asarray(gather_2d(table, y, x))
    ref = np.asarray(table)[np.asarray(y), np.asarray(x)]
    np.testing.assert_array_equal(out, ref)


def test_gather_clustered_rows_exact():
    # clustered indices exercise the dynamic chunk-window path
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.normal(size=(2048, 128)).astype(np.float32))
    rows = jnp.asarray(rng.integers(700, 760, 8192).astype(np.int32))
    lanes = jnp.asarray(rng.integers(0, 128, 8192).astype(np.int32))
    out = np.asarray(gather_rows_lanes(table, rows, lanes, interpret=True))
    ref = np.asarray(table)[np.asarray(rows), np.asarray(lanes)]
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_gather_2d_select_interpret():
    from mcmh_localization_tpu.ops.gather_pallas import gather_2d_select

    rng = np.random.default_rng(6)
    ta = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    tb = jnp.asarray(rng.normal(size=(40, 200)).astype(np.float32))
    n = 8192
    ya = jnp.asarray(rng.integers(0, 64, n).astype(np.int32))
    xa = jnp.asarray(rng.integers(0, 96, n).astype(np.int32))
    yb = jnp.asarray(rng.integers(0, 40, n).astype(np.int32))
    xb = jnp.asarray(rng.integers(0, 200, n).astype(np.int32))
    use_a = jnp.asarray(rng.random(n) < 0.7)
    out = np.asarray(
        gather_2d_select(ta, ya, xa, tb, yb, xb, use_a, interpret=True)
    )
    ref = np.where(
        np.asarray(use_a),
        np.asarray(ta)[np.asarray(ya), np.asarray(xa)],
        np.asarray(tb)[np.asarray(yb), np.asarray(xb)],
    )
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_gather_2d_select_cpu_fallback_exact():
    from mcmh_localization_tpu.ops.gather_pallas import gather_2d_select

    rng = np.random.default_rng(7)
    ta = jnp.asarray(rng.normal(size=(16, 20)).astype(np.float32))
    tb = jnp.asarray(rng.normal(size=(8, 300)).astype(np.float32))
    n = 700
    ya = jnp.asarray(rng.integers(0, 16, n).astype(np.int32))
    xa = jnp.asarray(rng.integers(0, 20, n).astype(np.int32))
    yb = jnp.asarray(rng.integers(0, 8, n).astype(np.int32))
    xb = jnp.asarray(rng.integers(0, 300, n).astype(np.int32))
    use_a = jnp.asarray(rng.random(n) < 0.5)
    out = np.asarray(gather_2d_select(ta, ya, xa, tb, yb, xb, use_a))
    ref = np.where(
        np.asarray(use_a),
        np.asarray(ta)[np.asarray(ya), np.asarray(xa)],
        np.asarray(tb)[np.asarray(yb), np.asarray(xb)],
    )
    np.testing.assert_array_equal(out, ref)
