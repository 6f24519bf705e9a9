import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.grid import GRID_MEMORY_FORMATS, FactorGrid, Grid
from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.geometry.conversions import (
    grid_sample_points,
    points_to_factor_grid,
    points_to_grid,
    voxels_to_grid,
)
from warpconvnet_tpu.nn.functional.fp8_utils import dequantize_fp8, quantize_fp8
from warpconvnet_tpu.nn.functional.pixel_shuffle import (

    pixel_shuffle_3d,
    pixel_unshuffle_3d,
)

pytestmark = pytest.mark.smoke  # pre-commit smoke tier (tests/README.md)


@pytest.mark.parametrize("fmt", GRID_MEMORY_FORMATS)
def test_memory_format_roundtrip(fmt, rng):
    g = Grid.from_shape((4, 5, 6), 3, batch_size=2)
    feats = rng.standard_normal(g.features.shape).astype(np.float32)
    g = g.replace_features(jnp.asarray(feats))
    g2 = g.to_memory_format(fmt).to_memory_format("b_x_y_z_c")
    np.testing.assert_allclose(np.asarray(g2.features), feats, rtol=1e-6)


def test_points_to_grid_mean(rng):
    pts = Points.create(
        rng.uniform(0, 1, (1, 100, 3)).astype(np.float32),
        rng.standard_normal((1, 100, 2)).astype(np.float32),
        np.array([100]),
    )
    bounds = jnp.asarray([[[0, 0, 0], [1, 1, 1]]], jnp.float32)
    g = points_to_grid(pts, (2, 2, 2), bounds=bounds)
    # Manual: mean of points per octant.
    c = np.asarray(pts.coords[0])
    f = np.asarray(pts.features[0])
    ijk = np.floor(c * 2).astype(int).clip(0, 1)
    for i in range(2):
        for j in range(2):
            for k in range(2):
                sel = (ijk == [i, j, k]).all(1)
                if sel.any():
                    np.testing.assert_allclose(
                        np.asarray(g.features[0, i, j, k]), f[sel].mean(0), rtol=1e-4
                    )


def test_grid_sample_points_constant():
    """Sampling a constant grid returns the constant everywhere."""
    g = Grid.from_shape((4, 4, 4), 2, batch_size=1)
    g = g.replace_features(jnp.ones_like(g.features) * 3.0)
    pts = Points.create(
        np.random.default_rng(0).uniform(0.1, 0.9, (1, 50, 3)).astype(np.float32),
        np.zeros((1, 50, 1), np.float32),
        np.array([50]),
    )
    out = grid_sample_points(g, pts)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)


def test_factor_grid_create(rng):
    fg = FactorGrid.create([(16, 16, 2), (16, 2, 16), (2, 16, 16)], 4, batch_size=2)
    assert len(fg) == 3
    assert fg[0].memory_format == "b_zc_x_y"
    assert fg[0].features.shape == (2, 2 * 4, 16, 16)
    # pytree flatten works (list is a pytree)
    leaves = jax.tree_util.tree_leaves(fg)
    assert len(leaves) > 0


def test_points_to_factor_grid(rng):
    pts = Points.create(
        rng.uniform(0, 1, (2, 64, 3)).astype(np.float32),
        rng.standard_normal((2, 64, 4)).astype(np.float32),
        np.array([64, 60]),
    )
    bounds = jnp.tile(jnp.asarray([[[0, 0, 0], [1, 1, 1]]], jnp.float32), (2, 1, 1))
    fg = points_to_factor_grid(pts, [(8, 8, 2), (2, 8, 8)], bounds=bounds)
    assert len(fg) == 2
    assert np.all(np.isfinite(np.asarray(fg[0].features)))


def test_fp8_roundtrip(rng):
    x = rng.standard_normal((32, 16)).astype(np.float32)
    q, s = quantize_fp8(jnp.asarray(x), "e4m3")
    back = dequantize_fp8(q, s)
    rel = np.abs(np.asarray(back) - x).max() / np.abs(x).max()
    assert rel < 0.1


def test_pixel_shuffle_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 3, 4, 5)).astype(np.float32))
    y = pixel_shuffle_3d(x, 2)
    assert y.shape == (2, 2, 6, 8, 10)
    back = pixel_unshuffle_3d(y, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
