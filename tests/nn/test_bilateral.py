"""Bilateral filter tests (reference tests for nn/functional/bilateral.py,
bilateral_grid.py)."""

import numpy as np
import jax.numpy as jnp

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.nn.functional.bilateral import (
    grid_bilateral_filter,
    point_bilateral_filter,
)


def test_point_bilateral_smooths_but_preserves_edges():
    rng = np.random.default_rng(0)
    n = 256
    # Two clusters far apart with distinct feature levels + noise.
    c1 = rng.uniform(0, 1, (n // 2, 3))
    c2 = rng.uniform(10, 11, (n // 2, 3))
    coords = np.concatenate([c1, c2]).astype(np.float32)[None]
    f = np.concatenate(
        [np.zeros(n // 2), np.ones(n // 2)]
    ).astype(np.float32)[None, :, None]
    noise = rng.normal(0, 0.05, f.shape).astype(np.float32)
    pts = Points.create(coords, f + noise, np.array([n], np.int32))

    out = point_bilateral_filter(pts, sigma_spatial=0.5, sigma_range=0.5, k=8)
    of = np.asarray(out.features)[0, :, 0]
    # Noise reduced within clusters...
    assert of[: n // 2].std() < noise[0, : n // 2, 0].std()
    # ...but the edge (cluster means) preserved.
    assert abs(of[: n // 2].mean() - 0.0) < 0.05
    assert abs(of[n // 2:].mean() - 1.0) < 0.05


def test_grid_bilateral_edge_preserving():
    rng = np.random.default_rng(1)
    img = np.zeros((1, 16, 16, 1), np.float32)
    img[:, :, 8:] = 1.0
    noisy = img + rng.normal(0, 0.1, img.shape).astype(np.float32)
    out = np.asarray(
        grid_bilateral_filter(
            jnp.asarray(noisy), jnp.asarray(noisy), sigma_spatial=2.0,
            sigma_range=0.3, half_window=2,
        )
    )
    assert out.shape == img.shape
    # smoother than input within each side
    assert out[0, :, :6].std() < noisy[0, :, :6].std()
    # step preserved
    assert out[0, :, 10:].mean() - out[0, :, :6].mean() > 0.8
