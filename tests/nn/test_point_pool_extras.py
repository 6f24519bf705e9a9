"""point_pool_by_code + global_scale tests (reference point_pool.py:31-370)."""

import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.nn.functional.point_pool import (
    global_scale,
    point_pool_by_code,
)


def _points(rng, b=2, n=32, c=4):
    return Points.create(
        rng.standard_normal((b, n, 3)).astype(np.float32),
        rng.standard_normal((b, n, c)).astype(np.float32),
        np.array([n, n - 5], np.int32),
    )


def test_pool_by_code_means():
    rng = np.random.default_rng(0)
    pts = _points(rng)
    codes = jnp.asarray(rng.integers(0, 5, (2, 32)), jnp.int32)
    res = point_pool_by_code(pts, codes, "mean")
    assert list(np.asarray(res.pooled.num_valid)) == [5, 5]
    # group means match (codes sort ascending -> code c is row c here)
    for code in range(5):
        m = np.asarray(codes[0]) == code
        np.testing.assert_allclose(
            np.asarray(res.pooled.features[0, code]),
            np.asarray(pts.features[0])[m].mean(0),
            rtol=1e-5,
        )
    # scene 1 ignores padding rows
    m = (np.asarray(codes[1]) == 0) & (np.arange(32) < 27)
    np.testing.assert_allclose(
        np.asarray(res.pooled.features[1, 0]),
        np.asarray(pts.features[1])[m].mean(0),
        rtol=1e-5,
    )


def test_global_scale():
    rng = np.random.default_rng(1)
    pts = _points(rng)
    s = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    out = global_scale(pts, s)
    np.testing.assert_allclose(
        np.asarray(out.features[0]),
        np.asarray(pts.features[0]) * np.asarray(s[0]),
        rtol=1e-6,
    )
    assert np.allclose(np.asarray(out.features[1, 27:]), 0)
