"""Dense bilateral grid: splat/blur/slice correctness vs naive reference and
solver behavior (reference ``nn/functional/bilateral_grid.py``)."""

import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.nn.functional.bilateral_grid import (
    _corner_offsets,
    bilateral_filter_grid,
    build_bilateral_grid,
    fast_bilateral_solver,
)


def test_splat_slice_roundtrip_constant():
    """Splatting a constant and slicing (normalized) must return it."""
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 10, (200, 3)), jnp.float32)
    f = jnp.full((200, 2), 3.5, jnp.float32)
    out = bilateral_filter_grid(pos, f, sigmas=1.0)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)


def test_filter_matches_naive_bilateral_smoothing():
    """The grid filter approximates a Gaussian bilateral: identical points
    average exactly; distant clusters don't mix."""
    rng = np.random.default_rng(1)
    a = rng.normal(0, 0.01, (50, 3))
    b = rng.normal(100, 0.01, (50, 3))
    pos = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    f = jnp.concatenate(
        [jnp.zeros((50, 1)), jnp.ones((50, 1))], axis=0
    ).astype(jnp.float32)
    out = np.asarray(bilateral_filter_grid(pos, f, sigmas=1.0))
    # Cluster A smooths toward 0, cluster B toward 1, no cross-talk.
    assert np.all(out[:50] < 0.05), out[:50].max()
    assert np.all(out[50:] > 0.95), out[50:].min()


def test_valid_mask_excludes_rows():
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(0, 5, (64, 3)), jnp.float32)
    f = jnp.ones((64, 1), jnp.float32)
    f = f.at[32:].set(1000.0)  # garbage on invalid rows
    valid = jnp.arange(64) < 32
    out = np.asarray(
        bilateral_filter_grid(pos, f, sigmas=0.5, valid=valid)
    )[:32]
    np.testing.assert_allclose(out, 1.0, rtol=1e-4)


def test_corner_weights_partition_of_unity():
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 4, (128, 4)), jnp.float32)
    grid = build_bilateral_grid(pos)
    w = np.asarray(grid.corner_w)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)
    assert _corner_offsets(4).shape == (16, 4)


def test_solver_respects_confidence():
    """High-confidence targets survive; zero-confidence points get smoothed
    toward their neighborhood (Barron & Poole semantics)."""
    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.uniform(0, 2, (100, 3)), jnp.float32)
    target = jnp.ones((100, 1), jnp.float32)
    target = target.at[0].set(50.0)  # outlier with zero confidence
    conf = jnp.ones((100,), jnp.float32).at[0].set(0.0)
    out = np.asarray(
        fast_bilateral_solver(pos, target, conf, sigmas=2.0, lam=1.0)
    )
    assert abs(out[0, 0] - 1.0) < 0.5, out[0, 0]  # pulled to consensus
    assert np.abs(out[1:, 0] - 1.0).max() < 0.2
