"""Permutohedral filter invariants (reference tests for
nn/functional/permutohedral.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from warpconvnet_tpu.nn.functional.permutohedral import permutohedral_filter


def test_constant_signal_preserved():
    rng = np.random.default_rng(0)
    n, d = 200, 3
    pos = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    vals = jnp.ones((n, 2), jnp.float32) * jnp.asarray([3.0, -1.5])
    out = permutohedral_filter(vals, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vals), rtol=1e-3)


def test_smoothing_reduces_noise_preserves_clusters():
    rng = np.random.default_rng(1)
    n = 300
    # Two clusters in 2D feature space with distinct values + noise.
    pos = np.concatenate(
        [rng.normal(0, 0.3, (n // 2, 2)), rng.normal(8, 0.3, (n // 2, 2))]
    ).astype(np.float32)
    base = np.concatenate([np.zeros(n // 2), np.ones(n // 2)])
    noisy = (base + rng.normal(0, 0.2, n)).astype(np.float32)[:, None]
    out = np.asarray(
        permutohedral_filter(jnp.asarray(noisy), jnp.asarray(pos))
    )[:, 0]
    assert out[: n // 2].std() < noisy[: n // 2, 0].std() * 0.8
    assert abs(out[: n // 2].mean() - 0.0) < 0.1
    assert abs(out[n // 2 :].mean() - 1.0) < 0.1


@pytest.mark.slow
def test_valid_mask_and_jit():
    rng = np.random.default_rng(2)
    n, d = 64, 4
    pos = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    valid = jnp.asarray(np.arange(n) < 50)

    f = jax.jit(lambda v, p, m: permutohedral_filter(v, p, m))
    out = np.asarray(f(vals, pos, valid))
    assert np.isfinite(out).all()
    assert np.allclose(out[50:], 0)
    # invalid rows do not influence valid ones: recompute without them
    out2 = np.asarray(
        permutohedral_filter(vals[:50], pos[:50])
    )
    np.testing.assert_allclose(out[:50], out2, rtol=1e-3, atol=1e-4)
