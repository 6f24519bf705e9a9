import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.nn.functional import normalizations as F
from warpconvnet_tpu.nn.functional.encodings import sinusoidal_encoding
from warpconvnet_tpu.nn.modules.norms import BatchNorm, LayerNorm, RMSNorm


def _pts(rng, b=2, n=50, c=8):
    return Points.create(
        rng.uniform(0, 1, (b, n, 3)).astype(np.float32),
        rng.standard_normal((b, n, c)).astype(np.float32),
        np.array([40, 30]),
    )


def test_layer_norm_module(rng):
    pts = _pts(rng)
    m = LayerNorm(8)
    params = m.init(jax.random.PRNGKey(0), pts)
    out = m.apply(params, pts)
    f = np.asarray(out.features[0, :40])
    np.testing.assert_allclose(f.mean(-1), 0, atol=1e-5)
    np.testing.assert_allclose(f.std(-1), 1, atol=1e-3)
    assert np.all(np.asarray(out.features[0, 40:]) == 0)


def test_batch_norm_masked_stats(rng):
    pts = _pts(rng)
    m = BatchNorm(8)
    variables = m.init(jax.random.PRNGKey(0), pts)
    out, updates = m.apply(variables, pts, mutable=["batch_stats"])
    # Normalized over valid rows only: overall masked mean ~0, var ~1
    f0 = np.asarray(out.features[0, :40])
    f1 = np.asarray(out.features[1, :30])
    allf = np.concatenate([f0, f1])
    np.testing.assert_allclose(allf.mean(0), 0, atol=1e-4)
    np.testing.assert_allclose(allf.var(0), 1, atol=1e-2)
    # Padding rows don't leak into stats: running mean equals masked mean.
    x = np.concatenate(
        [np.asarray(pts.features[0, :40]), np.asarray(pts.features[1, :30])]
    )
    got_mean = np.asarray(updates["batch_stats"]["mean"])
    np.testing.assert_allclose(got_mean, 0.1 * x.mean(0), rtol=1e-4, atol=1e-5)


def test_segmented_range_norm(rng):
    pts = _pts(rng)
    out = F.segmented_range_norm(pts.features, pts.valid_mask())
    f = np.asarray(out[0, :40])
    np.testing.assert_allclose(f.min(0), 0, atol=1e-5)
    np.testing.assert_allclose(f.max(0), 1, atol=1e-3)


def test_sinusoidal_encoding_shape():
    x = jnp.ones((2, 5, 3))
    enc = sinusoidal_encoding(x, 8)
    assert enc.shape == (2, 5, 24)
    enc2 = sinusoidal_encoding(x, 8, concat_input=True)
    assert enc2.shape == (2, 5, 27)
