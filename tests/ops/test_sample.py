"""FPS + random sampling tests (reference csrc/farthest_point_sampling.cu,
coords/ops/sample.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.ops.sample import farthest_point_sampling, random_sample_indices


def _fps_reference(pts, s):
    """O(S*N) numpy FPS starting from index 0."""
    n = len(pts)
    dist = np.full(n, np.inf)
    idxs = [0]
    for _ in range(1, s):
        d = np.sum((pts - pts[idxs[-1]]) ** 2, axis=-1)
        dist = np.minimum(dist, d)
        idxs.append(int(np.argmax(dist)))
    return np.array(idxs)


def test_fps_matches_reference():
    rng = np.random.default_rng(0)
    b, n, s = 2, 64, 8
    pts = rng.standard_normal((b, n, 3)).astype(np.float32)
    nv = np.array([n, n - 10], np.int32)
    pts[1, n - 10:] = 0.0

    out = np.asarray(farthest_point_sampling(jnp.asarray(pts), jnp.asarray(nv), s))
    for i in range(b):
        ref = _fps_reference(pts[i, : nv[i]], s)
        np.testing.assert_array_equal(out[i], ref)


def test_fps_degenerate_small_scene():
    pts = np.zeros((1, 16, 3), np.float32)
    pts[0, 0] = [1, 0, 0]
    pts[0, 1] = [0, 1, 0]
    nv = np.array([2], np.int32)
    out = np.asarray(farthest_point_sampling(jnp.asarray(pts), jnp.asarray(nv), 5))
    assert set(out[0].tolist()) <= {0, 1}


def test_fps_under_jit_and_spread():
    rng = np.random.default_rng(1)
    pts = rng.uniform(size=(1, 256, 3)).astype(np.float32)
    nv = np.array([256], np.int32)
    f = jax.jit(lambda p, v: farthest_point_sampling(p, v, 16))
    idx = np.asarray(f(jnp.asarray(pts), jnp.asarray(nv)))[0]
    assert len(set(idx.tolist())) == 16  # all distinct
    # FPS picks should be better spread than the first-16 prefix.
    def min_pairwise(p):
        d = np.linalg.norm(p[:, None] - p[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    assert min_pairwise(pts[0, idx]) > min_pairwise(pts[0, :16])


def test_random_sample_indices_valid_and_distinct():
    nv = np.array([50, 10], np.int32)
    idx = np.asarray(
        random_sample_indices(jax.random.PRNGKey(0), jnp.asarray(nv), 64, 20)
    )
    assert (idx[0] < 50).all() and len(set(idx[0].tolist())) == 20
    assert (idx[1] < 10).all()  # wraps with duplicates
