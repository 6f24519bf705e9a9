import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_pool import (
    global_pool,
    sparse_max_pool,
    sparse_unpool,
)
from warpconvnet_tpu.nn.functional.point_pool import point_pool, point_unpool
from warpconvnet_tpu.nn.modules.point_conv import PointConv
from warpconvnet_tpu.ops.search import (
    RealSearchConfig,
    batched_knn_search,
    batched_radius_search,
)
from warpconvnet_tpu.ops.keys import PAD_COORD


def _points(rng, b=2, n=200, c=4):
    coords = rng.uniform(0, 1, size=(b, n, 3)).astype(np.float32)
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    nv = np.array([n - 20, n - 50], np.int32)[:b]
    return Points.create(coords, feats, nv)


def test_knn_matches_bruteforce(rng):
    pts = _points(rng)
    res = batched_knn_search(pts.coords, pts.coords, pts.num_valid, pts.num_valid, k=5)
    b = 0
    nv = int(pts.num_valid[b])
    q = np.asarray(pts.coords[b, :nv])
    d = ((q[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    ref_idx = np.argsort(d, axis=1)[:, :5]
    got = np.asarray(res.indices[b, :nv])
    # Compare distance sets (ties make index comparison flaky).
    np.testing.assert_allclose(
        np.sort(np.take_along_axis(d, got, 1), axis=1),
        np.sort(np.take_along_axis(d, ref_idx, 1), axis=1),
        rtol=1e-4, atol=1e-5,
    )
    assert np.all(np.asarray(res.mask[b, :nv]))
    # Padded queries have empty masks.
    assert not np.any(np.asarray(res.mask[b, nv:]))


def test_radius_caps_and_filters(rng):
    pts = _points(rng)
    res = batched_radius_search(
        pts.coords, pts.coords, pts.num_valid, pts.num_valid, radius=0.1, max_neighbors=8
    )
    b, nv = 0, int(pts.num_valid[0])
    c = np.asarray(pts.coords[b])
    idx, mask = np.asarray(res.indices[b]), np.asarray(res.mask[b])
    for i in range(0, nv, 17):
        d = np.linalg.norm(c[idx[i][mask[i]]] - c[i], axis=-1)
        assert np.all(d <= 0.1 + 1e-6)


def test_sparse_max_pool_and_unpool(rng):
    n = 128
    raw = np.unique(rng.integers(0, 10, size=(n, 3)).astype(np.int32), axis=0)
    nv = len(raw)
    cp = np.full((1, n, 3), PAD_COORD, np.int32)
    cp[0, :nv] = raw
    f = np.zeros((1, n, 2), np.float32)
    f[0, :nv] = rng.standard_normal((nv, 2))
    vox = Voxels.create(cp, f, [nv])

    pooled, table = sparse_max_pool(vox, kernel_size=2, stride=2)
    # Every pooled output = max over its covered inputs.
    pc = np.asarray(pooled.coords[0, : int(pooled.num_valid[0])])
    for o, oc in enumerate(pc.tolist()):
        members = [
            i for i in range(nv)
            if np.array_equal(np.asarray(raw[i]) // 2, oc)
        ]
        want = np.max(f[0, members], axis=0)
        np.testing.assert_allclose(np.asarray(pooled.features[0, o]), want, rtol=1e-6)

    unpooled = sparse_unpool(pooled, vox, table)
    # Each fine voxel receives its parent's pooled feature.
    for i in range(nv):
        parent = np.asarray(raw[i]) // 2
        o = next(j for j, oc in enumerate(pc.tolist()) if np.array_equal(oc, parent))
        np.testing.assert_allclose(
            np.asarray(unpooled.features[0, i]), np.asarray(pooled.features[0, o])
        )


def test_global_pool(rng):
    pts = _points(rng)
    out = global_pool(pts, "mean")
    b, nv = 0, int(pts.num_valid[0])
    want = np.asarray(pts.features[b, :nv]).mean(0)
    np.testing.assert_allclose(np.asarray(out[b]), want, rtol=1e-5, atol=1e-6)
    out_max = global_pool(pts, "max")
    np.testing.assert_allclose(
        np.asarray(out_max[b]), np.asarray(pts.features[b, :nv]).max(0), rtol=1e-6
    )


def test_point_pool_unpool_roundtrip(rng):
    pts = _points(rng)
    pooled, to_unique = point_pool(pts, voxel_size=0.2, reduction="mean", max_out=128)
    up = point_unpool(pooled.features, pts, to_unique)
    b, nv = 0, int(pts.num_valid[0])
    # Each point receives its cell's mean feature.
    ic = np.floor(np.asarray(pts.coords[b, :nv]) / 0.2).astype(np.int32)
    pf = np.asarray(pooled.features[b])
    pcn = int(pooled.num_valid[b])
    cells = np.asarray(pooled.coords[b, :pcn]) if hasattr(pooled, "coords") else None
    got = np.asarray(up.features[b, :nv])
    tu = np.asarray(to_unique[b, :nv])
    np.testing.assert_allclose(got, pf[tu], rtol=1e-6)


def test_point_conv_runs_and_grads(rng):
    pts = _points(rng, b=2, n=128, c=4)
    model = PointConv(4, 8, RealSearchConfig("knn", knn_k=4))
    params = model.init(jax.random.PRNGKey(0), pts)
    out = model.apply(params, pts)
    assert out.features.shape == (2, 128, 8)

    def loss(p):
        return jnp.sum(model.apply(p, pts).features ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(np.any(np.asarray(x) != 0) for x in flat)
