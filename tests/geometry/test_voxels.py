import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.ops.keys import PAD_COORD
import pytest

pytestmark = pytest.mark.smoke  # pre-commit smoke tier (tests/README.md)



def _vox(rng, b=2, n=64, grid=6, c=3):
    coords, feats, nv = [], [], []
    for _ in range(b):
        raw = np.unique(rng.integers(0, grid, size=(n, 3)).astype(np.int32), axis=0)
        nv.append(len(raw))
        cp = np.full((n, 3), PAD_COORD, np.int32)
        cp[: len(raw)] = raw
        f = np.zeros((n, c), np.float32)
        f[: len(raw)] = rng.standard_normal((len(raw), c))
        coords.append(cp)
        feats.append(f)
    return Voxels.create(np.stack(coords), np.stack(feats), np.array(nv))


def test_to_dense_from_dense_roundtrip(rng):
    vox = _vox(rng)
    dense = vox.to_dense((6, 6, 6), channel_last=True)
    back = Voxels.from_dense(dense, max_out=64, channel_last=True)
    for b in range(2):
        nv, nv2 = int(vox.num_valid[b]), int(back.num_valid[b])
        # from_dense recovers cells with any nonzero feature.
        orig = {tuple(r) for r in np.asarray(vox.coords[b, :nv]).tolist()}
        got = {tuple(r) for r in np.asarray(back.coords[b, :nv2]).tolist()}
        assert got <= orig
        # features round-trip for recovered cells
        fmap = {
            tuple(c): f
            for c, f in zip(
                np.asarray(vox.coords[b, :nv]).tolist(), np.asarray(vox.features[b, :nv])
            )
        }
        for cell, f in zip(
            np.asarray(back.coords[b, :nv2]).tolist(), np.asarray(back.features[b, :nv2])
        ):
            np.testing.assert_allclose(f, fmap[tuple(cell)], rtol=1e-6)


def test_voxels_sort_preserves_set(rng):
    vox = _vox(rng)
    s = vox.sort()
    for b in range(2):
        nv = int(vox.num_valid[b])
        a = {tuple(r) for r in np.asarray(vox.coords[b, :nv]).tolist()}
        bb = {tuple(r) for r in np.asarray(s.coords[b, :nv]).tolist()}
        assert a == bb


def test_voxels_pytree():
    rng = np.random.default_rng(0)
    vox = _vox(rng)
    leaves, treedef = jax.tree_util.tree_flatten(vox)
    vox2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert vox2.voxel_size == vox.voxel_size
    out = jax.jit(lambda v: v.replace_features(v.features * 2))(vox)
    np.testing.assert_allclose(np.asarray(out.features), np.asarray(vox.features) * 2)


def test_points_voxel_downsample(rng):
    pts = Points.create(
        rng.uniform(0, 1, (2, 100, 3)).astype(np.float32),
        rng.standard_normal((2, 100, 4)).astype(np.float32),
        np.array([90, 80]),
    )
    down = pts.voxel_downsample(0.25, max_out=64)
    for b in range(2):
        nv = int(pts.num_valid[b])
        cells = np.unique(
            np.floor(np.asarray(pts.coords[b, :nv]) / 0.25).astype(np.int32), axis=0
        )
        assert int(down.num_valid[b]) == len(cells)


def test_arithmetic_ops(rng):
    vox = _vox(rng)
    out = (vox + 1.0) * 2.0
    np.testing.assert_allclose(
        np.asarray(out.features), (np.asarray(vox.features) + 1) * 2
    )
    out2 = vox + vox
    np.testing.assert_allclose(np.asarray(out2.features), np.asarray(vox.features) * 2)
