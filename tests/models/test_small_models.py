"""PointNet / DGCNN / FCGF / SpaCeFormer model smoke + gradient tests
(reference tests/models/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.ops.keys import PAD_COORD


def _points(rng, b=2, n=128, c=3):
    coords = rng.standard_normal((b, n, 3)).astype(np.float32)
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    nv = np.array([n, n - 20], np.int32)
    return Points.create(coords, feats, nv)


def _voxels(rng, b=2, n=128, grid=12, c=1):
    coords_list, feats_list, nv = [], [], []
    for _ in range(b):
        raw = rng.integers(0, grid, size=(n, 3)).astype(np.int32)
        uniq = np.unique(raw, axis=0)
        nv.append(len(uniq))
        cpad = np.full((n, 3), PAD_COORD, np.int32)
        cpad[: len(uniq)] = uniq
        f = np.zeros((n, c), np.float32)
        f[: len(uniq)] = rng.standard_normal((len(uniq), c))
        coords_list.append(cpad)
        feats_list.append(f)
    return Voxels.create(np.stack(coords_list), np.stack(feats_list), np.array(nv))


def test_pointnet_forward_and_grad():
    from warpconvnet_tpu.models.pointnet import PointNet

    rng = np.random.default_rng(0)
    pts = _points(rng)
    model = PointNet(num_classes=10, dims=(32, 64), head_dims=(32,))
    params = model.init(jax.random.PRNGKey(0), pts, train=False)
    logits = model.apply(params, pts, train=False)
    assert logits.shape == (2, 10)

    def loss(p):
        return jnp.sum(model.apply(p, pts, train=False) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_pointnet_seg_shapes():
    from warpconvnet_tpu.models.pointnet import PointNetSeg

    rng = np.random.default_rng(1)
    pts = _points(rng)
    model = PointNetSeg(num_classes=13, dims=(16, 32))
    params = model.init(jax.random.PRNGKey(0), pts, train=False)
    out = model.apply(params, pts, train=False)
    assert out.shape == (2, 128, 13)


def test_dgcnn_forward():
    from warpconvnet_tpu.models.dgcnn import DGCNN

    rng = np.random.default_rng(2)
    pts = _points(rng, n=64)
    model = DGCNN(num_classes=10, k=8, dims=(16, 32), emb_dim=64)
    params = model.init(jax.random.PRNGKey(0), pts, train=False)
    logits = model.apply(params, pts, train=False)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_fcgf_resunet_normalized_output():
    from warpconvnet_tpu.models.fcgf import ResUNet2

    rng = np.random.default_rng(3)
    vox = _voxels(rng, n=256, grid=16)
    model = ResUNet2(in_channels=1, out_channels=16, channels=(8, 16, 32, 64))
    variables = model.init(jax.random.PRNGKey(0), vox, train=False)
    out = model.apply(variables, vox, train=False,
                      mutable=["batch_stats"])[0]
    f = np.asarray(out.features)
    nv = np.asarray(out.num_valid)
    norms = np.linalg.norm(f[0, : nv[0]], axis=-1)
    # Rows can be ReLU-dead at init (all-zero features normalize to 0);
    # every other row must be unit-norm.
    live = norms > 1e-6
    assert live.mean() > 0.9
    np.testing.assert_allclose(norms[live], 1.0, atol=1e-4)
    assert np.allclose(f[0, nv[0]:], 0)
