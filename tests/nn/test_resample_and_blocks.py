"""Sparse resample / ConvNeXt / prune / embedding tests (reference tests for
nn/modules/sparse_resample.py, sparse_convnext.py, prune.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.ops.keys import PAD_COORD


def _voxels(rng, b=2, n=64, grid=8, c=8):
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
    return Voxels.create(
        np.stack(coords_list), np.stack(feats_list), np.array(nv), tensor_stride=2
    )


def test_subdivide_and_channel_spatial_roundtrip():
    from warpconvnet_tpu.nn.modules.sparse_resample import (
        SparseChannel2Spatial,
        SparseSpatial2Channel,
        SparseSubdivide,
    )

    rng = np.random.default_rng(0)
    vox = _voxels(rng, c=8)
    sub = SparseSubdivide()
    out = sub.apply(sub.init(jax.random.PRNGKey(0), vox), vox)
    assert out.coords.shape[1] == vox.coords.shape[1] * 8
    assert np.all(np.asarray(out.num_valid) == 8 * np.asarray(vox.num_valid))
    assert out.tensor_stride == (1, 1, 1)

    c2s = SparseChannel2Spatial()
    fine = c2s.apply(c2s.init(jax.random.PRNGKey(0), vox), vox)
    assert fine.features.shape[-1] == 1
    assert fine.coords.shape[1] == 8 * vox.coords.shape[1]

    # Round-trip: spatial2channel on the subdivided set recovers parents.
    s2c = SparseSpatial2Channel(out_capacity=vox.coords.shape[1])
    back = s2c.apply(s2c.init(jax.random.PRNGKey(0), fine), fine)
    assert back.features.shape[-1] == 8
    nv0 = int(vox.num_valid[0])
    assert int(back.num_valid[0]) == nv0
    # Parent coords recovered (possibly re-ordered): compare as sets with
    # feature payloads.
    orig = {
        tuple(c): f
        for c, f in zip(
            np.asarray(vox.coords[0, :nv0]), np.asarray(vox.features[0, :nv0])
        )
    }
    rec = {
        tuple(c): f
        for c, f in zip(
            np.asarray(back.coords[0, :nv0]), np.asarray(back.features[0, :nv0])
        )
    }
    assert set(orig) == set(rec)
    for key in orig:
        np.testing.assert_allclose(sorted(orig[key]), sorted(rec[key]), rtol=1e-6)


def test_convnext_block():
    from warpconvnet_tpu.nn.modules.blocks import SparseConvNeXtBlock

    rng = np.random.default_rng(1)
    vox = _voxels(rng, c=8)
    blk = SparseConvNeXtBlock(channels=8, kernel_size=3)
    params = blk.init(jax.random.PRNGKey(0), vox)
    out = blk.apply(params, vox)
    assert out.features.shape == vox.features.shape
    # layer_scale starts tiny -> output ~ input
    np.testing.assert_allclose(
        np.asarray(out.features), np.asarray(vox.features), atol=1e-3
    )


def test_sparse_prune():
    from warpconvnet_tpu.nn.modules.blocks import SparsePrune

    rng = np.random.default_rng(2)
    vox = _voxels(rng, c=4)
    scores = rng.standard_normal(vox.features.shape[:2]).astype(np.float32)
    keep = jnp.asarray(scores > 0)
    prune = SparsePrune()
    out = prune.apply(prune.init(jax.random.PRNGKey(0), vox, keep), vox, keep)
    nv = np.asarray(out.num_valid)
    expected = np.asarray(keep & np.asarray(vox.valid_mask())).sum(1)
    assert (nv == expected).all()
    # kept rows carry original (coord, feature) pairs
    kept_set = {
        tuple(c)
        for c, k, v in zip(
            np.asarray(vox.coords[0]), np.asarray(keep[0]),
            np.asarray(vox.valid_mask()[0]),
        )
        if k and v
    }
    out_set = {tuple(c) for c in np.asarray(out.coords[0, : nv[0]])}
    assert kept_set == out_set


def test_timestep_embedder():
    from warpconvnet_tpu.nn.modules.embeddings import TimestepEmbedder, timestep_embedding

    t = jnp.asarray([0.0, 10.0, 500.0])
    e = timestep_embedding(t, 64)
    assert e.shape == (3, 64)
    assert not np.allclose(np.asarray(e[0]), np.asarray(e[1]))

    mod = TimestepEmbedder(dim=32)
    params = mod.init(jax.random.PRNGKey(0), t)
    out = mod.apply(params, t)
    assert out.shape == (3, 32)
