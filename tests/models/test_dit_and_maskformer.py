"""Sparse DiT blocks + MaskFormer tests (reference tests/models maskformer +
trellis block suites)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.ops.keys import PAD_COORD


def _voxels(rng, b=2, n=128, grid=10, c=16):
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


def test_sparse_mha_modes():
    from warpconvnet_tpu.nn.modules.sparse_dit import SparseMultiHeadAttention

    rng = np.random.default_rng(0)
    vox = _voxels(rng, c=16)
    for mode, kw in (("full", {}), ("serialized", {"window_size": 64})):
        mod = SparseMultiHeadAttention(dim=16, num_heads=4, mode=mode,
                                       rope_base=100.0, **kw)
        params = mod.init(jax.random.PRNGKey(0), vox)
        out = mod.apply(params, vox)
        assert out.features.shape == vox.features.shape
        f = np.asarray(out.features)
        assert np.isfinite(f).all()
        nv = int(vox.num_valid[1])
        assert np.allclose(f[1, nv:], 0)


def test_modulated_block_gates_zero_at_init():
    """adaLN-zero: at init the gates are zero, so the block is identity."""
    from warpconvnet_tpu.nn.modules.sparse_dit import (
        ModulatedSparseTransformerBlock,
    )

    rng = np.random.default_rng(1)
    vox = _voxels(rng, c=16)
    cond = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    blk = ModulatedSparseTransformerBlock(dim=16, num_heads=4)
    params = blk.init(jax.random.PRNGKey(0), vox, cond)
    out = blk.apply(params, vox, cond)
    np.testing.assert_allclose(
        np.asarray(out.features), np.asarray(vox.features), atol=1e-5
    )


def test_modulated_block_with_cross_attention():
    from warpconvnet_tpu.nn.modules.sparse_dit import (
        ModulatedSparseTransformerBlock,
    )

    rng = np.random.default_rng(2)
    vox = _voxels(rng, c=16)
    cond = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32)
    blk = ModulatedSparseTransformerBlock(
        dim=16, num_heads=4, use_cross_attention=True
    )
    params = blk.init(jax.random.PRNGKey(0), vox, cond, ctx)
    out = blk.apply(params, vox, cond, ctx)
    assert np.isfinite(np.asarray(out.features)).all()


@pytest.mark.slow
def test_maskformer_shapes():
    from warpconvnet_tpu.models.mask_former import MaskFormer

    rng = np.random.default_rng(3)
    vox = _voxels(rng, n=256, grid=16, c=3)
    model = MaskFormer(
        in_channels=3, num_classes=5, num_queries=8, dim=32,
        decoder_layers=2,
        backbone_planes=(8, 16, 32, 64, 64, 32, 16, 16),
    )
    variables = model.init(jax.random.PRNGKey(0), vox, train=False)
    (cls_logits, mask_logits), _ = model.apply(
        variables, vox, train=False, mutable=["batch_stats"]
    )
    assert cls_logits.shape == (2, 8, 6)
    assert mask_logits.shape == (2, 8, 256)
    nv = int(vox.num_valid[0])
    assert (np.asarray(mask_logits)[0, :, nv:] < -1e29).all()
