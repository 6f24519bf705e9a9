import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.attention import (
    apply_rope,
    masked_sdpa,
    rope_3d_phases,
)
from warpconvnet_tpu.nn.modules.attention import (
    Attention,
    PatchAttention,
    SpatialFeatureAttention,
    TransformerBlock,
)
from warpconvnet_tpu.ops.keys import PAD_COORD


def test_masked_sdpa_matches_manual(rng):
    b, s, h, d = 2, 16, 2, 8
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    valid = np.zeros((b, s), bool)
    valid[0, :10] = True
    valid[1, :16] = True
    out = masked_sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      jnp.asarray(valid), jnp.asarray(valid))
    # Manual reference on valid region of scene 0.
    qs, ks, vs = q[0, :10], k[0, :10], v[0, :10]
    logits = np.einsum("qhd,khd->hqk", qs, ks) / np.sqrt(d)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("hqk,khd->qhd", probs, vs)
    np.testing.assert_allclose(np.asarray(out[0, :10]), want, rtol=1e-4, atol=1e-5)
    # Padded rows zero.
    assert np.all(np.asarray(out[0, 10:]) == 0)


def test_rope_preserves_norm_and_relativity(rng):
    coords = jnp.asarray(rng.integers(0, 50, (4, 3)).astype(np.int32))
    cos, sin = rope_3d_phases(coords, head_dim=12)
    x = jnp.asarray(rng.standard_normal((4, 12)).astype(np.float32))
    r = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # Relative property: <R(c1)x, R(c2)y> depends only on c1 - c2.
    c1 = jnp.asarray([[10, 20, 30]], jnp.int32)
    c2 = jnp.asarray([[12, 19, 33]], jnp.int32)
    shift = jnp.asarray([[5, 5, 5]], jnp.int32)
    y = jnp.asarray(rng.standard_normal((1, 12)).astype(np.float32))
    xx = jnp.asarray(rng.standard_normal((1, 12)).astype(np.float32))

    def dot(a, ca, bvec, cb):
        cosa, sina = rope_3d_phases(ca, 12)
        cosb, sinb = rope_3d_phases(cb, 12)
        return float(jnp.sum(apply_rope(a, cosa, sina) * apply_rope(bvec, cosb, sinb)))

    d1 = dot(xx, c1, y, c2)
    d2 = dot(xx, c1 + shift, y, c2 + shift)
    assert abs(d1 - d2) < 1e-3


def _vox(rng, b=2, n=64, grid=8, c=16):
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


def test_patch_attention_runs_and_masks(rng):
    vox = _vox(rng, n=64, c=16)
    m = PatchAttention(dim=16, patch_size=16, num_heads=4, rope_base=100.0)
    params = m.init(jax.random.PRNGKey(0), vox)
    out = m.apply(params, vox)
    assert out.features.shape == vox.features.shape
    nv = int(vox.num_valid[0])
    assert np.all(np.asarray(out.features[0, nv:]) == 0)
    assert np.all(np.isfinite(np.asarray(out.features)))
    # Different orderings give different results (serialization matters).
    out2 = m.apply(params, vox, order="zyx")
    assert not np.allclose(np.asarray(out.features[0, :nv]),
                           np.asarray(out2.features[0, :nv]))


def test_spatial_feature_attention(rng):
    vox = _vox(rng, n=32, c=16)
    m = SpatialFeatureAttention(dim=16, num_heads=4, use_encoding=True)
    params = m.init(jax.random.PRNGKey(0), vox)
    out = m.apply(params, vox)
    assert out.features.shape == vox.features.shape
    assert np.all(np.isfinite(np.asarray(out.features)))


def test_transformer_block_grads(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    valid = jnp.asarray(np.arange(32)[None, :] < np.array([[20], [32]]))
    m = TransformerBlock(dim=16, num_heads=4)
    params = m.init(jax.random.PRNGKey(0), x, valid)

    def loss(p):
        return jnp.sum(m.apply(p, x, valid) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))
