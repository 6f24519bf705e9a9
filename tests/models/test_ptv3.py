import numpy as np
import pytest
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.models.point_transformer_v3 import PointTransformerV3
from warpconvnet_tpu.ops.keys import PAD_COORD


def _vox(rng, b=2, n=256, grid=20, c=4):
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


@pytest.mark.slow
def test_ptv3_forward_and_grad():
    rng = np.random.default_rng(0)
    vox = _vox(rng)
    model = PointTransformerV3(
        in_channels=4, out_channels=5,
        enc_depths=(1, 1, 1), enc_channels=(16, 16, 32),
        enc_num_head=(2, 2, 4), enc_patch_size=(64, 64, 64),
        dec_depths=(1, 1), dec_channels=(16, 16), dec_num_head=(2, 2),
        dec_patch_size=(64, 64),
    )
    variables = model.init(jax.random.PRNGKey(0), vox, train=False)
    out = model.apply(variables, vox, train=False)
    assert out.features.shape == (2, 256, 5)
    np.testing.assert_array_equal(np.asarray(out.coords), np.asarray(vox.coords))
    nv = int(out.num_valid[0])
    assert np.all(np.asarray(out.features[0, nv:]) == 0)
    assert np.all(np.isfinite(np.asarray(out.features)))

    def loss(p):
        o = model.apply({"params": p, "batch_stats": variables["batch_stats"]},
                        vox, train=True, mutable=["batch_stats"])[0]
        return jnp.sum(o.features ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_ptv3_order_shuffle_traced():
    """Shuffled orders come from a traced rng: same compiled fn, different results."""
    rng = np.random.default_rng(1)
    vox = _vox(rng, b=1, n=128, grid=12)
    model = PointTransformerV3(
        in_channels=4, out_channels=None,
        enc_depths=(1, 1), enc_channels=(16, 16),
        enc_num_head=(2, 2), enc_patch_size=(32, 32),
        dec_depths=(1,), dec_channels=(16,), dec_num_head=(2,),
        dec_patch_size=(32,), shuffle_orders=True,
    )
    variables = model.init(jax.random.PRNGKey(0), vox, train=False)
    f = jax.jit(lambda v, r: model.apply(v, vox, train=False, order_rng=r).features)
    o1 = f(variables, jax.random.PRNGKey(1))
    o2 = f(variables, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(o1)))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
