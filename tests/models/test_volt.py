"""Volt model tests (reference models/volt)."""

import numpy as np
import pytest
import jax

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.ops.keys import PAD_COORD


def _voxels(rng, b=2, n=256, grid=16, c=3):
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


def test_volt_forward():
    from warpconvnet_tpu.models.volt import Volt

    rng = np.random.default_rng(0)
    vox = _voxels(rng)
    model = Volt(
        in_channels=3, out_channels=5, patch_size=4, dim=32, depth=2,
        num_heads=4, stem_dim=16,
    )
    params = model.init(jax.random.PRNGKey(0), vox, train=False)
    out = model.apply(params, vox, train=False)
    assert out.features.shape == (2, 256, 5)
    f = np.asarray(out.features)
    assert np.isfinite(f).all()
    nv = int(vox.num_valid[1])
    assert np.allclose(f[1, nv:], 0)


@pytest.mark.slow
def test_volt_convblock_variant():
    from warpconvnet_tpu.models.volt import Volt

    rng = np.random.default_rng(1)
    vox = _voxels(rng, n=128)
    model = Volt(
        in_channels=3, out_channels=4, patch_size=4, dim=16, depth=2,
        num_heads=2, stem_dim=8, use_conv_blocks=True, conv_every=1,
    )
    params = model.init(jax.random.PRNGKey(0), vox, train=False)
    out = model.apply(params, vox, train=False)
    assert np.isfinite(np.asarray(out.features)).all()


@pytest.mark.slow
def test_volt_variant_family():
    """Every README-table variant builds and runs (tiny scale); the variant
    knobs change the parameter count in the expected direction."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu.models.volt import VOLT_VARIANTS, build_volt
    from warpconvnet_tpu.geometry.voxels import Voxels
    from warpconvnet_tpu.ops.keys import PAD_COORD

    rng = np.random.default_rng(0)
    n = 256
    raw = np.unique(rng.integers(0, 12, (n, 3)).astype(np.int32), axis=0)
    coords = np.full((1, n, 3), PAD_COORD, np.int32)
    coords[0, : len(raw)] = raw
    feats = np.zeros((1, n, 3), np.float32)
    feats[0, : len(raw)] = rng.standard_normal((len(raw), 3))
    vox = Voxels.create(coords, feats, [len(raw)]).replace(lex_sorted=True)

    counts = {}
    for name in ("volt-s", "volt-convattn", "volt-convblock"):
        model = build_volt(name, depth=2, dim=32, num_heads=2, stem_dim=8)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            vox, train=False,
        )
        out = model.apply(params, vox, train=False)
        assert out.features.shape == (1, n, 20)
        counts[name] = sum(
            x.size for x in jax.tree_util.tree_leaves(params["params"])
        )
    assert counts["volt-convattn"] > counts["volt-s"]
    assert counts["volt-convblock"] > counts["volt-s"]
    assert set(VOLT_VARIANTS) == {
        "volt-s", "volt-convattn", "volt-b", "volt-convblock", "volt-all3",
        "volt-blockattn", "volt-b-convblock",
    }
