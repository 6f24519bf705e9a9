"""Window attention exactness: the banded-tile scheme must equal brute-force
same-window masked attention (the reference's per-window varlen flash
semantics, nn/modules/space_attention.py SpaceAttention)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.attention import masked_sdpa
from warpconvnet_tpu.nn.functional.window_attention import (
    window_attention,
    window_partition,
)
from warpconvnet_tpu.ops.keys import PAD_COORD


def _make_coords(rng, b, n, grid):
    coords_list, nv = [], []
    for _ in range(b):
        k = rng.integers(n // 2, n - 4)
        raw = rng.integers(0, grid, size=(k, 3)).astype(np.int32)
        uniq = np.unique(raw, axis=0)
        nv.append(len(uniq))
        cpad = np.full((n, 3), PAD_COORD, np.int32)
        cpad[: len(uniq)] = uniq
        coords_list.append(cpad)
    return np.stack(coords_list), np.array(nv, np.int32)


@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
def test_banded_window_attention_matches_bruteforce(shift):
    rng = np.random.default_rng(0)
    b, n, h, d = 2, 256, 2, 8
    ws = (4, 4, 4)  # occupancy <= 64 <= tile 128
    coords, nv = _make_coords(rng, b, n, grid=16)
    q = rng.standard_normal((b, n, h, d)).astype(np.float32)
    k = rng.standard_normal((b, n, h, d)).astype(np.float32)
    v = rng.standard_normal((b, n, h, d)).astype(np.float32)

    perm, inv, wcoords = window_partition(
        jnp.asarray(coords), jnp.asarray(nv), ws, shift
    )
    perm_np = np.asarray(perm)

    def permute(x):
        return jnp.take_along_axis(jnp.asarray(x), perm[..., None, None], axis=1)

    qs, ks, vs = permute(q), permute(k), permute(v)
    row_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n), 1) < jnp.asarray(nv)[:, None]
    )

    out_banded = window_attention(qs, ks, vs, wcoords, row_valid, tile=128)

    # Brute force: full NxN attention with same-window pair mask.
    wc = np.asarray(wcoords)
    pair = (wc[:, :, None, :] == wc[:, None, :, :]).all(-1)
    out_full = masked_sdpa(
        qs, ks, vs, row_valid, row_valid, jnp.asarray(pair)
    )
    np.testing.assert_allclose(
        np.asarray(out_banded), np.asarray(out_full), rtol=2e-5, atol=2e-5
    )
    # Sanity: windows must be contiguous after the sort (packing argument).
    for i in range(b):
        codes = [tuple(c) for c in wc[i, : nv[i]]]
        seen = set()
        prev = None
        for c in codes:
            if c != prev:
                assert c not in seen, "window rows not contiguous"
                seen.add(c)
                prev = c


def test_space_attention_module_and_blocks():
    from warpconvnet_tpu.nn.modules.space_attention import (
        AllAttention,
        SpaCeFormerBlock,
        SpaceAttention,
    )

    rng = np.random.default_rng(1)
    b, n, c = 2, 256, 32
    coords, nv = _make_coords(rng, b, n, grid=16)
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    for i in range(b):
        feats[i, nv[i]:] = 0
    vox = Voxels.create(coords, feats, nv)

    mod = SpaceAttention(dim=c, window_size=4, num_heads=4)
    params = mod.init(jax.random.PRNGKey(0), vox)
    out = mod.apply(params, vox)
    assert out.features.shape == (b, n, c)
    assert np.all(np.isfinite(np.asarray(out.features)))
    # padding rows stay zero
    assert np.allclose(np.asarray(out.features[1, nv[1]:]), 0)

    blk = SpaCeFormerBlock(dim=c, num_heads=4, mode="curve", patch_size=64)
    params = blk.init(jax.random.PRNGKey(1), vox)
    out = blk.apply(params, vox)
    assert out.features.shape == (b, n, c)

    alla = AllAttention(dim=c, num_heads=4, rope_base=100.0)
    params = alla.init(jax.random.PRNGKey(2), vox)
    out = alla.apply(params, vox)
    assert out.features.shape == (b, n, c)


@pytest.mark.slow
def test_spaceformer_model_smoke():
    from warpconvnet_tpu.models.space_former import SpaCeFormer

    rng = np.random.default_rng(2)
    b, n, cin, ncls = 2, 256, 4, 5
    coords, nv = _make_coords(rng, b, n, grid=32)
    feats = rng.standard_normal((b, n, cin)).astype(np.float32)
    vox = Voxels.create(coords, feats, nv)

    model = SpaCeFormer(
        in_channels=cin,
        out_channels=ncls,
        dims=(16, 32),
        depths=(2, 2),
        num_heads=(2, 4),
        dec_depths=(1,),
        window_size=4,
        patch_size=128,
        tile=128,
    )
    params = model.init(jax.random.PRNGKey(0), vox, train=False)
    out = model.apply(params, vox, train=False)
    assert out.features.shape == (b, n, ncls)
    assert np.all(np.isfinite(np.asarray(out.features)))


def test_window_attention_matches_naive_per_window():
    """The banded segment-attention path must equal naive per-window softmax
    attention computed window by window (exactness argument end-to-end)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu.nn.functional.window_attention import (
        window_attention,
        window_partition,
    )
    from warpconvnet_tpu.ops.keys import PAD_COORD

    rng = np.random.default_rng(5)
    n, h, d = 256, 2, 8
    raw = np.unique(rng.integers(0, 10, (n, 3)).astype(np.int32), axis=0)
    nv = len(raw)
    coords = np.full((1, n, 3), PAD_COORD, np.int32)
    coords[0, :nv] = raw
    perm, inv, wcoords = window_partition(
        jnp.asarray(coords), jnp.asarray([nv]), (4, 4, 4)
    )
    q = jnp.asarray(rng.standard_normal((1, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, n, h, d)), jnp.float32)
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < nv

    got = np.asarray(window_attention(q, k, v, wcoords, valid, tile=64))

    # Naive: per window group, full softmax attention.
    wc = np.asarray(wcoords[0])
    qn, kn, vn = (np.asarray(x[0], np.float64) for x in (q, k, v))
    ref = np.zeros_like(qn)
    groups = {}
    for i in range(nv):
        groups.setdefault(tuple(wc[i]), []).append(i)
    scale = d ** -0.5
    for idxs in groups.values():
        idxs = np.asarray(idxs)
        for hh in range(h):
            logits = qn[idxs, hh] @ kn[idxs, hh].T * scale
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref[idxs, hh] = p @ vn[idxs, hh]
    np.testing.assert_allclose(got[0, :nv], ref[:nv], rtol=2e-4, atol=2e-4)
