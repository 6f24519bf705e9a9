"""Parity-partitioned strided/transposed conv path (round 3): the fine-side
rows are permuted into stride-parity-class-major order so every offset's
gather spread fits one tile, moving strided convs onto the Pallas igemm
path (the TPU analog of the reference's mask_argsort locality reordering,
``detail/mask_gemm.py:240-243``). Exactness must hold for fwd AND both
gradients (the custom VJP un-permutes dx / permutes the dgrad gather)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu import constants
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import (
    _parity_perm,
    spatially_sparse_conv,
)
from warpconvnet_tpu.ops.keys import PAD_COORD

MODES = ("WCT_FWD_ALGO_MODE", "WCT_DGRAD_ALGO_MODE", "WCT_WGRAD_ALGO_MODE")


def _voxels(rng, b=2, n=512, grid=14, c=8):
    coords = np.full((b, n, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n, c), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        raw = np.unique(
            rng.integers(0, grid, size=(n, 3)).astype(np.int32), axis=0
        )
        nv[i] = len(raw)
        coords[i, : len(raw)] = raw
        feats[i, : len(raw)] = rng.standard_normal((len(raw), c))
    return Voxels.create(coords, feats, nv, tensor_stride=1).replace(
        lex_sorted=True
    )


@pytest.fixture
def pin_modes():
    saved = {m: getattr(constants, m) for m in MODES}
    yield
    for m, v in saved.items():
        setattr(constants, m, v)


def _loss_and_grads(vox, w, mode, **kw):
    for m in MODES:
        setattr(constants, m, mode)

    def loss_fn(feats, w):
        out, _ = spatially_sparse_conv(vox.replace(features=feats), w, **kw)
        return jnp.sum(out.features.astype(jnp.float32) ** 2), out.features

    (loss, feats_out), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(vox.features, w)
    return loss, feats_out, grads


@pytest.mark.parametrize(
    "ks,stride",
    [(2, 2), pytest.param(3, 2, marks=pytest.mark.slow)],
)
def test_strided_parity_matches_explicit(pin_modes, ks, stride):
    rng = np.random.default_rng(30)
    cin, cout = 8, 16
    vox = _voxels(rng, b=2, c=cin)
    k = ks ** 3
    w = jnp.asarray(rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.2)

    ref_l, ref_o, (ref_dx, ref_dw) = _loss_and_grads(
        vox, w, "explicit", kernel_size=ks, stride=stride
    )
    got_l, got_o, (got_dx, got_dw) = _loss_and_grads(
        vox, w, "implicit_pallas", kernel_size=ks, stride=stride
    )
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=1e-3, atol=1e-3)


def test_transposed_parity_matches_explicit(pin_modes):
    rng = np.random.default_rng(31)
    cin, cout = 8, 8
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.2)

    # Encoder: strided conv (gives the coarse voxels + reusable map).
    for m in MODES:
        setattr(constants, m, "explicit")
    coarse, enc_table = spatially_sparse_conv(
        vox, w, kernel_size=2, stride=2
    )

    wt = jnp.asarray(rng.standard_normal((8, cout, cin)).astype(np.float32) * 0.2)

    def run(mode):
        for m in MODES:
            setattr(constants, m, mode)

        def loss_fn(feats, wt):
            out, _ = spatially_sparse_conv(
                coarse.replace(features=feats), wt, kernel_size=2, stride=2,
                transposed=True, out_coords=vox,
            )
            return jnp.sum(out.features.astype(jnp.float32) ** 2), out.features

        (loss, fo), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(coarse.features, wt)
        return loss, fo, grads

    ref_l, ref_o, (ref_dx, ref_dw) = run("explicit")
    got_l, got_o, (got_dx, got_dw) = run("implicit_pallas")
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=1e-3, atol=1e-3)


def test_parity_perm_properties():
    """perm is a permutation; classes are contiguous; padded rows last;
    lex order preserved within each class."""
    rng = np.random.default_rng(32)
    vox = _voxels(rng, b=2, n=256, grid=10, c=4)
    perm, inv = _parity_perm(vox.coords, vox.num_valid, 1, 2)
    perm, inv = np.asarray(perm), np.asarray(inv)
    n = vox.coords.shape[1]
    for b in range(2):
        assert sorted(perm[b]) == list(range(n))
        np.testing.assert_array_equal(inv[b][perm[b]], np.arange(n))
        nv = int(vox.num_valid[b])
        c = np.asarray(vox.coords[b])
        cls = ((c[:, 0] % 2) * 2 + c[:, 1] % 2) * 2 + c[:, 2] % 2
        cls_perm = np.where(np.arange(n)[perm[b]] < nv, cls[perm[b]], 8)
        assert np.all(np.diff(cls_perm) >= 0)  # class-major, pads last
        # stable within class: original indices increasing
        for cc in range(8):
            sel = perm[b][cls_perm == cc]
            assert np.all(np.diff(sel) > 0)


def test_strided_parity_window_spread_bounded():
    """The motivating property: on the parity ordering, every offset's
    per-tile gather spread is bounded by ~tile, independent of the in/out
    density ratio (raw-order spreads grow with it)."""
    from warpconvnet_tpu.nn.functional.sparse_conv import (
        _remap_values,
        generate_output_coords_and_kernel_map,
    )

    rng = np.random.default_rng(33)
    vox = _voxels(rng, b=1, n=2048, grid=24, c=4)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 2, stride=2)
    perm, inv = _parity_perm(vox.coords, vox.num_valid, 1, 2)
    tp = np.asarray(_remap_values(bpt.table, inv))[0]
    tile = 128
    n_out = tp.shape[1]
    worst = 0
    for k in range(tp.shape[0]):
        for t0 in range(0, n_out, tile):
            seg = tp[k, t0 : t0 + tile]
            seg = seg[seg >= 0]
            if len(seg) > 1:
                worst = max(worst, int(seg.max() - seg.min()))
    assert worst <= 2 * tile, worst
