"""Depthwise + grouped sparse conv correctness vs the dense/explicit anchors
(reference strategy: tests/nn/test_kernel_correctness.py, depthwise tests in
tests/nn/ for sparse_conv_depth)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import spatially_sparse_conv
from warpconvnet_tpu.nn.functional.sparse_conv_depth import (
    spatially_sparse_depthwise_conv,
)
from warpconvnet_tpu.ops.keys import PAD_COORD


def _make_voxels(rng, b=2, n=96, grid=8, c=8):
    coords_list, feats_list, nv = [], [], []
    for _ in range(b):
        k = rng.integers(n // 2, n - 8)
        raw = rng.integers(0, grid, size=(k, 3)).astype(np.int32)
        uniq = np.unique(raw, axis=0)
        nv.append(len(uniq))
        cpad = np.full((n, 3), PAD_COORD, np.int32)
        cpad[: len(uniq)] = uniq
        f = np.zeros((n, c), np.float32)
        f[: len(uniq)] = rng.standard_normal((len(uniq), c)).astype(np.float32)
        coords_list.append(cpad)
        feats_list.append(f)
    return Voxels.create(np.stack(coords_list), np.stack(feats_list), np.array(nv))


def test_depthwise_matches_diagonal_full_conv():
    """Depthwise conv == full conv with block-diagonal (diagonal) weights."""
    rng = np.random.default_rng(1)
    vox = _make_voxels(rng, c=8)
    k = 27
    w_depth = rng.standard_normal((k, 8)).astype(np.float32)
    w_full = np.zeros((k, 8, 8), np.float32)
    for i in range(8):
        w_full[:, i, i] = w_depth[:, i]

    out_d, _ = spatially_sparse_depthwise_conv(vox, jnp.asarray(w_depth), 3)
    out_f, _ = spatially_sparse_conv(vox, jnp.asarray(w_full), 3)
    np.testing.assert_allclose(
        np.asarray(out_d.features), np.asarray(out_f.features), rtol=1e-5, atol=1e-5
    )


def test_depthwise_grads_match_diagonal_full_conv():
    rng = np.random.default_rng(2)
    vox = _make_voxels(rng, c=4)
    k = 27
    w_depth = jnp.asarray(rng.standard_normal((k, 4)).astype(np.float32))

    def loss_depth(w, feats):
        v = vox.replace(features=feats)
        out, _ = spatially_sparse_depthwise_conv(v, w, 3)
        return jnp.sum(out.features ** 2)

    def loss_full(w, feats):
        wf = jnp.zeros((k, 4, 4)).at[:, jnp.arange(4), jnp.arange(4)].set(w)
        v = vox.replace(features=feats)
        out, _ = spatially_sparse_conv(v, wf, 3)
        return jnp.sum(out.features ** 2)

    gd = jax.grad(loss_depth, argnums=(0, 1))(w_depth, vox.features)
    gf = jax.grad(loss_full, argnums=(0, 1))(w_depth, vox.features)
    np.testing.assert_allclose(np.asarray(gd[0]), np.asarray(gf[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd[1]), np.asarray(gf[1]), rtol=1e-4, atol=1e-4)


def test_depthwise_strided_shapes():
    rng = np.random.default_rng(3)
    vox = _make_voxels(rng, c=8)
    w = jnp.asarray(rng.standard_normal((27, 8)).astype(np.float32))
    out, table = spatially_sparse_depthwise_conv(vox, w, 3, stride=2)
    assert out.tensor_stride == (2, 2, 2)
    assert table is not None
    assert np.all(np.asarray(out.num_valid) <= np.asarray(vox.num_valid))


def test_grouped_matches_block_diagonal_full_conv():
    """groups=2 conv == full conv with a block-diagonal weight."""
    rng = np.random.default_rng(4)
    vox = _make_voxels(rng, c=8)
    k, g, cg, cd = 27, 2, 4, 4
    wg = rng.standard_normal((k, g, cg, cd)).astype(np.float32)
    w_full = np.zeros((k, 8, 8), np.float32)
    w_full[:, :4, :4] = wg[:, 0]
    w_full[:, 4:, 4:] = wg[:, 1]

    out_g, _ = spatially_sparse_conv(vox, jnp.asarray(wg), 3, groups=2)
    out_f, _ = spatially_sparse_conv(vox, jnp.asarray(w_full), 3)
    np.testing.assert_allclose(
        np.asarray(out_g.features), np.asarray(out_f.features), rtol=1e-4, atol=1e-4
    )


def test_grouped_grads_match_block_diagonal():
    rng = np.random.default_rng(5)
    vox = _make_voxels(rng, c=8)
    k = 27
    wg = jnp.asarray(rng.standard_normal((k, 2, 4, 4)).astype(np.float32))

    def loss_g(w, feats):
        v = vox.replace(features=feats)
        out, _ = spatially_sparse_conv(v, w, 3, groups=2)
        return jnp.sum(out.features ** 2)

    def loss_f(w, feats):
        wf = jnp.zeros((k, 8, 8))
        wf = wf.at[:, :4, :4].set(w[:, 0]).at[:, 4:, 4:].set(w[:, 1])
        v = vox.replace(features=feats)
        out, _ = spatially_sparse_conv(v, wf, 3)
        return jnp.sum(out.features ** 2)

    gg = jax.grad(loss_g, argnums=(0, 1))(wg, vox.features)
    # loss_f differentiates through the block-diagonal embedding, so its
    # weight gradient is already in grouped [K, G, Cg, Cd] layout.
    gf_w, gf_x = jax.grad(loss_f, argnums=(0, 1))(wg, vox.features)
    np.testing.assert_allclose(np.asarray(gg[0]), np.asarray(gf_w), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gf_x), rtol=1e-4, atol=1e-4)


def test_depthwise_module():
    import flax.linen  # noqa: F401  (import check)
    from warpconvnet_tpu.nn.modules.sparse_conv import SparseDepthwiseConv3d

    rng = np.random.default_rng(6)
    vox = _make_voxels(rng, c=8)
    mod = SparseDepthwiseConv3d(channels=8, kernel_size=3, use_bias=True)
    params = mod.init(jax.random.PRNGKey(0), vox)
    out, _ = mod.apply(params, vox)
    assert out.features.shape == vox.features.shape


def test_grouped_module():
    from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv3d

    rng = np.random.default_rng(7)
    vox = _make_voxels(rng, c=8)
    mod = SparseConv3d(in_channels=8, out_channels=16, kernel_size=3, groups=2)
    params = mod.init(jax.random.PRNGKey(0), vox)
    assert params["params"]["kernel"].shape == (27, 2, 4, 8)
    out, _ = mod.apply(params, vox)
    assert out.features.shape[-1] == 16


def test_reduce_and_stride_mode():
    """stride_mode='reduce_and_stride' (reference STRIDED_CONV_MODE,
    helper.py:275-287) == max-pool(kernel=stride) then stride-1 conv."""
    import numpy as np
    import jax.numpy as jnp
    from warpconvnet_tpu.geometry.voxels import Voxels
    from warpconvnet_tpu.nn.functional.sparse_conv import spatially_sparse_conv
    from warpconvnet_tpu.nn.functional.sparse_pool import sparse_reduce
    from warpconvnet_tpu.ops.keys import PAD_COORD

    rng = np.random.default_rng(40)
    b, n, c = 2, 256, 6
    coords = np.full((b, n, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n, c), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        raw = np.unique(rng.integers(0, 12, size=(n, 3)).astype(np.int32), axis=0)
        nv[i] = len(raw)
        coords[i, : len(raw)] = raw
        feats[i, : len(raw)] = rng.standard_normal((len(raw), c))
    vox = Voxels.create(coords, feats, nv).replace(lex_sorted=True)
    w = jnp.asarray(rng.standard_normal((27, c, 8)).astype(np.float32) * 0.2)

    got, _ = spatially_sparse_conv(
        vox, w, kernel_size=3, stride=2, stride_mode="reduce_and_stride",
    )
    pooled, _ = sparse_reduce(vox, 2, 2, "max")
    assert pooled.lex_sorted
    ref, _ = spatially_sparse_conv(pooled, w, kernel_size=3, stride=1)
    np.testing.assert_array_equal(np.asarray(got.coords), np.asarray(ref.coords))
    np.testing.assert_allclose(
        np.asarray(got.features), np.asarray(ref.features), rtol=1e-5, atol=1e-5
    )
    assert got.tensor_stride == (2, 2, 2)


def test_grouped_blockdiag_igemm_matches_scan():
    """groups>1 through the block-diagonal igemm path (reference routes
    groups through its flagship mask_gemm, detail/dispatch.py:24-109) must
    match the explicit grouped scan, gradients included."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu import constants
    from warpconvnet_tpu.geometry.voxels import Voxels
    from warpconvnet_tpu.nn.functional.sparse_conv import spatially_sparse_conv
    from warpconvnet_tpu.ops.keys import PAD_COORD

    rng = np.random.default_rng(41)
    b, n, g = 2, 256, 2
    cin, cout = 8, 16
    coords = np.full((b, n, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n, cin), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        raw = np.unique(rng.integers(0, 12, size=(n, 3)).astype(np.int32), axis=0)
        nv[i] = len(raw)
        coords[i, : len(raw)] = raw
        feats[i, : len(raw)] = rng.standard_normal((len(raw), cin))
    vox = Voxels.create(coords, feats, nv).replace(lex_sorted=True)
    w = jnp.asarray(
        rng.standard_normal((27, g, cin // g, cout // g)).astype(np.float32) * 0.2
    )

    MODES = ("WCT_FWD_ALGO_MODE", "WCT_DGRAD_ALGO_MODE", "WCT_WGRAD_ALGO_MODE")
    saved = {m: getattr(constants, m) for m in MODES}

    def run(mode):
        for m in MODES:
            setattr(constants, m, mode)

        def loss_fn(feats, w):
            out, _ = spatially_sparse_conv(
                vox.replace(features=feats), w, kernel_size=3, groups=g
            )
            return jnp.sum(out.features.astype(jnp.float32) ** 2), out.features

        (loss, fo), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(vox.features, w)
        return fo, grads

    try:
        ref_o, (ref_dx, ref_dw) = run("explicit")  # grouped scan
        got_o, (got_dx, got_dw) = run("implicit_pallas")  # block-diag igemm
    finally:
        for m, v in saved.items():
            setattr(constants, m, v)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=1e-3, atol=1e-3)


def test_reduce_and_stride_gradients_finite_and_match_composition():
    """REDUCE_AND_STRIDE gradients == grad of (max-pool then stride-1 conv)
    composed manually."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu.geometry.voxels import Voxels
    from warpconvnet_tpu.nn.functional.sparse_conv import spatially_sparse_conv
    from warpconvnet_tpu.nn.functional.sparse_pool import sparse_max_pool
    from warpconvnet_tpu.ops.keys import PAD_COORD

    rng = np.random.default_rng(41)
    b, n, c = 2, 256, 6
    coords = np.full((b, n, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n, c), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        raw = np.unique(rng.integers(0, 12, size=(n, 3)).astype(np.int32), axis=0)
        nv[i] = len(raw)
        coords[i, : len(raw)] = raw
        feats[i, : len(raw)] = rng.standard_normal((len(raw), c))
    vox = Voxels.create(coords, feats, nv).replace(lex_sorted=True)
    w = jnp.asarray(rng.standard_normal((27, c, 8)).astype(np.float32) * 0.2)

    def loss_ras(f, w):
        v = vox.replace(features=f)
        out, _ = spatially_sparse_conv(
            v, w, kernel_size=3, stride=2, stride_mode="reduce_and_stride"
        )
        return jnp.sum(out.features.astype(jnp.float32) ** 2)

    def loss_comp(f, w):
        v = vox.replace(features=f)
        pooled, _ = sparse_max_pool(v, 2, stride=2)
        out, _ = spatially_sparse_conv(pooled, w, kernel_size=3, stride=1)
        return jnp.sum(out.features.astype(jnp.float32) ** 2)

    df_a, dw_a = jax.grad(loss_ras, argnums=(0, 1))(vox.features, w)
    df_b, dw_b = jax.grad(loss_comp, argnums=(0, 1))(vox.features, w)
    assert bool(jnp.all(jnp.isfinite(df_a))) and bool(jnp.all(jnp.isfinite(dw_a)))
    np.testing.assert_allclose(np.asarray(df_a), np.asarray(df_b), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_a), np.asarray(dw_b), rtol=1e-4, atol=1e-5)
