"""Pallas depthwise FMA kernels vs the explicit gather-scan reference
(reference strategy: the depthwise kernel parity tests around
``tests/nn/test_sparse_conv_depth.py`` pin the fused CUDA FMA against the
explicit gather path). Covers fwd/dgrad/wgrad, the fused one-pass backward,
the identity fast path, overflow residuals, and dispatch through
``spatially_sparse_depthwise_conv``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.depthwise_fma import (
    depthwise_fma_bwd_fused,
    depthwise_fma_fwd,
    depthwise_fma_wgrad,
)
from warpconvnet_tpu.nn.functional.sparse_conv_depth import (
    _depth_dgrad_impl,
    _depth_fwd_impl,
    _depth_wgrad_impl,
)
from warpconvnet_tpu.nn.functional.sparse_conv import (
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.keys import PAD_COORD


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


@pytest.mark.parametrize("zg,ident", [(1, False), (3, True), (9, True)])
def test_depth_fwd_matches_explicit(zg, ident):
    rng = np.random.default_rng(0)
    c = 8
    vox = _voxels(rng, b=2, c=c)
    w = jnp.asarray(rng.standard_normal((27, c)).astype(np.float32) * 0.3)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=1)

    ref = _depth_fwd_impl(vox.features, w, bpt.table, jnp.float32)
    id_k = bpt.identity_index if ident else None
    out = depthwise_fma_fwd(
        vox.features, w, bpt.table,
        tile_m=128, window_factor=4, zg=zg, identity_k=id_k, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_depth_dgrad_matches_explicit():
    """dgrad == fwd on the reverse table (per-channel weight is its own
    transpose)."""
    rng = np.random.default_rng(1)
    c = 8
    vox = _voxels(rng, b=2, c=c)
    w = jnp.asarray(rng.standard_normal((27, c)).astype(np.float32) * 0.3)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=1)
    n = vox.max_num_points
    g = jnp.asarray(
        rng.standard_normal((vox.batch_size, n, c)).astype(np.float32)
    )
    ref = _depth_dgrad_impl(g, w, bpt.rev, jnp.float32)
    dx = depthwise_fma_fwd(
        g, w, bpt.rev,
        tile_m=128, window_factor=4, zg=3,
        identity_k=bpt.identity_index, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("zg,ident", [(1, False), (9, True)])
def test_depth_wgrad_matches_explicit(zg, ident):
    rng = np.random.default_rng(2)
    c = 8
    vox = _voxels(rng, b=2, c=c)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=1)
    n = vox.max_num_points
    g = jnp.asarray(
        rng.standard_normal((vox.batch_size, n, c)).astype(np.float32)
    )
    ref = _depth_wgrad_impl(vox.features, g, bpt.table, jnp.float32)
    id_k = bpt.identity_index if ident else None
    dw = depthwise_fma_wgrad(
        vox.features, g, bpt.table,
        tile_m=128, window_factor=4, zg=zg, identity_k=id_k, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(dw), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("ident", [False, True])
def test_depth_bwd_fused_matches_explicit(ident):
    rng = np.random.default_rng(3)
    c = 8
    vox = _voxels(rng, b=2, c=c)
    w = jnp.asarray(rng.standard_normal((27, c)).astype(np.float32) * 0.3)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=1)
    n = vox.max_num_points
    g = jnp.asarray(
        rng.standard_normal((vox.batch_size, n, c)).astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(bpt.rev), np.asarray(bpt.table[:, ::-1, :])
    )
    ref_dx = _depth_dgrad_impl(g, w, bpt.rev, jnp.float32)
    ref_dw = _depth_wgrad_impl(vox.features, g, bpt.table, jnp.float32)
    id_k = bpt.identity_index if ident else None
    dx, dw = depthwise_fma_bwd_fused(
        vox.features, g, w, bpt.table,
        tile_m=128, window_factor=4, zg=3, identity_k=id_k, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(ref_dx), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dw), np.asarray(ref_dw), rtol=1e-4, atol=1e-4
    )


def test_depth_residual_overflow():
    """Tiny window forces overflow pairs through the elementwise residual
    passes of all three directions."""
    rng = np.random.default_rng(4)
    c = 4
    vox = _voxels(rng, b=2, n=256, grid=10, c=c)
    w = jnp.asarray(rng.standard_normal((27, c)).astype(np.float32) * 0.3)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=1)
    n = vox.max_num_points
    g = jnp.asarray(
        rng.standard_normal((vox.batch_size, n, c)).astype(np.float32)
    )
    kw = dict(tile_m=64, window_factor=1.0, zg=1, interpret=True)
    out = depthwise_fma_fwd(vox.features, w, bpt.table, **kw)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(_depth_fwd_impl(vox.features, w, bpt.table, jnp.float32)),
        rtol=1e-4, atol=1e-4,
    )
    dw = depthwise_fma_wgrad(vox.features, g, bpt.table, **kw)
    np.testing.assert_allclose(
        np.asarray(dw),
        np.asarray(_depth_wgrad_impl(vox.features, g, bpt.table, jnp.float32)),
        rtol=1e-4, atol=1e-4,
    )
    dx, dw2 = depthwise_fma_bwd_fused(vox.features, g, w, bpt.table, **kw)
    np.testing.assert_allclose(
        np.asarray(dx),
        np.asarray(_depth_dgrad_impl(g, w, bpt.rev, jnp.float32)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(dw2), np.asarray(dw), rtol=1e-4, atol=1e-4)


def test_depthwise_dispatch_pallas_matches_explicit():
    """spatially_sparse_depthwise_conv value+grads agree between the pinned
    explicit backend and the pinned Pallas backend (interpret mode)."""
    from warpconvnet_tpu import constants
    from warpconvnet_tpu.nn.functional.sparse_conv_depth import (
        spatially_sparse_depthwise_conv,
    )

    rng = np.random.default_rng(5)
    c = 8
    vox = _voxels(rng, b=2, n=256, grid=10, c=c)
    w = jnp.asarray(rng.standard_normal((27, c)).astype(np.float32) * 0.3)

    def loss(f, w):
        out, _ = spatially_sparse_depthwise_conv(vox.replace(features=f), w, 3)
        return jnp.sum(out.features ** 2), out.features

    old_mode = constants.WCT_DEPTH_ALGO_MODE
    try:
        constants.WCT_DEPTH_ALGO_MODE = "explicit"
        (ref_l, ref_f), ref_g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            vox.features, w
        )
        # CPU test platform -> the Pallas backends run in interpret mode
        # automatically (_pallas_interpret).
        constants.WCT_DEPTH_ALGO_MODE = "implicit_pallas"
        (l2, f2), g2 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            vox.features, w
        )
    finally:
        constants.WCT_DEPTH_ALGO_MODE = old_mode

    np.testing.assert_allclose(float(l2), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(ref_f), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g2[1]), np.asarray(ref_g[1]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g2[0]), np.asarray(ref_g[0]), rtol=1e-4, atol=1e-4
    )
