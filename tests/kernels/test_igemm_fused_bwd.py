"""Fused backward (dgrad+wgrad one-pass) kernel vs the explicit reference.

The fused kernel exploits the self-map identity rev == table[:, ::-1]
(free K-flip): one one-hot gather per offset feeds BOTH dx and dw. Must be
exact vs the explicit scan backends on real submanifold maps, including the
overflow-residual path and the identity fast path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_bwd_fused,
    make_plan,
)
from warpconvnet_tpu.nn.functional.sparse_conv import (
    _dgrad_impl,
    _wgrad_impl,
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
def test_fused_bwd_matches_explicit(zg, ident):
    rng = np.random.default_rng(0)
    cin, cout = 8, 16
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=1)
    n = vox.max_num_points
    g = jnp.asarray(
        rng.standard_normal((vox.batch_size, n, cout)).astype(np.float32)
    )
    # Self-map contract: reverse table is the K-flip.
    np.testing.assert_array_equal(
        np.asarray(bpt.rev), np.asarray(bpt.table[:, ::-1, :])
    )

    ref_dx = _dgrad_impl(g, w, bpt.rev, jnp.float32)
    ref_dw = _wgrad_impl(vox.features, g, bpt.table, jnp.float32)

    id_k = bpt.identity_index if ident else None
    dx, dw = implicit_gemm_bwd_fused(
        vox.features, g, w, bpt.table,
        tile_m=128, window_factor=4, zg=zg, identity_k=id_k, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref_dw), rtol=1e-4, atol=1e-4)


def test_fused_bwd_residual_overflow():
    """Tiny window forces overflow pairs through BOTH residual passes."""
    rng = np.random.default_rng(1)
    cin, cout = 4, 4
    vox = _voxels(rng, b=2, n=256, grid=10, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=1)
    n = vox.max_num_points
    g = jnp.asarray(
        rng.standard_normal((vox.batch_size, n, cout)).astype(np.float32)
    )
    plan = make_plan(bpt.table, n, tile_m=128, window_factor=1)
    assert int(plan.of_count) > 0  # residual actually exercised

    ref_dx = _dgrad_impl(g, w, bpt.rev, jnp.float32)
    ref_dw = _wgrad_impl(vox.features, g, bpt.table, jnp.float32)
    dx, dw = implicit_gemm_bwd_fused(
        vox.features, g, w, bpt.table, plan,
        tile_m=128, window_factor=1, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref_dw), rtol=1e-4, atol=1e-4)


def test_fused_bwd_plan_reuse_and_s_steps():
    """Multi-tile grid steps (s=2) + a prebuilt shared plan."""
    rng = np.random.default_rng(2)
    cin, cout = 8, 8
    vox = _voxels(rng, b=2, n=512, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=1)
    n = vox.max_num_points
    g = jnp.asarray(
        rng.standard_normal((vox.batch_size, n, cout)).astype(np.float32)
    )
    id_k = bpt.identity_index
    plan = make_plan(
        bpt.table, n, tile_m=128, window_factor=2, zg=9, s=2, identity_k=id_k
    )
    ref_dx = _dgrad_impl(g, w, bpt.rev, jnp.float32)
    ref_dw = _wgrad_impl(vox.features, g, bpt.table, jnp.float32)
    dx, dw = implicit_gemm_bwd_fused(
        vox.features, g, w, bpt.table, plan,
        tile_m=128, window_factor=2, zg=9, s=2, identity_k=id_k,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref_dw), rtol=1e-4, atol=1e-4)


def test_fused_bwd_end_to_end_dispatch(monkeypatch):
    """jax.grad through spatially_sparse_conv takes the fused path when the
    self-map conditions hold, and matches the explicit backend's grads."""
    import jax

    from warpconvnet_tpu import constants
    from warpconvnet_tpu.kernels import implicit_gemm as ig
    from warpconvnet_tpu.nn.functional.sparse_conv import (
        spatially_sparse_conv,
    )

    rng = np.random.default_rng(3)
    cin, cout = 8, 8
    vox = _voxels(rng, b=2, n=512, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)

    def loss(feats, w, mode):
        monkeypatch.setattr(constants, "WCT_FWD_ALGO_MODE", mode)
        monkeypatch.setattr(constants, "WCT_DGRAD_ALGO_MODE", mode)
        monkeypatch.setattr(constants, "WCT_WGRAD_ALGO_MODE", mode)
        out, _ = spatially_sparse_conv(vox.replace(features=feats), w, 3)
        return jnp.sum(out.features ** 2)

    calls = []
    orig = ig.implicit_gemm_bwd_fused

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(ig, "implicit_gemm_bwd_fused", spy)
    monkeypatch.setattr(constants, "WCT_FUSED_BWD", True)

    ref_dx, ref_dw = jax.grad(loss, argnums=(0, 1))(
        vox.features, w, "explicit"
    )
    assert not calls
    dx, dw = jax.grad(loss, argnums=(0, 1))(
        vox.features, w, "implicit_pallas"
    )
    assert calls, "fused backward was not dispatched"
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref_dw), rtol=1e-4, atol=1e-4)
