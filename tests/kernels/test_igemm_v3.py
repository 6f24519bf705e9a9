"""Round-3 kernel v3 behaviors: multi-tile grid steps (s > 1) with
union-window DMA + per-tile sub-window gathers, the identity-offset
no-gather fast path (reference ``detail/explicit.py`` identity fast path /
``torch_discrete.py`` ``identity_map_index``), and the plan-precompacted
overflow residual (fast list path vs the exact full-scan fallback)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    OF_CAP,
    implicit_gemm_fwd,
    implicit_gemm_wgrad,
    make_plan,
)
from warpconvnet_tpu.nn.functional.sparse_conv import (
    _fwd_impl,
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


@pytest.mark.parametrize("s", [2, 4])
def test_multi_tile_fwd_matches_single(s):
    """s sub-tiles per grid step (one union-window DMA) must be exact."""
    rng = np.random.default_rng(10)
    cin, cout = 8, 16
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)

    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table,
        tile_m=128, window_factor=2, s=s, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_multi_tile_wgrad_matches_single():
    rng = np.random.default_rng(11)
    cin, cout = 8, 8
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    g = jnp.asarray(
        rng.standard_normal((2, bpt.table.shape[2], cout)).astype(np.float32)
    )
    ref = _wgrad_impl(vox.features, g, bpt.table, jnp.float32)
    got = implicit_gemm_wgrad(
        vox.features, g, bpt.table,
        tile_m=128, window_factor=2, s=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_identity_fast_path_exact():
    """Submanifold self-map: skipping the identity offset's gather and
    adding the pipeline-blocked x tile must be exact, INCLUDING padded
    rows past each scene's valid count (the fast path masks them via the
    validity bits stored in local[identity_k])."""
    rng = np.random.default_rng(12)
    cin, cout = 72, 40  # pack_for(72) == 1 -> identity path eligible
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    assert bpt.self_map and bpt.identity_index == 13

    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table,
        tile_m=128, window_factor=2, identity_k=13, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
    # Padded rows (>= num_valid) must be zero, not x_pad @ w[13].
    nv = int(vox.num_valid[0])
    assert np.allclose(np.asarray(got)[0, nv:], 0)

    # identity + multi-tile composed
    got_s = implicit_gemm_fwd(
        vox.features, w, bpt.table,
        tile_m=128, window_factor=2, s=2, identity_k=13, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(ref), rtol=1e-4, atol=1e-4
    )

    g = jnp.asarray(
        rng.standard_normal((2, bpt.table.shape[2], cout)).astype(np.float32)
    )
    ref_w = _wgrad_impl(vox.features, g, bpt.table, jnp.float32)
    got_w = implicit_gemm_wgrad(
        vox.features, g, bpt.table,
        tile_m=128, window_factor=2, identity_k=13, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_w), np.asarray(ref_w), rtol=1e-3, atol=1e-4
    )


def test_identity_plan_excludes_offset():
    """The plan must exclude the identity offset from window sizing,
    overflow, and ovalid; its local row carries the validity bits."""
    rng = np.random.default_rng(13)
    vox = _voxels(rng, b=2, c=72)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    n = vox.max_num_points
    plan = make_plan(
        bpt.table, n, tile_m=128, window_factor=2, identity_k=13
    )
    assert plan.identity_k == 13
    # No overflow or skip-mask entries on the identity offset.
    assert not bool(np.asarray(plan.overflow).reshape(27, -1)[13].any())
    assert not np.asarray(plan.ovalid)[13].any()
    # local[ident] is the validity mask: 0 for valid rows, -1 for pads —
    # matching exactly the identity row's table validity.
    local = np.asarray(plan.local)  # [Ts, K, 1, s*tile_m]
    table = np.asarray(bpt.table)
    id_local = local[:, 13, 0, :].reshape(-1)
    id_valid = (table[:, 13, :].reshape(-1) >= 0)
    np.testing.assert_array_equal(id_local >= 0, id_valid)
    assert np.all(id_local[id_valid] == 0)
    # Identity eligibility requires n_in == round_up(n_out, tile).
    from warpconvnet_tpu.kernels.implicit_gemm import _identity_ok

    assert _identity_ok(13, n, table.shape[2], 128) == 13
    assert _identity_ok(13, n + 128, table.shape[2], 128) == -1


def test_residual_fast_list_matches_full_scan():
    """Small overflow counts must take the precompacted of_list path and
    match both the explicit reference and the full-scan fallback."""
    rng = np.random.default_rng(14)
    cin, cout = 8, 8
    vox = _voxels(rng, b=2, n=512, grid=10, c=cin)  # dense -> some overflow
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    n = vox.max_num_points
    # Tight window at tile 128 on dense scenes: nonzero but small overflow.
    plan = make_plan(bpt.table, n, tile_m=128, window_factor=1)
    of = int(np.asarray(plan.of_count))
    assert 0 < of <= OF_CAP, of
    of_list = np.asarray(plan.of_list)
    assert (of_list >= 0).sum() == of

    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table, plan,
        tile_m=128, window_factor=1, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("zg", [3, 1])
def test_flip_k_plan_matches_fresh_rev_plan(zg):
    """The K-flipped fwd plan must drive dgrad identically to a plan built
    from scratch on the rev table (self-map symmetric offsets)."""
    rng = np.random.default_rng(15)
    cin, cout = 8, 8
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    n = vox.max_num_points
    rev = bpt.table[:, ::-1, :]

    for ident in (None, 13):
        fwd_plan = make_plan(
            bpt.table, n, tile_m=128, window_factor=2, zg=zg, s=2,
            identity_k=ident,
        )
        fresh = make_plan(
            rev, n, tile_m=128, window_factor=2, zg=zg, s=2, identity_k=ident
        )
        flip = fwd_plan.flip_k()
        np.testing.assert_array_equal(
            np.asarray(flip.starts), np.asarray(fresh.starts)
        )
        np.testing.assert_array_equal(
            np.asarray(flip.delta), np.asarray(fresh.delta)
        )
        np.testing.assert_array_equal(
            np.asarray(flip.ovalid), np.asarray(fresh.ovalid)
        )
        np.testing.assert_array_equal(
            np.asarray(flip.local), np.asarray(fresh.local)
        )
        np.testing.assert_array_equal(
            np.asarray(flip.overflow), np.asarray(fresh.overflow)
        )
        assert flip.identity_k == fresh.identity_k
        # of_list id remap: same PAIR SET (order may differ).
        a = np.asarray(flip.of_list); b = np.asarray(fresh.of_list)
        np.testing.assert_array_equal(np.sort(a[a >= 0]), np.sort(b[b >= 0]))

        g = jnp.asarray(
            rng.standard_normal((2, bpt.table.shape[2], cout)).astype(np.float32)
        )
        wt_sw = jnp.swapaxes(w, 1, 2)
        ref = implicit_gemm_fwd(
            g, wt_sw, rev, fresh, tile_m=128, window_factor=2, zg=zg, s=2,
            identity_k=ident, interpret=True,
        )
        got = implicit_gemm_fwd(
            g, wt_sw, rev, flip, tile_m=128, window_factor=2, zg=zg, s=2,
            identity_k=ident, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
