"""Round-2 batched implicit-GEMM behaviors: flattened-batch parity, exact
while-loop residual beyond any static cap, plan reuse, and the sentinel fix
for clip-boundary query aliasing (ADVICE round 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_fwd,
    implicit_gemm_wgrad,
    make_plan,
)
from warpconvnet_tpu.nn.functional.sparse_conv import (
    _fwd_impl,
    _wgrad_impl,
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.kernel_map import build_pair_table, kernel_offsets
from warpconvnet_tpu.ops.keys import PAD_COORD


def _voxels(rng, b=3, n=512, grid=14, c=8):
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


@pytest.mark.parametrize("stride", [1, 2])
def test_batched_fwd_matches_explicit(stride):
    rng = np.random.default_rng(0)
    cin, cout = 8, 16
    vox = _voxels(rng, b=3, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=stride)

    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_batched_wgrad_matches_explicit():
    rng = np.random.default_rng(1)
    cin, cout = 4, 8
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    oc, onv, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=1)
    g = jnp.asarray(
        rng.standard_normal((vox.batch_size, oc.shape[1], cout)).astype(np.float32)
    )
    ref = _wgrad_impl(vox.features, g, bpt.table, jnp.float32)
    got = implicit_gemm_wgrad(
        vox.features, g, bpt.table, tile_m=128, window_factor=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_residual_exact_beyond_chunk():
    """Overflow pairs far beyond one compaction chunk must stay exact (the
    round-1 kernel silently dropped pairs past max_residual=4096)."""
    rng = np.random.default_rng(2)
    cin, cout = 4, 4
    vox = _voxels(rng, b=2, n=1024, grid=16, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=2)
    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    # window_factor=1 on a strided map forces massive overflow; chunk=64
    # forces many while_loop iterations.
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table,
        tile_m=128, window_factor=1, interpret=True, residual_chunk=64,
    )
    plan = make_plan(bpt.table, vox.max_num_points, tile_m=128, window_factor=1)
    assert int(jnp.sum(plan.overflow)) > 64  # multiple chunks exercised
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    g = jnp.asarray(
        rng.standard_normal((2, bpt.table.shape[2], cout)).astype(np.float32)
    )
    ref_w = _wgrad_impl(vox.features, g, bpt.table, jnp.float32)
    got_w = implicit_gemm_wgrad(
        vox.features, g, bpt.table,
        tile_m=128, window_factor=1, interpret=True, residual_chunk=64,
    )
    np.testing.assert_allclose(
        np.asarray(got_w), np.asarray(ref_w), rtol=1e-4, atol=1e-4
    )


def test_plan_reuse_matches_fresh():
    rng = np.random.default_rng(3)
    cin, cout = 4, 4
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    plan = make_plan(bpt.table, vox.max_num_points, tile_m=128, window_factor=2)
    a = implicit_gemm_fwd(
        vox.features, w, bpt.table, plan,
        tile_m=128, window_factor=2, interpret=True,
    )
    b = implicit_gemm_fwd(
        vox.features, w, bpt.table, None,
        tile_m=128, window_factor=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clip_boundary_query_no_alias():
    """A real input voxel at the coordinate-range boundary (PAD_COORD - 1)
    must not be spuriously matched by out-of-range queries that round 1
    clipped onto it (ADVICE: kernel_map.py:177)."""
    boundary = PAD_COORD - 1  # 32766
    coords = np.array(
        [[0, 0, 0], [0, 0, 1], [boundary, boundary, boundary]], np.int32
    )
    n = 8
    cpad = np.full((n, 3), PAD_COORD, np.int32)
    cpad[: len(coords)] = coords
    valid = np.arange(n) < len(coords)
    offsets = kernel_offsets(3)
    pt = build_pair_table(
        jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(cpad), offsets,
        assume_sorted=True, use_probe=False,
    )
    table = np.asarray(pt.table)
    # The boundary voxel's identity tap must hit itself...
    k_id = 13  # center offset of the 3^3 enumeration
    assert table[k_id, 2] == 2
    # ...but queries from its +1 offsets fall OUT of range and must not hit
    # anything; neither may padded output rows alias it.
    for k in range(27):
        off = offsets[k]
        if np.all(off == 0):
            continue
        q = coords[2] + off
        if np.any(np.abs(q) >= PAD_COORD - 1):
            assert table[k, 2] == -1, (k, off, table[k, 2])
    assert np.all(table[:, len(coords):] == -1)


@pytest.mark.slow
def test_z_grouped_dma_matches_ungrouped():
    """One window DMA per (dx, dy) offset group must stay exact (offset
    enumeration is z-fastest, so zg=3 for a 3^3 kernel)."""
    from warpconvnet_tpu.kernels.implicit_gemm import z_group_of
    from warpconvnet_tpu.ops.kernel_map import kernel_offsets

    rng = np.random.default_rng(4)
    cin, cout = 4, 8
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    assert z_group_of(kernel_offsets(3)) == 3
    assert z_group_of(-kernel_offsets(3)[::-1]) == 3  # transposed enumeration

    ref = implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2,
        zg=1, interpret=True,
    )
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2,
        zg=3, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    g = jnp.asarray(
        rng.standard_normal((2, bpt.table.shape[2], cout)).astype(np.float32)
    )
    ref_w = implicit_gemm_wgrad(
        vox.features, g, bpt.table, tile_m=128, window_factor=2,
        zg=1, interpret=True,
    )
    got_w = implicit_gemm_wgrad(
        vox.features, g, bpt.table, tile_m=128, window_factor=2,
        zg=3, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_w), np.asarray(ref_w), rtol=1e-4, atol=1e-4
    )


def test_narrow_channels_exact():
    """Narrow-C convs (C_in < 128-lane width) must stay exact through the
    channel-padding path (row packing was removed with the batched kernel —
    pack_for is pinned to 1)."""
    from warpconvnet_tpu.kernels.implicit_gemm import pack_for

    rng = np.random.default_rng(6)
    cin, cout = 24, 40
    vox = _voxels(rng, b=2, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    assert pack_for(cin) == 1

    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    g = jnp.asarray(
        rng.standard_normal((2, bpt.table.shape[2], cout)).astype(np.float32)
    )
    ref_w = _wgrad_impl(vox.features, g, bpt.table, jnp.float32)
    got_w = implicit_gemm_wgrad(
        vox.features, g, bpt.table, tile_m=128, window_factor=2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_w), np.asarray(ref_w), rtol=1e-4, atol=1e-4
    )
