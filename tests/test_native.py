"""Native host coordinate engine tests: C++ results must match the JAX
sort-based engine exactly (the cross-engine invariant the reference enforces
between _C.cuhash and torch reference paths)."""

import numpy as np
import pytest

from warpconvnet_tpu import native


pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native engine not built (no g++?)"
)


def test_build_and_threads():
    assert native.num_threads() >= 1


def test_voxelize_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, (5000, 3)).astype(np.float32)
    vs = 0.07
    coords, src = native.voxelize(pts, vs)
    ref = np.floor(pts / vs).astype(np.int32)
    ref_uniq = np.unique(ref, axis=0)
    got = np.unique(coords, axis=0)
    assert got.shape == ref_uniq.shape
    np.testing.assert_array_equal(got, ref_uniq)
    # src indices point at points inside the voxel
    np.testing.assert_array_equal(ref[src], coords)


def test_voxelize_csr_groups():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    coords, vid = native.voxelize_csr(pts, 0.1)
    assert (vid >= 0).all()
    ref = np.floor(pts / 0.1).astype(np.int32)
    np.testing.assert_array_equal(coords[vid], ref)


def test_pair_table_matches_jax_engine():
    import jax.numpy as jnp
    from warpconvnet_tpu.ops.kernel_map import (
        build_pair_table as jax_build,
        kernel_offsets,
    )

    rng = np.random.default_rng(2)
    raw = rng.integers(0, 16, (800, 3)).astype(np.int32)
    in_coords = np.unique(raw, axis=0)
    n = len(in_coords)
    offsets = kernel_offsets(3)

    table = native.build_pair_table(in_coords, in_coords, offsets)
    jt = jax_build(
        jnp.asarray(in_coords), jnp.ones((n,), bool), jnp.asarray(in_coords),
        offsets,
    ).table
    np.testing.assert_array_equal(table, np.asarray(jt))

    # strided variant
    out_coords = native.stride_coords(in_coords, 2)
    table_s = native.build_pair_table(
        in_coords, out_coords, kernel_offsets(2), stride=2
    )
    # contract check: every hit satisfies in == 2*out + off
    k = len(kernel_offsets(2))
    for ki in range(k):
        hits = np.nonzero(table_s[ki] >= 0)[0]
        lhs = in_coords[table_s[ki, hits]]
        rhs = out_coords[hits] * 2 + kernel_offsets(2)[ki]
        np.testing.assert_array_equal(lhs, rhs)


def test_reverse_table_roundtrip():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 12, (400, 3)).astype(np.int32)
    in_coords = np.unique(raw, axis=0)
    from warpconvnet_tpu.ops.kernel_map import kernel_offsets

    table = native.build_pair_table(in_coords, in_coords, kernel_offsets(3))
    rev = native.reverse_pair_table(table, len(in_coords))
    k, n = table.shape
    for ki in range(k):
        for o in np.nonzero(table[ki] >= 0)[0][:50]:
            assert rev[ki, table[ki, o]] == o
