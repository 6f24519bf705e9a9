"""Pallas kernel-map probe vs the XLA bucketed search (interpret mode) and
the full pair-table fast path (reference fused-probe parity,
cuhash_kernel_map.cu)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu import constants
from warpconvnet_tpu.kernels.sorted_search import sorted_probe
from warpconvnet_tpu.ops.keys import lookup_in_sorted, pack_coords
from warpconvnet_tpu.ops.kernel_map import build_pair_table, kernel_offsets


def _sorted_coords(rng, n, grid):
    raw = rng.integers(0, grid, (n * 2, 3)).astype(np.int32)
    return np.unique(raw, axis=0)[:n]  # lexsorted unique


def test_probe_matches_bucketed_search():
    rng = np.random.default_rng(0)
    coords = _sorted_coords(rng, 2000, 32)
    keys = pack_coords(jnp.asarray(coords))
    offsets = kernel_offsets(3)
    # queries: per-offset monotone rows, padded per row to tile_q
    tile_q = 512
    n = len(coords)
    n_pad = (n + tile_q - 1) // tile_q * tile_q
    imax = np.iinfo(np.int32).max
    q = coords[None] + offsets[:, None, :]
    qk = pack_coords(jnp.asarray(q.reshape(-1, 3)))
    qk = tuple(
        jnp.pad(
            x.reshape(len(offsets), n), ((0, 0), (0, n_pad - n)),
            constant_values=imax,
        ).reshape(-1)
        for x in qk
    )
    got = np.asarray(sorted_probe(keys, qk, tile_q=tile_q, interpret=True))
    ref = np.asarray(lookup_in_sorted(keys, qk))
    np.testing.assert_array_equal(got, ref)
    assert (got >= 0).sum() > n  # identity offset hits everything


def test_probe_fallback_on_tiny_window():
    """window_factor=1 with a strided query pattern forces overflow tiles ->
    the XLA fallback path must keep results exact."""
    rng = np.random.default_rng(1)
    coords = _sorted_coords(rng, 4096, 64)
    keys = pack_coords(jnp.asarray(coords))
    # queries: every 8th coordinate (span 8x window) - still monotone
    q = coords[::8]
    qs = np.pad(
        q, ((0, 512 - len(q) % 512 if len(q) % 512 else 0), (0, 0)),
        constant_values=2**14,
    )
    qk = pack_coords(jnp.asarray(qs))
    got = np.asarray(sorted_probe(keys, qk, tile_q=512, window_factor=1,
                                  interpret=True))
    ref = np.asarray(lookup_in_sorted(keys, qk))
    np.testing.assert_array_equal(got, ref)


def test_probe_exact_on_unsorted_queries():
    """Non-monotone query tiles must be routed to the exact fallback by the
    per-tile monotonicity guard (probe exactness no longer silently depends
    on the caller's sortedness claim)."""
    rng = np.random.default_rng(3)
    coords = _sorted_coords(rng, 3000, 48)
    keys = pack_coords(jnp.asarray(coords))
    q = coords.copy()
    rng.shuffle(q)  # deliberately unsorted queries
    pad = (-len(q)) % 512
    qs = np.pad(q, ((0, pad), (0, 0)), constant_values=32767)
    qk = pack_coords(jnp.asarray(qs))
    got = np.asarray(sorted_probe(keys, qk, tile_q=512, interpret=True))
    ref = np.asarray(lookup_in_sorted(keys, qk))
    np.testing.assert_array_equal(got, ref)
    assert (got[: len(q)] >= 0).all()  # every shuffled query exists


@pytest.mark.slow
def test_mz_probe_z_range_boundary():
    """A z-group whose base (dz=0) query sits just OUTSIDE the valid coord
    range must still find matches for in-range dz queries — the raw-z low key
    keeps per-dz arithmetic exact (previously the whole group was sentineled
    on the base z, silently dropping pairs).

    Construction: stride-2, 5^3 kernel, coarse out z = 16384 -> base query
    z = 32768 (out of range, > PAD_COORD) but dz = -2 reaches the valid
    voxel at z = 32766."""
    from warpconvnet_tpu.ops.kernel_map import build_pair_tables_batched

    in_c = np.array(
        [[4, 4, 32764], [5, 5, 32766], [5, 5, 32764], [6, 4, 32766]],
        np.int32,
    )
    in_c = in_c[np.lexsort((in_c[:, 2], in_c[:, 1], in_c[:, 0]))]
    out_c = np.array([[2, 2, 16382], [2, 2, 16384]], np.int32)
    n_in, n_out = 8, 8
    pad_in = np.full((n_in, 3), 32767, np.int32)
    pad_in[: len(in_c)] = in_c
    pad_out = np.full((n_out, 3), 32767, np.int32)
    pad_out[: len(out_c)] = out_c
    offs = kernel_offsets(5)  # dz fastest, zg = 5
    kwargs = dict(stride=2)
    table = build_pair_tables_batched(
        jnp.asarray(pad_in)[None], jnp.asarray([len(in_c)]),
        jnp.asarray(pad_out)[None], jnp.asarray([len(out_c)]),
        offs, assume_sorted=True, queries_sorted=True, use_probe=True,
        **kwargs,
    )[0]
    ref = build_pair_tables_batched(
        jnp.asarray(pad_in)[None], jnp.asarray([len(in_c)]),
        jnp.asarray(pad_out)[None], jnp.asarray([len(out_c)]),
        offs, assume_sorted=False, use_probe=False, **kwargs,
    )[0]
    np.testing.assert_array_equal(np.asarray(table), np.asarray(ref))
    # out (2,2,16384)*2 + (1,1,-2) == in (5,5,32766): must be present even
    # though the group base query z (32768) exceeds the coordinate range.
    k_idx = int(np.nonzero((offs == [1, 1, -2]).all(1))[0][0])
    i_idx = int(np.nonzero((in_c == [5, 5, 32766]).all(1))[0][0])
    assert int(np.asarray(table)[k_idx, 1]) == i_idx


def test_pair_table_fast_paths_match():
    rng = np.random.default_rng(2)
    coords = _sorted_coords(rng, 1500, 24)
    n = 2048
    cpad = np.full((n, 3), 32767, np.int32)
    cpad[: len(coords)] = coords
    valid = np.arange(n) < len(coords)
    offsets = kernel_offsets(3)

    base = build_pair_table(
        jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(cpad), offsets,
        assume_sorted=False, use_probe=False,
    )
    fast = build_pair_table(
        jnp.asarray(cpad), jnp.asarray(valid), jnp.asarray(cpad), offsets,
        assume_sorted=True, use_probe=True,
    )
    np.testing.assert_array_equal(np.asarray(base.table), np.asarray(fast.table))


def test_span_empty_tiles_skip_exactly():
    """Tiles whose whole query range holds no key must emit -1 via the
    -3 skip marker (no DMA) and stay exact vs the XLA lookup."""
    import numpy as np
    import jax.numpy as jnp
    from warpconvnet_tpu.kernels.sorted_search import sorted_probe_batched
    from warpconvnet_tpu.ops.keys import lookup_in_sorted

    rng = np.random.default_rng(60)
    n = 2048
    # Keys clustered at the low end; queries span a far-away empty region
    # for entire tiles.
    kh = np.sort(rng.integers(0, 1000, n)).astype(np.int32)
    kl = rng.integers(0, 50, n).astype(np.int32)
    order = np.lexsort((kl, kh))
    kh, kl = kh[order], kl[order]

    q = 2048 * 4
    qh = np.sort(
        np.concatenate([
            rng.integers(0, 1000, q // 2),       # overlapping region
            rng.integers(500000, 501000, q // 2)  # empty region
        ])
    ).astype(np.int32)
    ql = rng.integers(0, 50, q).astype(np.int32)
    # sort (qh, ql) lexicographically per tile: global lexsort
    qorder = np.lexsort((ql, qh))
    qh, ql = qh[qorder], ql[qorder]

    got = sorted_probe_batched(
        (jnp.asarray(kh)[None], jnp.asarray(kl)[None]),
        (jnp.asarray(qh)[None], jnp.asarray(ql)[None]),
        interpret=True,
    )[0]
    ref = lookup_in_sorted(
        (jnp.asarray(kh), jnp.asarray(kl)),
        (jnp.asarray(qh), jnp.asarray(ql)),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # the far region really misses everything
    assert np.all(np.asarray(got)[qh >= 500000] == -1)


def _table_pair(in_c, out_c, offs, n_in=None, n_out=None, **kwargs):
    """Probe-path table vs the unsorted/bucketed reference for one scene."""
    from warpconvnet_tpu.ops.kernel_map import build_pair_tables_batched

    n_in = n_in or -(-len(in_c) // 256) * 256
    n_out = n_out or -(-len(out_c) // 256) * 256
    pad_in = np.full((n_in, 3), 32767, np.int32)
    pad_in[: len(in_c)] = in_c
    pad_out = np.full((n_out, 3), 32767, np.int32)
    pad_out[: len(out_c)] = out_c
    args = (
        jnp.asarray(pad_in)[None], jnp.asarray([len(in_c)]),
        jnp.asarray(pad_out)[None], jnp.asarray([len(out_c)]), offs,
    )
    got = build_pair_tables_batched(
        *args, assume_sorted=True, queries_sorted=True, use_probe=True,
        **kwargs,
    )[0]
    ref = build_pair_tables_batched(
        *args, assume_sorted=False, use_probe=False, **kwargs
    )[0]
    return np.asarray(got), np.asarray(ref)


def test_m2_probe_y_boundary_no_alias():
    """y + dy past the coordinate range wraps the raw-y hi key into the
    NEXT x plane — the per-dy post-mask must kill those slots even when a
    real voxel sits exactly at the alias target (x+1, y_wrapped)."""
    in_c = np.array(
        [
            [5, 32764, 7],
            [5, 32766, 7],   # top of the valid y range
            [6, -32762, 7],  # alias target of (5, 32766 + 2 == 32770)
            [6, -32760, 7],
        ],
        np.int32,
    )
    in_c = in_c[np.lexsort((in_c[:, 2], in_c[:, 1], in_c[:, 0]))]
    # 5^3 submanifold: dy spans ±2, so out (5, 32766, 7) probes y up to
    # 32768 (wraps) — none of those may match the x=6 voxels.
    got, ref = _table_pair(in_c, in_c, kernel_offsets(5))
    np.testing.assert_array_equal(got, ref)
    offs = kernel_offsets(5)
    # Sanity: in-range dy = -2 from (5, 32766) to (5, 32764) IS found.
    k_idx = int(np.nonzero((offs == [0, -2, 0]).all(1))[0][0])
    o_idx = int(np.nonzero((in_c == [5, 32766, 7]).all(1))[0][0])
    i_idx = int(np.nonzero((in_c == [5, 32764, 7]).all(1))[0][0])
    assert got[k_idx, o_idx] == i_idx


def test_m2_probe_y_range_boundary_strided():
    """Mirror of the z-range test on the y axis: the block base y (dy=0)
    sits outside the valid range but dy = -2 reaches a real voxel — raw-y
    hi arithmetic must keep that slot exact instead of sentineling the
    whole dx block."""
    in_c = np.array(
        [[4, 32764, 4], [5, 32766, 5], [5, 32764, 5], [6, 32766, 4]],
        np.int32,
    )
    in_c = in_c[np.lexsort((in_c[:, 2], in_c[:, 1], in_c[:, 0]))]
    out_c = np.array([[2, 16382, 2], [2, 16384, 2]], np.int32)
    got, ref = _table_pair(in_c, out_c, kernel_offsets(5), stride=2)
    np.testing.assert_array_equal(got, ref)
    offs = kernel_offsets(5)
    # out (2,16384,2)*2 + (1,-2,1) == in (5,32766,5).
    k_idx = int(np.nonzero((offs == [1, -2, 1]).all(1))[0][0])
    i_idx = int(np.nonzero((in_c == [5, 32766, 5]).all(1))[0][0])
    assert got[k_idx, 1] == i_idx


@pytest.mark.parametrize("ks,dil", [(7, 1), (3, 2), (5, 1)])
def test_m2_probe_large_and_dilated_kernels(ks, dil):
    """dx-major blocks with 7^3, dilated 3^3 (non-consecutive dy/dz), and
    5^3 grids all match the bucketed reference on a random scene."""
    rng = np.random.default_rng(ks * 10 + dil)
    coords = _sorted_coords(rng, 1800, 20)
    offs = kernel_offsets(ks)
    if dil > 1:
        offs = offs * dil
    got, ref = _table_pair(coords, coords, offs)
    np.testing.assert_array_equal(got, ref)
    assert (got >= 0).sum() > len(coords)  # identity + neighbors hit


def test_m2_probe_stride2_k8():
    """Stride-2 2^3 maps (dy, dz deltas {0, 1} per dx block) through the
    multi-(y, z) probe match the reference."""
    rng = np.random.default_rng(77)
    coords = _sorted_coords(rng, 1500, 24)
    out = np.unique(coords // 2, axis=0)
    offs = kernel_offsets(2)  # deltas {0, 1}
    got, ref = _table_pair(coords, out, offs, stride=2)
    np.testing.assert_array_equal(got, ref)
