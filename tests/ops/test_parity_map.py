"""Parity-partition kernel maps (kernel == stride) must match the probe.

The direct construction (ops/kernel_map.py parity_pair_tables_from_unique /
parity_down_map) replaces the K-offset search for even kernel==stride convs;
these tests pin it element-for-element against the general probe builder on
the same coordinate sets (reference invariant: tests/coords/
test_kernel_map_invariants.py — every valid (input, output, k) triple appears
exactly once).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.ops.kernel_map import (
    build_pair_tables_batched,
    kernel_offsets,
    parity_down_map,
    parity_pair_tables_from_unique,
    parity_partition_applies,
    stride_coords,
)
from warpconvnet_tpu.ops.keys import PAD_COORD, pack_coords, sort_keys


def _scene(rng, n, n_cap, rng_max=64):
    c = np.unique(
        rng.integers(0, rng_max, (n, 3), dtype=np.int32), axis=0
    )
    keys = (
        c[:, 0].astype(np.int64) * (1 << 32)
        + c[:, 1].astype(np.int64) * (1 << 16)
        + c[:, 2]
    )
    c = c[np.argsort(keys)]
    out = np.full((n_cap, 3), PAD_COORD, np.int32)
    out[: len(c)] = c
    return out, len(c)


def test_applies_predicate():
    assert parity_partition_applies(2, 2)
    assert parity_partition_applies((2, 2, 2), (2, 2, 2))
    assert parity_partition_applies(4, 4)
    assert not parity_partition_applies(3, 3)  # odd: centered offsets
    assert not parity_partition_applies(3, 2)
    assert not parity_partition_applies(2, 2, dilation=2)


@pytest.mark.parametrize("ks", [2, 4])
def test_strided_parity_matches_probe(ks):
    rng = np.random.default_rng(3)
    b, n_cap, cap = 2, 512, 256
    coords = np.stack([_scene(rng, 400, n_cap)[0] for _ in range(b)])
    nv = np.array(
        [_scene(np.random.default_rng(3), 400, n_cap)[1]] * b, np.int32
    )
    # regenerate per-scene properly
    coords, nvl = [], []
    for i in range(b):
        c, k = _scene(np.random.default_rng(3 + i), 400, n_cap)
        coords.append(c)
        nvl.append(k)
    coords = jnp.asarray(np.stack(coords))
    nv = jnp.asarray(np.array(nvl, np.int32))
    offs = kernel_offsets(ks)
    st = (ks, ks, ks)

    valid = np.arange(n_cap)[None, :] < np.asarray(nv)[:, None]
    res = jax.vmap(
        lambda c, v: stride_coords(c, v, st, max_out=cap)
    )(coords, jnp.asarray(valid))

    tab, rev = parity_pair_tables_from_unique(
        coords, jnp.asarray(valid), res.to_unique, st, cap
    )
    ref = build_pair_tables_batched(
        coords, nv, res.coords,
        jnp.minimum(res.num_unique, cap), offs, stride=st,
        assume_sorted=True, queries_sorted=True, use_probe=False,
    )
    np.testing.assert_array_equal(np.asarray(tab), np.asarray(ref))
    # rev consistency: rev[b,k,i] = o <=> tab[b,k,o] = i
    tab_np, rev_np = np.asarray(tab), np.asarray(rev)
    for bi in range(b):
        for k in range(offs.shape[0]):
            o_idx = np.nonzero(tab_np[bi, k] >= 0)[0]
            i_idx = tab_np[bi, k][o_idx]
            expect = np.full(n_cap, -1, np.int64)
            expect[i_idx] = o_idx
            np.testing.assert_array_equal(rev_np[bi, k], expect)


def test_down_map_matches_probe():
    rng = np.random.default_rng(7)
    b, n_cap, cap = 2, 512, 256
    coords, nvl = [], []
    for i in range(b):
        c, k = _scene(np.random.default_rng(11 + i), 400, n_cap)
        coords.append(c)
        nvl.append(k)
    fine = jnp.asarray(np.stack(coords))
    fnv = jnp.asarray(np.array(nvl, np.int32))
    offs = kernel_offsets(2)
    # Coarse set: a random subset of the fine parents (NOT the full
    # floor-div set) — exercises dropped fine rows.
    coarse_list = []
    cnv = []
    for i in range(b):
        par = np.unique(np.asarray(fine[i][: nvl[i]]) // 2, axis=0)
        keep = np.random.default_rng(5 + i).random(len(par)) < 0.7
        par = par[keep]
        keys = (
            par[:, 0].astype(np.int64) * (1 << 32)
            + par[:, 1] * (1 << 16)
            + par[:, 2]
        )
        par = par[np.argsort(keys)][:cap]
        out = np.full((cap, 3), PAD_COORD, np.int32)
        out[: len(par)] = par
        coarse_list.append(out)
        cnv.append(len(par))
    coarse = jnp.asarray(np.stack(coarse_list))
    cnv = jnp.asarray(np.array(cnv, np.int32))

    fv = np.arange(n_cap)[None, :] < np.asarray(fnv)[:, None]
    tab, rev = parity_down_map(fine, jnp.asarray(fv), coarse, cnv, (2, 2, 2))
    ref = build_pair_tables_batched(
        fine, fnv, coarse, cnv, offs, stride=2,
        assume_sorted=True, queries_sorted=False, use_probe=False,
    )
    np.testing.assert_array_equal(np.asarray(tab), np.asarray(ref))


def test_parity_strided_unique_matches_stride_coords():
    from warpconvnet_tpu.ops.kernel_map import parity_strided_unique

    b, n_cap, cap = 2, 512, 256
    coords, nvl = [], []
    for i in range(b):
        c, k = _scene(np.random.default_rng(21 + i), 400, n_cap)
        coords.append(c)
        nvl.append(k)
    coords = jnp.asarray(np.stack(coords))
    nv = jnp.asarray(np.array(nvl, np.int32))
    valid = np.arange(n_cap)[None, :] < np.asarray(nv)[:, None]

    oc, onu, to_u = parity_strided_unique(coords, nv, (2, 2, 2), cap)
    ref = jax.vmap(
        lambda c, v: stride_coords(c, v, (2, 2, 2), max_out=cap)
    )(coords, jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(ref.coords))
    np.testing.assert_array_equal(np.asarray(onu), np.asarray(ref.num_unique))
    np.testing.assert_array_equal(
        np.asarray(to_u), np.asarray(ref.to_unique)
    )


def test_parity_strided_unique_negative_coords_and_overflow():
    from warpconvnet_tpu.ops.kernel_map import parity_strided_unique

    rng = np.random.default_rng(5)
    b, n_cap, cap = 1, 256, 16  # cap forces overflow
    c = np.unique(
        rng.integers(-40, 40, (200, 3), dtype=np.int32), axis=0
    )
    keys = (
        c[:, 0].astype(np.int64) * (1 << 32)
        + (c[:, 1].astype(np.int64) + 32768) * (1 << 16)
        + c[:, 2]
        + 32768
    )
    c = c[np.argsort(keys)]
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    coords[0, : len(c)] = c
    nv = jnp.asarray(np.array([len(c)], np.int32))
    coords = jnp.asarray(coords)
    valid = np.arange(n_cap)[None, :] < np.asarray(nv)[:, None]

    oc, onu, to_u = parity_strided_unique(coords, nv, (4, 4, 4), cap)
    ref = jax.vmap(
        lambda cc, v: stride_coords(cc, v, (4, 4, 4), max_out=cap)
    )(coords, jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(ref.coords))
    np.testing.assert_array_equal(np.asarray(onu), np.asarray(ref.num_unique))
    np.testing.assert_array_equal(
        np.asarray(to_u), np.asarray(ref.to_unique)
    )
