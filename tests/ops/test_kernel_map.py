"""The formal kernel-map contract (reference
``tests/coords/test_kernel_map_invariants.py``): for input coords I, output
coords O, stride S, table[k, o] == i >= 0 implies I[i] == S*O[o] + offset[k],
and every valid (i, o, k) triple appears exactly once."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.ops.kernel_map import (
    PairTable,
    build_pair_table,
    expand_coords,
    identity_offset_index,
    kernel_offsets,
    stride_coords,
)
from warpconvnet_tpu.ops.unique import unique_coords

pytestmark = pytest.mark.smoke  # pre-commit smoke tier (tests/README.md)



def _check_invariants(in_c, in_valid, out_c, out_valid, table, offsets, stride):
    """Brute-force verification of the contract."""
    table = np.asarray(table)
    stride = np.asarray(stride if hasattr(stride, "__len__") else [stride] * 3)
    in_set = {tuple(r): i for i, r in enumerate(in_c[in_valid].tolist())}
    valid_in_rows = np.nonzero(in_valid)[0]
    row_of = {tuple(in_c[i].tolist()): i for i in valid_in_rows}
    n_checked = 0
    for k in range(len(offsets)):
        for o in range(len(out_c)):
            q = tuple((stride * out_c[o] + offsets[k]).tolist())
            expected = row_of.get(q, -1) if out_valid[o] else -1
            got = table[k, o]
            assert got == expected, f"k={k} o={o}: got {got}, expected {expected}"
            n_checked += 1
    return n_checked


@pytest.mark.parametrize("kernel_size,stride", [(3, 1), (3, 2), (2, 2), (5, 1)])
def test_kernel_map_invariants(kernel_size, stride):
    rng = np.random.default_rng(0)
    n = 512
    in_c = rng.integers(0, 20, size=(n, 3)).astype(np.int32)
    in_c = np.unique(in_c, axis=0)
    n_valid = len(in_c)
    pad = np.zeros((n - n_valid, 3), np.int32)
    in_full = np.concatenate([in_c, pad], axis=0)
    in_valid = np.zeros((n,), bool)
    in_valid[:n_valid] = True

    offs = kernel_offsets(kernel_size)
    if stride == 1:
        out_res_coords, out_valid_np = in_full, in_valid
    else:
        res = stride_coords(jnp.asarray(in_full), jnp.asarray(in_valid), stride, max_out=n)
        out_res_coords = np.asarray(res.coords)
        out_valid_np = np.arange(n) < int(res.num_unique)

    pt = build_pair_table(
        jnp.asarray(in_full),
        jnp.asarray(in_valid),
        jnp.asarray(out_res_coords),
        offs,
        stride=stride,
        out_valid=jnp.asarray(out_valid_np),
    )
    _check_invariants(in_full, in_valid, out_res_coords, out_valid_np, pt.table, offs, stride)


def test_identity_offset():
    offs = kernel_offsets(3)
    idx = identity_offset_index(offs)
    assert idx == 13  # center of 3x3x3
    np.testing.assert_array_equal(offs[idx], [0, 0, 0])

    # Submanifold conv: identity slot of the table is the identity map.
    rng = np.random.default_rng(1)
    c = np.unique(rng.integers(0, 10, size=(200, 3)).astype(np.int32), axis=0)
    n = len(c)
    pt = build_pair_table(jnp.asarray(c), jnp.ones((n,), bool), jnp.asarray(c), offs, stride=1)
    np.testing.assert_array_equal(np.asarray(pt.table)[idx], np.arange(n))


def test_reverse_table():
    rng = np.random.default_rng(2)
    c = np.unique(rng.integers(0, 12, size=(300, 3)).astype(np.int32), axis=0)
    n = len(c)
    offs = kernel_offsets(3)
    res = stride_coords(jnp.asarray(c), jnp.ones((n,), bool), 2, max_out=n)
    pt = build_pair_table(jnp.asarray(c), jnp.ones((n,), bool), res.coords, offs, stride=2)
    rev = pt.reverse()
    fwd = np.asarray(pt.table)
    bwd = np.asarray(rev.table)
    # rev[k, i] == o  <=>  fwd[k, o] == i
    for k in range(len(offs)):
        for o in range(fwd.shape[1]):
            i = fwd[k, o]
            if i >= 0:
                assert bwd[k, i] == o
        # every rev entry is backed by a fwd entry
        for i in range(bwd.shape[1]):
            o = bwd[k, i]
            if o >= 0:
                assert fwd[k, o] == i


def test_expand_coords_generative():
    c = np.array([[0, 0, 0], [5, 5, 5]], np.int32)
    offs = kernel_offsets(3)
    res = expand_coords(jnp.asarray(c), jnp.ones((2,), bool), offs, max_out=64)
    expected = np.unique(
        (c[None, :, :] + offs[:, None, :]).reshape(-1, 3), axis=0
    )
    nu = int(res.num_unique)
    assert nu == len(expected)
    np.testing.assert_array_equal(np.asarray(res.coords)[:nu], expected)


def test_neighbor_count():
    # Dense 4x4x4 block, 3^3 submanifold: interior voxels have 27 neighbors.
    g = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"), -1).reshape(-1, 3).astype(np.int32)
    n = len(g)
    offs = kernel_offsets(3)
    pt = build_pair_table(jnp.asarray(g), jnp.ones((n,), bool), jnp.asarray(g), offs)
    counts = np.asarray(pt.neighbor_count_per_output())
    interior = ((g > 0) & (g < 3)).all(axis=1)
    assert np.all(counts[interior] == 27)
    corner = (g == 0).all(axis=1) | (g == 3).all(axis=1)
    assert np.all(counts[(g == np.array([0, 0, 0])).all(axis=1)] == 8)
