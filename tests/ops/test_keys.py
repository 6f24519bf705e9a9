import numpy as np
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.ops.keys import (

    PAD_COORD,
    argsort_keys,
    lookup_in_sorted,
    pack_coords,
    searchsorted_keys,
    unique_mask_sorted,
)

pytestmark = pytest.mark.smoke  # pre-commit smoke tier (tests/README.md)


@pytest.mark.parametrize("coord_bits", [(10, 10, 10), (16, 16, 16), (17, 17, 17)])
def test_pack_monotone(coord_bits):
    rng = np.random.default_rng(1)
    lim = 2 ** (min(coord_bits) - 1) - 1
    c = rng.integers(-lim, lim, size=(500, 3)).astype(np.int32)
    keys = pack_coords(jnp.asarray(c), coord_bits)
    keys_np = np.stack([np.asarray(k) for k in keys], axis=-1)
    order_keys = np.lexsort(keys_np.T[::-1])
    order_coords = np.lexsort(c.T[::-1])
    # Lexicographic order by keys == lexicographic order by coords.
    np.testing.assert_array_equal(c[order_keys], c[order_coords])


@pytest.mark.parametrize("coord_bits", [(10, 10, 10), (16, 16, 16), (17, 17, 17)])
def test_lookup_roundtrip(coord_bits):
    rng = np.random.default_rng(2)
    lim = 2 ** (min(coord_bits) - 1) - 1
    base = rng.integers(-min(lim, 100), min(lim, 100), size=(300, 3)).astype(np.int32)
    base = np.unique(base, axis=0)
    keys = pack_coords(jnp.asarray(base), coord_bits)
    sorted_keys, perm = argsort_keys(keys)

    # Every row must be found, and must map back to itself.
    qkeys = pack_coords(jnp.asarray(base), coord_bits)
    pos = lookup_in_sorted(sorted_keys, qkeys)
    assert np.all(np.asarray(pos) >= 0)
    found = base[np.asarray(perm)[np.asarray(pos)]]
    np.testing.assert_array_equal(found, base)

    # Absent queries return -1 (no false hits).
    absent = base + np.int32(500)
    pos2 = lookup_in_sorted(sorted_keys, pack_coords(jnp.asarray(absent), coord_bits))
    present = {tuple(r) for r in base.tolist()}
    for i, row in enumerate(absent.tolist()):
        if tuple(row) not in present:
            assert int(pos2[i]) == -1


def test_searchsorted_matches_numpy():
    rng = np.random.default_rng(3)
    a = np.sort(rng.integers(0, 1000, size=997).astype(np.int32))
    q = rng.integers(-10, 1010, size=257).astype(np.int32)
    zeros_a = jnp.zeros_like(jnp.asarray(a))
    zeros_q = jnp.zeros_like(jnp.asarray(q))
    for side in ("left", "right"):
        # 2-key search with constant second key reduces to 1-key semantics.
        got = searchsorted_keys((jnp.asarray(a), zeros_a), (jnp.asarray(q), zeros_q), side=side)
        np.testing.assert_array_equal(np.asarray(got), np.searchsorted(a, q, side=side))


def test_unique_mask():
    c = jnp.asarray(np.array([[0, 0, 0], [0, 0, 0], [0, 1, 0], [2, 0, 0], [2, 0, 0]], np.int32))
    keys = pack_coords(c)
    mask = unique_mask_sorted(keys)
    np.testing.assert_array_equal(np.asarray(mask), [True, False, True, True, False])
