"""Bucketed lookup must match the plain binary search bit-for-bit."""

import numpy as np
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.ops.keys import (
    lookup_in_sorted,
    lookup_in_sorted_bisect,
    pack_coords,
)


@pytest.mark.parametrize("n,q", [(100, 37), (1000, 5000), (4096, 4096)])
@pytest.mark.parametrize("seed", [0, 1])
def test_matches_bisect(n, q, seed):
    rng = np.random.default_rng(seed)
    coords = rng.integers(-200, 200, (n, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    keys = pack_coords(jnp.asarray(coords))
    order = np.lexsort(
        tuple(np.asarray(k) for k in reversed(keys))
    )
    skeys = tuple(k[order] for k in keys)

    queries = rng.integers(-220, 220, (q, 3)).astype(np.int32)
    # ensure plenty of exact hits
    queries[: q // 2] = coords[rng.integers(0, len(coords), q // 2)]
    qkeys = pack_coords(jnp.asarray(queries))

    a = np.asarray(lookup_in_sorted(skeys, qkeys, block=64, chunk=1024))
    b = np.asarray(lookup_in_sorted_bisect(skeys, qkeys))
    np.testing.assert_array_equal(a, b)
    # hits really are exact matches
    hits = a >= 0
    assert hits[: q // 2].all()


def test_single_key_path():
    rng = np.random.default_rng(2)
    vals = np.unique(rng.integers(0, 1000, 500)).astype(np.int32)
    queries = rng.integers(0, 1100, 2000).astype(np.int32)
    a = np.asarray(lookup_in_sorted((jnp.asarray(vals),), (jnp.asarray(queries),)))
    for i in range(0, 2000, 97):
        idx = np.searchsorted(vals, queries[i])
        expected = idx if idx < len(vals) and vals[idx] == queries[i] else -1
        assert a[i] == expected
