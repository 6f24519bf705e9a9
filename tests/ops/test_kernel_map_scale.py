"""Kernel-map contract at ScanNet scale (reference
tests/coords/test_kernel_map_invariants.py:43-56 — 200k/scene, coord_range
512): for every (k, o) with table[k, o] == i >= 0,
``in[i] == stride * out[o] + offset[k]``, and every valid triple appears
exactly once. Marked slow; also covers the probe + assume_sorted fast path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from warpconvnet_tpu.ops.kernel_map import build_pair_table, kernel_offsets


def _scannet_like(rng, n_target=200_000, coord_range=512):
    pts = rng.standard_normal((int(n_target * 1.5), 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True) + 1e-9
    r = coord_range * 0.4 * (1 + 0.1 * rng.standard_normal((len(pts), 1)))
    coords = np.round(pts * r + coord_range / 2).astype(np.int32)
    return np.unique(coords, axis=0)[:n_target]  # lexsorted


@pytest.mark.parametrize("use_fast", [False, True])
def test_kernel_map_invariants_at_scale(use_fast):
    rng = np.random.default_rng(0)
    # The probe fast path runs through the Pallas *interpreter* on CPU —
    # exercise it at reduced scale; the pure-XLA path gets full ScanNet scale
    # (the reference tests at 200k/scene).
    coords = _scannet_like(rng, n_target=40_000 if use_fast else 200_000)
    n = len(coords)
    assert n > (30_000 if use_fast else 150_000)
    offsets = kernel_offsets(3)
    valid = np.ones((n,), bool)

    pt = build_pair_table(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(coords), offsets,
        assume_sorted=use_fast, use_probe=use_fast,
    )
    table = np.asarray(pt.table)

    # Contract part 1: every hit satisfies in == out + offset.
    for k in range(27):
        hits = np.nonzero(table[k] >= 0)[0]
        np.testing.assert_array_equal(
            coords[table[k, hits]], coords[hits] + offsets[k]
        )

    # Contract part 2: exactly-once — ground truth via a dict over the full
    # set, checked on a 20k sample per offset.
    full = {tuple(c): i for i, c in enumerate(coords)}
    sample_idx = np.arange(0, n, max(n // 20000, 1))
    for k in (0, 13, 26):
        got = table[k, sample_idx]
        want = np.array(
            [full.get(tuple(coords[i] + offsets[k]), -1) for i in sample_idx]
        )
        np.testing.assert_array_equal(got, want)

    # Identity offset maps every row to itself.
    k_id = 13
    assert (offsets[k_id] == 0).all()
    np.testing.assert_array_equal(table[k_id], np.arange(n))


def test_probe_kernel_map_invariants_500k():
    """The PROBE path (the one with the sentinel/monotonicity edge cases —
    round-2 advisor findings) at full ScanNet scale: 500k voxels through the
    Pallas interpreter, checked pair-exact against the pure-XLA bucketed
    search (itself contract-tested above). Reference scale:
    tests/coords/test_kernel_map_invariants.py:43-56 (500k+).
    """
    rng = np.random.default_rng(1)
    coords = _scannet_like(rng, n_target=500_000, coord_range=1024)
    n = len(coords)
    assert n >= 400_000
    offsets = kernel_offsets(3)
    valid = np.ones((n,), bool)

    probe = build_pair_table(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(coords), offsets,
        assume_sorted=True, use_probe=True,
    )
    ref = build_pair_table(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(coords), offsets,
        assume_sorted=False, use_probe=False,
    )
    table = np.asarray(probe.table)
    np.testing.assert_array_equal(table, np.asarray(ref.table))

    # Direct invariants on the probe table (not just equality): every hit
    # satisfies in == out + offset, and the identity row is iota.
    for k in range(27):
        hits = np.nonzero(table[k] >= 0)[0]
        np.testing.assert_array_equal(
            coords[table[k, hits]], coords[hits] + offsets[k]
        )
    np.testing.assert_array_equal(table[13], np.arange(n))
