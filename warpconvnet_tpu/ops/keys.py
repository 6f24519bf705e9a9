"""Integer-coordinate sort keys — the TPU-native replacement for the reference's
GPU hash engine (``warpconvnet/geometry/coords/search/packed_hashmap.py``,
``csrc/cuhash_hash_table.cu``).

Design
------
TPUs have no native 64-bit integer datapath, so instead of packing 4D coords
into a uint64 hash key (reference ``packed_hashmap.py:33-42``) we represent a
coordinate row as a **tuple of 1..3 int32 keys** compared lexicographically:

* ``coord_bits=(10, 10, 10)`` → a single int32 key (native ``jnp.searchsorted``)
* ``coord_bits=(16, 16, 16)`` → two int32 keys (default; covers |x|,|y|,|z| < 32768)
* anything wider → three raw int32 keys

All downstream machinery (unique voxelization, kernel-map probe, radius cell
lists, window grouping, stride dedup) reduces to:

    ``lax.sort(keys..., num_keys=k)``  +  vectorized n-key binary search

which is jit-stable, shape-static, and needs no scatter races.

Padding convention: invalid rows use ``PAD_COORD`` per axis, which packs to the
maximum key value, so padded rows sort to the end and never match a query.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Sentinel coordinate for padded/invalid rows. Must be representable in the
# widest key config and larger than any valid coordinate.
PAD_COORD = (1 << 15) - 1  # 32767, packs to the max 2-key value

Keys = Tuple[jnp.ndarray, ...]


def pack_coords(coords: jnp.ndarray, coord_bits: Tuple[int, int, int] = (16, 16, 16)) -> Keys:
    """Pack integer coords [..., 3] into a tuple of int32 lexicographic keys.

    The packing is strictly monotone w.r.t. lexicographic coordinate order, so
    sorting by the returned keys sorts coordinates lexicographically.
    """
    x = coords[..., 0].astype(jnp.int32)
    y = coords[..., 1].astype(jnp.int32)
    z = coords[..., 2].astype(jnp.int32)
    bx, by, bz = coord_bits
    total = bx + by + bz
    if total <= 31:
        # Single-key fast path: coords must lie in [-(2^(b-1)), 2^(b-1)).
        key = (
            ((x + (1 << (bx - 1))) << (by + bz))
            + ((y + (1 << (by - 1))) << bz)
            + (z + (1 << (bz - 1)))
        )
        return (key,)
    if bx <= 16 and by <= 16 and bz <= 31:
        # Two-key path: hi = x*2^16 + (y + 2^15) is a bijection onto int32 for
        # 16-bit signed x, y (no overflow: 32767*65536 + 65535 == 2^31 - 1).
        hi = x * 65536 + (y + 32768)
        return (hi, z)
    return (x, y, z)


def keys_leq(a: Keys, b: Keys):
    """Elementwise lexicographic a <= b over key tuples (broadcasting)."""
    result = a[-1] <= b[-1]
    for ka, kb in zip(reversed(a[:-1]), reversed(b[:-1])):
        result = (ka < kb) | ((ka == kb) & result)
    return result


def keys_lt(a: Keys, b: Keys):
    """Elementwise lexicographic a < b over key tuples (broadcasting)."""
    result = a[-1] < b[-1]
    for ka, kb in zip(reversed(a[:-1]), reversed(b[:-1])):
        result = (ka < kb) | ((ka == kb) & result)
    return result


def keys_eq(a: Keys, b: Keys):
    result = a[0] == b[0]
    for ka, kb in zip(a[1:], b[1:]):
        result = result & (ka == kb)
    return result


def sort_keys(keys: Keys, *payloads: jnp.ndarray) -> Tuple[Keys, Tuple[jnp.ndarray, ...]]:
    """Lexicographically sort keys; co-sort payload arrays.

    Returns (sorted_keys, sorted_payloads). Stable.
    """
    operands = tuple(keys) + tuple(payloads)
    out = lax.sort(operands, num_keys=len(keys), is_stable=True)
    return out[: len(keys)], out[len(keys):]


def argsort_keys(keys: Keys) -> Tuple[Keys, jnp.ndarray]:
    """Sort keys, returning (sorted_keys, perm) with perm int32."""
    n = keys[0].shape[-1] if keys[0].ndim else keys[0].shape[0]
    iota = lax.broadcasted_iota(jnp.int32, keys[0].shape, keys[0].ndim - 1)
    sorted_keys, (perm,) = sort_keys(keys, iota)
    return sorted_keys, perm


def searchsorted_keys(sorted_keys: Keys, query_keys: Keys, side: str = "left") -> jnp.ndarray:
    """Vectorized n-key binary search: first index where query could insert.

    ``sorted_keys``: tuple of [N] int32 (lexicographically sorted).
    ``query_keys``: tuple of [Q] int32.
    Returns int32 [Q] in [0, N].
    """
    if len(sorted_keys) == 1:
        return jnp.searchsorted(sorted_keys[0], query_keys[0], side=side).astype(jnp.int32)
    n = sorted_keys[0].shape[0]
    q = query_keys[0].shape[0]
    lo = jnp.zeros((q,), jnp.int32)
    hi = jnp.full((q,), n, jnp.int32)
    # Interval [lo, hi] shrinks from size n to 0; needs floor(log2(n))+1 steps.
    num_iters = max(1, n.bit_length())
    cmp = keys_leq if side == "right" else keys_lt

    def body(_, carry):
        lo, hi = carry
        active = lo < hi  # converged lanes must not move (extra iterations)
        mid = jnp.minimum((lo + hi) >> 1, n - 1)
        mid_keys = tuple(k[mid] for k in sorted_keys)
        go_right = cmp(mid_keys, query_keys)
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
        return lo, hi

    lo, hi = lax.fori_loop(0, num_iters, body, (lo, hi))
    return lo


def lookup_in_sorted_bisect(sorted_keys: Keys, query_keys: Keys) -> jnp.ndarray:
    """Reference implementation: plain binary search (see
    :func:`lookup_in_sorted` for the production path)."""
    n = sorted_keys[0].shape[0]
    pos = searchsorted_keys(sorted_keys, query_keys, side="left")
    safe = jnp.minimum(pos, n - 1)
    found_keys = tuple(k[safe] for k in sorted_keys)
    hit = keys_eq(found_keys, query_keys) & (pos < n)
    return jnp.where(hit, pos, -1).astype(jnp.int32)


_INT32_MAX = jnp.iinfo(jnp.int32).max


def lookup_in_sorted(
    sorted_keys: Keys,
    query_keys: Keys,
    block: int = 128,
    chunk: int = 65536,
) -> jnp.ndarray:
    """Find exact-match positions of queries in sorted keys; -1 if absent.

    Replaces the reference hash-table ``search`` (``packed_hashmap.py:150-180``).
    Returns int32 [Q]: index into the *sorted* array, or -1.

    TPU-tuned **two-level bucketed search** (the VMEM analog of the GPU
    hash probe): measured on v5e, the naive O(log N) binary search costs one
    HBM gather pass over all queries *per iteration* (~1.4 s for 27x131k
    queries); this formulation does
      1. a fused compare-reduce of every query against the N/block bucket
         anchors (pure VPU compute, no gather), then
      2. one gather of the query's single ``block``-wide key row and an
         in-row compare-reduce,
    i.e. exactly two memory passes over the queries (~30 ms for the same
    workload). Queries are processed in ``chunk``-sized slabs via ``lax.map``
    to bound the gathered-row intermediate.
    """
    n = sorted_keys[0].shape[0]
    q = query_keys[0].shape[0]
    nk = len(sorted_keys)

    pad_n = (-n) % block
    padded = tuple(
        jnp.pad(k, (0, pad_n), constant_values=_INT32_MAX) for k in sorted_keys
    )
    nb = (n + pad_n) // block
    rows = tuple(k.reshape(nb, block) for k in padded)
    anchors = tuple(r[:, -1] for r in rows)  # last key per bucket [nb]

    pad_q = (-q) % chunk
    qs = tuple(
        jnp.pad(k, (0, pad_q), constant_values=_INT32_MAX) for k in query_keys
    )
    num_chunks = (q + pad_q) // chunk
    qs = tuple(k.reshape(num_chunks, chunk) for k in qs)

    def one_chunk(qc: Keys) -> jnp.ndarray:
        # Level 1: bucket id = #anchors strictly below the query.
        a = tuple(x[None, :] for x in anchors)  # [1, nb]
        qq = tuple(x[:, None] for x in qc)  # [chunk, 1]
        bucket = jnp.sum(keys_lt(a, qq), axis=1, dtype=jnp.int32)  # [chunk]
        safe_b = jnp.minimum(bucket, nb - 1)
        # Level 2: rank within the gathered bucket row.
        row = tuple(r[safe_b] for r in rows)  # [chunk, block]
        inner = jnp.sum(keys_lt(row, qq), axis=1, dtype=jnp.int32)
        safe_i = jnp.minimum(inner, block - 1)
        found = tuple(
            jnp.take_along_axis(r, safe_i[:, None], axis=1)[:, 0] for r in row
        )
        pos = safe_b * block + inner
        hit = keys_eq(found, qc) & (inner < block) & (pos < n)
        return jnp.where(hit, pos, -1).astype(jnp.int32)

    if num_chunks == 1:
        out = one_chunk(tuple(k[0] for k in qs))
    else:
        out = lax.map(one_chunk, qs).reshape(-1)
    return out[:q]


def rank_in_sorted(
    sorted_keys: Keys,
    query_keys: Keys,
    side: str = "left",
    block: int = 128,
    chunk: int = 65536,
) -> jnp.ndarray:
    """Insertion rank of each query in sorted keys (vectorized searchsorted).

    Same two-level bucketed structure as :func:`lookup_in_sorted` (two memory
    passes instead of log-N gather rounds), but returns the insertion
    position in [0, N] instead of exact-match hits — the primitive for
    cell-list range queries (radius search) and window spans.
    """
    n = sorted_keys[0].shape[0]
    q = query_keys[0].shape[0]
    cmp = keys_leq if side == "right" else keys_lt

    pad_n = (-n) % block
    padded = tuple(
        jnp.pad(k, (0, pad_n), constant_values=_INT32_MAX) for k in sorted_keys
    )
    nb = (n + pad_n) // block
    rows = tuple(k.reshape(nb, block) for k in padded)
    anchors = tuple(r[:, -1] for r in rows)

    pad_q = (-q) % chunk
    qs = tuple(
        jnp.pad(k, (0, pad_q), constant_values=_INT32_MAX) for k in query_keys
    )
    num_chunks = (q + pad_q) // chunk
    qs = tuple(k.reshape(num_chunks, chunk) for k in qs)

    def one_chunk(qc: Keys) -> jnp.ndarray:
        a = tuple(x[None, :] for x in anchors)
        qq = tuple(x[:, None] for x in qc)
        # Bucket = #anchors strictly/leq below the query.
        bucket = jnp.sum(cmp(a, qq), axis=1, dtype=jnp.int32)
        safe_b = jnp.minimum(bucket, nb - 1)
        row = tuple(r[safe_b] for r in rows)
        inner = jnp.sum(cmp(row, qq), axis=1, dtype=jnp.int32)
        pos = safe_b * block + inner
        return jnp.minimum(pos, n).astype(jnp.int32)

    if num_chunks == 1:
        out = one_chunk(tuple(k[0] for k in qs))
    else:
        out = lax.map(one_chunk, qs).reshape(-1)
    return out[:q]


def unique_mask_sorted(sorted_keys: Keys, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Boolean mask of first-occurrence rows in lexicographically sorted keys."""
    first = jnp.ones_like(sorted_keys[0], dtype=bool)
    neq = ~keys_eq(tuple(k[1:] for k in sorted_keys), tuple(k[:-1] for k in sorted_keys))
    first = first.at[1:].set(neq)
    if valid is not None:
        first = first & valid
    return first
