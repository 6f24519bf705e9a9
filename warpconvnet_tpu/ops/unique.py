"""Sort-based coordinate deduplication — replaces the reference's hash-table
unique machinery (``warpconvnet/utils/unique.py:16-240``,
``geometry/coords/ops/voxel.py:33-276``) with jit-stable, shape-static XLA.

All results are padded to a static ``max_out`` capacity; the true count is a
traced int32. Padded rows carry ``PAD_COORD`` coords and map to an overflow
segment so reductions ignore them.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.ops.keys import (
    PAD_COORD,
    argsort_keys,
    pack_coords,
    sort_keys,
    unique_mask_sorted,
)


class UniqueResult(NamedTuple):
    """Result of :func:`unique_coords`.

    Attributes:
      coords: [max_out, 3] int32 — unique coordinates in lexicographic order;
        rows >= num_unique are PAD_COORD.
      num_unique: [] int32 — number of valid unique rows (may exceed max_out
        if capacity overflowed; compare against max_out to detect).
      to_unique: [N] int32 — for every input row, the index of its unique row
        in ``coords``; invalid/padded input rows map to ``max_out`` (an
        overflow segment — use num_segments=max_out+1 and drop the last row).
      counts: [max_out] int32 — multiplicity of each unique row.
    """

    coords: jnp.ndarray
    num_unique: jnp.ndarray
    to_unique: jnp.ndarray
    counts: jnp.ndarray


def unique_coords(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    max_out: int,
    coord_bits: Tuple[int, int, int] = (16, 16, 16),
) -> UniqueResult:
    """Deduplicate integer coordinate rows.

    Equivalent of reference ``unique_hashmap`` + ``to_unique`` CSR mapping
    (``utils/unique.py:209``), built on lexicographic sort.

    Args:
      coords: [N, 3] int32.
      valid: [N] bool — rows to consider.
      max_out: static output capacity.
    """
    n = coords.shape[0]
    coords = jnp.where(valid[:, None], coords, PAD_COORD)
    keys = pack_coords(coords, coord_bits)
    sorted_keys, perm = argsort_keys(keys)
    sorted_valid = valid[perm]
    first = unique_mask_sorted(sorted_keys, sorted_valid)
    # Rank of each sorted row's unique group (0-based); invalid rows get rank
    # after all valid ones (they sort to the end via PAD_COORD keys).
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_unique = jnp.sum(first.astype(jnp.int32))
    # Invalid rows → overflow segment max_out.
    seg = jnp.where(sorted_valid, jnp.minimum(rank, max_out), max_out)
    # Map back to original row order.
    to_unique = jnp.zeros((n,), jnp.int32).at[perm].set(seg.astype(jnp.int32))
    # Compact unique coords: scatter sorted first-occurrence coords to rank.
    sorted_coords = coords[perm]
    unique_c = jnp.full((max_out, 3), PAD_COORD, jnp.int32)
    scatter_idx = jnp.where(first & (rank < max_out), rank, max_out)
    unique_c = unique_c.at[scatter_idx].set(sorted_coords, mode="drop")
    counts = (
        jnp.zeros((max_out + 1,), jnp.int32)
        .at[seg]
        .add(sorted_valid.astype(jnp.int32), mode="drop")[:max_out]
    )
    return UniqueResult(unique_c, num_unique, to_unique, counts)


def voxel_downsample(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    voxel_size: float | jnp.ndarray,
    max_out: int,
    origin: jnp.ndarray | None = None,
) -> Tuple[UniqueResult, jnp.ndarray]:
    """Quantize float coords to voxel indices and deduplicate.

    Mirrors reference ``voxel_downsample_csr_mapping`` (``coords/ops/voxel.py``).
    Returns (UniqueResult over int voxel coords, int_coords [N,3] per input row).
    """
    if origin is not None:
        coords = coords - origin
    int_coords = jnp.floor(coords / voxel_size).astype(jnp.int32)
    res = unique_coords(int_coords, valid, max_out)
    return res, int_coords


def voxel_downsample_mapping(
    up_coords: jnp.ndarray,
    up_valid: jnp.ndarray,
    down_coords: jnp.ndarray,
    down_valid: jnp.ndarray,
    voxel_size: float | jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match each fine ("up") point to its coarse ("down") voxel row
    (reference ``voxel_downsample_mapping``, coords/ops/voxel.py:200+ —
    used e.g. to carry labels across resolutions).

    up_coords: [N, 3] float; down_coords: [M, 3] float points at coarse
    voxel centers/representatives. Returns (down_index [N] int32 or -1,
    found [N] bool). Misses can be filled by the caller with a kNN pass
    (reference's optional knn fill), e.g. via ops.search.batched_knn_search.
    """
    from warpconvnet_tpu.ops.keys import lookup_in_sorted

    up_int = jnp.floor(up_coords / voxel_size).astype(jnp.int32)
    down_int = jnp.floor(down_coords / voxel_size).astype(jnp.int32)
    down_int = jnp.where(down_valid[:, None], down_int, PAD_COORD)
    keys = pack_coords(down_int)
    sorted_keys, perm = argsort_keys(keys)
    q = pack_coords(jnp.where(up_valid[:, None], up_int, PAD_COORD - 1))
    pos = lookup_in_sorted(sorted_keys, q)
    safe = jnp.maximum(pos, 0)
    idx = perm[safe]
    found = (pos >= 0) & down_valid[idx] & up_valid
    return jnp.where(found, idx, -1).astype(jnp.int32), found
