"""Sparse 3D window attention — sort-based grouping + banded exact attention.

TPU-native rebuild of the reference window-attention machinery
(``nn/modules/space_attention.py`` ``SpaceAttention:29``,
``nn/functional/voxel_encode.py:237-302`` counting-sort window grouping via
``_C.coords.window_group_{histogram,scatter}``, and per-window varlen flash
attention).

Design
------
The reference buckets voxels into 3D windows with an O(N) counting sort and
runs varlen flash attention per ragged window. On TPU we need static shapes,
and we get exactness from a packing argument instead of ragged buffers:

1. Sort rows by (window code, morton-in-window) — ``lax.sort`` on int32 keys.
2. A window of size (wx, wy, wz) holds at most M = wx*wy*wz voxels, so after
   sorting every window occupies **at most M consecutive rows**.
3. Tile the sorted sequence with tile size T >= M. Any window then straddles
   at most two adjacent tiles, so attention of tile t against tiles
   {t-1, t, t+1} with a same-window pair mask is **exact** window attention
   with fully static shapes: cost N x 3T instead of N^2.

Window shifting (reference "zero"/fractional shifts) is an offset added to
coords before the floor-div; shifted and unshifted layers alternate in
SpaCeFormer blocks exactly as in Swin-style schemes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.ops.keys import PAD_COORD, pack_coords, sort_keys
from warpconvnet_tpu.ops.morton import morton_keys


def window_partition(
    coords: jnp.ndarray,
    num_valid: jnp.ndarray,
    window_size: Sequence[int],
    shift: Sequence[int] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort each scene's rows by window code (then morton within window).

    Args:
      coords: [B, N, 3] int32 (padding rows = PAD_COORD).
      num_valid: [B] int32.
      window_size: static (wx, wy, wz).
      shift: optional static per-axis offset added before windowing.
    Returns:
      perm: [B, N] int32 permutation (sorted order; padded rows last).
      inv_perm: [B, N] int32 inverse permutation.
      wcoords: [B, N, 3] int32 window index per *sorted* row (PAD on padding).
    """
    ws = jnp.asarray(window_size, jnp.int32)
    sh = jnp.asarray(shift if shift is not None else (0, 0, 0), jnp.int32)
    b, n, _ = coords.shape

    def one(c, nv):
        valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
        # Shift to non-negative so floor-div windows are well defined.
        cmin = jnp.min(jnp.where(valid[:, None], c, PAD_COORD), axis=0)
        local = jnp.where(valid[:, None], c - cmin + sh, PAD_COORD)
        wc = jnp.where(valid[:, None], local // ws, PAD_COORD)
        wkeys = pack_coords(wc)
        mkeys = morton_keys(jnp.where(valid[:, None], local % ws, 0))
        rows = lax.broadcasted_iota(jnp.int32, (n,), 0)
        _, (perm, wc0, wc1, wc2) = sort_keys(
            tuple(wkeys) + tuple(mkeys), rows, wc[:, 0], wc[:, 1], wc[:, 2]
        )
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(rows)
        return perm, inv, jnp.stack([wc0, wc1, wc2], axis=-1)

    return jax.vmap(one)(coords, num_valid)


def _tile_band(x: jnp.ndarray, num_tiles: int, tile: int) -> jnp.ndarray:
    """[B, N, ...] -> [B, nT, 3T, ...]: each tile's left/self/right context."""
    b = x.shape[0]
    xt = x.reshape((b, num_tiles, tile) + x.shape[2:])
    left = jnp.roll(xt, 1, axis=1)
    right = jnp.roll(xt, -1, axis=1)
    return jnp.concatenate([left, xt, right], axis=2)


def _band_edge_valid(b: int, num_tiles: int, tile: int) -> jnp.ndarray:
    """[B, nT, 3T] bool: False on wrapped-around roll positions."""
    t_idx = lax.broadcasted_iota(jnp.int32, (num_tiles, 3 * tile), 0)
    pos = lax.broadcasted_iota(jnp.int32, (num_tiles, 3 * tile), 1)
    left_bad = (pos < tile) & (t_idx == 0)
    right_bad = (pos >= 2 * tile) & (t_idx == num_tiles - 1)
    ok = ~(left_bad | right_bad)
    return jnp.broadcast_to(ok[None], (b, num_tiles, 3 * tile))


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    wcoords: jnp.ndarray,
    row_valid: jnp.ndarray,
    tile: int,
) -> jnp.ndarray:
    """Exact window attention over window-sorted rows via banded tiles.

    Args:
      q, k, v: [B, N, H, D] in window-sorted order.
      wcoords: [B, N, 3] window index per row (from :func:`window_partition`).
      row_valid: [B, N] bool.
      tile: static tile size; must be >= max window occupancy
        (= prod(window_size) for voxel windows).
    Returns: [B, N, H, D].
    """
    from warpconvnet_tpu.nn.functional.flash_attention import (
        _PAD_SEGMENT,
        segment_attention,
    )

    b, n, h, d = q.shape
    assert n % tile == 0, f"padded N {n} must be divisible by tile {tile}"
    nt = n // tile

    # Window RANK along the sorted axis: a single int32 segment id per row
    # (strictly increasing across windows, so equality <=> same window even
    # across band-tile boundaries). Pads get a sentinel shared per scene.
    changed = jnp.any(wcoords[:, 1:] != wcoords[:, :-1], axis=-1)
    rank = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), jnp.cumsum(changed, axis=1, dtype=jnp.int32)],
        axis=1,
    )
    rank = jnp.where(row_valid, rank, _PAD_SEGMENT)

    qt = q.reshape(b * nt, tile, h, d)
    kt = _tile_band(k, nt, tile).reshape(b * nt, 3 * tile, h, d)
    vt = _tile_band(v, nt, tile).reshape(b * nt, 3 * tile, h, d)
    seg_q = rank.reshape(b * nt, tile)
    # Wrapped-around roll positions must never match: overwrite with a second
    # sentinel distinct from the pad sentinel.
    edge_ok = _band_edge_valid(b, nt, tile).reshape(b * nt, 3 * tile)
    seg_k = _tile_band(rank, nt, tile).reshape(b * nt, 3 * tile)
    seg_k = jnp.where(edge_ok, seg_k, _PAD_SEGMENT + 1)

    out = segment_attention(qt, kt, vt, seg_q, seg_k)
    out = out.reshape(b, n, h, d)
    return jnp.where(row_valid[..., None, None], out, 0)
