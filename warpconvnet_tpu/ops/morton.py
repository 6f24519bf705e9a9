"""Morton (Z-order) serialization — pure int32 bit-twiddling.

Replaces the reference CUDA kernels (``csrc/morton_code.cu``,
``geometry/coords/ops/serialization.py:22-240``). TPUs have no native int64,
so wide codes are represented as a lexicographic (hi, lo) int32 key pair:
hi interleaves the upper 8 bits of each axis, lo the lower 8 — concatenated
this is exactly the 48-bit Morton order for 16-bit coordinates.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.ops.keys import Keys, argsort_keys

# Axis orderings matching reference POINT_ORDERING (serialization.py:22).
MORTON_ORDERINGS = ("xyz", "xzy", "yxz", "yzx", "zxy", "zyx")


def _part1by2(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_code_10bit(coords: jnp.ndarray, ordering: str = "xyz") -> jnp.ndarray:
    """30-bit Morton code for coords in [0, 1024) per axis. [..., 3] -> [...]."""
    axes = ["xyz".index(c) for c in ordering]
    a = coords[..., axes[0]].astype(jnp.int32)
    b = coords[..., axes[1]].astype(jnp.int32)
    c = coords[..., axes[2]].astype(jnp.int32)
    return (_part1by2(a) << 2) | (_part1by2(b) << 1) | _part1by2(c)


def morton_keys(coords: jnp.ndarray, ordering: str = "xyz", bits: int = 16) -> Keys:
    """Morton sort keys for coords in [0, 2^bits) per axis.

    Returns a 1-tuple (bits <= 10) or 2-tuple (bits <= 16) of int32 keys whose
    lexicographic order equals Morton order.
    """
    if bits <= 10:
        return (morton_code_10bit(coords, ordering),)
    if bits > 16:
        raise ValueError(f"morton_keys supports at most 16 bits/axis, got {bits}")
    hi = morton_code_10bit((coords >> 8) & 0xFF, ordering)
    lo = morton_code_10bit(coords & 0xFF, ordering)
    return (hi, lo)


def morton_argsort(
    coords: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    ordering: str = "xyz",
    bits: int = 16,
    offset: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation sorting rows of coords [N, 3] into Morton order.

    Invalid rows sort to the end. Coordinates are shifted by ``offset`` (or
    their minimum is assumed pre-shifted by the caller) and must be
    non-negative after shifting. Returns (perm, inverse_perm), both int32 [N].
    """
    if offset is not None:
        coords = coords - offset
    keys = morton_keys(coords, ordering, bits)
    if valid is not None:
        big = jnp.int32(0x7FFFFFFF)
        keys = tuple(jnp.where(valid, k, big) for k in keys)
    _, perm = argsort_keys(keys)
    n = coords.shape[0]
    inverse = jnp.zeros((n,), jnp.int32).at[perm].set(
        lax.broadcasted_iota(jnp.int32, (n,), 0)
    )
    return perm, inverse
