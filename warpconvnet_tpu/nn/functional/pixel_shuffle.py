"""3D pixel shuffle/unshuffle: channel <-> spatial rearrangement for dense
3D VAEs (reference ``nn/functional/pixel_shuffle.py``)."""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle_3d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, C*r^3, X, Y, Z] -> [B, C, X*r, Y*r, Z*r]."""
    b, c, xx, yy, zz = x.shape
    assert c % (r ** 3) == 0, (c, r)
    co = c // r ** 3
    x = x.reshape(b, co, r, r, r, xx, yy, zz)
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))
    return x.reshape(b, co, xx * r, yy * r, zz * r)


def pixel_unshuffle_3d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, C, X*r, Y*r, Z*r] -> [B, C*r^3, X, Y, Z]."""
    b, c, xx, yy, zz = x.shape
    assert xx % r == 0 and yy % r == 0 and zz % r == 0
    x = x.reshape(b, c, xx // r, r, yy // r, r, zz // r, r)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))
    return x.reshape(b, c * r ** 3, xx // r, yy // r, zz // r)
