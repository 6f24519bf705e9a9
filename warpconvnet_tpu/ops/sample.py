"""Point sampling ops: farthest point sampling + per-scene random sampling.

TPU-native equivalents of the reference's sampling kernels
(``warpconvnet/csrc/farthest_point_sampling.cu``, exposed via ``_C.sampling``,
and ``geometry/coords/ops/sample.py`` per-batch random sampling).

FPS is a sequential argmax-update recurrence — on TPU it runs as a
``lax.fori_loop`` whose body is one fused VPU pass over N points (distance
update + argmax), vmapped over scenes. O(S * N) like the CUDA kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def farthest_point_sampling(
    points: jnp.ndarray,
    num_valid: jnp.ndarray,
    num_samples: int,
) -> jnp.ndarray:
    """Batched FPS.

    Args:
      points: [B, N, 3] float coords (padding rows ignored).
      num_valid: [B] int32.
      num_samples: static sample count S.
    Returns: [B, S] int32 indices into N (scenes with fewer than S valid
      points repeat their last selection).
    """

    def one(pts, nv):
        n = pts.shape[0]
        valid = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
        big = jnp.asarray(jnp.finfo(pts.dtype).max, pts.dtype)

        def body(i, carry):
            dist, idxs = carry
            last = pts[idxs[i - 1]]
            d = jnp.sum((pts - last) ** 2, axis=-1)
            dist = jnp.minimum(dist, jnp.where(valid, d, -big))
            nxt = jnp.argmax(dist).astype(jnp.int32)
            # Degenerate scenes (< S valid points): argmax of all -inf picks
            # row 0; clamp to a valid row by reusing the previous pick.
            nxt = jnp.where(dist[nxt] >= 0, nxt, idxs[i - 1])
            return dist, idxs.at[i].set(nxt)

        dist0 = jnp.where(valid, big, -big)
        idxs0 = jnp.zeros((num_samples,), jnp.int32)
        _, idxs = lax.fori_loop(1, num_samples, body, (dist0, idxs0))
        return idxs

    return jax.vmap(one)(points, num_valid)


def random_sample_indices(
    key: jax.Array,
    num_valid: jnp.ndarray,
    n: int,
    num_samples: int,
) -> jnp.ndarray:
    """Per-scene uniform sampling without replacement over valid rows
    (reference ``coords/ops/sample.py`` per-batch random sampling).

    Returns [B, S] int32 indices; scenes with fewer than S valid rows sample
    with wraparound (duplicates), keeping shapes static.
    """
    b = num_valid.shape[0]

    def one(k, nv):
        # Random keys on valid rows, +inf on padding -> argsort prefix is a
        # uniform permutation of the valid rows.
        r = jax.random.uniform(k, (n,))
        r = jnp.where(lax.broadcasted_iota(jnp.int32, (n,), 0) < nv, r, 2.0)
        order = jnp.argsort(r).astype(jnp.int32)
        pos = lax.broadcasted_iota(jnp.int32, (num_samples,), 0)
        return order[pos % jnp.maximum(nv, 1)]

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, num_valid)
