"""Sparse pooling / unpooling (reference ``nn/functional/sparse_pool.py:25-182``).

Pooling = stride the coordinates + reduce each output over its kernel-map
neighbors. Unpooling reuses the pooling map's reverse table — the explicit
equivalent of the reference's cached-forward-map scatter.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.geometry.voxels import Voxels, _as3
from warpconvnet_tpu.nn.functional.sparse_conv import (
    BatchedPairTable,
    _gather_rows,
    generate_output_coords_and_kernel_map,
)


def sparse_reduce(
    voxels: Voxels,
    kernel_size: Sequence[int] | int,
    stride: Sequence[int] | int,
    reduction: str = "max",
    out_capacity: Optional[int] = None,
) -> Tuple[Voxels, BatchedPairTable]:
    """Reduce features over each output's kernel-map neighborhood.

    Outputs with no covered inputs are zero-filled (reference warns and
    zero-fills, ``sparse_pool.py:60-75``).
    """
    oc, onv, table, out_ts = generate_output_coords_and_kernel_map(
        voxels, kernel_size, stride, out_capacity=out_capacity
    )
    t = jnp.swapaxes(table.table, 0, 1)  # [K, B, M]
    feats = voxels.features
    b, _, c = feats.shape
    m = oc.shape[1]

    if reduction in ("max", "min"):
        neutral = -jnp.inf if reduction == "max" else jnp.inf
        op = jnp.maximum if reduction == "max" else jnp.minimum

        def body(acc, tk):
            rows = jnp.take_along_axis(feats, jnp.maximum(tk, 0)[..., None], axis=1)
            rows = jnp.where((tk >= 0)[..., None], rows, neutral)
            return op(acc, rows), None

        init = jnp.full((b, m, c), neutral, feats.dtype)
        acc, _ = lax.scan(body, init, t)
        count = jnp.sum((t >= 0).astype(jnp.int32), axis=0)  # [B, M]
        out = jnp.where(count[..., None] > 0, acc, 0)
    elif reduction in ("sum", "mean"):
        def body(acc, tk):
            return acc + _gather_rows(feats, tk).astype(jnp.float32), None

        acc, _ = lax.scan(body, jnp.zeros((b, m, c), jnp.float32), t)
        if reduction == "mean":
            count = jnp.sum((t >= 0).astype(jnp.int32), axis=0)
            acc = acc / jnp.maximum(count, 1)[..., None]
        out = acc.astype(feats.dtype)
    else:
        raise ValueError(f"unsupported reduction {reduction!r}")

    row_valid = lax.broadcasted_iota(jnp.int32, (b, m), 1) < onv[:, None]
    out = jnp.where(row_valid[..., None], out, 0)
    # Strided outputs come from unique_coords (always lex-sorted); stride-1
    # pooling keeps the input coords and their sortedness flag.
    pooled_sorted = (
        True if any(s != 1 for s in _as3(stride)) else voxels.lex_sorted
    )
    pooled = Voxels(
        coords=oc, features=out, num_valid=onv,
        voxel_size=voxels.voxel_size, tensor_stride=tuple(out_ts),
        lex_sorted=pooled_sorted,
    )
    return pooled, table


def sparse_max_pool(voxels, kernel_size, stride=None, out_capacity=None):
    stride = stride if stride is not None else kernel_size
    return sparse_reduce(voxels, kernel_size, stride, "max", out_capacity)


def sparse_avg_pool(voxels, kernel_size, stride=None, out_capacity=None):
    stride = stride if stride is not None else kernel_size
    return sparse_reduce(voxels, kernel_size, stride, "mean", out_capacity)


def sparse_unpool(
    coarse: Voxels,
    fine_coords_voxels: Voxels,
    table: BatchedPairTable,
    concat_features: Optional[jnp.ndarray] = None,
) -> Voxels:
    """Scatter coarse features back to the fine coordinates that pooled into
    them (reference ``sparse_unpool``). ``table`` is the map returned by the
    pooling/strided conv (fine -> coarse); its reverse assigns each fine row
    its coarse parent's feature.
    """
    rev = jnp.swapaxes(table.rev, 0, 1)  # [K, B, N_fine]
    cf = coarse.features
    b, n_fine = rev.shape[1], rev.shape[2]
    c = cf.shape[-1]

    def body(acc, rk):
        rows = jnp.take_along_axis(cf, jnp.maximum(rk, 0)[..., None], axis=1)
        return jnp.where((rk >= 0)[..., None], rows, acc), None

    out, _ = lax.scan(body, jnp.zeros((b, n_fine, c), cf.dtype), rev)
    if concat_features is not None:
        out = jnp.concatenate([concat_features, out], axis=-1)
    mask = fine_coords_voxels.valid_mask()
    out = jnp.where(mask[..., None], out, 0)
    return fine_coords_voxels.replace(features=out)


def global_pool(geometry, reduction: str = "max") -> jnp.ndarray:
    """Per-scene reduce over valid rows -> [B, C]
    (reference ``nn/functional/global_pool.py``)."""
    feats = geometry.features
    mask = geometry.valid_mask()[..., None]
    if reduction == "max":
        x = jnp.where(mask, feats, -jnp.inf)
        out = jnp.max(x, axis=1)
        return jnp.where(jnp.isfinite(out), out, 0)
    if reduction == "sum":
        return jnp.sum(jnp.where(mask, feats, 0), axis=1)
    if reduction == "mean":
        s = jnp.sum(jnp.where(mask, feats, 0), axis=1)
        denom = jnp.maximum(geometry.num_valid, 1).astype(feats.dtype)[:, None]
        return s / denom
    raise ValueError(f"unsupported reduction {reduction!r}")
