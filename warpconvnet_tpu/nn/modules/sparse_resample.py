"""Sparse resampling modules (reference ``nn/modules/sparse_resample.py``:
``SparseUpsample/SparseDownsample/SparseSubdivide``,
``SparseChannel2Spatial/SparseSpatial2Channel``).

Channel<->spatial trades 8 channels against one level of voxel subdivision —
the sparse analog of pixel shuffle, used by the TRELLIS VAE decoders.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels, _as3
from warpconvnet_tpu.nn.functional.sparse_pool import sparse_reduce, sparse_unpool
from warpconvnet_tpu.ops.keys import PAD_COORD


class SparseDownsample(nn.Module):
    """Stride the coordinate set and reduce features (reference
    SparseDownsample)."""

    kernel_size: int = 2
    stride: Optional[int] = None
    reduction: str = "mean"
    out_capacity: Optional[int] = None

    @nn.compact
    def __call__(self, x: Voxels):
        s = self.stride or self.kernel_size
        return sparse_reduce(
            x, self.kernel_size, s, self.reduction, self.out_capacity
        )


class SparseUpsample(nn.Module):
    """Scatter coarse features to fine coordinates via a pooling map
    (reference SparseUpsample)."""

    @nn.compact
    def __call__(self, coarse: Voxels, fine: Voxels, table):
        return sparse_unpool(coarse, fine, table)


def _child_perm(factor: int, child_order: str) -> Optional[np.ndarray]:
    """Permutation mapping enumeration index -> canonical (z-fastest) child.

    ``"zyx"`` (canonical, matches ``kernel_offsets``): index = x*f^2+y*f+z.
    ``"xyz"`` (x-fastest, the TRELLIS.2 / reference ``SparseSpatial2Channel``
    sub-index ``x%f + (y%f)*f + (z%f)*f^2``,
    reference sparse_resample.py:202-203): index = x + y*f + z*f^2.
    """
    if child_order == "zyx":
        return None
    assert child_order == "xyz", child_order
    f = factor
    idx = np.arange(f ** 3)
    x, y, z = idx % f, (idx // f) % f, idx // (f * f)
    return (x * f * f + y * f + z).astype(np.int64)


def _subdivide(
    vox: Voxels, factor: int = 2, child_order: str = "zyx"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Every voxel spawns its factor^3 children at the finer stride.
    Returns (coords [B, N*f^3, 3], num_valid [B]). ``child_order`` sets the
    enumeration of the f^3 children (see :func:`_child_perm`)."""
    b, n, _ = vox.coords.shape
    f3 = factor ** 3
    offs = np.stack(
        np.meshgrid(*([np.arange(factor)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)
    perm = _child_perm(factor, child_order)
    if perm is not None:
        offs = offs[perm]
    base = vox.coords[:, :, None, :] * factor + jnp.asarray(offs, jnp.int32)
    # Children of padded rows must stay PAD.
    base = jnp.where(
        vox.valid_mask()[:, :, None, None], base, PAD_COORD
    )
    # Interleave children so each parent's block is contiguous and valid
    # rows stay front-packed (valid parents are front-packed already).
    coords = base.reshape(b, n * f3, 3)
    return coords, vox.num_valid * f3


class SparseSubdivide(nn.Module):
    """Subdivide each voxel into 2^3 children, replicating features
    (reference SparseSubdivide — TRELLIS decoder upsampling)."""

    factor: int = 2

    @nn.compact
    def __call__(self, x: Voxels) -> Voxels:
        f3 = self.factor ** 3
        coords, nv = _subdivide(x, self.factor)
        feats = jnp.repeat(x.features, f3, axis=1)
        feats = jnp.where(
            jnp.repeat(x.valid_mask(), f3, axis=1)[..., None], feats, 0
        )
        return Voxels(
            coords=coords,
            features=feats,
            num_valid=nv,
            voxel_size=x.voxel_size,
            tensor_stride=tuple(max(t // self.factor, 1) for t in x.tensor_stride),
        )


class SparseChannel2Spatial(nn.Module):
    """[N, C] -> subdivided [N*8, C/8]: move channel blocks onto child voxels
    (reference SparseChannel2Spatial; sparse pixel-shuffle).

    ``subdiv_mask`` (optional, [B, N, factor^3] bool): keep only the masked
    children — the reference's predicted-subdivision upsample
    (``SparseResBlockC2S3d``'s ``to_subdiv`` head feeds C2S so only surface
    children materialize).

    ``sort``: lex-sort the children (one sort pass; child enumeration is
    NOT globally lex-ordered — children of adjacent parents interleave).
    Sorting also front-compacts masked-out children (PAD sorts last) and
    hands downstream convs the sorted fast path (probe + igemm).

    ``child_order``: which child each channel block (and ``subdiv_mask``
    bit) addresses — ``"zyx"`` canonical, ``"xyz"`` the reference/TRELLIS.2
    x-fastest sub-index (see :func:`_child_perm`)."""

    factor: int = 2
    sort: bool = True
    child_order: str = "zyx"

    @nn.compact
    def __call__(self, x: Voxels, subdiv_mask=None) -> Voxels:
        f3 = self.factor ** 3
        b, n, c = x.features.shape
        assert c % f3 == 0, (c, f3)
        coords, nv = _subdivide(x, self.factor, self.child_order)
        feats = x.features.reshape(b, n * f3, c // f3)
        valid = jnp.repeat(x.valid_mask(), f3, axis=1)
        if subdiv_mask is not None:
            valid = valid & subdiv_mask.reshape(b, n * f3)
            nv = jnp.sum(valid.astype(jnp.int32), axis=1)
            coords = jnp.where(valid[..., None], coords, PAD_COORD)
        feats = jnp.where(valid[..., None], feats, 0)
        lex = False
        if self.sort:
            # Sort rows directly on the (already PAD-masked) coords —
            # Voxels.lex_sort assumes prefix validity, but masked-out
            # children leave holes mid-array; PAD keys sort last, restoring
            # the valid prefix and the canonical order in one pass.
            from warpconvnet_tpu.ops.keys import argsort_keys, pack_coords

            def one(c, f):
                _, perm = argsort_keys(pack_coords(c))
                return c[perm], f[perm]

            coords, feats = jax.vmap(one)(coords, feats)
            lex = True
        return Voxels(
            coords=coords,
            features=feats,
            num_valid=nv,
            voxel_size=x.voxel_size,
            tensor_stride=tuple(max(t // self.factor, 1) for t in x.tensor_stride),
            lex_sorted=lex,
        )


class SparseSpatial2Channel(nn.Module):
    """Inverse of SparseChannel2Spatial: gather each parent's 8 children into
    channel blocks (reference SparseSpatial2Channel). Children missing from
    the coordinate set contribute zeros.

    ``child_order``: enumeration of the packed channel blocks — ``"zyx"``
    canonical (``kernel_offsets``), ``"xyz"`` the reference/TRELLIS.2
    x-fastest sub-index (see :func:`_child_perm`)."""

    factor: int = 2
    out_capacity: Optional[int] = None
    child_order: str = "zyx"

    @nn.compact
    def __call__(self, x: Voxels) -> Voxels:
        from warpconvnet_tpu.nn.functional.sparse_conv import (
            generate_output_coords_and_kernel_map,
        )

        f = self.factor
        f3 = f ** 3
        b, n, c = x.features.shape
        # Parent coords = stride-f downsample; children found via the
        # kernel map with kernel_size = f, stride = f (offset order is the
        # canonical kernel_offsets enumeration).
        oc, onv, table, out_ts = generate_output_coords_and_kernel_map(
            x, f, f, out_capacity=self.out_capacity
        )
        t = jnp.swapaxes(table.table, 0, 1)  # [f^3, B, M]
        perm = _child_perm(f, self.child_order)
        if perm is not None:
            # Channel block j must hold the reference-order child j: row
            # perm[j] of the canonical table.
            t = t[jnp.asarray(perm)]

        def gather_one(tk):
            rows = jnp.take_along_axis(
                x.features, jnp.maximum(tk, 0)[..., None], axis=1
            )
            return jnp.where((tk >= 0)[..., None], rows, 0)

        parts = jax.vmap(gather_one)(t)  # [f^3, B, M, C]
        feats = jnp.moveaxis(parts, 0, 2).reshape(b, -1, f3 * c)
        m = feats.shape[1]
        row_valid = lax.broadcasted_iota(jnp.int32, (b, m), 1) < onv[:, None]
        feats = jnp.where(row_valid[..., None], feats, 0)
        return Voxels(
            coords=oc,
            features=feats,
            num_valid=onv,
            voxel_size=x.voxel_size,
            tensor_stride=tuple(out_ts),
        )
