"""Spatially sparse depthwise convolution.

TPU-native rebuild of the reference depthwise conv stack
(``warpconvnet/nn/functional/sparse_conv_depth.py:657-1005`` — unified
Function with explicit gather-mul-scatter and the fused ``_C.fma.implicit_fma``
CUDA kernel, ``csrc/implicit_fma_kernel.cu``).

On TPU the whole op is elementwise over channels — there is no GEMM — so the
natural formulation is a scan over kernel offsets of masked row-gathers and
fused multiply-adds, which XLA fuses into a single VPU loop per offset:

* forward:  ``out[b, o, c] = sum_k x[b, table[b,k,o], c] * w[k, c]``
* dgrad:    atomics-free via the per-offset **reverse table** (the same trick
  as the dense conv: the map per offset is injective, so the transpose is a
  gather): ``dx[b, i, c] = sum_k g[b, rev[b,k,i], c] * w[k, c]``
* wgrad:    ``dw[k, c] = sum_{b,o} x[b, table[b,k,o], c] * g[b, o, c]`` — the
  reference's ``implicit_reduction.cu`` is a plain masked sum-product here.

Accumulation is fp32 by default with the same bf16 opt-in as the dense conv.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.geometry.voxels import Voxels, _as3
from warpconvnet_tpu.nn.functional.sparse_conv import (
    BatchedPairTable,
    _accum_dtype,
    _gather_rows,
    generate_output_coords_and_kernel_map,
)


def _depth_fwd_impl(features, weight, table, accum_dtype):
    b, _, c = features.shape
    n_out = table.shape[2]
    table_k = jnp.swapaxes(table, 0, 1)  # [K, B, N_out]

    def body(acc, inp):
        t, w = inp
        a = _gather_rows(features, t).astype(accum_dtype)
        return acc + a * w.astype(accum_dtype), None

    init = jnp.zeros((b, n_out, c), accum_dtype)
    acc, _ = lax.scan(body, init, (table_k, weight))
    return acc.astype(features.dtype)


def _depth_dgrad_impl(g, weight, rev, accum_dtype):
    b, _, c = g.shape
    n_in = rev.shape[2]
    rev_k = jnp.swapaxes(rev, 0, 1)

    def body(acc, inp):
        r, w = inp
        gg = _gather_rows(g, r).astype(accum_dtype)
        return acc + gg * w.astype(accum_dtype), None

    init = jnp.zeros((b, n_in, c), accum_dtype)
    acc, _ = lax.scan(body, init, (rev_k, weight))
    return acc.astype(g.dtype)


def _depth_wgrad_impl(features, g, table, accum_dtype):
    table_k = jnp.swapaxes(table, 0, 1)
    ga = g.astype(accum_dtype)

    def body(_, t):
        a = _gather_rows(features, t).astype(accum_dtype)
        return None, jnp.sum(a * ga, axis=(0, 1))

    _, dws = lax.scan(body, None, table_k)
    return dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def depthwise_conv_fma(features, weight, table, rev, accum_dtype_name: str):
    """Depthwise sparse conv core.

    Args:
      features: [B, N_in, C].
      weight: [K, C].
      table: [B, K, N_out] int32 pair table (input index or -1).
      rev: [B, K, N_in] int32 reverse table.
    Returns: [B, N_out, C].
    """
    return _depth_fwd_impl(features, weight, table, jnp.dtype(accum_dtype_name))


def _depth_fwd(features, weight, table, rev, accum_dtype_name):
    out = _depth_fwd_impl(features, weight, table, jnp.dtype(accum_dtype_name))
    return out, (features, weight, table, rev)


def _depth_bwd(accum_dtype_name, res, g):
    features, weight, table, rev = res
    acc = jnp.dtype(accum_dtype_name)
    dx = _depth_dgrad_impl(g, weight, rev, acc)
    dw = _depth_wgrad_impl(features, g, table, acc).astype(weight.dtype)
    return dx, dw, None, None


depthwise_conv_fma.defvjp(_depth_fwd, _depth_bwd)


def spatially_sparse_depthwise_conv(
    voxels: Voxels,
    weight: jnp.ndarray,
    kernel_size: Sequence[int] | int,
    stride: Sequence[int] | int = 1,
    dilation: Sequence[int] | int = 1,
    bias: Optional[jnp.ndarray] = None,
    out_coords: Optional[Voxels] = None,
    pair_table: Optional[BatchedPairTable] = None,
    out_capacity: Optional[int] = None,
) -> Tuple[Voxels, Optional[BatchedPairTable]]:
    """Depthwise sparse conv over :class:`Voxels` (reference
    ``spatially_sparse_depthwise_conv``, ``sparse_conv_depth.py:957``).

    ``weight`` has shape [K, C]. Returns (out_voxels, pair_table).
    """
    ks = _as3(kernel_size)
    features = voxels.features

    if pair_table is not None:
        assert out_coords is not None, "pair_table reuse requires out_coords"
        oc, onv = out_coords.coords, out_coords.num_valid
        out_ts = out_coords.tensor_stride
        table = pair_table
    else:
        oc, onv, table, out_ts = generate_output_coords_and_kernel_map(
            voxels, ks, stride, dilation, False, False, out_coords, out_capacity
        )

    out_feats = depthwise_conv_fma(
        features, weight, table.table, table.rev, _accum_dtype()
    )
    if bias is not None:
        out_feats = out_feats + bias
    n_out = oc.shape[1]
    row_valid = (
        lax.broadcasted_iota(jnp.int32, (voxels.batch_size, n_out), 1) < onv[:, None]
    )
    out_feats = jnp.where(row_valid[..., None], out_feats, 0)
    out = Voxels(
        coords=oc,
        features=out_feats,
        num_valid=onv,
        voxel_size=voxels.voxel_size,
        tensor_stride=tuple(out_ts),
    )
    return out, table
