"""Sparse convolution modules (reference ``nn/modules/sparse_conv.py:31``).

Weight layout [K, C_in, C_out]; kaiming-uniform init with fan = K * C_in
(fan_out = K * C_out when transposed), matching the reference's
sqrt(ndim)-scaled kaiming (sparse_conv.py weight init).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels, _as3
from warpconvnet_tpu.nn.functional.sparse_conv import (
    BatchedPairTable,
    spatially_sparse_conv,
)


def _kaiming_uniform(transposed: bool):
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:  # grouped [K, G, C_in/G, C_out/G]
            k, _, cin, cout = shape
        elif len(shape) == 3:
            k, cin, cout = shape
        else:  # depthwise [K, C]
            k, cin = shape
            cout = cin
        fan = k * (cout if transposed else cin)
        bound = math.sqrt(6.0 / fan)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class SparseConv3d(nn.Module):
    """3D spatially sparse convolution over :class:`Voxels`.

    ``__call__(voxels, out_coords=None, pair_table=None)`` returns
    ``(out_voxels, pair_table)`` so callers can reuse kernel maps (the
    functional replacement for the reference's IntSearchCache/spatial_cache).
    """

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    dilation: Union[int, Sequence[int]] = 1
    transposed: bool = False
    generative: bool = False
    use_bias: bool = False
    out_capacity: Optional[int] = None
    compute_dtype: Optional[jnp.dtype] = None
    groups: int = 1
    # "stride_only" | "reduce_and_stride" (reference STRIDED_CONV_MODE,
    # nn/modules/sparse_conv.py:90): the latter pre-pools with
    # kernel=stride before a stride-1 conv.
    stride_mode: str = "stride_only"
    stride_reduce: str = "max"
    # Optional weight initializer override (e.g. zeros for residual-branch
    # convs, the reference's zero-init conv2 in SparseResBlockC2S3d).
    kernel_init: Optional[Callable] = None
    # Per-module backend pins overriding WCT_{FWD,DGRAD,WGRAD}_ALGO_MODE
    # (reference per-module fwd/dgrad/wgrad algo override,
    # nn/modules/sparse_conv.py:31): "auto" | "explicit" | "implicit_pallas".
    fwd_algo: Optional[str] = None
    dgrad_algo: Optional[str] = None
    wgrad_algo: Optional[str] = None

    def _ks(self) -> Tuple[int, int, int]:
        return _as3(self.kernel_size)

    @nn.compact
    def __call__(
        self,
        voxels: Voxels,
        out_coords: Optional[Voxels] = None,
        pair_table: Optional[BatchedPairTable] = None,
    ) -> Tuple[Voxels, Optional[BatchedPairTable]]:
        ks = self._ks()
        k = int(np.prod(ks))
        if self.groups > 1:
            assert self.in_channels % self.groups == 0
            assert self.out_channels % self.groups == 0
            wshape = (
                k,
                self.groups,
                self.in_channels // self.groups,
                self.out_channels // self.groups,
            )
        else:
            wshape = (k, self.in_channels, self.out_channels)
        w_init = self.kernel_init or _kaiming_uniform(self.transposed)
        weight = self.param("kernel", w_init, wshape)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        return spatially_sparse_conv(
            voxels,
            weight,
            kernel_size=ks,
            stride=self.stride,
            dilation=self.dilation,
            bias=bias,
            transposed=self.transposed,
            generative=self.generative,
            out_coords=out_coords,
            pair_table=pair_table,
            out_capacity=self.out_capacity,
            compute_dtype=self.compute_dtype,
            groups=self.groups,
            stride_mode=self.stride_mode,
            stride_reduce=self.stride_reduce,
            fwd_algo=self.fwd_algo,
            dgrad_algo=self.dgrad_algo,
            wgrad_algo=self.wgrad_algo,
        )


class SparseConv2d(SparseConv3d):
    """2D variant: z kernel extent 1 (reference ``SparseConv2d``)."""

    def _ks(self) -> Tuple[int, int, int]:
        ks = _as3(self.kernel_size)
        return (ks[0], ks[1], 1)


class SparseDepthwiseConv3d(nn.Module):
    """Depthwise sparse conv module (reference
    ``nn/modules/sparse_conv_depth.py``). Weight shape [K, C]."""

    channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = False
    out_capacity: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        voxels: Voxels,
        out_coords: Optional[Voxels] = None,
        pair_table: Optional[BatchedPairTable] = None,
    ) -> Tuple[Voxels, Optional[BatchedPairTable]]:
        from warpconvnet_tpu.nn.functional.sparse_conv_depth import (
            spatially_sparse_depthwise_conv,
        )

        ks = _as3(self.kernel_size)
        k = int(np.prod(ks))
        weight = self.param(
            "kernel", _kaiming_uniform(False), (k, self.channels)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.channels,))
            if self.use_bias
            else None
        )
        return spatially_sparse_depthwise_conv(
            voxels,
            weight,
            kernel_size=ks,
            stride=self.stride,
            dilation=self.dilation,
            bias=bias,
            out_coords=out_coords,
            pair_table=pair_table,
            out_capacity=self.out_capacity,
        )
