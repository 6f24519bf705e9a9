"""Checkpoint-compatible TRELLIS.2 shape VAE (reference
``models/trellis2/shape_vae.py`` ``SparseUnetVaeEncoder`` /
``SparseUnetVaeDecoder`` and the FlexiDualGrid wrappers; block internals per
``nn/modules/sparse_convnext.py:32-60`` and ``nn/modules/sparse_unet.py``).

Unlike :mod:`warpconvnet_tpu.models.trellis2.shape_vae` (our own TPU-shaped
VAE used by the pipeline), these classes mirror the reference graph
*exactly* — module names, norm placement (fp32 LayerNorm, eps 1e-6, affine
on norm1/norm only), SiLU activations, zero-init residual convs, the
x-fastest spatial<->channel child packing (reference
``sparse_resample.py:202-203``), and the repeat/mean residual skips — so a
published TRELLIS.2 shape-VAE checkpoint converts mechanically via
``convert_trellis2_state_dict`` + ``load_into_params`` with no key_map, and
the numerics match the reference's CPU forward (verified against the actual
reference through ``tests/parity/refbridge.py``).

State-dict key correspondence (torch -> flax path):
    input_layer.weight            -> input_layer/kernel (transposed)
    blocks.{i}.{j}.conv.weight    -> blocks/{i}/{j}/conv/kernel  [K, Cin, Cout]
    blocks.{i}.{j}.norm.weight    -> blocks/{i}/{j}/norm/scale
    blocks.{i}.{j}.mlp.0.weight   -> blocks/{i}/{j}/mlp/0/kernel
    blocks.{i}.{j}.{norm1,conv1,conv2,to_subdiv}.* likewise
    to_latent.weight              -> to_latent/kernel
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv3d
from warpconvnet_tpu.nn.modules.sparse_resample import (
    SparseChannel2Spatial,
    SparseSpatial2Channel,
)


def _ln32(feats: jnp.ndarray, name: str, affine: bool = True,
          eps: float = 1e-6) -> jnp.ndarray:
    """fp32 layer norm, cast back (reference ``LayerNorm32``,
    normalizations.py:196-201). Call inside an ``@nn.compact`` scope."""
    out = nn.LayerNorm(
        epsilon=eps, use_bias=affine, use_scale=affine, name=name
    )(feats.astype(jnp.float32))
    return out.astype(feats.dtype)


class _RefMlp(nn.Module):
    """``nn.Sequential(Linear, SiLU, zero Linear)`` — submodules named
    ``0``/``2`` to mirror the torch Sequential state-dict keys."""

    channels: int
    hidden: int

    @nn.compact
    def __call__(self, f: jnp.ndarray) -> jnp.ndarray:
        f = nn.Dense(self.hidden, name="0")(f)
        f = jax.nn.silu(f)
        return nn.Dense(
            self.channels, kernel_init=nn.initializers.zeros, name="2"
        )(f)


class RefConvNeXtBlock3d(nn.Module):
    """Reference ``SparseConvNeXtBlock3d`` (sparse_convnext.py:32-60):
    full 3^3 submanifold conv -> fp32 LN (affine) -> Linear/SiLU/zero-Linear
    MLP -> + skip. (No depthwise conv, no layer scale — that is our own
    generic :class:`~warpconvnet_tpu.nn.modules.blocks.SparseConvNeXtBlock`.)
    """

    channels: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Voxels, table=None):
        h, t = SparseConv3d(
            self.channels, self.channels, 3, use_bias=True, name="conv"
        )(x, pair_table=table, out_coords=x if table is not None else None)
        f = _ln32(h.features, "norm")
        f = _RefMlp(
            self.channels, int(self.channels * self.mlp_ratio), name="mlp"
        )(f)
        return x.replace_features(x.features + f), t


class RefResBlockS2C3d(nn.Module):
    """Reference ``SparseResBlockS2C3d`` / ``SparseSpatialToChannelResBlock3d``
    (sparse_unet.py:196-280): norm1+silu -> conv1 (C -> out/8) -> S2C pack
    (x-fastest children) on both branches -> norm2(no affine)+silu -> conv2
    (zero-init) -> + reshape/mean skip."""

    channels: int
    out_channels: int
    factor: int = 2
    out_capacity: Optional[int] = None

    @nn.compact
    def __call__(self, x: Voxels) -> Voxels:
        nc = self.factor ** 3
        assert self.out_channels % nc == 0
        assert (self.channels * nc) % self.out_channels == 0
        f = jax.nn.silu(_ln32(x.features, "norm1"))
        h, _ = SparseConv3d(
            self.channels, self.out_channels // nc, 3, use_bias=True,
            name="conv1",
        )(x.replace_features(f))
        s2c = SparseSpatial2Channel(
            factor=self.factor, child_order="xyz",
            out_capacity=self.out_capacity, name="updown",
        )
        h = s2c(h)
        xs = s2c(x)
        f2 = jax.nn.silu(_ln32(h.features, "norm2", affine=False))
        h2, _ = SparseConv3d(
            self.out_channels, self.out_channels, 3, use_bias=True,
            kernel_init=nn.initializers.zeros, name="conv2",
        )(h.replace_features(f2))
        # Skip: pack the raw input's children, then mean each group of
        # ``channels * nc / out_channels`` channels (the encoder inverse of
        # the decoder's repeat_interleave broadcast).
        b, m, _ = xs.features.shape
        skip = xs.features.reshape(b, m, self.out_channels, -1).mean(axis=-1)
        return h2.replace_features(h2.features + skip)


class RefResBlockC2S3d(nn.Module):
    """Reference ``SparseResBlockC2S3d`` / ``SparseChannelToSpatialResBlock3d``
    (sparse_unet.py:119-195): optional ``to_subdiv`` child-mask head,
    norm1+silu -> conv1 (C -> out*8) -> C2S unpack (x-fastest, masked) on
    both branches -> norm2(no affine)+silu -> conv2 (zero-init) ->
    + repeat_interleave skip. Returns ``(out, subdiv_logits_voxels)`` when
    ``pred_subdiv`` else ``out``."""

    channels: int
    out_channels: int
    factor: int = 2
    pred_subdiv: bool = True

    @nn.compact
    def __call__(self, x: Voxels, subdiv: Optional[Voxels] = None):
        nc = self.factor ** 3
        assert self.channels % nc == 0
        assert self.out_channels % (self.channels // nc) == 0
        if self.pred_subdiv:
            logits = nn.Dense(nc, name="to_subdiv")(x.features)
            subdiv = x.replace_features(logits)
        sub_bin = None
        if subdiv is not None:
            sub_bin = subdiv.features > 0
        f = jax.nn.silu(_ln32(x.features, "norm1"))
        h, _ = SparseConv3d(
            self.channels, self.out_channels * nc, 3, use_bias=True,
            name="conv1",
        )(x.replace_features(f))
        c2s = SparseChannel2Spatial(
            factor=self.factor, child_order="xyz", name="updown"
        )
        h = c2s(h, subdiv_mask=sub_bin)
        xs = c2s(x, subdiv_mask=sub_bin)
        f2 = jax.nn.silu(_ln32(h.features, "norm2", affine=False))
        h2, _ = SparseConv3d(
            self.out_channels, self.out_channels, 3, use_bias=True,
            kernel_init=nn.initializers.zeros, name="conv2",
        )(h.replace_features(f2))
        rep = self.out_channels // (self.channels // nc)
        skip = jnp.repeat(xs.features, rep, axis=-1)
        out = h2.replace_features(h2.features + skip)
        if self.pred_subdiv:
            return out, subdiv
        return out


class _RefEncStage(nn.Module):
    """One encoder resolution stage: ``num_blocks`` ConvNeXt blocks (sharing
    one kernel map) + an optional S2C down block, submodules named
    ``0..num_blocks`` to mirror the torch ``nn.ModuleList`` keys."""

    channels: int
    num_blocks: int
    down_channels: Optional[int]
    mlp_ratio: float = 4.0
    down_capacity: Optional[int] = None

    @nn.compact
    def __call__(self, x: Voxels) -> Voxels:
        table = None
        for j in range(self.num_blocks):
            x, table = RefConvNeXtBlock3d(
                self.channels, self.mlp_ratio, name=str(j)
            )(x, table)
        if self.down_channels is not None:
            x = RefResBlockS2C3d(
                self.channels, self.down_channels,
                out_capacity=self.down_capacity, name=str(self.num_blocks),
            )(x)
        return x


class _RefEncStages(nn.Module):
    """Reference ``SparseUNetEncoderStages`` (sparse_unet.py:282-336)."""

    model_channels: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    mlp_ratio: float = 4.0
    # Optional static row capacity after each downsample (len = stages - 1).
    # None keeps the input capacity — always safe (every parent has >= 1
    # child) but wasteful at ScanNet-scale density where parents shrink ~8x;
    # production callers size these from their data.
    stage_capacities: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: Voxels) -> Voxels:
        n = len(self.model_channels)
        for i in range(n):
            down = self.model_channels[i + 1] if i < n - 1 else None
            cap = None
            if down is not None and self.stage_capacities is not None:
                cap = self.stage_capacities[i]
            x = _RefEncStage(
                self.model_channels[i], self.num_blocks[i], down,
                self.mlp_ratio, down_capacity=cap, name=str(i),
            )(x)
        return x


class SparseUnetVaeEncoder(nn.Module):
    """Reference ``SparseUnetVaeEncoder`` (shape_vae.py:355-449): Linear in,
    ConvNeXt/S2C stages, non-affine final LN (torch ``F.layer_norm`` default
    eps 1e-5), ``to_latent`` Linear producing mean|logvar."""

    in_channels: int
    model_channels: Tuple[int, ...]
    latent_channels: int
    num_blocks: Tuple[int, ...]
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Voxels, sample_posterior: bool = False,
                 rng: Optional[jax.Array] = None):
        return _encode(self, x, sample_posterior, rng)


def _encode(mdl: nn.Module, x: Voxels, sample_posterior: bool,
            rng: Optional[jax.Array]):
    """Shared encoder body — called from the ``@nn.compact`` scope of both
    encoder classes so submodule names (= state-dict keys) stay top-level,
    exactly as in the reference where ``FlexiDualGridVaeEncoder`` *inherits*
    ``SparseUnetVaeEncoder``."""
    h = x.replace_features(
        nn.Dense(mdl.model_channels[0], name="input_layer")(x.features)
    )
    h = _RefEncStages(
        tuple(mdl.model_channels), tuple(mdl.num_blocks),
        mdl.mlp_ratio, name="blocks",
    )(h)
    f = nn.LayerNorm(
        epsilon=1e-5, use_bias=False, use_scale=False, name="final_norm",
    )(h.features.astype(jnp.float32)).astype(h.features.dtype)
    f = nn.Dense(2 * mdl.latent_channels, name="to_latent")(f)
    mean, logvar = jnp.split(f, 2, axis=-1)
    if sample_posterior:
        assert rng is not None
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, std.shape, std.dtype)
    else:
        z = mean
    vm = h.valid_mask()[..., None]
    z_vox = h.replace_features(jnp.where(vm, z, 0))
    return z_vox, jnp.where(vm, mean, 0), jnp.where(vm, logvar, 0)


class FlexiDualGridVaeEncoder(nn.Module):
    """Reference ``FlexiDualGridVaeEncoder`` (shape_vae.py:455-500): consumes
    the O-Voxel ``(vertices, intersected)`` pair on shared coords, shifts
    both by -0.5, and runs the 6-channel encoder body. Inherits the parent's
    state-dict keys (top-level ``input_layer``/``blocks``/``to_latent``)."""

    model_channels: Tuple[int, ...]
    latent_channels: int
    num_blocks: Tuple[int, ...]
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, vertices: Voxels, intersected: Voxels,
                 sample_posterior: bool = False,
                 rng: Optional[jax.Array] = None):
        feats = jnp.concatenate(
            [
                vertices.features - 0.5,
                intersected.features.astype(vertices.features.dtype) - 0.5,
            ],
            axis=-1,
        )
        feats = jnp.where(vertices.valid_mask()[..., None], feats, 0)
        x = vertices.replace_features(feats)
        return _encode(self, x, sample_posterior, rng)


class _RefDecStage(nn.Module):
    """One decoder resolution stage: ConvNeXt blocks + optional C2S up
    block; returns ``(x, subdiv_or_None)``."""

    channels: int
    num_blocks: int
    up_channels: Optional[int]
    mlp_ratio: float = 4.0
    pred_subdiv: bool = True

    @nn.compact
    def __call__(self, x: Voxels, guide_sub: Optional[Voxels] = None):
        table = None
        for j in range(self.num_blocks):
            x, table = RefConvNeXtBlock3d(
                self.channels, self.mlp_ratio, name=str(j)
            )(x, table)
        sub = None
        if self.up_channels is not None:
            block = RefResBlockC2S3d(
                self.channels, self.up_channels,
                pred_subdiv=self.pred_subdiv, name=str(self.num_blocks),
            )
            if self.pred_subdiv:
                x, sub = block(x)
            else:
                x = block(x, subdiv=guide_sub)
        return x, sub


class _RefDecStages(nn.Module):
    """Reference ``SparseUNetDecoderStages`` (sparse_unet.py:31-116), with
    ``stop_before_stage`` for the cascade's coordinate upsample."""

    model_channels: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    mlp_ratio: float = 4.0
    pred_subdiv: bool = True

    @nn.compact
    def __call__(self, x: Voxels, guide_subs=None,
                 stop_before_stage: Optional[int] = None):
        subs = []
        n = len(self.model_channels)
        for i in range(n):
            if stop_before_stage is not None and i == stop_before_stage:
                return x, subs
            up = self.model_channels[i + 1] if i < n - 1 else None
            guide = None
            if guide_subs is not None and up is not None:
                guide = guide_subs[i]
            x, sub = _RefDecStage(
                self.model_channels[i], self.num_blocks[i], up,
                self.mlp_ratio, pred_subdiv=self.pred_subdiv, name=str(i),
            )(x, guide_sub=guide)
            if sub is not None:
                subs.append(sub)
        return x, subs


class SparseUnetVaeDecoder(nn.Module):
    """Reference ``SparseUnetVaeDecoder`` (shape_vae.py:142-249):
    ``from_latent`` Linear, ConvNeXt/C2S stages with predicted subdivision,
    non-affine final LN, ``output_layer`` Linear."""

    out_channels: int
    model_channels: Tuple[int, ...]
    latent_channels: int
    num_blocks: Tuple[int, ...]
    mlp_ratio: float = 4.0
    pred_subdiv: bool = True

    @nn.compact
    def __call__(self, x: Voxels, guide_subs=None, return_subs: bool = False,
                 upsample_times: Optional[int] = None):
        out = _decode(self, x, guide_subs, upsample_times)
        if upsample_times is not None:
            return out
        h, subs = out
        if return_subs:
            return h, subs
        return h


def _decode(mdl: nn.Module, x: Voxels, guide_subs,
            upsample_times: Optional[int], out_channels: int = None):
    """Shared decoder body — called from the ``@nn.compact`` scope of both
    decoder classes so submodule names (= state-dict keys) stay top-level,
    exactly as in the reference where ``FlexiDualGridVaeDecoder`` *inherits*
    ``SparseUnetVaeDecoder``."""
    oc = out_channels if out_channels is not None else mdl.out_channels
    h = x.replace_features(
        nn.Dense(mdl.model_channels[0], name="from_latent")(x.features)
    )
    h, subs = _RefDecStages(
        tuple(mdl.model_channels), tuple(mdl.num_blocks),
        mdl.mlp_ratio, pred_subdiv=getattr(mdl, "pred_subdiv", True),
        name="blocks",
    )(h, guide_subs=guide_subs, stop_before_stage=upsample_times)
    if upsample_times is not None:
        return h
    f = nn.LayerNorm(
        epsilon=1e-5, use_bias=False, use_scale=False, name="final_norm"
    )(h.features.astype(jnp.float32)).astype(h.features.dtype)
    f = nn.Dense(oc, name="output_layer")(f)
    f = jnp.where(h.valid_mask()[..., None], f, 0)
    return h.replace_features(f), subs


class FlexiDualGridVaeDecoder(nn.Module):
    """Reference ``FlexiDualGridVaeDecoder`` (shape_vae.py:255-313): 7-channel
    mesh-attribute head; ``decode_attrs`` splits into (vertices,
    intersected, quad_lerp). Inherits the parent's state-dict keys
    (top-level ``from_latent``/``blocks``/``output_layer``)."""

    model_channels: Tuple[int, ...]
    latent_channels: int
    num_blocks: Tuple[int, ...]
    mlp_ratio: float = 4.0
    voxel_margin: float = 0.5
    pred_subdiv: bool = True

    @nn.compact
    def __call__(self, x: Voxels, guide_subs=None,
                 upsample_times: Optional[int] = None, raw: bool = False):
        out = _decode(self, x, guide_subs, upsample_times, out_channels=7)
        if upsample_times is not None:
            return out
        h, _ = out
        if raw:
            return h
        return self.decode_attrs(h, self.voxel_margin)

    @staticmethod
    def decode_attrs(h: Voxels, voxel_margin: float = 0.5):
        f = h.features
        vertices = h.replace_features(
            (1 + 2 * voxel_margin) * jax.nn.sigmoid(f[..., 0:3])
            - voxel_margin
        )
        intersected = h.replace_features(f[..., 3:6] > 0)
        quad_lerp = h.replace_features(jax.nn.softplus(f[..., 6:7]))
        return vertices, intersected, quad_lerp
