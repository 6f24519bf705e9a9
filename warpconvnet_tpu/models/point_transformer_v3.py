"""PointTransformerV3 (reference ``warpconvnet/models/point_transformer_v3.py:188``).

Serialized patch-attention U-Net over sparse voxels: conv stem, encoder
levels of PatchAttentionBlocks with stride-2 max-pool downs, decoder with
SerializedUnpooling (project + unpool + add) and more blocks.

TPU-native detail: the reference re-selects a random Morton axis order per
forward (``shuffle_orders``), which would be a static recompile here —
instead the axis order is a *traced* permutation of the coordinate columns,
so one compiled program covers all 6 orders.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_pool import sparse_max_pool, sparse_unpool
from warpconvnet_tpu.nn.modules.attention import PatchAttention
from warpconvnet_tpu.nn.modules.norms import BatchNorm
from warpconvnet_tpu.nn.modules.sparse_conv import SparseConv3d

# The 6 Morton axis orders (reference POINT_ORDERING, serialization.py:22).
_ORDER_PERMS = np.array(
    [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]], np.int32
)


class PatchAttentionBlock(nn.Module):
    """conv positional branch (xCPE) -> +x; norm -> PatchAttention -> +x;
    norm -> MLP -> +x (reference ``PatchAttentionBlock``,
    point_transformer_v3.py:61-140: ``x = conv(x) + conv_shortcut(x)``
    where conv = SparseConv3d(k=3) -> Linear -> LayerNorm and the shortcut
    is identity at equal channels)."""

    dim: int
    patch_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: Optional[float] = 100.0
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Voxels, order_perm: Optional[jnp.ndarray] = None) -> Voxels:
        h_vox, _ = SparseConv3d(
            self.dim, self.dim, self.kernel_size, use_bias=True, name="cpe_conv"
        )(x)
        h = nn.Dense(self.dim, name="cpe_proj")(h_vox.features)
        h = nn.LayerNorm(name="cpe_norm")(h)
        x = x.replace_features(
            jnp.where(x.valid_mask()[..., None], x.features + h, 0)
        )
        feats = x.features
        coords = x.coords
        if order_perm is not None:
            coords = jnp.take(coords, order_perm, axis=-1)
        h = nn.LayerNorm()(feats)
        attn_in = x.replace(coords=coords, features=h)
        h = PatchAttention(self.dim, self.patch_size, self.num_heads,
                           rope_base=self.rope_base, name="attn")(attn_in).features
        feats = feats + h
        h = nn.LayerNorm()(feats)
        h = nn.Dense(int(self.dim * self.mlp_ratio))(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim)(h)
        feats = feats + h
        feats = jnp.where(x.valid_mask()[..., None], feats, 0)
        return x.replace_features(feats)


class SerializedUnpooling(nn.Module):
    """Project skip + project up + unpool + ADD (reference
    ``SerializedUnpooling``, point_transformer_v3.py:143-185)."""

    in_channels: int
    skip_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: Voxels, skip: Voxels, table, train: bool = True) -> Voxels:
        xf = nn.Dense(self.out_channels, name="proj")(x.features)
        xp = x.replace_features(xf)
        xp = BatchNorm(self.out_channels, name="proj_norm")(xp, use_running_average=not train)
        xp = xp.replace_features(jax.nn.gelu(xp.features, approximate=False))
        sf = nn.Dense(self.out_channels, name="proj_skip")(skip.features)
        sp = skip.replace_features(sf)
        sp = BatchNorm(self.out_channels, name="skip_norm")(sp, use_running_average=not train)
        sp = sp.replace_features(jax.nn.gelu(sp.features, approximate=False))
        up = sparse_unpool(xp, skip, table)
        out = up.replace_features(up.features + sp.features)
        return out.mask_features()


class PointTransformerV3(nn.Module):
    in_channels: int = 6
    out_channels: Optional[int] = None
    enc_depths: Tuple[int, ...] = (2, 2, 2, 6, 2)
    enc_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    enc_num_head: Tuple[int, ...] = (2, 4, 8, 16, 32)
    enc_patch_size: Tuple[int, ...] = (1024, 1024, 1024, 1024, 1024)
    dec_depths: Tuple[int, ...] = (2, 2, 2, 2)
    dec_channels: Tuple[int, ...] = (64, 64, 128, 256)
    dec_num_head: Tuple[int, ...] = (4, 4, 8, 16)
    dec_patch_size: Tuple[int, ...] = (1024, 1024, 1024, 1024)
    mlp_ratio: float = 4.0
    shuffle_orders: bool = True
    capacities: Optional[Tuple[int, ...]] = None
    # 3D coordinate RoPE base for the attention blocks. The reference PTv3
    # has no RoPE (point_transformer_v3.py:61-140); None matches it. Set
    # e.g. 100.0 to enable the TPU-native rotary variant.
    rope_base: Optional[float] = None

    def _caps(self, n: int) -> Tuple[int, ...]:
        if self.capacities is not None:
            return self.capacities
        num_level = len(self.enc_depths)
        # Capacities must stay divisible by the patch size for reshaping.
        # Level 0 runs at the input's padded size (must divide patch size 0).
        out = [n]
        for i in range(1, num_level):
            c = max(n // (2 ** i), min(n, 128))
            p = min(self.enc_patch_size[i], c)
            c = max((c // p) * p, p)
            out.append(c)
        return tuple(out)

    @nn.compact
    def __call__(self, x: Voxels, train: bool = True,
                 order_rng: Optional[jax.Array] = None) -> Voxels:
        num_level = len(self.enc_depths)
        caps = self._caps(x.max_num_points)
        perms = jnp.asarray(_ORDER_PERMS)

        def pick_order(i):
            if self.shuffle_orders and order_rng is not None:
                idx = jax.random.randint(
                    jax.random.fold_in(order_rng, i), (), 0, len(_ORDER_PERMS)
                )
                return perms[idx]
            return perms[i % len(_ORDER_PERMS)]

        # Stem: 5^3 submanifold conv.
        h, _ = SparseConv3d(self.in_channels, self.enc_channels[0], 5,
                            name="stem")(x)
        h = BatchNorm(self.enc_channels[0], name="stem_norm")(h, use_running_average=not train)
        h = h.replace_features(jax.nn.gelu(h.features, approximate=False))

        # Encoder.
        skips, tables = [], []
        blk = 0
        for i in range(num_level):
            for d in range(self.enc_depths[i]):
                h = PatchAttentionBlock(
                    self.enc_channels[i], min(self.enc_patch_size[i], caps[i]),
                    self.enc_num_head[i], self.mlp_ratio,
                    rope_base=self.rope_base, name=f"enc{i}_blk{d}",
                )(h, pick_order(blk)); blk += 1
            if i < num_level - 1:
                skips.append(h)
                h = h.replace_features(
                    nn.Dense(self.enc_channels[i + 1], name=f"down{i}_proj")(h.features)
                )
                h, t = sparse_max_pool(h, kernel_size=2, stride=2,
                                       out_capacity=caps[i + 1])
                tables.append(t)
                h = BatchNorm(self.enc_channels[i + 1], name=f"down{i}_norm")(
                    h, use_running_average=not train)
                h = h.replace_features(jax.nn.gelu(h.features, approximate=False))

        # Decoder.
        dec_ch = list(self.dec_channels) + [self.enc_channels[-1]]
        for j, i in enumerate(reversed(range(num_level - 1))):
            h = SerializedUnpooling(
                dec_ch[i + 1], self.enc_channels[i], dec_ch[i],
                name=f"up{i}",
            )(h, skips[i], tables[i], train)
            for d in range(self.dec_depths[i]):
                h = PatchAttentionBlock(
                    dec_ch[i], min(self.dec_patch_size[i], caps[i]),
                    self.dec_num_head[i], self.mlp_ratio,
                    rope_base=self.rope_base, name=f"dec{i}_blk{d}",
                )(h, pick_order(blk)); blk += 1

        if self.out_channels is not None:
            h = h.replace_features(
                nn.Dense(self.out_channels, name="final")(h.features)
            )
            h = h.mask_features()
        return h
