"""Linear / MLP modules on geometry features (reference ``nn/modules/mlp.py``,
``activations.py``)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.nn.functional.normalizations import layer_norm


class Linear(nn.Module):
    """Dense layer applied to geometry features (masked)."""

    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, geometry):
        out = nn.Dense(self.out_features, use_bias=self.use_bias)(geometry.features)
        out = jnp.where(geometry.valid_mask()[..., None], out, 0)
        return geometry.replace_features(out)


class Activation(nn.Module):
    fn: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, geometry):
        return geometry.replace_features(self.fn(geometry.features))


class MLPBlock(nn.Module):
    """Dense -> norm -> act (+ optional residual) on raw feature arrays
    (reference ``MLPBlock``, mlp.py). Operates on arrays so PointConv can use
    it on edge tensors of any rank."""

    hidden: int
    out: Optional[int] = None
    act: Callable = jax.nn.relu
    use_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_dim = self.out or self.hidden
        h = nn.Dense(self.hidden)(x)
        if self.use_norm:
            h = layer_norm(h)
        h = self.act(h)
        h = nn.Dense(out_dim)(h)
        return h


class BatchedLinear(nn.Module):
    """Stacked linear maps with one [S, Din, Dout] parameter (reference
    ``BatchedLinear`` — fused QKV projections keep optimizer-friendly shape)."""

    num_stacks: int
    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        din = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (self.num_stacks, din, self.out_features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.num_stacks, self.out_features))
        return jnp.einsum("...c,scd->...sd", x, w) + b
