"""Normalization modules over geometry features (reference
``nn/modules/normalizations.py``). Flax linen; running batch-norm stats live
in the ``batch_stats`` collection like flax's own BatchNorm.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.nn.functional import normalizations as F


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, geometry):
        gamma = self.param("scale", nn.initializers.ones, (self.dim,))
        beta = self.param("bias", nn.initializers.zeros, (self.dim,))
        out = F.layer_norm(geometry.features, gamma, beta, self.eps)
        out = jnp.where(geometry.valid_mask()[..., None], out, 0)
        return geometry.replace_features(out)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, geometry):
        gamma = self.param("scale", nn.initializers.ones, (self.dim,))
        out = F.rms_norm(geometry.features, gamma, self.eps)
        out = jnp.where(geometry.valid_mask()[..., None], out, 0)
        return geometry.replace_features(out)


class BatchNorm(nn.Module):
    """Masked batch norm over all valid rows (reference BatchNorm over cat
    features). ``use_running_average`` selects train vs eval statistics."""

    dim: int
    eps: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, geometry, use_running_average: bool = False):
        x = geometry.features
        mask = geometry.valid_mask()
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.dim,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.dim,), jnp.float32)
        )
        gamma = self.param("scale", nn.initializers.ones, (self.dim,))
        beta = self.param("bias", nn.initializers.zeros, (self.dim,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = F.masked_batch_stats(x.astype(jnp.float32), mask)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        out = F.batch_norm(
            x, mask, gamma.astype(x.dtype), beta.astype(x.dtype), self.eps,
            mean.astype(x.dtype), var.astype(x.dtype),
        )
        return geometry.replace_features(out)
