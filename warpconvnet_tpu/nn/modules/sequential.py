"""Sequential container mixing geometry-aware and feature-level modules
(reference ``nn/modules/sequential.py:45-102``: auto re-wraps plain layers to
act on geometry features)."""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from warpconvnet_tpu.geometry.base import GeometryMixin


class GeometrySequential(nn.Module):
    """Applies a list of callables; plain array->array modules (e.g. nn.Dense,
    activation fns) are lifted to operate on geometry features. Modules that
    return (geometry, table) tuples have the table dropped."""

    layers: Sequence[Any]

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        for layer in self.layers:
            if isinstance(x, GeometryMixin):
                try:
                    out = layer(x)
                except TypeError:
                    out = x.replace_features(layer(x.features))
                if isinstance(out, tuple):
                    out = out[0]
                if not isinstance(out, GeometryMixin) and isinstance(out, jnp.ndarray):
                    out = x.replace_features(out)
                x = out
            else:
                x = layer(x)
        return x
