"""Point-cloud bilateral filtering (reference
``warpconvnet/nn/functional/bilateral.py`` knn/radius backends; the dense
``bilateral_grid.py`` serves images — here the grid variant operates on
:class:`Grid` features).

out_i = sum_j w_ij f_j / sum_j w_ij,
w_ij = exp(-|p_i - p_j|^2 / 2 sigma_s^2) * exp(-|f_i - f_j|^2 / 2 sigma_r^2)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.points import Points
from warpconvnet_tpu.ops.search import RealSearchConfig, neighbor_search


def point_bilateral_filter(
    points: Points,
    sigma_spatial: float,
    sigma_range: float,
    k: int = 16,
    radius: Optional[float] = None,
) -> Points:
    """Edge-preserving smoothing of point features.

    Neighbors via kNN (or capped radius when ``radius`` is given), matching
    the reference's two backends.
    """
    cfg = (
        RealSearchConfig("radius", knn_k=k, radius=radius)
        if radius is not None
        else RealSearchConfig("knn", knn_k=k)
    )
    res = neighbor_search(
        points.coords, points.coords, points.num_valid, points.num_valid, cfg
    )
    nb_f = jax.vmap(lambda f, i: f[i])(points.features, res.indices)
    nb_p = jax.vmap(lambda c, i: c[i])(points.coords, res.indices)

    dp2 = jnp.sum((nb_p - points.coords[:, :, None, :]) ** 2, axis=-1)
    df2 = jnp.sum((nb_f - points.features[:, :, None, :]) ** 2, axis=-1)
    logw = -dp2 / (2 * sigma_spatial**2) - df2 / (2 * sigma_range**2)
    w = jnp.where(res.mask, jnp.exp(logw), 0.0)
    den = jnp.sum(w, axis=-1, keepdims=True)
    out = jnp.sum(w[..., None] * nb_f, axis=2) / jnp.maximum(den, 1e-12)
    out = jnp.where(points.valid_mask()[..., None], out, 0)
    return points.replace_features(out)


def grid_bilateral_filter(
    features: jnp.ndarray,
    guide: jnp.ndarray,
    sigma_spatial: float,
    sigma_range: float,
    half_window: int = 2,
) -> jnp.ndarray:
    """Dense bilateral filter over a [B, H, W, C] grid with scalar/vector
    guide [B, H, W, G] (reference ``bilateral_grid.py`` use case: image
    smoothing / CRF message passing). Window is static (2*half_window+1)^2."""
    b, h, w, c = features.shape
    out_num = jnp.zeros_like(features)
    out_den = jnp.zeros(features.shape[:-1] + (1,), features.dtype)
    for dy in range(-half_window, half_window + 1):
        for dx in range(-half_window, half_window + 1):
            shifted_f = jnp.roll(features, (dy, dx), axis=(1, 2))
            shifted_g = jnp.roll(guide, (dy, dx), axis=(1, 2))
            dg2 = jnp.sum((shifted_g - guide) ** 2, axis=-1, keepdims=True)
            logw = -(dy * dy + dx * dx) / (2 * sigma_spatial**2) - dg2 / (
                2 * sigma_range**2
            )
            wgt = jnp.exp(logw)
            # mask roll wraparound
            ys = jnp.arange(h)[None, :, None, None]
            xs = jnp.arange(w)[None, None, :, None]
            ok_y = (ys - dy >= 0) & (ys - dy < h)
            ok_x = (xs - dx >= 0) & (xs - dx < w)
            wgt = jnp.where(ok_y & ok_x, wgt, 0)
            out_num = out_num + wgt * shifted_f
            out_den = out_den + wgt
    return out_num / jnp.maximum(out_den, 1e-12)
