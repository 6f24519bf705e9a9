"""Segment reductions — replaces ``torch_scatter.segment_csr`` usage
(reference ``warpconvnet/ops/reductions.py:13-76``).

Works on segment-id vectors (our ``to_unique`` mapping) instead of CSR
row_splits; ids equal to ``num_segments`` land in a dropped overflow segment.

Gradient semantics note (reference ``ops/reductions.py:56-61``): for min/max,
``jax.ops.segment_max`` gradients flow to one arg-extremum element, matching
``segment_csr`` rather than torch.segment_reduce's leaky tie behavior.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

REDUCTIONS = ("sum", "mean", "max", "min", "prod", "var", "std")


def row_reduction(
    features: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    reduction: str = "mean",
    counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reduce rows of ``features [N, C]`` grouped by ``seg_ids [N]``.

    Returns [num_segments, C]. Rows with seg_ids >= num_segments are ignored
    (scattered into one extra dropped segment). Empty segments produce 0.
    """
    ns = num_segments + 1  # overflow segment for padded rows
    if counts is None:
        counts = jax.ops.segment_sum(
            jnp.ones((features.shape[0],), jnp.int32), seg_ids, num_segments=ns
        )[:num_segments]
    denom = jnp.maximum(counts, 1).astype(features.dtype)[:, None]
    if reduction == "sum":
        return jax.ops.segment_sum(features, seg_ids, num_segments=ns)[:num_segments]
    if reduction == "mean":
        s = jax.ops.segment_sum(features, seg_ids, num_segments=ns)[:num_segments]
        return s / denom
    if reduction == "max":
        m = jax.ops.segment_max(features, seg_ids, num_segments=ns)[:num_segments]
        return jnp.where(counts[:, None] > 0, m, 0)
    if reduction == "min":
        m = jax.ops.segment_min(features, seg_ids, num_segments=ns)[:num_segments]
        return jnp.where(counts[:, None] > 0, m, 0)
    if reduction == "prod":
        return jax.ops.segment_prod(features, seg_ids, num_segments=ns)[:num_segments]
    if reduction in ("var", "std"):
        s = jax.ops.segment_sum(features, seg_ids, num_segments=ns)[:num_segments]
        sq = jax.ops.segment_sum(features * features, seg_ids, num_segments=ns)[:num_segments]
        mean = s / denom
        var = jnp.maximum(sq / denom - mean * mean, 0)
        return jnp.sqrt(var) if reduction == "std" else var
    raise ValueError(f"unknown reduction {reduction!r}; valid: {REDUCTIONS}")
