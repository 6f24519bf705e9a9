"""Continuous neighbor search: kNN and radius (reference
``geometry/coords/search/{knn,radius,continuous}.py``).

TPU-native contract: results are **fixed-k padded** ``(indices [.., k],
valid_mask [.., k])`` instead of ragged CSR — jit-stable and directly
consumable by masked reductions. Radius search returns up to ``k`` neighbors
within the radius (a capped radius search; the reference's CSR rows are
unbounded but downstream reductions behave identically under the cap).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class SearchResult(NamedTuple):
    indices: jnp.ndarray  # [B, Nq, k] int32 into reference rows
    mask: jnp.ndarray  # [B, Nq, k] bool


@dataclasses.dataclass(frozen=True)
class RealSearchConfig:
    """Search configuration (reference ``search_configs.py:24-70``)."""

    mode: str = "knn"  # "knn" | "radius"
    knn_k: int = 16
    radius: float = 0.1

    def __post_init__(self):
        assert self.mode in ("knn", "radius"), self.mode


def _knn_single(
    q: jnp.ndarray,
    r: jnp.ndarray,
    q_valid: jnp.ndarray,
    r_valid: jnp.ndarray,
    k: int,
    chunk: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force chunked kNN for one scene (reference ``knn.py:10-142``)."""
    nq = q.shape[0]
    nr = r.shape[0]
    pad = (-nq) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    r2 = jnp.sum(r * r, axis=-1)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

    def one_chunk(qc):
        d = (
            jnp.sum(qc * qc, axis=-1)[:, None]
            - 2.0 * (qc @ r.T).astype(jnp.float32)
            + r2[None, :]
        )
        d = jnp.where(r_valid[None, :], d, big)
        neg_d, idx = lax.top_k(-d, k)
        return idx.astype(jnp.int32), -neg_d

    idx, dist = lax.map(one_chunk, qp.reshape(-1, chunk, q.shape[-1]))
    idx = idx.reshape(-1, k)[:nq]
    dist = dist.reshape(-1, k)[:nq]
    n_ref_valid = jnp.sum(r_valid.astype(jnp.int32))
    mask = (
        q_valid[:, None]
        & (lax.broadcasted_iota(jnp.int32, (nq, k), 1) < n_ref_valid)
        & (dist < big)
    )
    return jnp.where(mask, idx, 0), mask, dist


def batched_knn_search(
    queries: jnp.ndarray,
    refs: jnp.ndarray,
    q_num_valid: jnp.ndarray,
    r_num_valid: jnp.ndarray,
    k: int,
) -> SearchResult:
    """[B, Nq, D] x [B, Nr, D] -> k nearest reference indices per query
    (D is usually 3 but any feature dimension works — DGCNN builds graphs in
    feature space)."""
    nq, nr = queries.shape[1], refs.shape[1]

    def one(q, r, qnv, rnv):
        qv = lax.broadcasted_iota(jnp.int32, (nq,), 0) < qnv
        rv = lax.broadcasted_iota(jnp.int32, (nr,), 0) < rnv
        idx, mask, _ = _knn_single(q, r, qv, rv, k)
        return idx, mask

    idx, mask = jax.vmap(one)(queries, refs, q_num_valid, r_num_valid)
    return SearchResult(idx, mask)


def batched_radius_search(
    queries: jnp.ndarray,
    refs: jnp.ndarray,
    q_num_valid: jnp.ndarray,
    r_num_valid: jnp.ndarray,
    radius: float,
    max_neighbors: int,
) -> SearchResult:
    """Capped radius search: the ``max_neighbors`` nearest refs within
    ``radius`` (reference ``radius.py`` cell-list, fixed-cap variant)."""
    nq, nr = queries.shape[1], refs.shape[1]

    def one(q, r, qnv, rnv):
        qv = lax.broadcasted_iota(jnp.int32, (nq,), 0) < qnv
        rv = lax.broadcasted_iota(jnp.int32, (nr,), 0) < rnv
        idx, mask, dist = _knn_single(q, r, qv, rv, max_neighbors)
        mask = mask & (dist <= radius * radius)
        return jnp.where(mask, idx, 0), mask

    idx, mask = jax.vmap(one)(queries, refs, q_num_valid, r_num_valid)
    return SearchResult(idx, mask)


def neighbor_search(
    queries: jnp.ndarray,
    refs: jnp.ndarray,
    q_num_valid: jnp.ndarray,
    r_num_valid: jnp.ndarray,
    config: RealSearchConfig,
) -> SearchResult:
    """Dispatch on config (reference ``continuous.py:19-66``)."""
    if config.mode == "knn":
        return batched_knn_search(queries, refs, q_num_valid, r_num_valid, config.knn_k)
    return batched_radius_search(
        queries, refs, q_num_valid, r_num_valid, config.radius, config.knn_k
    )
