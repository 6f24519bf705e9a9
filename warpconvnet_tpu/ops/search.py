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

import numpy as np
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


def _radius_cells_single(
    q: jnp.ndarray,
    r: jnp.ndarray,
    q_valid: jnp.ndarray,
    r_valid: jnp.ndarray,
    radius: float,
    k_cap: int,
    cell_cap: int,
    chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cell-list radius search for one scene — the TPU analog of the
    reference's hash-grid 2-pass kernels (``coords/search/radius.py:16-291``,
    ``csrc/radius_search_kernels.cu``): quantize refs to radius-sized cells,
    sort by cell key, then each query inspects the 27 neighbor cells' sorted
    ranges (two bucketed-rank passes) instead of every reference point —
    O(27 * cell_cap) work per query instead of O(N_ref).

    Exact nearest-``k_cap``-within-radius as long as no single cell holds
    more than ``cell_cap`` points (cells are radius-sized, so cell_cap ~
    max local density; overflowing candidates beyond the cap are dropped).
    """
    from warpconvnet_tpu.ops.keys import (
        PAD_COORD,
        argsort_keys,
        pack_coords,
        rank_in_sorted,
    )

    nq = q.shape[0]
    nr = r.shape[0]
    inv = 1.0 / radius
    rcell = jnp.where(
        r_valid[:, None], jnp.floor(r * inv).astype(jnp.int32), PAD_COORD
    )
    sorted_keys, perm = argsort_keys(pack_coords(rcell))
    r2 = jnp.sum(r * r, axis=-1)

    qcell = jnp.floor(q * inv).astype(jnp.int32)
    offs = jnp.asarray(
        np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"), -1)
        .reshape(-1, 3),
        jnp.int32,
    )  # [27, 3]

    pad_q = (-nq) % chunk
    qp = jnp.pad(q, ((0, pad_q), (0, 0)))
    qcp = jnp.pad(qcell, ((0, pad_q), (0, 0)), constant_values=PAD_COORD - 2)
    n_cells = offs.shape[0]
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

    def one_chunk(args):
        qc, cell = args  # [chunk, 3] float, [chunk, 3] int
        cells = jnp.clip(
            cell[:, None, :] + offs[None, :, :], -(PAD_COORD - 1), PAD_COORD - 1
        )  # [chunk, 27, 3]
        ck = pack_coords(cells.reshape(-1, 3))
        lo = rank_in_sorted(sorted_keys, ck, side="left").reshape(-1, n_cells)
        hi = rank_in_sorted(sorted_keys, ck, side="right").reshape(-1, n_cells)
        cnt = jnp.minimum(hi - lo, cell_cap)  # [chunk, 27]
        slot = lax.broadcasted_iota(jnp.int32, (chunk, n_cells, cell_cap), 2)
        cand_pos = lo[..., None] + slot
        cand_ok = slot < cnt[..., None]
        cand_pos = jnp.where(cand_ok, cand_pos, nr - 1)
        cand = perm[cand_pos.reshape(chunk, -1)]  # [chunk, 27*cap]
        cand_ok = cand_ok.reshape(chunk, -1)
        d = (
            jnp.sum(qc * qc, axis=-1)[:, None]
            - 2.0 * jnp.einsum("qd,qcd->qc", qc, r[cand]).astype(jnp.float32)
            + r2[cand]
        )
        d = jnp.where(cand_ok & r_valid[cand], d, big)
        neg_d, sel = lax.top_k(-d, k_cap)
        idx = jnp.take_along_axis(cand, sel, axis=1)
        dist = -neg_d
        ok = (dist <= radius * radius) & (dist < big)
        return jnp.where(ok, idx, 0).astype(jnp.int32), ok

    idx, ok = lax.map(
        one_chunk,
        (
            qp.reshape(-1, chunk, q.shape[-1]),
            qcp.reshape(-1, chunk, 3),
        ),
    )
    idx = idx.reshape(-1, k_cap)[:nq]
    ok = ok.reshape(-1, k_cap)[:nq] & q_valid[:, None]
    return jnp.where(ok, idx, 0), ok


def batched_radius_search(
    queries: jnp.ndarray,
    refs: jnp.ndarray,
    q_num_valid: jnp.ndarray,
    r_num_valid: jnp.ndarray,
    radius: float,
    max_neighbors: int,
    cell_cap: Optional[int] = None,
    use_cells: Optional[bool] = None,
) -> SearchResult:
    """Capped radius search: the ``max_neighbors`` nearest refs within
    ``radius``.

    ``use_cells`` (default: True for >= 16k reference points) selects the
    cell-list path — O(27 * cell_cap) per query (the reference's hash-grid
    design) — over the brute-force chunked cdist.

    Exactness contract of the cell path: results equal the brute-force path
    as long as no radius-sized cell holds more than ``cell_cap`` reference
    points; candidates beyond the cap are dropped in sorted-key order
    (NOT by distance), so an overflowing cell can shadow closer points.
    With concrete (non-traced) inputs the cap is sized automatically from
    the true max cell occupancy, making the result exact; under ``jit``,
    pass ``cell_cap`` explicitly if local density can exceed the default
    ``max(32, 2 * max_neighbors)``.
    """
    nq, nr = queries.shape[1], refs.shape[1]
    if use_cells is None:
        use_cells = nr >= 16384
    if cell_cap is None:
        cell_cap = max(32, 2 * max_neighbors)
        if use_cells:
            try:
                # Concrete inputs: size the cap to the true max occupancy of
                # any radius-sized cell (cells are keyed per scene; padded
                # rows all share the PAD cell but are excluded via validity).
                occ = 0
                inv = 1.0 / radius
                for b in range(refs.shape[0]):
                    nv = int(r_num_valid[b])
                    if nv == 0:
                        continue
                    cells = np.floor(np.asarray(refs[b, :nv]) * inv).astype(np.int64)
                    _, counts = np.unique(cells, axis=0, return_counts=True)
                    occ = max(occ, int(counts.max()))
                cell_cap = max(cell_cap, occ)
            except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
                pass  # traced: keep the documented default

    def one(q, r, qnv, rnv):
        qv = lax.broadcasted_iota(jnp.int32, (nq,), 0) < qnv
        rv = lax.broadcasted_iota(jnp.int32, (nr,), 0) < rnv
        if use_cells:
            return _radius_cells_single(
                q, r, qv, rv, radius, max_neighbors, cell_cap
            )
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
