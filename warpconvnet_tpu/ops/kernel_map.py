"""Kernel-map construction for spatially sparse convolution.

TPU-native redesign of the reference's fused hash-probe kernel-map generator
(``warpconvnet/geometry/coords/search/torch_discrete.py:24-432``,
``csrc/cuhash_kernel_map.cu``).

Representation
--------------
Instead of ragged CSR (in_maps/out_maps/offsets per kernel offset), the map is
a dense **pair table** ``table[K, N_out]`` — for kernel offset ``k`` and output
row ``o``, the index of the matching input row, or ``-1``. This is the
reference's own ``pair_table`` layout (``detail/mask_gemm.py``) promoted to the
primary representation: it is jit-stable (static shape), maps directly onto a
masked implicit GEMM, and its per-offset **reverse table** ``[K, N_in]``
(guaranteed to exist because ``in = S*out + off_k`` is injective per offset)
gives atomics-free dgrad *and* transposed-convolution maps for free.

Formal contract (reference ``tests/coords/test_kernel_map_invariants.py``):
for every k, o with ``table[k, o] == i >= 0``:
    ``in_coords[i] == stride * out_coords[o] + kernel_offset[k]``
and every valid (i, o, k) triple satisfying this appears exactly once.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.ops.keys import (
    PAD_COORD,
    argsort_keys,
    lookup_in_sorted,
    pack_coords,
)
from warpconvnet_tpu.ops.unique import UniqueResult, unique_coords


def _as_tuple3(v) -> Tuple[int, int, int]:
    if isinstance(v, (int, np.integer)):
        return (int(v),) * 3
    t = tuple(int(x) for x in v)
    assert len(t) == 3, f"expected 3D value, got {t}"
    return t


def kernel_offsets(
    kernel_size: Sequence[int] | int,
    dilation: Sequence[int] | int = 1,
    center_offset: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Static [K, 3] int32 offsets. Odd kernels are centered; even anchored at
    0 (reference ``kernel_offsets_from_size``, torch_discrete.py:24-56)."""
    ks = _as_tuple3(kernel_size)
    dil = _as_tuple3(dilation)
    if center_offset is None:
        center_offset = [(s - 1) // 2 if s % 2 == 1 else 0 for s in ks]
    grids = np.meshgrid(*[np.arange(s) for s in ks], indexing="ij")
    offs = np.stack([g.reshape(-1) for g in grids], axis=1).astype(np.int32)
    offs = (offs - np.asarray(center_offset, np.int32)) * np.asarray(dil, np.int32)
    return offs


def identity_offset_index(offsets: np.ndarray) -> Optional[int]:
    """Index of the all-zero offset, if present (the submanifold identity tap)."""
    hits = np.nonzero((offsets == 0).all(axis=1))[0]
    return int(hits[0]) if hits.size else None


class PairTable(NamedTuple):
    """Dense kernel map.

    Attributes:
      table: [K, N_out] int32 — input-row index per (offset, output), -1 if none.
      offsets: [K, 3] static numpy int32 kernel offsets.
      num_in: static int — input capacity (for reverse-table construction).
    """

    table: jnp.ndarray
    offsets: np.ndarray
    num_in: int

    @property
    def num_offsets(self) -> int:
        return self.table.shape[0]

    @property
    def num_out(self) -> int:
        return self.table.shape[1]

    def reverse(self) -> "PairTable":
        """Reverse table [K, N_in]: output-row index per (offset, input row).

        Exists exactly because for fixed k the map o -> i is injective.
        This is the reference's atomics-free dgrad ``reverse_mask_data``
        (``detail/mask_gemm.py:_build_reverse_mask_data``) and also the
        transposed-conv map (``helper.py:462-512`` in/out swap).
        """
        k, n_out = self.table.shape
        rev = jnp.full((k, self.num_in), -1, jnp.int32)
        out_ids = jnp.broadcast_to(
            lax.broadcasted_iota(jnp.int32, (k, n_out), 1), (k, n_out)
        )
        scatter_rows = jnp.where(self.table >= 0, self.table, self.num_in)
        k_ids = lax.broadcasted_iota(jnp.int32, (k, n_out), 0)
        rev = rev.at[k_ids.reshape(-1), scatter_rows.reshape(-1)].set(
            out_ids.reshape(-1), mode="drop"
        )
        return PairTable(rev, -self.offsets, n_out)

    def valid_mask(self) -> jnp.ndarray:
        return self.table >= 0

    def neighbor_count_per_output(self) -> jnp.ndarray:
        """[N_out] int32 — number of contributing inputs per output row."""
        return jnp.sum((self.table >= 0).astype(jnp.int32), axis=0)


def build_pair_table(
    in_coords: jnp.ndarray,
    in_valid: jnp.ndarray,
    out_coords: jnp.ndarray,
    offsets: np.ndarray,
    stride: Sequence[int] | int = 1,
    out_valid: jnp.ndarray | None = None,
    coord_bits: Tuple[int, int, int] = (16, 16, 16),
    assume_sorted: bool | None = None,
    use_probe: bool | None = None,
) -> PairTable:
    """Build the dense kernel map.

    For each kernel offset k and output row o, finds input row i with
    ``in_coords[i] == stride * out_coords[o] + offsets[k]``.

    ``in_coords`` need not be sorted; padded output rows (PAD_COORD) never
    match because queries built from them exceed the valid key range only if
    stride*PAD would overflow — so padded outputs are masked explicitly by the
    caller-provided coords themselves (PAD_COORD * stride + off never equals a
    valid input coordinate, which is < PAD_COORD).

    Fast paths (the fused-probe analog of the reference's
    ``packed_kernel_map_size``, ``cuhash_kernel_map.cu``):
    * ``assume_sorted`` — input rows are already lex-sorted (the coordinate
      engine's canonical order): skips the sort and the position->row gather.
    * ``use_probe`` — run the Pallas window-DMA probe
      (:func:`warpconvnet_tpu.kernels.sorted_search.sorted_probe`) instead of
      the XLA bucketed search. Defaults follow
      ``constants.WCT_ASSUME_LEX_SORTED`` / ``WCT_KERNEL_MAP_PROBE``.
    """
    from warpconvnet_tpu import constants

    if assume_sorted is None:
        assume_sorted = constants.WCT_ASSUME_LEX_SORTED
    if use_probe is None:
        use_probe = constants.WCT_KERNEL_MAP_PROBE

    stride3 = jnp.asarray(_as_tuple3(stride), jnp.int32)
    n_in = in_coords.shape[0]
    k = offsets.shape[0]
    n_out = out_coords.shape[0]
    in_c = jnp.where(in_valid[:, None], in_coords, PAD_COORD)
    in_keys = pack_coords(in_c, coord_bits)
    if assume_sorted:
        sorted_keys, perm = in_keys, None
    else:
        sorted_keys, perm = argsort_keys(in_keys)

    # Queries: [K, N_out, 3]. Clamp to avoid key-packing overflow on pad rows.
    if out_valid is not None:
        out_coords = jnp.where(out_valid[:, None], out_coords, PAD_COORD)
    base = out_coords[None, :, :] * stride3[None, None, :]
    q = base + jnp.asarray(offsets, jnp.int32)[:, None, :]
    q = jnp.clip(q, -(PAD_COORD - 1), PAD_COORD - 1)

    if use_probe and len(sorted_keys) == 2:
        from warpconvnet_tpu.kernels.sorted_search import sorted_probe

        # Pad each offset row to the probe tile so tiles stay monotone.
        tile_q = 256
        n_out_pad = ((n_out + tile_q - 1) // tile_q) * tile_q
        qk = pack_coords(q, coord_bits)  # tuple of [K, N_out]
        imax = jnp.iinfo(jnp.int32).max
        qk = tuple(
            jnp.pad(x, ((0, 0), (0, n_out_pad - n_out)), constant_values=imax)
            for x in qk
        )
        qk = tuple(x.reshape(-1) for x in qk)
        interp = jax.devices()[0].platform == "cpu"
        pos = sorted_probe(sorted_keys, qk, tile_q=tile_q, interpret=interp)
        pos = pos.reshape(k, n_out_pad)[:, :n_out].reshape(-1)
    else:
        q_keys = pack_coords(q.reshape(-1, 3), coord_bits)
        pos = lookup_in_sorted(sorted_keys, q_keys)  # index into sorted order

    # Map back to original input row ids; reject hits on padded input rows.
    safe = jnp.maximum(pos, 0)
    orig = perm[safe] if perm is not None else safe
    hit_valid = (pos >= 0) & in_valid[orig]
    table = jnp.where(hit_valid, orig, -1).astype(jnp.int32).reshape(k, -1)
    return PairTable(table, offsets, n_in)


def stride_coords(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    stride: Sequence[int] | int,
    max_out: int,
    coord_bits: Tuple[int, int, int] = (16, 16, 16),
) -> UniqueResult:
    """Downsample coords by integer stride: floor-divide then deduplicate.

    Matches reference ``stride_coords`` (``coords/ops/stride.py:18-56``) —
    NOTE output coords stay at the divided scale; the kernel map re-multiplies
    by the stride ratio (handled by ``build_pair_table``'s ``stride`` arg).
    """
    s = jnp.asarray(_as_tuple3(stride), jnp.int32)
    down = jnp.where(valid[:, None], coords // s, PAD_COORD)
    return unique_coords(down, valid, max_out, coord_bits)


def expand_coords(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    offsets: np.ndarray,
    max_out: int,
    coord_bits: Tuple[int, int, int] = (16, 16, 16),
) -> UniqueResult:
    """Generative expansion: union of ``coords + off`` over all kernel offsets,
    deduplicated (reference ``expand_coords``, ``coords/ops/expand.py``)."""
    k = offsets.shape[0]
    n = coords.shape[0]
    exp = coords[None, :, :] + jnp.asarray(offsets, jnp.int32)[:, None, :]
    exp = exp.reshape(k * n, 3)
    exp_valid = jnp.broadcast_to(valid[None, :], (k, n)).reshape(-1)
    return unique_coords(exp, exp_valid, max_out, coord_bits)
