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
    sort_keys,
    unique_mask_sorted,
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


_IMAX = np.iinfo(np.int32).max
_IMIN = np.iinfo(np.int32).min
_PROBE_TILE_Q = 256
_PROBE_TILES_PER_STEP = 8


def _z_group(offsets: np.ndarray) -> int:
    """zg such that offsets come in contiguous (dx, dy) blocks of zg sharing
    one z-delta vector across blocks (the z-fastest ``kernel_offsets``
    enumeration and its negations/reversals); 1 if no such structure."""
    from warpconvnet_tpu.kernels.implicit_gemm import z_group_of

    offs = np.asarray(offsets)
    zg = z_group_of(offs)
    if zg <= 1:
        return 1
    dz = offs[:, 2].reshape(-1, zg)
    if not np.all(dz == dz[0]):
        return 1
    return zg


def _yz_group(offsets: np.ndarray):
    """Detect dx-major block structure: offsets in contiguous blocks sharing
    dx, each block a full (y_deltas x z_deltas) grid enumerated dy-major /
    z-fastest, with ONE delta grid shared by every block (holds for
    ``kernel_offsets`` and its negations/reversals, any dilation).

    Returns ``(y_deltas, z_deltas)`` or ``None``. The multi-(y, z) probe
    then serves a whole dx block with one window DMA."""
    from warpconvnet_tpu.kernels.implicit_gemm import _prefix_group_of

    offs = np.asarray(offsets)
    k = offs.shape[0]
    gsz = _prefix_group_of(offs, 1)  # block size sharing dx
    if gsz <= 1:
        return None
    block = offs[:gsz]
    # Within a block: ndz = leading run sharing dy.
    ndz = 1
    while ndz < gsz and block[ndz, 1] == block[0, 1]:
        ndz += 1
    if gsz % ndz != 0:
        return None
    ndy = gsz // ndz
    dy2 = block[:, 1].reshape(ndy, ndz)
    dz2 = block[:, 2].reshape(ndy, ndz)
    if not (
        np.all(dy2 == dy2[:, :1])  # dy constant within each z-run
        and np.all(dz2 == dz2[0])  # same z-delta vector for every dy
        and len(set(dy2[:, 0].tolist())) == ndy  # distinct dys
    ):
        return None
    # Same (dy, dz) grid in every dx block.
    if not np.all(offs[:, 1:].reshape(k // gsz, gsz, 2) == block[None, :, 1:]):
        return None
    return tuple(int(d) for d in dy2[:, 0]), tuple(int(d) for d in dz2[0])


def _sentinel_queries(
    q: jnp.ndarray,  # [..., 3] int32 raw queries (stride*out + off)
    out_valid: jnp.ndarray,  # [...] bool
    coord_bits: Tuple[int, int, int],
):
    """Pack queries into keys, replacing out-of-range and pad-row queries by
    non-matching sentinels that preserve lexicographic order.

    Clipping queries into the valid range (the round-1 approach) could alias
    a genuine input voxel at the clip boundary; instead, queries above the
    range (and all pad-row queries, which sort last) get key INT32_MAX and
    queries below the range get INT32_MIN — neither can equal a real input
    key (valid keys lie strictly inside), and order within each monotone
    query row is preserved.
    """
    hi_bad = jnp.any(q >= PAD_COORD, axis=-1) | ~out_valid
    lo_bad = jnp.any(q <= -PAD_COORD, axis=-1) & ~hi_bad
    qc = jnp.clip(q, -(PAD_COORD - 1), PAD_COORD - 1)  # safe packing only
    keys = pack_coords(qc, coord_bits)
    keys = tuple(
        jnp.where(hi_bad, _IMAX, jnp.where(lo_bad, _IMIN, kk)) for kk in keys
    )
    return keys


def _sentinel_queries_mz(
    q: jnp.ndarray,  # [..., 3] int32 block-base queries (dy = dz = 0)
    out_valid: jnp.ndarray,  # [...] bool
    y_deltas: Tuple[int, ...] = (0,),
):
    """Multi-(y, z) variant of :func:`_sentinel_queries` for the default
    2-key packing: the low key carries **raw z** (unclipped, unsentineled),
    so the in-probe ``z + dz`` arithmetic is exact plain-integer arithmetic
    — a z outside the valid coordinate range simply matches no voxel (valid
    voxels lie strictly inside ±(PAD_COORD-1)) and correctly yields -1, for
    every dz independently.

    y is kept **raw** inside the hi key for the same reason: ``hi =
    x * 65536 + (y + 32768)`` is linear in y, so ``hi + dy`` is exactly the
    dy-shifted query's hi whenever ``y + dy`` is in range. A base y for
    which NO dy in ``y_deltas`` lands in range is sentineled (its raw hi
    could overflow int32 for extreme strides); bases where only SOME dy are
    in range keep the raw hi, and the caller masks the out-of-range (dy)
    slots, whose wrapped hi could alias a neighboring-x voxel
    (``_y_delta_valid``). Sentinels therefore encode x violations, whole-
    block y violations, and pad rows — never a partially-in-range block
    (sentineling on the base y/z wrongly killed whole groups when some of
    their deltas were in range)."""
    dy_min, dy_max = min(y_deltas), max(y_deltas)
    x, y, z = q[..., 0], q[..., 1], q[..., 2]
    hi_bad = (
        (x >= PAD_COORD) | (y + dy_min > PAD_COORD - 1) | ~out_valid
    )
    lo_bad = (
        (x <= -PAD_COORD) | (y + dy_max < -(PAD_COORD - 1))
    ) & ~hi_bad
    xc = jnp.clip(x, -(PAD_COORD - 1), PAD_COORD - 1)
    hi = xc * 65536 + (y + 32768)
    hi = jnp.where(hi_bad, _IMAX, jnp.where(lo_bad, _IMIN, hi))
    lo = jnp.where(hi_bad, _IMAX, jnp.where(lo_bad, _IMIN, z))
    return hi, lo


def _y_delta_valid(
    y_base: jnp.ndarray,  # [...] int32 block-base y (dy = 0)
    y_deltas: Tuple[int, ...],
) -> jnp.ndarray:
    """[NDY, ...] bool — y_base + dy lands in the valid coordinate range.

    Out-of-range dy slots of the multi-(y, z) probe MUST be masked: their
    wrapped hi key can alias a real voxel at x±1 (see
    ``_sentinel_queries_mz``)."""
    dyv = jnp.asarray(y_deltas, jnp.int32).reshape(
        (-1,) + (1,) * y_base.ndim
    )
    yv = y_base[None] + dyv
    return (yv >= -(PAD_COORD - 1)) & (yv <= PAD_COORD - 1)


def build_pair_tables_batched(
    in_coords: jnp.ndarray,  # [B, N, 3]
    in_num_valid: jnp.ndarray,  # [B]
    out_coords: jnp.ndarray,  # [B, M, 3]
    out_num_valid: jnp.ndarray,  # [B]
    offsets: np.ndarray,
    stride: Sequence[int] | int = 1,
    coord_bits: Tuple[int, int, int] = (16, 16, 16),
    assume_sorted: bool | None = None,
    use_probe: bool | None = None,
    queries_sorted: bool | None = None,
) -> jnp.ndarray:
    """Batched dense kernel map: table [B, K, M] int32 (input row or -1).

    For each scene b, offset k, output row o, finds input row i with
    ``in_coords[b, i] == stride * out_coords[b, o] + offsets[k]``.

    Fast paths (the fused-probe analog of the reference's
    ``packed_kernel_map_size``, ``cuhash_kernel_map.cu``):
    * ``assume_sorted`` — input rows are already lex-sorted (the coordinate
      engine's canonical order): skips the sort and the position->row gather.
    * ``queries_sorted`` — **out_coords** rows are lex-sorted, which makes
      the probe's query tiles monotone. Auto-probe requires BOTH flags: key
      sortedness alone says nothing about the query side. (The probe also
      carries a per-tile monotonicity guard that routes violating tiles to
      the exact fallback, so an over-claimed flag degrades speed, not
      correctness.)
    * ``use_probe`` — the Pallas window-DMA probe
      (:func:`warpconvnet_tpu.kernels.sorted_search.sorted_probe_batched`)
      instead of the XLA bucketed search; one pallas_call per batch.
    Defaults follow ``constants.WCT_ASSUME_LEX_SORTED`` /
    ``WCT_KERNEL_MAP_PROBE``.
    """
    from warpconvnet_tpu import constants

    if assume_sorted is None:
        assume_sorted = constants.WCT_ASSUME_LEX_SORTED
    if queries_sorted is None:
        queries_sorted = constants.WCT_ASSUME_LEX_SORTED
    if use_probe is None:
        use_probe = constants.WCT_KERNEL_MAP_PROBE
    if use_probe is None:
        # Probe needs monotone query tiles AND sorted keys; only callers
        # that establish both get it by default.
        use_probe = bool(assume_sorted) and bool(queries_sorted)

    stride3 = jnp.asarray(_as_tuple3(stride), jnp.int32)
    b, n, _ = in_coords.shape
    m = out_coords.shape[1]
    k = offsets.shape[0]

    iv = lax.broadcasted_iota(jnp.int32, (b, n), 1) < in_num_valid[:, None]
    ov = lax.broadcasted_iota(jnp.int32, (b, m), 1) < out_num_valid[:, None]
    in_c = jnp.where(iv[..., None], in_coords, PAD_COORD)
    in_keys = pack_coords(in_c, coord_bits)  # tuple of [B, N]
    if assume_sorted:
        sorted_keys, perm = in_keys, None
    else:
        sorted_keys, perm = jax.vmap(lambda *ks: argsort_keys(ks))(*in_keys)

    oc = jnp.where(ov[..., None], out_coords, PAD_COORD)
    base = oc[:, None, :, :] * stride3  # [B, 1, M, 3]
    q = base + jnp.asarray(offsets, jnp.int32)[None, :, None, :]  # [B, K, M, 3]
    qk = _sentinel_queries(q, ov[:, None, :], coord_bits)  # tuple of [B, K, M]

    yz = _yz_group(offsets) if len(sorted_keys) == 2 else None
    # dy_in_deltas: blocks are dx-major and dy is enumerated by the probe's
    # y_deltas chain (block bases carry dy = 0). In the z-only fallback the
    # blocks are (dx, dy) groups whose bases KEEP their dy.
    dy_in_deltas = yz is not None
    if yz is None and len(sorted_keys) == 2:
        # No dx-block grid structure; fall back to plain (dx, dy) z-blocks.
        zg = _z_group(offsets)
        if zg > 1:
            yz = ((0,), tuple(int(d) for d in np.asarray(offsets)[:zg, 2]))
    if use_probe and yz is not None:
        # Multi-(y, z) fused probe: one window DMA per dx offset block
        # serves the block's whole (dy, dz) delta grid via exact integer-
        # chain key arithmetic (the TPU analog of the reference's
        # hierarchical coarse->fine pruning for big kernels,
        # ``hierarchical_search.py:25-66`` — here the (dy, dz) fan-out is
        # folded into the probe instead of pruned: grid steps and DMAs per
        # offset drop by ndy*ndz).
        from warpconvnet_tpu.kernels.sorted_search import (
            sorted_probe_batched_mz,
        )

        y_deltas, z_deltas = yz
        gsz = len(y_deltas) * len(z_deltas)
        g = k // gsz
        # Block-base queries at dy = dz = 0: hi from (x+dx, y) with RAW y,
        # low key = raw strided z (both delta chains applied in-kernel).
        goffs = np.asarray(offsets)[::gsz].copy()  # [G, 3]
        if dy_in_deltas:
            goffs[:, 1] = 0
        goffs[:, 2] = 0
        qg = base + jnp.asarray(goffs, jnp.int32)[None, :, None, :]
        gqk = _sentinel_queries_mz(
            qg, ov[:, None, :], y_deltas
        )  # ([B,G,M], [B,G,M])

        tile_q = _PROBE_TILE_Q
        mq = -(-m // tile_q) * tile_q
        q_tot = g * mq
        q_pad = -(-q_tot // (tile_q * _PROBE_TILES_PER_STEP)) * (
            tile_q * _PROBE_TILES_PER_STEP
        )

        def padq(x):
            x = jnp.pad(
                x, ((0, 0), (0, 0), (0, mq - m)), constant_values=_IMAX
            ).reshape(b, q_tot)
            return jnp.pad(
                x, ((0, 0), (0, q_pad - q_tot)), constant_values=_IMAX
            )

        interp = jax.devices()[0].platform == "cpu"
        pos = sorted_probe_batched_mz(
            sorted_keys, padq(gqk[0]), padq(gqk[1]), z_deltas,
            y_deltas=y_deltas, tile_q=tile_q, interpret=interp,
        )  # [B, NDY*NDZ, Qp]
        pos = pos[:, :, :q_tot].reshape(b, gsz, g, mq)[:, :, :, :m]
        if dy_in_deltas and (len(y_deltas) > 1 or min(y_deltas) != 0):
            # Kill slots whose y + dy left the valid range: their wrapped
            # hi key can falsely match a voxel at a neighboring x.
            yval = _y_delta_valid(qg[..., 1], y_deltas)  # [NDY, B, G, M]
            yval = jnp.repeat(
                jnp.moveaxis(yval, 0, 1), len(z_deltas), axis=1
            )  # [B, NDY*NDZ, G, M]
            pos = jnp.where(yval, pos, -1)
        pos = jnp.transpose(pos, (0, 2, 1, 3)).reshape(b, k, m)
    elif use_probe and len(sorted_keys) == 2:
        from warpconvnet_tpu.kernels.sorted_search import sorted_probe_batched

        tile_q = _PROBE_TILE_Q
        mq = -(-m // tile_q) * tile_q
        q_tot = k * mq
        q_pad = -(-q_tot // (tile_q * _PROBE_TILES_PER_STEP)) * (
            tile_q * _PROBE_TILES_PER_STEP
        )
        qk2 = tuple(
            jnp.pad(
                x, ((0, 0), (0, 0), (0, mq - m)), constant_values=_IMAX
            ).reshape(b, q_tot)
            for x in qk
        )
        qk2 = tuple(
            jnp.pad(x, ((0, 0), (0, q_pad - q_tot)), constant_values=_IMAX)
            for x in qk2
        )
        interp = jax.devices()[0].platform == "cpu"
        pos = sorted_probe_batched(
            sorted_keys, qk2, tile_q=tile_q, interpret=interp
        )
        pos = pos[:, :q_tot].reshape(b, k, mq)[:, :, :m]
    else:
        flat = tuple(x.reshape(b, k * m) for x in qk)
        nk = len(sorted_keys)

        def one(*args):
            return lookup_in_sorted(args[:nk], args[nk:])

        pos = jax.vmap(one)(*sorted_keys, *flat).reshape(b, k, m)

    safe = jnp.maximum(pos, 0)
    if perm is not None:
        orig = jnp.take_along_axis(perm, safe.reshape(b, -1), axis=1).reshape(
            b, k, m
        )
    else:
        orig = safe
    hit = pos >= 0
    if len(in_keys) != 2:
        # Non-default key configs may not reserve a sentinel for pad input
        # rows; reject hits on padded inputs explicitly.
        hit = hit & jnp.take_along_axis(
            iv, jnp.minimum(orig, n - 1).reshape(b, -1), axis=1
        ).reshape(b, k, m)
    return jnp.where(hit, orig, -1).astype(jnp.int32)


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
    queries_sorted: bool | None = None,
) -> PairTable:
    """Single-scene dense kernel map (see :func:`build_pair_tables_batched`).

    ``in_valid``/``out_valid`` are boolean masks; valid rows must be the
    first ``num_valid`` rows (the padded-layout convention).
    """
    n_in = in_coords.shape[0]
    n_out = out_coords.shape[0]
    inv = jnp.sum(in_valid.astype(jnp.int32))
    if out_valid is None:
        # Padded-layout convention: pad rows carry PAD_COORD on every axis
        # and sort last, so "rows before the first pad" is the valid prefix.
        out_valid = ~jnp.any(out_coords >= PAD_COORD, axis=-1)
    onv = jnp.sum(out_valid.astype(jnp.int32))
    table = build_pair_tables_batched(
        in_coords[None],
        inv[None],
        out_coords[None],
        onv[None],
        offsets,
        stride=stride,
        coord_bits=coord_bits,
        assume_sorted=assume_sorted,
        use_probe=use_probe,
        queries_sorted=queries_sorted,
    )[0]
    return PairTable(table, offsets, n_in)


def parity_partition_applies(
    kernel_size: Sequence[int] | int,
    stride: Sequence[int] | int,
    dilation: Sequence[int] | int = 1,
) -> bool:
    """True when the kernel map of a strided conv is a *parity partition*:
    every input voxel matches exactly one (offset, output) pair, namely
    ``offset = coord mod stride`` and ``output = coord // stride``.

    Holds for even ``kernel_size == stride`` at dilation 1 (the 0-anchored
    even-offset convention makes offsets a complete residue system
    ``[0, stride)``) — MinkUNet's 2^3/s2 downsamples and every
    kernel==stride reduction. The map then needs NO search at all: the
    ``to_unique`` mapping of :func:`stride_coords` already is the output
    column (the TPU answer to the reference's fused hash probe for this
    case, ``cuhash_kernel_map.cu packed_kernel_map_size``).
    """
    ks = _as_tuple3(kernel_size)
    st = _as_tuple3(stride)
    dil = _as_tuple3(dilation)
    return ks == st and all(s % 2 == 0 for s in ks) and dil == (1, 1, 1)


def _parity_k_index(
    coords: jnp.ndarray, kernel_size: Tuple[int, int, int]
) -> jnp.ndarray:
    """Offset-slot index of each coordinate row under the x-major
    :func:`kernel_offsets` enumeration: k = rx*ky*kz + ry*kz + rz with
    r = coord mod kernel_size (non-negative, floor-mod)."""
    kx, ky, kz = kernel_size
    rx = jnp.mod(coords[..., 0], kx)
    ry = jnp.mod(coords[..., 1], ky)
    rz = jnp.mod(coords[..., 2], kz)
    return rx * (ky * kz) + ry * kz + rz


def parity_pair_tables_from_unique(
    coords: jnp.ndarray,  # [B, N, 3] int32 (fine/input side)
    valid: jnp.ndarray,  # [B, N] bool
    to_unique: jnp.ndarray,  # [B, N] int32 — output column per row, cap = drop
    kernel_size: Tuple[int, int, int],
    out_capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct kernel-map construction for parity-partition convs.

    Given the ``to_unique`` mapping (from :func:`stride_coords`, or any
    input-row -> output-row index with ``out_capacity`` meaning "dropped"),
    builds table [B, K, M] and rev [B, K, N] with two vector ops and one
    injective scatter — no probe, no searchsorted.
    """
    b, n, _ = coords.shape
    k_vol = int(np.prod(kernel_size))
    k_i = _parity_k_index(coords, kernel_size)  # [B, N]
    u = to_unique.astype(jnp.int32)
    ok = valid & (u >= 0) & (u < out_capacity)
    rows = lax.broadcasted_iota(jnp.int32, (b, n), 1)
    # table[b, k_i, u] = row  (injective: one input per (offset, output)).
    sk = jnp.where(ok, k_i, k_vol)  # OOB slot -> dropped
    su = jnp.where(ok, u, 0)
    table = jnp.full((b, k_vol, out_capacity), -1, jnp.int32)
    bi = lax.broadcasted_iota(jnp.int32, (b, n), 0)
    table = table.at[
        bi.reshape(-1), sk.reshape(-1), su.reshape(-1)
    ].set(rows.reshape(-1), mode="drop")
    # rev[b, k, i] = u_i where k == k_i — a broadcast compare, no scatter.
    karange = jnp.arange(k_vol, dtype=jnp.int32)[None, :, None]
    rev = jnp.where(
        (k_i[:, None, :] == karange) & ok[:, None, :], u[:, None, :], -1
    ).astype(jnp.int32)
    return table, rev


def parity_strided_unique(
    coords: jnp.ndarray,  # [B, N, 3] int32
    num_valid: jnp.ndarray,  # [B]
    kernel_size: Tuple[int, int, int],  # == stride, all pow2
    out_capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused divided-coords unique for parity-partition convs.

    Returns (out_coords [B, M, 3], num_unique [B], to_unique [B, N]) — the
    pieces :func:`parity_pair_tables_from_unique` needs — with ONE 3-operand
    sort and NO permutation gathers: validity in sorted order is positional
    (PAD keys sort last), divided coords are unpacked from the sort keys,
    and the original row index rides the sort as a packed payload.
    (``stride_coords`` + ``unique_coords`` spend ~2x this on ``valid[perm]``
    / ``coords[perm]`` gathers — measured 11.6 ms vs the sort's 2.7 ms at
    131k rows on v5e, scripts/plan_decompose.py.)
    """
    from warpconvnet_tpu.ops.keys import pack_coords as _pack

    b, n, _ = coords.shape
    assert n < (1 << 20), "payload packs row index into 20 bits"
    ks = tuple(int(k) for k in kernel_size)
    assert all(k > 0 and (k & (k - 1)) == 0 for k in ks), "pow2 strides only"
    shifts = tuple(k.bit_length() - 1 for k in ks)
    valid = lax.broadcasted_iota(jnp.int32, (b, n), 1) < num_valid[:, None]
    c = jnp.where(valid[..., None], coords, PAD_COORD)
    cdiv = jnp.where(
        valid[..., None],
        jnp.stack(
            [c[..., d] >> shifts[d] for d in range(3)], axis=-1
        ),
        PAD_COORD,
    )
    dhi, dlo = _pack(cdiv)
    pay = lax.broadcasted_iota(jnp.int32, (b, n), 1)  # original row index
    sk, (pay_s,) = sort_keys((dhi, dlo), pay)
    dhi_s, dlo_s = sk
    svalid = lax.broadcasted_iota(jnp.int32, (b, n), 1) < num_valid[:, None]
    first = jax.vmap(unique_mask_sorted)((dhi_s, dlo_s), svalid)
    rank = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    num_unique = jnp.sum(first.astype(jnp.int32), axis=1)
    u_s = jnp.where(svalid, jnp.minimum(rank, out_capacity), out_capacity)
    # Unpack divided coords from the sorted keys (hi = x*65536 + y + 32768).
    x_div = dhi_s >> 16
    y_div = (dhi_s & 0xFFFF) - 32768
    z_div = dlo_s
    bi = lax.broadcasted_iota(jnp.int32, (b, n), 0)
    scatter_u = jnp.where(
        first & (rank < out_capacity), rank, out_capacity
    )
    oc = jnp.full((b, out_capacity, 3), PAD_COORD, jnp.int32)
    oc = oc.at[bi.reshape(-1), scatter_u.reshape(-1)].set(
        jnp.stack([x_div, y_div, z_div], axis=-1).reshape(-1, 3),
        mode="drop",
    )
    # to_unique back in original row order: one scatter by the payload.
    to_u = jnp.full((b, n), out_capacity, jnp.int32)
    to_u = to_u.at[bi.reshape(-1), pay_s.reshape(-1)].set(
        u_s.reshape(-1).astype(jnp.int32), mode="drop"
    )
    return oc, num_unique, to_u


def parity_down_map(
    fine_coords: jnp.ndarray,  # [B, N, 3] int32, lex-sorted keys not required
    fine_valid: jnp.ndarray,  # [B, N] bool
    coarse_coords: jnp.ndarray,  # [B, M, 3] int32, lex-sorted
    coarse_num_valid: jnp.ndarray,  # [B]
    kernel_size: Tuple[int, int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parity-partition down map when the coarse set is *given* (transposed
    convs): one single-offset lookup of each fine row's parent
    ``fine // stride`` in the sorted coarse keys replaces the K-offset
    probe (K-fold fewer queries).  Returns (table [B,K,M], rev [B,K,N])."""
    from warpconvnet_tpu.ops.keys import (
        lookup_in_sorted,
        pack_coords,
    )

    b, n, _ = fine_coords.shape
    m = coarse_coords.shape[1]
    st = jnp.asarray(kernel_size, jnp.int32)
    ov = lax.broadcasted_iota(jnp.int32, (b, m), 1) < coarse_num_valid[:, None]
    ck = pack_coords(jnp.where(ov[..., None], coarse_coords, PAD_COORD))
    parent = jnp.where(fine_valid[..., None], fine_coords // st, PAD_COORD - 1)
    qk = pack_coords(parent)
    nk = len(ck)

    def one(*args):
        return lookup_in_sorted(args[:nk], args[nk:])

    pos = jax.vmap(one)(*ck, *qk)  # [B, N] coarse row or -1
    to_u = jnp.where(pos >= 0, pos, m)
    return parity_pair_tables_from_unique(
        fine_coords, fine_valid & (pos >= 0), to_u, kernel_size, m
    )


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
