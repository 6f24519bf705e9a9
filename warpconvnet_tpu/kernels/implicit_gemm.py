"""Pallas implicit-GEMM sparse convolution — the MXU replacement for the
reference's ~45k-LoC CUDA GEMM zoo (``csrc/mask_gemm_kernels_*``,
``cutlass_gemm_gather_scatter.cu``, ``cute_gemm_*`` — SURVEY.md section 2.2).

Key structural fact this kernel is built on: coordinates are kept
lexicographically sorted, and for a *fixed* kernel offset the query sequence
``stride * out_coord + offset`` is lexicographically increasing, so the valid
entries of ``table[k, :]`` are **monotone in the output index**. Hence the
inputs needed by one output tile for one offset form a *contiguous row range*
of the input array. The kernel therefore does, per output tile t and offset k:

  1. one sequential DMA of the input window x[start[t,k] : start[t,k]+W]
     (HBM -> VMEM, double-buffered across k) instead of a random gather;
  2. a one-hot MXU contraction that realizes the in-window row gather
     (Mosaic's dynamic_gather cannot span vregs along the gather dim);
  3. an MXU matmul against weight[k], accumulated in a VMEM fp32 tile across
     all K offsets (no K-fold HBM read-modify-write of the output);
  4. offsets with zero valid pairs in the tile are skipped entirely (the
     reference mask_gemm's pair-mask bit-skip, done with a prefetched count).

Batch handling: scenes are **flattened into one row axis** (each scene's
table columns padded to the tile size, entries shifted by the scene's row
offset), so one ``pallas_call`` serves any batch size — no per-scene Python
loop (program size) and no vmap (which would force both branches of the
residual ``lax.cond`` to run every step).

Rows whose window offset exceeds W (rare: lex-order boundary effects) are
masked out in-kernel and corrected **exactly for any overflow count** by a
``lax.while_loop`` over fixed-size compacted chunks (``residual_correction``).

The window plan (per-tile DMA starts + in-window local indices) is exposed as
:class:`ConvPlan` so that every conv sharing one kernel map (a UNet stage's
blocks; fwd + wgrad of one conv; the transposed decoder reusing the encoder
map) computes it once — the analog of the reference's lazy ``_mask_data``
caches on ``IntSearchResult`` (``geometry/coords/search/search_results.py``).

This re-derives the reference mask_gemm's tricks (pair_table, bitmask skip,
reverse-table dgrad) for the TPU memory system. The same kernel serves
forward (AB, table) and dgrad (ABt, reverse table + transposed weights).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# XLA-side planning: window starts, local indices, overflow residuals
# ---------------------------------------------------------------------------


class ConvPlan(NamedTuple):
    """Window plan for one flattened pair table at one (tile_m, window).

    Offsets are processed in **z-groups**: the canonical offset enumeration
    varies the lexicographic minor axis fastest (``kernel_offsets``), so the
    ``zg`` offsets of one (dx, dy) block target almost the same sorted
    neighborhood — ONE window DMA serves all of them. With the kernel
    measured HBM-DMA-bound on v5e, this cuts conv DMA bytes by ~zg x.

    starts: [G, T] int32 — HBM window start per (offset-group, tile);
      -1 = whole group has no valid pair in the tile (DMA skipped).
      ([G, T] rather than [T, G]: SMEM-prefetched operands pad the minor dim
      to 128, so the tile axis must be minor to stay within the 1 MB SMEM.)
    ovalid: [K, T] int32 — 1 when offset k has any in-window pair in tile t
      (the reference mask_gemm pair-mask bit-skip).
    local: [T, K, tile_m] int32 — group-window row index per slot; -1 pad.
    overflow: [K, M_flat] bool — pairs not covered by any window (handled by
      ``residual_correction``).
    tile_m / window / zg: static ints the plan was built for.
    """

    starts: jnp.ndarray
    ovalid: jnp.ndarray
    local: jnp.ndarray
    overflow: jnp.ndarray
    tile_m: int
    window: int
    zg: int
    pack: int = 1

    def matches(self, tile_m: int, window: int, zg: int, pack: int = 1) -> bool:
        return (
            self.tile_m == tile_m and self.window == window
            and self.zg == zg and self.pack == pack
        )


jax.tree_util.register_pytree_node(
    ConvPlan,
    lambda p: (
        (p.starts, p.ovalid, p.local, p.overflow),
        (p.tile_m, p.window, p.zg, p.pack),
    ),
    lambda aux, ch: ConvPlan(*ch, *aux),
)


def z_group_of(offsets: np.ndarray) -> int:
    """Largest zg such that offsets come in contiguous blocks of zg sharing
    (dx, dy) — the z-fastest enumeration of ``kernel_offsets`` (and its
    reversals/negations). Returns 1 when no such structure exists."""
    k = offsets.shape[0]
    if k <= 1:
        return 1
    first = offsets[0, :2]
    zg = 1
    while zg < k and np.array_equal(offsets[zg, :2], first):
        zg += 1
    if k % zg != 0:
        return 1
    blocks = offsets[:, :2].reshape(k // zg, zg, 2)
    if not all(np.all(b == b[0]) for b in blocks):
        return 1
    return zg


def flatten_table(table: jnp.ndarray, row_stride: int, tile_m: int) -> jnp.ndarray:
    """[B, K, M] per-scene tables -> [K, B*Mp] flattened table.

    Each scene's columns are padded to a multiple of ``tile_m`` (so tiles
    never straddle scenes) and its valid entries shifted by ``b*row_stride``
    (the scene's offset in the flattened gather-source array).
    """
    b, k, m = table.shape
    mp = _round_up(m, tile_m)
    if mp != m:
        table = jnp.pad(table, ((0, 0), (0, 0), (0, mp - m)), constant_values=-1)
    shift = (jnp.arange(b, dtype=jnp.int32) * row_stride)[:, None, None]
    shifted = jnp.where(table >= 0, table + shift, -1)
    return jnp.transpose(shifted, (1, 0, 2)).reshape(k, b * mp)


def plan_windows(
    table: jnp.ndarray, tile_m: int, window: int, zg: int = 1, pack: int = 1
) -> ConvPlan:
    """Build the :class:`ConvPlan` for a flattened table [K, M_flat]
    (M_flat divisible by tile_m; valid entries monotone per (row, tile);
    K divisible by zg with z-grouped offset enumeration). ``pack`` = rows
    packed per 128-lane vector for narrow channels (window starts align to
    16*pack so the packed DMA start stays sublane-aligned)."""
    k, n_out = table.shape
    assert k % zg == 0, (k, zg)
    g = k // zg
    t = n_out // tile_m
    tiles = table.reshape(k, t, tile_m)
    valid = tiles >= 0
    big = jnp.int32(2 ** 30)
    per_off = jnp.min(jnp.where(valid, tiles, big), axis=2)  # [K, T]
    # Group window start = min over the group's offsets (empty offsets are
    # +inf and drop out); aligned to the sublane tiling (16 covers bf16's
    # (16, 128) tiles; Mosaic requires provably-aligned slice starts).
    gstarts = jnp.min(per_off.reshape(g, zg, t), axis=1)  # [G, T]
    gempty = gstarts == big
    gstarts = jnp.where(gempty, 0, gstarts & ~jnp.int32(16 * pack - 1))
    local = tiles - jnp.repeat(gstarts, zg, axis=0)[:, :, None]
    in_window = valid & (local >= 0) & (local < window)
    overflow = valid & ~in_window
    local = jnp.where(in_window, local, -1)
    ovalid = jnp.any(in_window, axis=2)  # [K, T]
    g_any = jnp.any(ovalid.reshape(g, zg, t), axis=1)  # [G, T]
    gstarts = jnp.where(g_any, gstarts, -1)
    return ConvPlan(
        gstarts.astype(jnp.int32),
        ovalid.astype(jnp.int32),
        jnp.transpose(local, (1, 0, 2)).astype(jnp.int32),
        overflow.reshape(k, n_out),
        tile_m,
        window,
        zg,
        pack,
    )


def residual_correction(
    x, weight, table, overflow, out, chunk: int = 1024
):
    """Exact correction for window-overflow pairs — any overflow count.

    Overflow pairs are compacted ``chunk`` at a time inside a
    ``lax.while_loop`` (each iteration: cumsum-position filter -> scatter
    compaction -> gathered matmul -> scatter-add), so correctness never
    depends on a static cap (the reference relies on its autotune numeric
    guard instead; here exactness is structural). The whole pass sits behind
    a ``lax.cond`` — steady state with well-behaved windows pays only the
    predicate reduction.
    """
    k, n_out = table.shape
    flat_of = overflow.reshape(-1)

    def correct(out):
        pos = jnp.cumsum(flat_of.astype(jnp.int32)) - 1
        pos = jnp.where(flat_of, pos, -1)
        total = jnp.sum(flat_of.astype(jnp.int32))
        flat_ids = lax.broadcasted_iota(jnp.int32, flat_of.shape, 0)

        def body(carry):
            i, out = carry
            local = pos - i * chunk
            sel_mask = (local >= 0) & (local < chunk)
            sel = (
                jnp.full((chunk + 1,), -1, jnp.int32)
                .at[jnp.where(sel_mask, local, chunk)]
                .set(jnp.where(sel_mask, flat_ids, -1), mode="drop")[:chunk]
            )
            sel_valid = sel >= 0
            sel_safe = jnp.maximum(sel, 0)
            k_idx = (sel_safe // n_out).astype(jnp.int32)
            o_idx = (sel_safe % n_out).astype(jnp.int32)
            i_idx = table.reshape(-1)[sel_safe]
            xi = jnp.where(sel_valid[:, None], x[jnp.maximum(i_idx, 0)], 0)
            # Per-pair weight-row gather: chunk*Cin*Cout elements — cheap at
            # the default chunk (tighter windows with a few thousand
            # overflow pairs must not pay a K-scan of full matmuls).
            wk = weight[k_idx]  # [R, Cin, Cout]
            contrib = jnp.einsum(
                "rc,rcd->rd", xi.astype(jnp.float32), wk.astype(jnp.float32)
            )
            o_scatter = jnp.where(sel_valid, o_idx, n_out)
            out = out.at[o_scatter].add(contrib.astype(out.dtype), mode="drop")
            return i + 1, out

        def cond(carry):
            i, _ = carry
            return i * chunk < total

        _, out = lax.while_loop(cond, body, (jnp.int32(0), out))
        return out

    return lax.cond(jnp.any(flat_of), correct, lambda o: o, out)


def residual_correction_wgrad(
    x, g, table, overflow, dw, chunk: int = 1024
):
    """wgrad analog of :func:`residual_correction`:
    ``dw[k] += sum_r x[i_r].T g[o_r]`` over overflow pairs, chunked."""
    k, n_out = table.shape
    flat_of = overflow.reshape(-1)

    def correct(dw):
        pos = jnp.cumsum(flat_of.astype(jnp.int32)) - 1
        pos = jnp.where(flat_of, pos, -1)
        total = jnp.sum(flat_of.astype(jnp.int32))
        flat_ids = lax.broadcasted_iota(jnp.int32, flat_of.shape, 0)

        def body(carry):
            i, dw = carry
            local = pos - i * chunk
            sel_mask = (local >= 0) & (local < chunk)
            sel = (
                jnp.full((chunk + 1,), -1, jnp.int32)
                .at[jnp.where(sel_mask, local, chunk)]
                .set(jnp.where(sel_mask, flat_ids, -1), mode="drop")[:chunk]
            )
            sel_valid = sel >= 0
            sel_safe = jnp.maximum(sel, 0)
            k_idx = (sel_safe // n_out).astype(jnp.int32)
            o_idx = (sel_safe % n_out).astype(jnp.int32)
            i_idx = table.reshape(-1)[sel_safe]
            xi = jnp.where(sel_valid[:, None], x[jnp.maximum(i_idx, 0)], 0)
            gi = jnp.where(
                sel_valid[:, None], g[jnp.minimum(o_idx, g.shape[0] - 1)], 0
            )
            xi = xi.astype(jnp.float32)
            gi = gi.astype(jnp.float32)

            # Per-offset masked AtB (K matmuls of [R, Cin].T @ [R, Cout]) —
            # unlike the fwd residual, wgrad accumulates per offset, so the
            # K-scan is inherent; chunk stays small to bound it.
            def per_k(_, kk):
                mask = (k_idx == kk).astype(jnp.float32)[:, None]
                return None, (xi * mask).T @ gi

            _, dws = lax.scan(per_k, None, jnp.arange(k, dtype=jnp.int32))
            dw = dw + dws
            return i + 1, dw

        def cond(carry):
            i, _ = carry
            return i * chunk < total

        _, dw = lax.while_loop(cond, body, (jnp.int32(0), dw))
        return dw

    return lax.cond(jnp.any(flat_of), correct, lambda d: d, dw)


# ---------------------------------------------------------------------------
# The Pallas kernels
# ---------------------------------------------------------------------------


def _igemm_kernel(
    # scalar prefetch
    starts_ref,  # [G, T] SMEM; -1 = skip this (group, tile)
    ovalid_ref,  # [K, T] SMEM; 0 = skip this (offset, tile)
    # inputs
    x_hbm,  # [N_in_pad, C_in] ANY (HBM)
    local_ref,  # [1, K, TILE_M] VMEM (this tile's block)
    w_ref,  # [K, C_in, C_out] VMEM
    # outputs
    out_ref,  # [TILE_M, C_out] VMEM
    # scratch
    win_ref,  # [2, W, C_in] VMEM double buffer
    sem,  # DMA sems [2]
    acc_ref,  # [TILE_M, C_out] f32 VMEM
    *,
    num_groups: int,
    zg: int,
    tile_m: int,
    window: int,
):
    t = pl.program_id(0)

    def dma(g, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(jnp.maximum(starts_ref[g, t], 0), 16), window), :],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[0, t] >= 0)
    def _():
        dma(0, 0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    iota_w = lax.broadcasted_iota(jnp.int32, (tile_m, window), 1)

    def body(g, _):
        slot = lax.rem(g, 2)
        nxt = lax.rem(g + 1, 2)

        @pl.when((g + 1 < num_groups) & (starts_ref[g + 1, t] >= 0))
        def _():
            dma(g + 1, nxt).start()

        @pl.when(starts_ref[g, t] >= 0)
        def _():
            dma(g, slot).wait()
            # All zg offsets of this (dx, dy) group gather from ONE window.
            for dz in range(zg):
                k = g * zg + dz

                @pl.when(ovalid_ref[k, t] > 0)
                def _(k=k):
                    idx = local_ref[0, k, :]  # [TILE_M] int32, -1 = invalid
                    # One-hot matmul gather: Mosaic's dynamic_gather can't
                    # span multiple vregs along the gather dim, and the MXU
                    # eats the [TILE_M, W] x [W, C] contraction anyway.
                    # Invalid rows (idx == -1) match no window column ->
                    # zero row, masking free.
                    onehot = (idx[:, None] == iota_w).astype(win_ref.dtype)
                    a = jax.lax.dot(
                        onehot, win_ref[slot],
                        preferred_element_type=jnp.float32,
                    )
                    acc_ref[:] += jax.lax.dot(
                        a.astype(w_ref.dtype), w_ref[k],
                        preferred_element_type=jnp.float32,
                    )

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _igemm_wgrad_kernel(
    # scalar prefetch
    starts_ref,  # [G, T] SMEM; -1 = skip this (group, tile)
    ovalid_ref,  # [K, T] SMEM; 0 = skip this (offset, tile)
    # inputs
    x_hbm,  # [N_in_pad, C_in] ANY (HBM)
    local_ref,  # [1, K, TILE_M] VMEM
    g_ref,  # [TILE_M, C_out] VMEM (this tile's dout block)
    # outputs
    out_ref,  # [K, C_in, C_out] VMEM — same block every grid step
    # scratch
    win_ref,  # [2, W, C_in]
    sem,
    *,
    num_groups: int,
    zg: int,
    tile_m: int,
    window: int,
):
    """wgrad (AtB): dw[k] += gather(x, table[k, tile]).T @ g[tile].

    The [K, C_in, C_out] accumulator is the *output block itself* (constant
    index map -> stays resident in VMEM across all grid steps; zeroed at
    step 0). Gather is the same one-hot MXU contraction as the forward."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def dma(g, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(jnp.maximum(starts_ref[g, t], 0), 16), window), :],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[0, t] >= 0)
    def _():
        dma(0, 0).start()

    iota_w = lax.broadcasted_iota(jnp.int32, (tile_m, window), 1)

    def body(g, _):
        slot = lax.rem(g, 2)
        nxt = lax.rem(g + 1, 2)

        @pl.when((g + 1 < num_groups) & (starts_ref[g + 1, t] >= 0))
        def _():
            dma(g + 1, nxt).start()

        @pl.when(starts_ref[g, t] >= 0)
        def _():
            dma(g, slot).wait()
            for dz in range(zg):
                k = g * zg + dz

                @pl.when(ovalid_ref[k, t] > 0)
                def _(k=k):
                    idx = local_ref[0, k, :]
                    onehot = (idx[:, None] == iota_w).astype(win_ref.dtype)
                    a = jax.lax.dot(
                        onehot, win_ref[slot],
                        preferred_element_type=jnp.float32,
                    )  # [TILE_M, C_in]
                    dw = jax.lax.dot_general(
                        a.astype(g_ref.dtype),
                        g_ref[:],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [C_in, C_out]
                    out_ref[k] += dw

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)


def _igemm_kernel_packed(
    # scalar prefetch
    starts_ref,  # [G, T] SMEM; -1 = skip this (group, tile)
    ovalid_ref,  # [K, T] SMEM; 0 = skip this (offset, tile)
    # inputs
    xp_hbm,  # [N_packed, 128] ANY (HBM) — pack rows of cp channels each
    local_ref,  # [1, K, TILE_M] VMEM (UNPACKED window-local indices)
    w_ref,  # [K, 128, C_out] VMEM — weight tiled pack x along channel-in
    # outputs
    out_ref,  # [TILE_M, C_out] VMEM
    # scratch
    win_ref,  # [2, W_p, 128] VMEM double buffer (packed rows)
    sem,
    acc_ref,  # [TILE_M, C_out] f32
    *,
    num_groups: int,
    zg: int,
    tile_m: int,
    window: int,
    pack: int,
    cp: int,
):
    """Channel-packed forward: for C_in <= 64, ``pack`` input rows share one
    128-lane vector, cutting window DMA bytes and one-hot gather flops by
    ``pack``x (a C32 conv otherwise costs exactly as much as C128 because
    Mosaic pads the DMA minor dim to 128 lanes).

    Gather becomes two-level: a one-hot matmul picks the PACKED row
    (idx // pack), then a lane mask selects the sub-block (idx % pack); the
    weight is pre-tiled pack x along its input axis so one matmul finishes
    the contraction."""
    t = pl.program_id(0)
    wp = window // pack

    def dma(g, slot):
        sp = lax.div(jnp.maximum(starts_ref[g, t], 0), pack)
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(pl.multiple_of(sp, 16), wp), :],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[0, t] >= 0)
    def _():
        dma(0, 0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    iota_wp = lax.broadcasted_iota(jnp.int32, (tile_m, wp), 1)
    lane_block = lax.broadcasted_iota(jnp.int32, (tile_m, 128), 1) // cp

    def body(g, _):
        slot = lax.rem(g, 2)
        nxt = lax.rem(g + 1, 2)

        @pl.when((g + 1 < num_groups) & (starts_ref[g + 1, t] >= 0))
        def _():
            dma(g + 1, nxt).start()

        @pl.when(starts_ref[g, t] >= 0)
        def _():
            dma(g, slot).wait()
            for dz in range(zg):
                k = g * zg + dz

                @pl.when(ovalid_ref[k, t] > 0)
                def _(k=k):
                    idx = local_ref[0, k, :]  # [TILE_M], -1 = invalid
                    loc_p = idx // pack  # floor: -1 -> -1, never matches
                    rem = idx - loc_p * pack
                    onehot = (loc_p[:, None] == iota_wp).astype(win_ref.dtype)
                    a_p = jax.lax.dot(
                        onehot, win_ref[slot],
                        preferred_element_type=jnp.float32,
                    )  # [TILE_M, 128] — pack candidate sub-rows per output
                    sel = (lane_block == rem[:, None]).astype(jnp.float32)
                    a_sel = (a_p * sel).astype(w_ref.dtype)
                    acc_ref[:] += jax.lax.dot(
                        a_sel, w_ref[k], preferred_element_type=jnp.float32
                    )

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _igemm_wgrad_kernel_packed(
    starts_ref,  # [G, T] SMEM
    ovalid_ref,  # [K, T] SMEM
    xp_hbm,  # [N_packed, 128] ANY
    local_ref,  # [1, K, TILE_M] VMEM
    g_ref,  # [TILE_M, C_out] VMEM
    out_ref,  # [K, 128, C_out] VMEM — per-(pack-slot, cp-channel) partials
    win_ref,  # [2, W_p, 128]
    sem,
    *,
    num_groups: int,
    zg: int,
    tile_m: int,
    window: int,
    pack: int,
    cp: int,
):
    """Packed wgrad: the [K, 128, C_out] accumulator holds pack partial
    copies of dw along the input-channel axis; the caller reshape-sums
    [K, pack, cp, C_out] -> [K, cp, C_out]."""
    t = pl.program_id(0)
    wp = window // pack

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def dma(g, slot):
        sp = lax.div(jnp.maximum(starts_ref[g, t], 0), pack)
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(pl.multiple_of(sp, 16), wp), :],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[0, t] >= 0)
    def _():
        dma(0, 0).start()

    iota_wp = lax.broadcasted_iota(jnp.int32, (tile_m, wp), 1)
    lane_block = lax.broadcasted_iota(jnp.int32, (tile_m, 128), 1) // cp

    def body(g, _):
        slot = lax.rem(g, 2)
        nxt = lax.rem(g + 1, 2)

        @pl.when((g + 1 < num_groups) & (starts_ref[g + 1, t] >= 0))
        def _():
            dma(g + 1, nxt).start()

        @pl.when(starts_ref[g, t] >= 0)
        def _():
            dma(g, slot).wait()
            for dz in range(zg):
                k = g * zg + dz

                @pl.when(ovalid_ref[k, t] > 0)
                def _(k=k):
                    idx = local_ref[0, k, :]
                    loc_p = idx // pack
                    rem = idx - loc_p * pack
                    onehot = (loc_p[:, None] == iota_wp).astype(win_ref.dtype)
                    a_p = jax.lax.dot(
                        onehot, win_ref[slot],
                        preferred_element_type=jnp.float32,
                    )
                    sel = (lane_block == rem[:, None]).astype(jnp.float32)
                    a_sel = (a_p * sel).astype(g_ref.dtype)
                    dw = jax.lax.dot_general(
                        a_sel, g_ref[:],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [128, C_out]
                    out_ref[k] += dw

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)


# ---------------------------------------------------------------------------
# Flattened-batch entry points
# ---------------------------------------------------------------------------


def _flatten_x(x: jnp.ndarray, window: int, align: int = 16) -> jnp.ndarray:
    """[B, N, C] -> [B*N + window_pad, C] flattened gather source."""
    b, n, c = x.shape
    flat = x.reshape(b * n, c)
    tail = _round_up(b * n + window, align) - b * n
    return jnp.pad(flat, ((0, tail), (0, 0)))


def pack_for(c: int) -> int:
    """Rows packed per 128-lane vector for channel width ``c`` (narrow
    channels otherwise pay the full 128-lane DMA/gather cost)."""
    if c <= 32:
        return 4
    if c <= 64:
        return 2
    return 1


def _pad_channels(arr: jnp.ndarray, mult: int = 128) -> Tuple[jnp.ndarray, int]:
    c = arr.shape[-1]
    cp = _round_up(c, mult)
    if cp != c:
        pad = [(0, 0)] * (arr.ndim - 1) + [(0, cp - c)]
        arr = jnp.pad(arr, pad)
    return arr, cp


def implicit_gemm_fwd(
    x: jnp.ndarray,  # [B, N_in, C_in]
    weight: jnp.ndarray,  # [K, C_in, C_out]
    table: jnp.ndarray,  # [B, K, N_out] int32, monotone valid entries per row
    plan: Optional[ConvPlan] = None,
    *,
    tile_m: int = 256,
    window_factor: int = 2,
    zg: int = 1,
    interpret: bool = False,
    residual_chunk: int = 1024,
) -> jnp.ndarray:
    """Batched fused sparse-conv forward: ``out[b, o] = sum_k x[b, table[b, k, o]]
    @ weight[k]`` -> [B, N_out, C_out]. One pallas_call for the whole batch.

    ``plan`` (if given) must be built by :func:`make_plan` with the same
    (tile_m, window_factor, zg) over the same table. ``zg``: z-group size of
    the offset enumeration (see :func:`z_group_of`).
    """
    b, n_in, c_in = x.shape
    k, n_out = table.shape[1], table.shape[2]
    c_out = weight.shape[-1]
    if k % zg != 0:
        zg = 1
    pack = pack_for(c_in)
    window = _round_up(int(window_factor * tile_m), 16 * pack)

    if pack > 1:
        cp = 128 // pack
        x, _ = _pad_channels(x, cp)
        weight = jnp.pad(weight, ((0, 0), (0, cp - c_in), (0, 0)))
        weight, c_out_pad = _pad_channels(weight)
        w_tiled = jnp.concatenate([weight] * pack, axis=1)  # [K, 128, C_out]

        if plan is None or not plan.matches(tile_m, window, zg, pack):
            plan = make_plan(
                table, n_in, tile_m=tile_m, window_factor=window_factor,
                zg=zg, pack=pack,
            )
        tbl_flat = flatten_table(table, n_in, tile_m)
        m_flat = tbl_flat.shape[1]
        t = m_flat // tile_m

        x_flat = _flatten_x(x, window, align=16 * pack)
        xp = x_flat.reshape(-1, 128)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, k, tile_m), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, c_out_pad), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, window // pack, 128), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((tile_m, c_out_pad), jnp.float32),
            ],
        )
        kernel = functools.partial(
            _igemm_kernel_packed, num_groups=k // zg, zg=zg, tile_m=tile_m,
            window=window, pack=pack, cp=cp,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m_flat, c_out_pad), x.dtype),
            interpret=interpret,
        )(plan.starts, plan.ovalid, xp, plan.local, w_tiled)
        out = residual_correction(
            x_flat, weight, tbl_flat, plan.overflow, out, chunk=residual_chunk
        )
        mp = m_flat // b
        return out.reshape(b, mp, c_out_pad)[:, :n_out, :c_out]

    # Mosaic requires 128-lane alignment on the minor dim of the HBM window
    # DMA; pad channels (autotune accounts for the padding cost at small C).
    x, c_in_pad = _pad_channels(x)
    weight, _ = _pad_channels(jnp.swapaxes(weight, 1, 2))
    weight = jnp.swapaxes(weight, 1, 2)
    weight, c_out_pad = _pad_channels(weight)

    if plan is None or not plan.matches(tile_m, window, zg):
        plan = make_plan(
            table, n_in, tile_m=tile_m, window_factor=window_factor, zg=zg
        )
    tbl_flat = flatten_table(table, n_in, tile_m)
    m_flat = tbl_flat.shape[1]
    t = m_flat // tile_m

    x_flat = _flatten_x(x, window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, k, tile_m), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full weight resident
        ],
        out_specs=pl.BlockSpec((tile_m, c_out_pad), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, c_in_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tile_m, c_out_pad), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _igemm_kernel, num_groups=k // zg, zg=zg, tile_m=tile_m, window=window
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_flat, c_out_pad), x.dtype),
        interpret=interpret,
    )(plan.starts, plan.ovalid, x_flat, plan.local, weight)

    out = residual_correction(
        x_flat, weight, tbl_flat, plan.overflow, out, chunk=residual_chunk
    )
    mp = m_flat // b
    return out.reshape(b, mp, c_out_pad)[:, :n_out, :c_out]


def implicit_gemm_wgrad(
    x: jnp.ndarray,  # [B, N_in, C_in]
    g: jnp.ndarray,  # [B, N_out, C_out]
    table: jnp.ndarray,  # [B, K, N_out]
    plan: Optional[ConvPlan] = None,
    *,
    tile_m: int = 256,
    window_factor: int = 2,
    zg: int = 1,
    interpret: bool = False,
    residual_chunk: int = 1024,
) -> jnp.ndarray:
    """Batched fused sparse-conv wgrad: ``dw[k] = sum_{b,o} x[b, table[b,k,o]].T
    @ g[b, o]`` -> [K, C_in, C_out] fp32, summed over the whole batch inside
    the kernel's resident VMEM accumulator."""
    b, n_in, c_in = x.shape
    k, n_out = table.shape[1], table.shape[2]
    c_out = g.shape[-1]
    if k % zg != 0:
        zg = 1
    pack = pack_for(c_in)
    window = _round_up(int(window_factor * tile_m), 16 * pack)

    if pack > 1:
        cp = 128 // pack
        x, _ = _pad_channels(x, cp)
        g, c_out_pad = _pad_channels(g)

        if plan is None or not plan.matches(tile_m, window, zg, pack):
            plan = make_plan(
                table, n_in, tile_m=tile_m, window_factor=window_factor,
                zg=zg, pack=pack,
            )
        tbl_flat = flatten_table(table, n_in, tile_m)
        m_flat = tbl_flat.shape[1]
        t = m_flat // tile_m
        mp = m_flat // b

        x_flat = _flatten_x(x, window, align=16 * pack)
        xp = x_flat.reshape(-1, 128)
        g_pad = jnp.pad(
            g, ((0, 0), (0, mp - n_out), (0, 0))
        ).reshape(m_flat, c_out_pad)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, k, tile_m), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((tile_m, c_out_pad), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((k, 128, c_out_pad), lambda i, *_: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, window // pack, 128), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _igemm_wgrad_kernel_packed, num_groups=k // zg, zg=zg,
            tile_m=tile_m, window=window, pack=pack, cp=cp,
        )
        dwp = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((k, 128, c_out_pad), jnp.float32),
            interpret=interpret,
        )(plan.starts, plan.ovalid, xp, plan.local, g_pad)
        dw = jnp.sum(dwp.reshape(k, pack, cp, c_out_pad), axis=1)
        dw = residual_correction_wgrad(
            x_flat, g_pad, tbl_flat, plan.overflow, dw, chunk=residual_chunk
        )
        return dw[:, :c_in, :c_out]

    x, c_in_pad = _pad_channels(x)
    g, c_out_pad = _pad_channels(g)

    if plan is None or not plan.matches(tile_m, window, zg):
        plan = make_plan(
            table, n_in, tile_m=tile_m, window_factor=window_factor, zg=zg
        )
    tbl_flat = flatten_table(table, n_in, tile_m)
    m_flat = tbl_flat.shape[1]
    t = m_flat // tile_m
    mp = m_flat // b

    x_flat = _flatten_x(x, window)
    g_pad = jnp.pad(g, ((0, 0), (0, mp - n_out), (0, 0))).reshape(m_flat, c_out_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k, tile_m), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((tile_m, c_out_pad), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((k, c_in_pad, c_out_pad), lambda i, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, c_in_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _igemm_wgrad_kernel, num_groups=k // zg, zg=zg, tile_m=tile_m,
        window=window,
    )

    dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c_in_pad, c_out_pad), jnp.float32),
        interpret=interpret,
    )(plan.starts, plan.ovalid, x_flat, plan.local, g_pad)

    dw = residual_correction_wgrad(
        x_flat, g_pad, tbl_flat, plan.overflow, dw, chunk=residual_chunk
    )
    return dw[:, :c_in, :c_out]


def make_plan(
    table: jnp.ndarray,  # [B, K, N_out]
    n_in: int,
    *,
    tile_m: int = 256,
    window_factor: int = 2,
    zg: int = 1,
    pack: int = 1,
) -> ConvPlan:
    """Build the shared :class:`ConvPlan` for a batched pair table."""
    return plan_windows(
        flatten_table(table, n_in, tile_m), tile_m,
        _round_up(int(window_factor * tile_m), 16 * pack), zg, pack,
    )


# ---------------------------------------------------------------------------
# Single-scene compatibility wrappers (tests, scripts)
# ---------------------------------------------------------------------------


def implicit_gemm_raw(
    x: jnp.ndarray,  # [N_in, C_in]
    weight: jnp.ndarray,  # [K, C_in, C_out]
    table: jnp.ndarray,  # [K, N_out]
    *,
    tile_m: int = 256,
    window_factor: int = 2,
    max_residual: int = 4096,  # kept for API compat; correction is now exact
    interpret: bool = False,
) -> jnp.ndarray:
    del max_residual
    return implicit_gemm_fwd(
        x[None], weight, table[None],
        tile_m=tile_m, window_factor=window_factor, interpret=interpret,
    )[0]


def implicit_gemm_wgrad_raw(
    x: jnp.ndarray,
    g: jnp.ndarray,
    table: jnp.ndarray,
    *,
    tile_m: int = 256,
    window_factor: int = 2,
    max_residual: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    del max_residual
    return implicit_gemm_wgrad(
        x[None], g[None], table[None],
        tile_m=tile_m, window_factor=window_factor, interpret=interpret,
    )
