"""Pallas implicit-GEMM sparse convolution — the MXU replacement for the
reference's ~45k-LoC CUDA GEMM zoo (``csrc/mask_gemm_kernels_*``,
``cutlass_gemm_gather_scatter.cu``, ``cute_gemm_*`` — SURVEY.md section 2.2).

Key structural fact this kernel is built on: coordinates are kept
lexicographically sorted, and for a *fixed* kernel offset the query sequence
``stride * out_coord + offset`` is lexicographically increasing, so the valid
entries of ``table[k, :]`` are **monotone in the output index**. Hence the
inputs needed by one output tile for one offset form a *contiguous row range*
of the input array.

v4 design (round 3 — measured: the kernel is bound by the count of small
dependent ops per (sub-tile, offset), NOT by FLOPs or bytes; see
docs/user_guide/performance.md):

  1. **Multi-tile grid steps** (``s`` sub-tiles of ``tile_m`` rows per step):
     one union-window DMA of ``wu = wt + (s-1)*tile_m`` rows per offset
     group serves all ``s`` sub-tiles (their windows advance by ~tile_m per
     tile on a monotone map).
  2. Each sub-tile gathers from a **dynamically sliced sub-window**
     ``win[delta : delta+wt]`` (16-aligned starts), so the one-hot gather
     contraction stays [tile_m, wt] — gather flops follow the measured
     per-tile spread (<=320 for 3^3 submanifold at every UNet level), not
     the union size.
  3. **Batched z-group gather**: the zg offsets of one (dx, dy) group are
     gathered in ONE [zg*tile_m, wt] one-hot matmul, contracted against the
     group's weights with one zg-batched ``dot_general``, and reduced with
     one dz-sum — ~6 ops per (group, sub-tile) instead of ~5*zg (1.5x
     kernel speedup at identical FLOPs; C32 == C128).
  4. **Identity-offset fast path**: for submanifold self-maps the identity
     offset's table row is iota — the gather is skipped entirely and the
     rows arrive as a pipeline-blocked input (``acc += x_tile @ w[k_id]``,
     the analog of the reference's identity fast path,
     ``nn/functional/sparse_conv/detail/explicit.py:22-338``). The plan
     excludes the identity offset from window sizing and overflow; the
     batched gather masks its index row.
  5. One-hot MXU contraction realizes the in-window row gather (Mosaic's
     dynamic_gather cannot span vregs along the gather dim).
  6. Offset groups with zero valid pairs in a super-tile are skipped via
     prefetched window starts (the reference mask_gemm's pair-mask
     bit-skip).

Batch handling: scenes are **flattened into one row axis** (each scene's
table columns padded to the super-tile size, entries shifted by the scene's
row offset), so one ``pallas_call`` serves any batch size — no per-scene
Python loop and no vmap (which would force both branches of the residual
``lax.cond`` to run every step).

Rows whose window offset exceeds wt (rare: lex-order boundary effects) are
masked out in-kernel and corrected **exactly for any overflow count** by
``residual_correction``: the plan pre-compacts overflow pair ids into a
fixed list (cap ``OF_CAP``) so a firing correction is a single small gather
+ einsum (~1 ms) instead of a full cumsum scan of the [K, M] table; counts
beyond the cap fall back to the exact chunked ``lax.while_loop`` scan.

The window plan (per-tile DMA starts + in-window local indices + compacted
overflow) is exposed as :class:`ConvPlan` so that every conv sharing one
kernel map (a UNet stage's blocks; fwd + wgrad of one conv; the transposed
decoder reusing the encoder map) computes it once — the analog of the
reference's lazy ``_mask_data`` caches on ``IntSearchResult``.

This re-derives the reference mask_gemm's tricks (pair_table, bitmask skip,
reverse-table dgrad, mask_argsort locality) for the TPU memory system. The
same kernel serves forward (AB, table) and dgrad (ABt, reverse table +
transposed weights).
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


# Static cap of the plan-compacted overflow list; counts beyond it take the
# exact full-scan path (never wrong, just slow — sized so real workloads
# never hit it: measured overflow at the auto windows is 0).
OF_CAP = 4096


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# XLA-side planning: window starts, local indices, overflow residuals
# ---------------------------------------------------------------------------


class ConvPlan(NamedTuple):
    """Window plan for one flattened pair table at one (tile_m, wt, s).

    Offsets are processed in **z-groups**: the canonical offset enumeration
    varies the lexicographic minor axis fastest (``kernel_offsets``), so the
    ``zg`` offsets of one (dx, dy) block target almost the same sorted
    neighborhood — ONE window DMA serves all of them.

    starts: [G, Ts] int32 — HBM union-window start per (offset-group,
      super-tile); -1 = whole group has no valid pair in the super-tile
      (DMA skipped). ([G, Ts] rather than [Ts, G]: SMEM-prefetched operands
      pad the minor dim to 128, so the long axis must be minor.)
    delta: [G*s, Ts] int32 — per (group, sub-tile) offset of the wt-wide
      gather sub-window inside the union window (multiple of the DMA
      alignment); -1 = sub-tile empty for the group.
    ovalid: [K, Ts] int32 — 1 when offset k has any in-window pair in the
      super-tile (the reference mask_gemm pair-mask bit-skip).
    local: [Ts, K, 1, s*tile_m] int32 — sub-window row index per slot; -1
      pad. (The singleton axis keeps K on an UNTILED dim of the [1, K,
      1, tile] per-step block — dynamic offset indexing stays legal at
      any tile_m, where a [1, K, tile] block puts K on the sublane dim
      and Mosaic rejects dynamic loads below 256 lanes — while the
      block's last two dims still equal the array's, as the TPU
      lowering requires.)
    overflow: [K, M_flat] bool — pairs not covered by any window (handled by
      ``residual_correction``).
    of_list / of_count: compacted flat overflow pair ids (shape [OF_CAP],
      -1-padded) + true count — the fast residual path.
    tile_m / window (= wt) / zg / pack / s / identity_k: static ints the
    plan was built for (identity_k = -1 when no identity fast path).
    """

    starts: jnp.ndarray
    delta: jnp.ndarray
    ovalid: jnp.ndarray
    local: jnp.ndarray
    overflow: jnp.ndarray
    of_list: jnp.ndarray
    of_count: jnp.ndarray
    tile_m: int
    window: int
    zg: int
    pack: int = 1
    s: int = 1
    identity_k: int = -1
    parity: int = 0

    def matches(self, tile_m: int, window: int, zg: int, pack: int = 1,
                s: int = 1, identity_k: int = -1, parity: int = 0) -> bool:
        # ``parity`` tags the row ordering of the table the plan was built
        # on (0 = raw lex order, 1 = parity-class-major) so a plan cannot
        # be reused across orderings that share static tile params.
        return (
            self.tile_m == tile_m and self.window == window
            and self.zg == zg and self.pack == pack and self.s == s
            and self.identity_k == identity_k and self.parity == parity
        )

    def flip_k(self) -> "ConvPlan":
        """Plan for the K-FLIPPED table ``table[:, ::-1, :]`` — i.e. the
        free reverse table of a symmetric-offset self-map
        (``BatchedPairTable.with_reverse``'s K-flip). ``plan_windows``
        treats offsets independently except for zg-grouping, and a full
        reversal maps z-group blocks onto z-group blocks, so the reverse
        plan is pure slicing (~free) instead of a second plan build with
        its reductions + overflow-compaction cumsum over [K, M_flat].

        The identity offset of a symmetric enumeration is self-conjugate
        (K-1-ident == ident), so the identity fast path carries over.
        """
        n_flat_cols = self.local.shape[0] * self.local.shape[3]
        k = self.ovalid.shape[0]
        g = self.starts.shape[0]
        s = self.s
        ids = self.of_list
        cols = jnp.where(ids >= 0, ids % n_flat_cols, 0)
        ks = jnp.where(ids >= 0, ids // n_flat_cols, 0)
        of_list = jnp.where(
            ids >= 0, (k - 1 - ks) * n_flat_cols + cols, -1
        )
        ident = self.identity_k if self.identity_k < 0 else k - 1 - self.identity_k
        return ConvPlan(
            self.starts[::-1],
            self.delta.reshape(g, s, -1)[::-1].reshape(g * s, -1),
            self.ovalid[::-1],
            self.local[:, ::-1],
            self.overflow[::-1],
            of_list,
            self.of_count,
            self.tile_m,
            self.window,
            self.zg,
            self.pack,
            self.s,
            ident,
            self.parity,
        )


jax.tree_util.register_pytree_node(
    ConvPlan,
    lambda p: (
        (p.starts, p.delta, p.ovalid, p.local, p.overflow, p.of_list,
         p.of_count),
        (p.tile_m, p.window, p.zg, p.pack, p.s, p.identity_k, p.parity),
    ),
    lambda aux, ch: ConvPlan(*ch, *aux),
)


def _prefix_group_of(offsets: np.ndarray, ndim: int) -> int:
    """Largest zg such that offsets come in contiguous blocks of zg sharing
    their first ``ndim`` coordinates. Returns 1 when no such structure
    exists."""
    k = offsets.shape[0]
    if k <= 1:
        return 1
    first = offsets[0, :ndim]
    zg = 1
    while zg < k and np.array_equal(offsets[zg, :ndim], first):
        zg += 1
    if k % zg != 0:
        return 1
    blocks = offsets[:, :ndim].reshape(k // zg, zg, ndim)
    if not all(np.all(b == b[0]) for b in blocks):
        return 1
    return zg


def z_group_of(offsets: np.ndarray) -> int:
    """Largest zg such that offsets come in contiguous blocks of zg sharing
    (dx, dy) — the z-fastest enumeration of ``kernel_offsets`` (and its
    reversals/negations). Returns 1 when no such structure exists."""
    return _prefix_group_of(offsets, 2)


def x_group_of(offsets: np.ndarray) -> int:
    """Largest zg such that offsets come in contiguous blocks sharing dx
    alone ("v5" dx-major grouping: 9 for 3^3, 25 for 5^3).

    On lex-sorted coords a dy/dz step moves an offset's matching row by
    only ~(points per (x, y) column) = O(1) on sparse scenes, so the whole
    dx-block's gathers fit the SAME per-tile window as one (dx, dy)
    z-group: measured per-tile spreads are identical (p99.9 319 vs 319 at
    L1) with ZERO overflow at window_factor 1.25 at every UNet level
    (``scripts/window_stats_zg9.py``). One window DMA + one batched one-hot
    matmul then serves 3x more offsets: 3x fewer dependent op chains per
    sub-tile at identical one-hot FLOPs — the op-count lever that the
    measured kernel is actually bound by (docs/user_guide/performance.md)."""
    return _prefix_group_of(offsets, 1)


def flatten_table(table: jnp.ndarray, row_stride: int, tile: int) -> jnp.ndarray:
    """[B, K, M] per-scene tables -> [K, B*Mp] flattened table.

    Each scene's columns are padded to a multiple of ``tile`` (the
    super-tile size ``s*tile_m``, so grid steps never straddle scenes) and
    its valid entries shifted by ``b*row_stride`` (the scene's offset in the
    flattened gather-source array).
    """
    b, k, m = table.shape
    mp = _round_up(m, tile)
    if mp != m:
        table = jnp.pad(table, ((0, 0), (0, 0), (0, mp - m)), constant_values=-1)
    shift = (jnp.arange(b, dtype=jnp.int32) * row_stride)[:, None, None]
    shifted = jnp.where(table >= 0, table + shift, -1)
    return jnp.transpose(shifted, (1, 0, 2)).reshape(k, b * mp)


def plan_windows(
    table: jnp.ndarray, tile_m: int, window: int, zg: int = 1, pack: int = 1,
    s: int = 1, identity_k: Optional[int] = None, parity: int = 0,
) -> ConvPlan:
    """Build the :class:`ConvPlan` for a flattened table [K, M_flat]
    (M_flat divisible by s*tile_m; valid entries monotone per (row, tile);
    K divisible by zg with z-grouped offset enumeration).

    ``pack`` = rows packed per 128-lane vector for narrow channels (window
    starts align to 16*pack so the packed DMA start stays sublane-aligned).
    ``identity_k``: offset whose table row is known to be iota (submanifold
    self-map) — excluded from window sizing, gather and overflow; the kernel
    adds its contribution from a pipeline-blocked input instead.
    """
    k, n_out = table.shape
    assert k % zg == 0, (k, zg)
    assert n_out % (tile_m * s) == 0, (n_out, tile_m, s)
    g = k // zg
    t = n_out // tile_m
    ts = t // s
    align = 16 * pack
    wt = window
    wu = _round_up(wt + (s - 1) * tile_m, align)
    tiles = table.reshape(k, t, tile_m)
    valid = tiles >= 0
    ident = identity_k if identity_k is not None else -1
    if ident >= 0:
        kmask = (jnp.arange(k) != ident)[:, None, None]
        use = valid & kmask
    else:
        use = valid
    big = jnp.int32(2 ** 30)
    per_off = jnp.min(jnp.where(use, tiles, big), axis=2)  # [K, T]
    # Per-(group, tile) window start = min over the group's offsets (empty
    # offsets are +inf and drop out); aligned to the sublane tiling.
    glo = jnp.min(per_off.reshape(g, zg, t), axis=1)  # [G, T]
    gempty = glo == big
    glo = jnp.where(gempty, big, glo & ~jnp.int32(align - 1))
    # Union-window start per (group, super-tile).
    ustart = jnp.min(glo.reshape(g, ts, s), axis=2)  # [G, Ts]
    uempty = ustart == big
    ustart = jnp.where(uempty, 0, ustart)
    # Effective per-tile sub-window start: clamped into the union so the
    # wt-slice stays readable; rows pushed out by the clamp become overflow
    # (exactness preserved by the residual pass).
    ucap = jnp.repeat(ustart, s, axis=1).reshape(g, ts, s).reshape(g, t)
    eff = jnp.minimum(glo, ucap + (wu - wt))  # [G, T]
    delta = jnp.where(gempty, -1, eff - ucap)  # [G, T]
    delta = delta.reshape(g, ts, s).transpose(0, 2, 1).reshape(g * s, ts)
    eff_k = jnp.repeat(eff, zg, axis=0)  # [K, T]
    local = tiles - eff_k[:, :, None]
    in_window = use & (local >= 0) & (local < wt)
    overflow = use & ~in_window
    local = jnp.where(in_window, local, -1)
    if ident >= 0:
        # The identity row's local indices are never gathered (the kernel
        # skips it) — repurpose them as the per-row validity mask for the
        # identity fast path (0 = valid, -1 = padded row), so the no-gather
        # contribution stays zero on rows the explicit path leaves zero.
        local = local.at[ident].set(jnp.where(tiles[ident] >= 0, 0, -1))
    ovalid = jnp.any(
        in_window.reshape(k, ts, s, tile_m), axis=(2, 3)
    ).astype(jnp.int32)  # [K, Ts]
    g_any = jnp.any(ovalid.reshape(g, zg, ts), axis=1)  # [G, Ts]
    ustart = jnp.where(g_any, ustart, -1)
    overflow = overflow.reshape(k, n_out)
    # Plan-time compaction of overflow pair ids (the fast residual path):
    # one cumsum per plan instead of one per conv direction per step.
    flat_of = overflow.reshape(-1)
    pos = jnp.cumsum(flat_of.astype(jnp.int32)) - 1
    of_count = jnp.sum(flat_of.astype(jnp.int32))
    flat_ids = lax.broadcasted_iota(jnp.int32, flat_of.shape, 0)
    sel = flat_of & (pos < OF_CAP)
    of_list = (
        jnp.full((OF_CAP + 1,), -1, jnp.int32)
        .at[jnp.where(sel, pos, OF_CAP)]
        .set(jnp.where(sel, flat_ids, -1), mode="drop")[:OF_CAP]
    )
    local = local.reshape(k, ts, s * tile_m).transpose(1, 0, 2)[:, :, None, :]
    return ConvPlan(
        ustart.astype(jnp.int32),
        delta.astype(jnp.int32),
        ovalid,
        local.astype(jnp.int32),
        overflow,
        of_list,
        of_count,
        tile_m,
        wt,
        zg,
        pack,
        s,
        ident,
        parity,
    )


def _residual_full_scan_fwd(x, weight, table, overflow, out, chunk):
    """Exact correction for any overflow count — chunked compaction scan
    (the pre-v3 path, kept as the beyond-OF_CAP fallback)."""
    k, n_out = table.shape
    flat_of = overflow.reshape(-1)
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
        out = _apply_fwd_pairs(x, weight, table, sel, out)
        return i + 1, out

    def cond(carry):
        i, _ = carry
        return i * chunk < total

    _, out = lax.while_loop(cond, body, (jnp.int32(0), out))
    return out


def _apply_fwd_pairs(x, weight, table, sel, out):
    """out[o] += x[i] @ w[k] over the flat pair ids in ``sel`` (-1 = skip).

    Per-offset masked matmuls (K small) instead of a per-pair [R, Cin,
    Cout] weight gather — the gather materializes R*Cin*Cout elements
    (0.5 GB at R=4096, C=256) where the K-scan costs K tiny matmuls."""
    k, n_out = table.shape
    sel_valid = sel >= 0
    sel_safe = jnp.maximum(sel, 0)
    k_idx = (sel_safe // n_out).astype(jnp.int32)
    o_idx = (sel_safe % n_out).astype(jnp.int32)
    i_idx = table.reshape(-1)[sel_safe]
    xi = jnp.where(sel_valid[:, None], x[jnp.maximum(i_idx, 0)], 0)
    xi = xi.astype(jnp.float32)

    def per_k(acc, inp):
        kk, wk = inp
        mask = (k_idx == kk).astype(jnp.float32)[:, None]
        return acc + (xi * mask) @ wk.astype(jnp.float32), None

    contrib, _ = lax.scan(
        per_k,
        jnp.zeros((sel.shape[0], weight.shape[-1]), jnp.float32),
        (jnp.arange(k, dtype=jnp.int32), weight),
    )
    o_scatter = jnp.where(sel_valid, o_idx, n_out)
    return out.at[o_scatter].add(contrib.astype(out.dtype), mode="drop")


def residual_correction(
    x, weight, table, plan_or_overflow, out, chunk: int = 1024
):
    """Exact correction for window-overflow pairs — any overflow count.

    With a :class:`ConvPlan` (the production path), the plan's pre-compacted
    ``of_list`` makes a firing correction one small gather + einsum; counts
    beyond OF_CAP fall back to the exact chunked full scan. With a raw
    overflow mask (tests / ad-hoc), only the full scan is available. The
    whole pass sits behind a ``lax.cond`` — steady state with well-behaved
    windows pays only the predicate reduction.
    """
    if isinstance(plan_or_overflow, ConvPlan):
        plan = plan_or_overflow

        def fast(out):
            return _apply_fwd_pairs(x, weight, table, plan.of_list, out)

        def slow(out):
            return _residual_full_scan_fwd(
                x, weight, table, plan.overflow, out, chunk
            )

        def correct(out):
            return lax.cond(plan.of_count <= OF_CAP, fast, slow, out)

        return lax.cond(plan.of_count > 0, correct, lambda o: o, out)

    overflow = plan_or_overflow
    return lax.cond(
        jnp.any(overflow),
        lambda o: _residual_full_scan_fwd(x, weight, table, overflow, o, chunk),
        lambda o: o,
        out,
    )


def _apply_wgrad_pairs(x, gout, table, sel, dw):
    """dw[k] += x[i].T g[o] over flat pair ids in ``sel`` — per-offset
    masked AtB (wgrad accumulates per offset, so the K-scan is inherent;
    the pair count stays small on this path)."""
    k, n_out = table.shape
    sel_valid = sel >= 0
    sel_safe = jnp.maximum(sel, 0)
    k_idx = (sel_safe // n_out).astype(jnp.int32)
    o_idx = (sel_safe % n_out).astype(jnp.int32)
    i_idx = table.reshape(-1)[sel_safe]
    xi = jnp.where(sel_valid[:, None], x[jnp.maximum(i_idx, 0)], 0)
    gi = jnp.where(
        sel_valid[:, None], gout[jnp.minimum(o_idx, gout.shape[0] - 1)], 0
    )
    xi = xi.astype(jnp.float32)
    gi = gi.astype(jnp.float32)

    def per_k(_, kk):
        mask = (k_idx == kk).astype(jnp.float32)[:, None]
        return None, (xi * mask).T @ gi

    _, dws = lax.scan(per_k, None, jnp.arange(k, dtype=jnp.int32))
    return dw + dws


def _residual_full_scan_wgrad(x, gout, table, overflow, dw, chunk):
    k, n_out = table.shape
    flat_of = overflow.reshape(-1)
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
        dw = _apply_wgrad_pairs(x, gout, table, sel, dw)
        return i + 1, dw

    def cond(carry):
        i, _ = carry
        return i * chunk < total

    _, dw = lax.while_loop(cond, body, (jnp.int32(0), dw))
    return dw


def residual_correction_wgrad(
    x, g, table, plan_or_overflow, dw, chunk: int = 1024
):
    """wgrad analog of :func:`residual_correction`:
    ``dw[k] += sum_r x[i_r].T g[o_r]`` over overflow pairs."""
    if isinstance(plan_or_overflow, ConvPlan):
        plan = plan_or_overflow

        def fast(dw):
            return _apply_wgrad_pairs(x, g, table, plan.of_list, dw)

        def slow(dw):
            return _residual_full_scan_wgrad(
                x, g, table, plan.overflow, dw, chunk
            )

        def correct(dw):
            return lax.cond(plan.of_count <= OF_CAP, fast, slow, dw)

        return lax.cond(plan.of_count > 0, correct, lambda d: d, dw)

    overflow = plan_or_overflow
    return lax.cond(
        jnp.any(overflow),
        lambda d: _residual_full_scan_wgrad(x, g, table, overflow, d, chunk),
        lambda d: d,
        dw,
    )


# ---------------------------------------------------------------------------
# The Pallas kernels
# ---------------------------------------------------------------------------


def _igemm_kernel(
    # scalar prefetch
    starts_ref,  # [G, Ts] SMEM; -1 = skip this (group, super-tile)
    delta_ref,  # [G*S, Ts] SMEM; sub-window offset; -1 = sub-tile empty
    ovalid_ref,  # [K, Ts] SMEM; 0 = skip this (offset, super-tile)
    # inputs
    x_hbm,  # [N_in_pad, C_in] ANY (HBM)
    xid_ref,  # [s*tile_m, C_in] VMEM identity block (dummy when unused)
    local_ref,  # [1, K, 1, s*tile_m] VMEM (this super-tile's block)
    w_ref,  # [G, zg, C_in, C_out] VMEM
    # outputs
    out_ref,  # [s*tile_m, C_out] VMEM
    # scratch
    win_ref,  # [2, Wu, C_in] VMEM double buffer
    sem,  # DMA sems [2]
    acc_ref,  # [s*tile_m, C_out] f32 VMEM
    *,
    num_groups: int,
    zg: int,
    tile_m: int,
    s: int,
    wt: int,
    wu: int,
    align: int,
    identity_k: int,
):
    """Batched-gather forward ("v4"): the zg offsets of a (dx, dy) group are
    gathered and contracted in ONE [zg*tile_m, wt] one-hot matmul + one
    zg-batched weight matmul + one dz-sum — ~6 ops per (group, sub-tile)
    instead of ~5*zg. The kernel is bound by the count of small dependent
    ops, not FLOPs (measured: C32 runs at C128 speed, tile_m=128 with half
    the gather FLOPs is 40% SLOWER, and this batching is 1.55x faster at
    identical FLOPs — scripts/perf_v4.py)."""
    t = pl.program_id(0)

    def dma(g, slot):
        return pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(
                    pl.multiple_of(jnp.maximum(starts_ref[g, t], 0), align),
                    wu,
                ),
                :,
            ],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[0, t] >= 0)
    def _():
        dma(0, 0).start()

    if identity_k >= 0:
        # Identity fast path: table[identity_k] == iota, so the gather is a
        # straight copy — the rows arrive via the pipeline-blocked input.
        # local[identity_k] holds the per-row validity (0 valid / -1 pad),
        # keeping padded rows at zero like the explicit path. (Reshape the
        # int32 vector BEFORE comparing: Mosaic only supports minor-dim
        # insertion on 32-bit types, not i1.)
        idv = local_ref[0, identity_k, 0, :][:, None] >= 0
        xid = jnp.where(idv, xid_ref[:], 0)
        acc_ref[:] = jax.lax.dot(
            xid.astype(w_ref.dtype),
            w_ref[identity_k // zg, identity_k % zg],
            preferred_element_type=jnp.float32,
        )
    else:
        acc_ref[:] = jnp.zeros_like(acc_ref)

    iota3 = lax.broadcasted_iota(jnp.int32, (1, 1, wt), 2)
    iota_zg = lax.broadcasted_iota(jnp.int32, (zg, tile_m), 0)

    def body(g, _):
        slot = lax.rem(g, 2)
        nxt = lax.rem(g + 1, 2)

        @pl.when((g + 1 < num_groups) & (starts_ref[g + 1, t] >= 0))
        def _():
            dma(g + 1, nxt).start()

        @pl.when(starts_ref[g, t] >= 0)
        def _():
            dma(g, slot).wait()
            # Static double-buffer parity branches: the compute read needs a
            # static leading index so the sub-window slice lowers cleanly.
            for parity in range(2):

                @pl.when(slot == parity)
                def _(parity=parity):
                    for ss in range(s):
                        d = delta_ref[g * s + ss, t]

                        @pl.when(d >= 0)
                        def _(ss=ss, parity=parity, d=d):
                            sub = win_ref[
                                parity, pl.ds(pl.multiple_of(d, align), wt), :
                            ]
                            lo = ss * tile_m
                            idxs = local_ref[
                                0:1, pl.ds(g * zg, zg), 0:1,
                                lo:lo + tile_m,
                            ].reshape(zg, tile_m)
                            if identity_k >= 0:
                                # The identity row holds validity bits, not
                                # gather indices — exclude it (its add is
                                # the xid fast path above). [zg, tile]
                                # select: negligible next to the matmuls.
                                idxs = jnp.where(
                                    (g == identity_k // zg)
                                    & (iota_zg == identity_k % zg),
                                    -1, idxs,
                                )
                            # One-hot matmul gather for ALL zg offsets at
                            # once (invalid idx == -1 matches no column ->
                            # zero row, masking free), then a zg-batched
                            # weight contraction and one dz-sum.
                            onehot3 = (idxs[:, :, None] == iota3).astype(
                                win_ref.dtype
                            )  # [zg, tile_m, wt]
                            a3 = jax.lax.dot_general(
                                onehot3, sub,
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [zg, tile_m, C_in]
                            part = jax.lax.dot_general(
                                a3.astype(w_ref.dtype), w_ref[g],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                            )  # [zg, tile_m, C_out]
                            acc_ref[lo:lo + tile_m, :] += part.sum(0)

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _igemm_wgrad_kernel(
    starts_ref,  # [G, Ts] SMEM
    delta_ref,  # [G*S, Ts] SMEM
    ovalid_ref,  # [K, Ts] SMEM
    x_hbm,  # [N_in_pad, C_in] ANY (HBM)
    xid_ref,  # [s*tile_m, C_in] VMEM identity block (dummy when unused)
    local_ref,  # [1, K, 1, s*tile_m] VMEM
    g_ref,  # [s*tile_m, C_out] VMEM (this super-tile's dout block)
    out_ref,  # [K, C_in, C_out] VMEM — same block every grid step
    win_ref,  # [2, Wu, C_in]
    sem,
    *,
    num_groups: int,
    zg: int,
    tile_m: int,
    s: int,
    wt: int,
    wu: int,
    align: int,
    identity_k: int,
):
    """wgrad (AtB): dw[k] += gather(x, table[k, tile]).T @ g[tile].

    The [K, C_in, C_out] accumulator is the *output block itself* (constant
    index map -> stays resident in VMEM across all grid steps; zeroed at
    step 0). Gather is the same zg-batched one-hot MXU contraction as the
    forward; the zg dw blocks land with one dynamic-slice accumulate."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def dma(g, slot):
        return pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(
                    pl.multiple_of(jnp.maximum(starts_ref[g, t], 0), align),
                    wu,
                ),
                :,
            ],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[0, t] >= 0)
    def _():
        dma(0, 0).start()

    if identity_k >= 0:
        idv = local_ref[0, identity_k, 0, :][:, None] >= 0
        xid = jnp.where(idv, xid_ref[:], 0)
        out_ref[identity_k] += jax.lax.dot_general(
            xid.astype(g_ref.dtype),
            g_ref[:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    iota3 = lax.broadcasted_iota(jnp.int32, (1, 1, wt), 2)
    iota_zg = lax.broadcasted_iota(jnp.int32, (zg, tile_m), 0)

    def body(g, _):
        slot = lax.rem(g, 2)
        nxt = lax.rem(g + 1, 2)

        @pl.when((g + 1 < num_groups) & (starts_ref[g + 1, t] >= 0))
        def _():
            dma(g + 1, nxt).start()

        @pl.when(starts_ref[g, t] >= 0)
        def _():
            dma(g, slot).wait()
            for parity in range(2):

                @pl.when(slot == parity)
                def _(parity=parity):
                    for ss in range(s):
                        d = delta_ref[g * s + ss, t]

                        @pl.when(d >= 0)
                        def _(ss=ss, parity=parity, d=d):
                            sub = win_ref[
                                parity, pl.ds(pl.multiple_of(d, align), wt), :
                            ]
                            lo = ss * tile_m
                            idxs = local_ref[
                                0:1, pl.ds(g * zg, zg), 0:1,
                                lo:lo + tile_m,
                            ].reshape(zg, tile_m)
                            if identity_k >= 0:
                                idxs = jnp.where(
                                    (g == identity_k // zg)
                                    & (iota_zg == identity_k % zg),
                                    -1, idxs,
                                )
                            onehot3 = (idxs[:, :, None] == iota3).astype(
                                win_ref.dtype
                            )  # [zg, tile_m, wt]
                            a3 = jax.lax.dot_general(
                                onehot3, sub,
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [zg, tile_m, C_in]
                            dw3 = jax.lax.dot_general(
                                a3.astype(g_ref.dtype),
                                g_ref[lo:lo + tile_m, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [zg, C_in, C_out]
                            out_ref[pl.ds(g * zg, zg)] += dw3

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)


def _igemm_bwd_fused_kernel(
    starts_ref,  # [G, Ts] SMEM (FORWARD plan)
    delta_ref,  # [G*S, Ts] SMEM
    ovalid_ref,  # [K, Ts] SMEM
    x_hbm,  # [N_flat, Cp] ANY (HBM)
    g_hbm,  # [N_flat, Cp] ANY (HBM) — same flattened row space (self-map)
    xid_ref,  # [s*tile_m, Cp] VMEM identity x block (dummy when unused)
    gt_ref,  # [s*tile_m, Cp] VMEM dout block (this super-tile)
    local_ref,  # [1, K, 1, s*tile_m] VMEM
    wrev_ref,  # [G, zg, Cp, Cp] VMEM: slot (g, z) holds w[K-1-(g*zg+z)].T
    dx_ref,  # out [s*tile_m, Cp]
    dw_ref,  # out [K, Cp, Cp] f32 — same block every grid step
    win_ref,  # [2, Wu, 2*Cp] scratch: x rows in lanes [0:Cp], g in [Cp:2Cp]
    sem,  # DMA sems [2, 2]
    acc_ref,  # [s*tile_m, Cp] f32
    *,
    num_groups: int,
    zg: int,
    tile_m: int,
    s: int,
    wt: int,
    wu: int,
    align: int,
    identity_k: int,
    cp: int,
):
    """Fused backward for symmetric self-maps: dgrad + wgrad in ONE pass.

    Key identity (the free K-flip reverse table): for a self-map,
    ``rev[k] == table[flip(k)]`` with ``flip(k) = K-1-k``, so

        dx[i] = sum_k g[rev[k, i]] @ w[k].T  =  sum_k g[table[k, i]] @ w[flip(k)].T
        dw[k] = sum_i x[table[k, i]].T @ g[i]

    Both directions gather rows ``table[k, i]`` — the SAME one-hot — from
    two arrays (x for wgrad, g for dgrad). The window DMAs share starts and
    land in one channel-concatenated buffer, so ONE gather matmul
    ``[zg*tile_m, wt] @ [wt, 2*Cp]`` feeds both: per (group, sub-tile) the
    unit does 1 one-hot build + 1 gather + 2 weight matmuls + 2 accumulates
    instead of the 2x(build + gather + matmul + accumulate) of separate
    dgrad/wgrad passes. The one-hot build is ~a matmul's worth of VPU time,
    so this halving targets exactly the measured per-unit latency wall
    (docs/user_guide/performance.md, round-3 decomposition).
    """
    t = pl.program_id(0)

    def dma_x(g, slot):
        return pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(
                    pl.multiple_of(jnp.maximum(starts_ref[g, t], 0), align),
                    wu,
                ),
                :,
            ],
            win_ref.at[slot, :, pl.ds(0, cp)],
            sem.at[slot, 0],
        )

    def dma_g(g, slot):
        return pltpu.make_async_copy(
            g_hbm.at[
                pl.ds(
                    pl.multiple_of(jnp.maximum(starts_ref[g, t], 0), align),
                    wu,
                ),
                :,
            ],
            win_ref.at[slot, :, pl.ds(cp, cp)],
            sem.at[slot, 1],
        )

    @pl.when(starts_ref[0, t] >= 0)
    def _():
        dma_x(0, 0).start()
        dma_g(0, 0).start()

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    if identity_k >= 0:
        idv = local_ref[0, identity_k, 0, :][:, None] >= 0
        xid = jnp.where(idv, xid_ref[:], 0)
        gtv = jnp.where(idv, gt_ref[:], 0)
        # dw[ident] += x_tile.T @ g_tile ; dx_tile = g_tile @ w[ident].T
        # (flip(ident) == ident for a symmetric enumeration, so the wrev
        # slot at ident already holds w[ident].T).
        dw_ref[identity_k] += jax.lax.dot_general(
            xid.astype(gt_ref.dtype), gt_ref[:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = jax.lax.dot(
            gtv.astype(wrev_ref.dtype),
            wrev_ref[identity_k // zg, identity_k % zg],
            preferred_element_type=jnp.float32,
        )
    else:
        acc_ref[:] = jnp.zeros_like(acc_ref)

    iota3 = lax.broadcasted_iota(jnp.int32, (1, 1, wt), 2)
    iota_zg = lax.broadcasted_iota(jnp.int32, (zg, tile_m), 0)

    def body(g, _):
        slot = lax.rem(g, 2)
        nxt = lax.rem(g + 1, 2)

        @pl.when((g + 1 < num_groups) & (starts_ref[g + 1, t] >= 0))
        def _():
            dma_x(g + 1, nxt).start()
            dma_g(g + 1, nxt).start()

        @pl.when(starts_ref[g, t] >= 0)
        def _():
            dma_x(g, slot).wait()
            dma_g(g, slot).wait()
            for parity in range(2):

                @pl.when(slot == parity)
                def _(parity=parity):
                    for ss in range(s):
                        d = delta_ref[g * s + ss, t]

                        @pl.when(d >= 0)
                        def _(ss=ss, parity=parity, d=d):
                            sub = win_ref[
                                parity, pl.ds(pl.multiple_of(d, align), wt), :
                            ]  # [wt, 2*Cp]
                            lo = ss * tile_m
                            idxs = local_ref[
                                0:1, pl.ds(g * zg, zg), 0:1,
                                lo:lo + tile_m,
                            ].reshape(zg, tile_m)
                            if identity_k >= 0:
                                idxs = jnp.where(
                                    (g == identity_k // zg)
                                    & (iota_zg == identity_k % zg),
                                    -1, idxs,
                                )
                            onehot3 = (idxs[:, :, None] == iota3).astype(
                                win_ref.dtype
                            )  # [zg, tile_m, wt]
                            a3 = jax.lax.dot_general(
                                onehot3, sub,
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [zg, tile_m, 2*Cp]: x rows ‖ g rows
                            a3x = a3[:, :, :cp]
                            a3g = a3[:, :, cp:]
                            dw3 = jax.lax.dot_general(
                                a3x.astype(gt_ref.dtype),
                                gt_ref[lo:lo + tile_m, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [zg, Cp, Cp]
                            dw_ref[pl.ds(g * zg, zg)] += dw3
                            dxp = jax.lax.dot_general(
                                a3g.astype(wrev_ref.dtype), wrev_ref[g],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                            )  # [zg, tile_m, Cp]
                            acc_ref[lo:lo + tile_m, :] += dxp.sum(0)

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)
    dx_ref[:] = acc_ref[:].astype(dx_ref.dtype)


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
    """Always 1: narrow-C row packing was removed with the batched ("v4")
    kernel. The kernel is op-count-bound, not bytes/FLOP-bound — packed
    C32 measured 15.0 ms where the unpacked batched gather runs 10.4 ms
    (scripts/perf_v4.py) — so packing's extra two-level-gather ops cost
    more than the 4x DMA-byte saving is worth. Kept for API stability
    (plans and dispatch carry a pack field)."""
    del c
    return 1


def _pad_channels(arr: jnp.ndarray, mult: int = 128) -> Tuple[jnp.ndarray, int]:
    c = arr.shape[-1]
    cp = _round_up(c, mult)
    if cp != c:
        pad = [(0, 0)] * (arr.ndim - 1) + [(0, cp - c)]
        arr = jnp.pad(arr, pad)
    return arr, cp


def _windows_of(tile_m: int, window_factor: float, s: int, pack: int):
    align = 16 * pack
    wt = _round_up(int(window_factor * tile_m), align)
    wu = _round_up(wt + (s - 1) * tile_m, align)
    return wt, wu, align


def _identity_ok(identity_k, n_in: int, n_out: int, tile: int) -> int:
    """The identity fast path needs flattened-out row b*mp+o to equal the
    flattened-in row b*n_in+o, i.e. the per-scene column padding must match
    the gather-source stride."""
    if identity_k is None or identity_k < 0:
        return -1
    if n_in != _round_up(n_out, tile):
        return -1
    return int(identity_k)


def implicit_gemm_fwd(
    x: jnp.ndarray,  # [B, N_in, C_in]
    weight: jnp.ndarray,  # [K, C_in, C_out]
    table: jnp.ndarray,  # [B, K, N_out] int32, monotone valid entries per row
    plan: Optional[ConvPlan] = None,
    *,
    tile_m: int = 256,
    window_factor: float = 2,
    zg: int = 1,
    s: int = 1,
    identity_k: Optional[int] = None,
    parity: int = 0,
    interpret: bool = False,
    residual_chunk: int = 1024,
) -> jnp.ndarray:
    """Batched fused sparse-conv forward: ``out[b, o] = sum_k x[b, table[b, k, o]]
    @ weight[k]`` -> [B, N_out, C_out]. One pallas_call for the whole batch.

    ``plan`` (if given) must be built by :func:`make_plan` with the same
    (tile_m, window_factor, zg, s, identity_k) over the same table.
    ``identity_k``: offset index whose table rows are iota (submanifold
    self-map) — enables the no-gather fast path (only valid when the caller
    guarantees ``table[b, identity_k, o] == o`` for all valid o).
    """
    b, n_in, c_in = x.shape
    k, n_out = table.shape[1], table.shape[2]
    c_out = weight.shape[-1]
    if k % zg != 0:
        zg = 1
    wt, wu, align = _windows_of(tile_m, window_factor, s, 1)
    tile = tile_m * s
    ident = _identity_ok(identity_k, n_in, n_out, tile)

    if plan is None or not plan.matches(
        tile_m, wt, zg, 1, s, ident, parity
    ):
        plan = make_plan(
            table, n_in, tile_m=tile_m, window_factor=window_factor,
            zg=zg, s=s, identity_k=ident, parity=parity,
        )
    tbl_flat = flatten_table(table, n_in, tile)
    m_flat = tbl_flat.shape[1]
    ts = m_flat // tile

    # Mosaic requires 128-lane alignment on the minor dim of the HBM window
    # DMA; pad channels. (Narrow-C row packing was removed with the batched
    # kernel: the kernel is op-count-bound, and the unpacked batched gather
    # at C32 beats the packed per-offset one by 1.4x — scripts/perf_v4.py.)
    x, c_in_pad = _pad_channels(x)
    weight, _ = _pad_channels(jnp.swapaxes(weight, 1, 2))
    weight = jnp.swapaxes(weight, 1, 2)
    weight, c_out_pad = _pad_channels(weight)

    x_flat = _flatten_x(x, wu, align=align)
    if ident >= 0:
        xid_spec = pl.BlockSpec((tile, c_in_pad), lambda i, *_: (i, 0))
    else:
        # Dummy tiny block — the kernel never reads it.
        xid_spec = pl.BlockSpec((16, c_in_pad), lambda i, *_: (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ts,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            xid_spec,
            pl.BlockSpec((1, k, 1, tile), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full weight resident
        ],
        out_specs=pl.BlockSpec((tile, c_out_pad), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wu, c_in_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tile, c_out_pad), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _igemm_kernel, num_groups=k // zg, zg=zg, tile_m=tile_m, s=s,
        wt=wt, wu=wu, align=align, identity_k=ident,
    )

    w4 = weight.reshape(k // zg, zg, c_in_pad, c_out_pad)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_flat, c_out_pad), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(plan.starts, plan.delta, plan.ovalid, x_flat, x_flat, plan.local, w4)

    out = residual_correction(
        x_flat, weight, tbl_flat, plan, out, chunk=residual_chunk
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
    window_factor: float = 2,
    zg: int = 1,
    s: int = 1,
    identity_k: Optional[int] = None,
    parity: int = 0,
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
    wt, wu, align = _windows_of(tile_m, window_factor, s, 1)
    tile = tile_m * s
    ident = _identity_ok(identity_k, n_in, n_out, tile)

    if plan is None or not plan.matches(
        tile_m, wt, zg, 1, s, ident, parity
    ):
        plan = make_plan(
            table, n_in, tile_m=tile_m, window_factor=window_factor,
            zg=zg, s=s, identity_k=ident, parity=parity,
        )
    tbl_flat = flatten_table(table, n_in, tile)
    m_flat = tbl_flat.shape[1]
    ts = m_flat // tile
    mp = m_flat // b

    x, c_in_pad = _pad_channels(x)
    g, c_out_pad = _pad_channels(g)

    x_flat = _flatten_x(x, wu, align=align)
    g_pad = jnp.pad(g, ((0, 0), (0, mp - n_out), (0, 0))).reshape(
        m_flat, c_out_pad
    )
    if ident >= 0:
        xid_spec = pl.BlockSpec((tile, c_in_pad), lambda i, *_: (i, 0))
    else:
        xid_spec = pl.BlockSpec((16, c_in_pad), lambda i, *_: (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ts,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            xid_spec,
            pl.BlockSpec((1, k, 1, tile), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((tile, c_out_pad), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (k, c_in_pad, c_out_pad), lambda i, *_: (0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wu, c_in_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _igemm_wgrad_kernel, num_groups=k // zg, zg=zg, tile_m=tile_m, s=s,
        wt=wt, wu=wu, align=align, identity_k=ident,
    )

    dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c_in_pad, c_out_pad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(plan.starts, plan.delta, plan.ovalid, x_flat, x_flat, plan.local, g_pad)

    dw = residual_correction_wgrad(
        x_flat, g_pad, tbl_flat, plan, dw, chunk=residual_chunk
    )
    return dw[:, :c_in, :c_out]


def implicit_gemm_bwd_fused(
    x: jnp.ndarray,  # [B, N, C_in]
    g: jnp.ndarray,  # [B, N, C_out]
    weight: jnp.ndarray,  # [K, C_in, C_out]
    table: jnp.ndarray,  # [B, K, N] int32 symmetric self-map pair table
    plan: Optional[ConvPlan] = None,
    *,
    tile_m: int = 256,
    window_factor: float = 2,
    zg: int = 1,
    s: int = 1,
    identity_k: Optional[int] = None,
    interpret: bool = False,
    residual_chunk: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused dgrad+wgrad for a symmetric SELF-map (``rev == table[:, ::-1]``,
    n_in == n_out): returns ``(dx [B, N, C_in], dw [K, C_in, C_out] fp32)``
    from ONE kernel pass sharing window DMAs and one-hot gathers (see
    :func:`_igemm_bwd_fused_kernel`). The caller must guarantee the self-map
    contract; exactness w.r.t. window overflow is preserved by the same
    residual passes as the separate directions (dx via the K-flipped plan).
    """
    b, n_in, c_in = x.shape
    k, n_out = table.shape[1], table.shape[2]
    c_out = g.shape[-1]
    if k % zg != 0:
        zg = 1
    wt, wu, align = _windows_of(tile_m, window_factor, s, 1)
    tile = tile_m * s
    if n_in != n_out:
        raise ValueError(
            f"fused bwd requires a SELF-map (n_in={n_in} != n_out={n_out})"
        )
    # Identity fast path only when the padded column stride equals the
    # gather-source row stride (checked inside); gather path is general.
    ident = _identity_ok(identity_k, n_in, n_out, tile)

    if plan is None or not plan.matches(tile_m, wt, zg, 1, s, ident, 0):
        plan = make_plan(
            table, n_in, tile_m=tile_m, window_factor=window_factor,
            zg=zg, s=s, identity_k=ident,
        )
    tbl_flat = flatten_table(table, n_in, tile)
    m_flat = tbl_flat.shape[1]
    ts = m_flat // tile

    x, c_in_pad = _pad_channels(x)
    g, c_out_pad = _pad_channels(g)
    cp = max(c_in_pad, c_out_pad)
    if c_in_pad != cp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c_in_pad)))
    if c_out_pad != cp:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, cp - c_out_pad)))
    x_flat = _flatten_x(x, wu, align=align)
    g_flat = _flatten_x(g, wu, align=align)
    mp = m_flat // b
    # Blocked g tile in the flattened OUT-column space (scene stride mp) —
    # distinct from g_flat, whose rows live in the gather-source space
    # (scene stride n_in); they coincide only when n_in == mp.
    g_tile = jnp.pad(g, ((0, 0), (0, mp - n_out), (0, 0))).reshape(
        m_flat, cp
    )

    # wrev[g, z] = w[K-1-(g*zg+z)].T, channel-padded to [Cp, Cp].
    wt_mat = jnp.swapaxes(weight, 1, 2)  # [K, C_out, C_in]
    wt_mat = jnp.pad(
        wt_mat,
        ((0, 0), (0, cp - c_out), (0, cp - c_in)),
    )
    wrev4 = wt_mat[::-1].reshape(k // zg, zg, cp, cp)

    if ident >= 0:
        xid_spec = pl.BlockSpec((tile, cp), lambda i, *_: (i, 0))
    else:
        xid_spec = pl.BlockSpec((16, cp), lambda i, *_: (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ts,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_flat in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # g_flat in HBM
            xid_spec,
            pl.BlockSpec((tile, cp), lambda i, *_: (i, 0)),  # g tile
            pl.BlockSpec((1, k, 1, tile), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wrev resident
        ],
        out_specs=[
            pl.BlockSpec((tile, cp), lambda i, *_: (i, 0)),  # dx
            pl.BlockSpec((k, cp, cp), lambda i, *_: (0, 0, 0)),  # dw
        ],
        scratch_shapes=[
            pltpu.VMEM((2, wu, 2 * cp), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((tile, cp), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _igemm_bwd_fused_kernel, num_groups=k // zg, zg=zg, tile_m=tile_m,
        s=s, wt=wt, wu=wu, align=align, identity_k=ident, cp=cp,
    )

    dx, dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m_flat, cp), x.dtype),
            jax.ShapeDtypeStruct((k, cp, cp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(plan.starts, plan.delta, plan.ovalid, x_flat, g_flat, x_flat,
      g_tile, plan.local, wrev4)

    # Exact overflow corrections (fire only when of_count > 0):
    # wgrad over the forward plan; dgrad over its free K-flip
    # (dgrad == igemm_fwd(g, w.T, rev) with rev = table[:, ::-1]).
    dw = residual_correction_wgrad(
        x_flat, g_flat, tbl_flat, plan, dw, chunk=residual_chunk
    )
    rev_flat = flatten_table(table[:, ::-1, :], n_in, tile)
    dx = residual_correction(
        g_flat, wt_mat, rev_flat, plan.flip_k(), dx, chunk=residual_chunk,
    )

    dx = dx.reshape(b, mp, cp)[:, :n_in, :c_in]
    return dx, dw[:, :c_in, :c_out]


def make_plan(
    table: jnp.ndarray,  # [B, K, N_out]
    n_in: int,
    *,
    tile_m: int = 256,
    window_factor: float = 2,
    zg: int = 1,
    pack: int = 1,
    s: int = 1,
    identity_k: Optional[int] = None,
    parity: int = 0,
) -> ConvPlan:
    """Build the shared :class:`ConvPlan` for a batched pair table."""
    wt, _, align = _windows_of(tile_m, window_factor, s, pack)
    ident = _identity_ok(identity_k, n_in, table.shape[2], tile_m * s)
    return plan_windows(
        flatten_table(table, n_in, tile_m * s), tile_m, wt, zg, pack, s,
        ident, parity,
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
    window_factor: float = 2,
    s: int = 1,
    max_residual: int = 4096,  # kept for API compat; correction is exact
    interpret: bool = False,
) -> jnp.ndarray:
    del max_residual
    return implicit_gemm_fwd(
        x[None], weight, table[None],
        tile_m=tile_m, window_factor=window_factor, s=s, interpret=interpret,
    )[0]


def implicit_gemm_wgrad_raw(
    x: jnp.ndarray,
    g: jnp.ndarray,
    table: jnp.ndarray,
    *,
    tile_m: int = 256,
    window_factor: float = 2,
    s: int = 1,
    max_residual: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    del max_residual
    return implicit_gemm_wgrad(
        x[None], g[None], table[None],
        tile_m=tile_m, window_factor=window_factor, s=s, interpret=interpret,
    )
