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
  2. an in-VMEM dynamic row gather (Mosaic ``dynamic_gather`` via
     take_along_axis) by the tile's local indices;
  3. an MXU matmul against weight[k], accumulated in a VMEM fp32 tile across
     all K offsets (no K-fold HBM read-modify-write of the output);
  4. offsets with zero valid pairs in the tile are skipped entirely (the
     reference mask_gemm's pair-mask bit-skip, done with a prefetched count).

Rows whose window offset exceeds W (rare: lex-order boundary effects) are
masked out in-kernel and corrected exactly by a compacted residual pass in
XLA (``_residual_correction``).

This re-derives the reference mask_gemm's tricks (pair_table, bitmask skip,
reverse-table dgrad) for the TPU memory system. The same kernel serves
forward (AB, table) and dgrad (ABt, reverse table + transposed weights).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

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


def plan_windows(table: jnp.ndarray, tile_m: int, window: int):
    """Per-(tile, offset) window starts and in-window local indices.

    table: [K, N_out] int32 (N_out divisible by tile_m), values in [0, N_in)
    or -1; valid entries monotone per row.

    Returns (starts [T, K] — window start row, or -1 when the (tile, offset)
    pair has no valid entries (SMEM-packed skip flag), local [T, K, TILE_M]
    (-1 = invalid), overflow [K, N_out] bool).
    """
    k, n_out = table.shape
    t = n_out // tile_m
    tiles = table.reshape(k, t, tile_m)
    valid = tiles >= 0
    big = jnp.int32(2 ** 30)
    starts = jnp.min(jnp.where(valid, tiles, big), axis=2)  # [K, T]
    empty = starts == big
    # Align window starts to the sublane tiling (16 covers bf16's (16, 128)
    # tiles; Mosaic requires provably-aligned dynamic slice starts).
    starts = jnp.where(empty, 0, starts & ~jnp.int32(15))
    local = tiles - starts[:, :, None]
    in_window = valid & (local >= 0) & (local < window)
    overflow = valid & ~in_window
    local = jnp.where(in_window, local, -1)
    has_any = jnp.any(in_window, axis=2)  # [K, T]
    starts = jnp.where(has_any, starts, -1)
    return (
        jnp.transpose(starts, (1, 0)).astype(jnp.int32),
        jnp.transpose(local, (1, 0, 2)).astype(jnp.int32),
        overflow.reshape(k, n_out),
    )


def _residual_correction(x, weight, table, overflow, out, max_residual: int):
    """Exact correction for window-overflow pairs, compacted to a static cap.

    Overflow beyond the cap is dropped (detectable via jnp.sum(overflow);
    the autotuner's numeric guard falls back to the explicit backend there).

    Overflow is rare (lex-order boundary effects on sorted inputs), so the
    whole pass sits behind a ``lax.cond``: when no pair overflowed, steady
    state pays only the predicate reduction. Compaction is cumsum+scatter
    (one pass), not a full argsort.
    """
    k, n_out = table.shape
    flat_of = overflow.reshape(-1)

    def correct(out):
        pos = jnp.cumsum(flat_of.astype(jnp.int32)) - 1
        pos = jnp.where(flat_of & (pos < max_residual), pos, max_residual)
        flat_ids = lax.broadcasted_iota(jnp.int32, flat_of.shape, 0)
        sel = (
            jnp.full((max_residual + 1,), -1, jnp.int32)
            .at[pos]
            .set(flat_ids, mode="drop")[:max_residual]
        )
        sel_valid = sel >= 0
        sel_safe = jnp.maximum(sel, 0)
        k_idx = (sel_safe // n_out).astype(jnp.int32)
        o_idx = (sel_safe % n_out).astype(jnp.int32)
        i_idx = table.reshape(-1)[sel_safe]
        xi = jnp.where(sel_valid[:, None], x[jnp.maximum(i_idx, 0)], 0)
        wk = weight[k_idx]  # [R, Cin, Cout]
        contrib = jnp.einsum(
            "rc,rcd->rd", xi.astype(jnp.float32), wk.astype(jnp.float32)
        )
        o_scatter = jnp.where(sel_valid, o_idx, n_out)
        return out.at[o_scatter].add(contrib.astype(out.dtype), mode="drop")

    return lax.cond(jnp.any(flat_of), correct, lambda o: o, out)


# ---------------------------------------------------------------------------
# The Pallas kernel
# ---------------------------------------------------------------------------


def _igemm_kernel(
    # scalar prefetch
    starts_ref,  # [T, K] SMEM; -1 = skip this (tile, offset)
    # inputs
    x_hbm,  # [N_in_pad, C_in] ANY (HBM)
    local_ref,  # [1, K, TILE_M] VMEM (this tile's block)
    w_ref,  # [K, C_in, C_out] VMEM
    # outputs
    out_ref,  # [TILE_M, C_out] VMEM
    # scratch
    win_ref,  # [2, W, C_in] VMEM double buffer
    sem,  # DMA semaphores [2]
    acc_ref,  # [TILE_M, C_out] f32 VMEM
    *,
    num_offsets: int,
    tile_m: int,
    window: int,
):
    t = pl.program_id(0)
    c_in = win_ref.shape[2]

    def dma(k, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(jnp.maximum(starts_ref[t, k], 0), 16), window), :],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[t, 0] >= 0)
    def _():
        dma(0, 0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(k, _):
        slot = lax.rem(k, 2)
        nxt = lax.rem(k + 1, 2)

        @pl.when((k + 1 < num_offsets) & (starts_ref[t, k + 1] >= 0))
        def _():
            dma(k + 1, nxt).start()

        @pl.when(starts_ref[t, k] >= 0)
        def _():
            dma(k, slot).wait()
            idx = local_ref[0, k, :]  # [TILE_M] int32, -1 = invalid
            # One-hot matmul gather: Mosaic's dynamic_gather can't span
            # multiple vregs along the gather dim, and the MXU eats the
            # [TILE_M, W] x [W, C] contraction anyway. Invalid rows
            # (idx == -1) match no window column -> zero row, masking free.
            iota_w = lax.broadcasted_iota(jnp.int32, (tile_m, window), 1)
            onehot = (idx[:, None] == iota_w).astype(win_ref.dtype)
            a = jax.lax.dot(
                onehot, win_ref[slot], preferred_element_type=jnp.float32
            )
            acc_ref[:] += jax.lax.dot(
                a.astype(w_ref.dtype), w_ref[k],
                preferred_element_type=jnp.float32,
            )

        return ()

    lax.fori_loop(0, num_offsets, body, (), unroll=False)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _igemm_wgrad_kernel(
    # scalar prefetch
    starts_ref,  # [T, K] SMEM; -1 = skip this (tile, offset)
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
    num_offsets: int,
    tile_m: int,
    window: int,
):
    """wgrad (AtB): dw[k] += gather(x, table[k, tile]).T @ g[tile].

    The [K, C_in, C_out] accumulator is the *output block itself* (constant
    index map -> stays resident in VMEM across all grid steps; zeroed at
    step 0). Gather is the same one-hot MXU contraction as the forward."""
    t = pl.program_id(0)
    c_in = win_ref.shape[2]

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def dma(k, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(jnp.maximum(starts_ref[t, k], 0), 16), window), :],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[t, 0] >= 0)
    def _():
        dma(0, 0).start()

    def body(k, _):
        slot = lax.rem(k, 2)
        nxt = lax.rem(k + 1, 2)

        @pl.when((k + 1 < num_offsets) & (starts_ref[t, k + 1] >= 0))
        def _():
            dma(k + 1, nxt).start()

        @pl.when(starts_ref[t, k] >= 0)
        def _():
            dma(k, slot).wait()
            idx = local_ref[0, k, :]
            iota_w = lax.broadcasted_iota(jnp.int32, (tile_m, window), 1)
            onehot = (idx[:, None] == iota_w).astype(win_ref.dtype)
            a = jax.lax.dot(
                onehot, win_ref[slot], preferred_element_type=jnp.float32
            )  # [TILE_M, C_in]
            dw = jax.lax.dot_general(
                a.astype(g_ref.dtype),
                g_ref[:],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [C_in, C_out]
            out_ref[k] += dw

        return ()

    lax.fori_loop(0, num_offsets, body, (), unroll=False)


def implicit_gemm_wgrad_raw(
    x: jnp.ndarray,  # [N_in, C_in]
    g: jnp.ndarray,  # [N_out, C_out]
    table: jnp.ndarray,  # [K, N_out] int32, monotone valid entries per row
    *,
    tile_m: int = 256,
    window_factor: int = 2,
    max_residual: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-scene fused sparse-conv wgrad:
    ``dw[k] = sum_o x[table[k, o]].T @ g[o]`` -> [K, C_in, C_out] fp32."""
    k, n_out = table.shape
    n_in, c_in = x.shape
    c_out = g.shape[-1]
    window = window_factor * tile_m

    # 128-lane alignment for the HBM window DMA (see implicit_gemm_raw).
    c_in_pad = _round_up(c_in, 128)
    c_out_pad = _round_up(c_out, 128)
    if c_in_pad != c_in:
        x = jnp.pad(x, ((0, 0), (0, c_in_pad - c_in)))
    if c_out_pad != c_out:
        g = jnp.pad(g, ((0, 0), (0, c_out_pad - c_out)))

    n_out_pad = _round_up(n_out, tile_m)
    if n_out_pad != n_out:
        table = jnp.pad(table, ((0, 0), (0, n_out_pad - n_out)), constant_values=-1)
        g = jnp.pad(g, ((0, n_out_pad - n_out), (0, 0)))
    t = n_out_pad // tile_m

    n_in_pad = _round_up(n_in + window, 16)
    x_pad = jnp.pad(x, ((0, n_in_pad - n_in), (0, 0)))

    starts, local_tiles, overflow = plan_windows(table, tile_m, window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
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
        _igemm_wgrad_kernel, num_offsets=k, tile_m=tile_m, window=window
    )

    dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c_in_pad, c_out_pad), jnp.float32),
        interpret=interpret,
    )(starts, x_pad, local_tiles, g)
    dw = dw[:, :c_in, :c_out]
    g = g[:, :c_out]
    x_pad = x_pad[:, :c_in]

    # Exact correction for window-overflow pairs.
    def correct(dw):
        flat_of = overflow.reshape(-1)
        pos = jnp.cumsum(flat_of.astype(jnp.int32)) - 1
        pos = jnp.where(flat_of & (pos < max_residual), pos, max_residual)
        flat_ids = lax.broadcasted_iota(jnp.int32, flat_of.shape, 0)
        sel = (
            jnp.full((max_residual + 1,), -1, jnp.int32)
            .at[pos]
            .set(flat_ids, mode="drop")[:max_residual]
        )
        sel_valid = sel >= 0
        sel_safe = jnp.maximum(sel, 0)
        k_idx = (sel_safe // n_out_pad).astype(jnp.int32)
        o_idx = (sel_safe % n_out_pad).astype(jnp.int32)
        i_idx = table.reshape(-1)[sel_safe]
        xi = jnp.where(sel_valid[:, None], x_pad[jnp.maximum(i_idx, 0)], 0)
        gi = jnp.where(sel_valid[:, None], g[jnp.minimum(o_idx, n_out_pad - 1)], 0)
        contrib = jnp.einsum(
            "rc,rd->rcd", xi.astype(jnp.float32), gi.astype(jnp.float32)
        )
        return dw + jax.ops.segment_sum(contrib, k_idx, num_segments=k)

    return lax.cond(jnp.any(overflow), correct, lambda d: d, dw)


def implicit_gemm_raw(
    x: jnp.ndarray,  # [N_in, C_in]
    weight: jnp.ndarray,  # [K, C_in, C_out]
    table: jnp.ndarray,  # [K, N_out] int32, monotone valid entries per row
    *,
    tile_m: int = 256,
    window_factor: int = 2,
    max_residual: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-scene fused sparse-conv forward:
    ``out[o] = sum_k x[table[k, o]] @ weight[k]``.

    Requires lex-consistent ordering between x rows and table queries (the
    monotonicity contract). Exact for all inputs given enough residual
    capacity; see ``_residual_correction``.
    """
    k, n_out = table.shape
    n_in, c_in = x.shape
    c_out = weight.shape[-1]
    window = window_factor * tile_m

    # Mosaic requires 128-lane alignment on the minor dim of the HBM window
    # DMA; pad channels (the autotuner's numeric timing accounts for the
    # padding cost at small C).
    c_in_pad = _round_up(c_in, 128)
    c_out_pad = _round_up(c_out, 128)
    if c_in_pad != c_in:
        x = jnp.pad(x, ((0, 0), (0, c_in_pad - c_in)))
        weight = jnp.pad(weight, ((0, 0), (0, c_in_pad - c_in), (0, 0)))
    if c_out_pad != c_out:
        weight = jnp.pad(weight, ((0, 0), (0, 0), (0, c_out_pad - c_out)))

    n_out_pad = _round_up(n_out, tile_m)
    if n_out_pad != n_out:
        table = jnp.pad(table, ((0, 0), (0, n_out_pad - n_out)), constant_values=-1)
    t = n_out_pad // tile_m

    # Pad x so any in-bounds window DMA stays in bounds.
    n_in_pad = _round_up(n_in + window, 16)
    x_pad = jnp.pad(x, ((0, n_in_pad - n_in), (0, 0)))

    starts, local_tiles, overflow = plan_windows(table, tile_m, window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
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
        _igemm_kernel, num_offsets=k, tile_m=tile_m, window=window
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_pad, c_out_pad), x.dtype),
        interpret=interpret,
    )(starts, x_pad, local_tiles, weight)

    out = _residual_correction(x, weight, table, overflow, out, max_residual)
    return out[:n_out, :c_out]
