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

    Returns (starts [T, K], local [T, K, TILE_M] (-1 = invalid),
    counts [T, K], overflow [K, N_out] bool).
    """
    k, n_out = table.shape
    t = n_out // tile_m
    tiles = table.reshape(k, t, tile_m)
    valid = tiles >= 0
    big = jnp.int32(2 ** 30)
    starts = jnp.min(jnp.where(valid, tiles, big), axis=2)  # [K, T]
    starts = jnp.where(starts == big, 0, starts)
    local = tiles - starts[:, :, None]
    in_window = valid & (local >= 0) & (local < window)
    overflow = valid & ~in_window
    local = jnp.where(in_window, local, -1)
    counts = jnp.sum(in_window.astype(jnp.int32), axis=2)  # [K, T]
    return (
        jnp.transpose(starts, (1, 0)).astype(jnp.int32),
        jnp.transpose(local, (1, 0, 2)).astype(jnp.int32),
        jnp.transpose(counts, (1, 0)).astype(jnp.int32),
        overflow.reshape(k, n_out),
    )


def _residual_correction(x, weight, table, overflow, out, max_residual: int):
    """Exact correction for window-overflow pairs, compacted to a static cap.

    Overflow beyond the cap is dropped (detectable via jnp.sum(overflow);
    the autotuner's numeric guard falls back to the explicit backend there).
    """
    k, n_out = table.shape
    flat_of = overflow.reshape(-1)
    order = jnp.argsort(~flat_of)  # overflow pairs first
    sel = order[:max_residual]
    sel_valid = flat_of[sel]
    k_idx = (sel // n_out).astype(jnp.int32)
    o_idx = (sel % n_out).astype(jnp.int32)
    i_idx = table.reshape(-1)[sel]
    xi = jnp.where(sel_valid[:, None], x[jnp.maximum(i_idx, 0)], 0)
    wk = weight[k_idx]  # [R, Cin, Cout]
    contrib = jnp.einsum(
        "rc,rcd->rd", xi.astype(jnp.float32), wk.astype(jnp.float32)
    )
    o_scatter = jnp.where(sel_valid, o_idx, n_out)
    return out.at[o_scatter].add(contrib.astype(out.dtype), mode="drop")


# ---------------------------------------------------------------------------
# The Pallas kernel
# ---------------------------------------------------------------------------


def _igemm_kernel(
    # scalar prefetch
    starts_ref,  # [T, K] SMEM
    counts_ref,  # [T, K] SMEM
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
    idx_ref,  # [W, 1] int32 VMEM
    *,
    num_offsets: int,
    tile_m: int,
    window: int,
):
    t = pl.program_id(0)
    c_in = win_ref.shape[2]

    def dma(k, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(starts_ref[t, k], window), :],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(counts_ref[t, 0] > 0)
    def _():
        dma(0, 0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    idx_ref[:] = jnp.zeros_like(idx_ref)

    def body(k, _):
        slot = lax.rem(k, 2)
        nxt = lax.rem(k + 1, 2)

        @pl.when((k + 1 < num_offsets) & (counts_ref[t, k + 1] > 0))
        def _():
            dma(k + 1, nxt).start()

        @pl.when(counts_ref[t, k] > 0)
        def _():
            dma(k, slot).wait()
            idx = local_ref[0, k, :]  # [TILE_M]
            idx_ref[0:tile_m, 0] = jnp.maximum(idx, 0)
            idx_mat = jnp.broadcast_to(idx_ref[:, 0:1], (window, c_in))
            gathered = jnp.take_along_axis(win_ref[slot], idx_mat, axis=0)
            a = gathered[0:tile_m, :]
            a = jnp.where((idx >= 0)[:, None], a, 0)
            acc_ref[:] += jax.lax.dot(
                a, w_ref[k], preferred_element_type=jnp.float32
            )

        return ()

    lax.fori_loop(0, num_offsets, body, (), unroll=False)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def implicit_gemm_raw(
    x: jnp.ndarray,  # [N_in, C_in]
    weight: jnp.ndarray,  # [K, C_in, C_out]
    table: jnp.ndarray,  # [K, N_out] int32, monotone valid entries per row
    *,
    tile_m: int = 256,
    window_factor: int = 4,
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

    n_out_pad = _round_up(n_out, tile_m)
    if n_out_pad != n_out:
        table = jnp.pad(table, ((0, 0), (0, n_out_pad - n_out)), constant_values=-1)
    t = n_out_pad // tile_m

    # Pad x so any in-bounds window DMA stays in bounds.
    n_in_pad = _round_up(n_in + window, 8)
    x_pad = jnp.pad(x, ((0, n_in_pad - n_in), (0, 0)))

    starts, local_tiles, counts, overflow = plan_windows(table, tile_m, window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, k, tile_m), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full weight resident
        ],
        out_specs=pl.BlockSpec((tile_m, c_out), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, c_in), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tile_m, c_out), jnp.float32),
            pltpu.VMEM((window, 1), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _igemm_kernel, num_offsets=k, tile_m=tile_m, window=window
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_pad, c_out), x.dtype),
        interpret=interpret,
    )(starts, counts, x_pad, local_tiles, weight)

    out = _residual_correction(x, weight, table, overflow, out, max_residual)
    return out[:n_out]
