"""Pallas depthwise sparse-conv FMA kernels — the TPU equivalent of the
reference's fused depthwise CUDA path (``csrc/implicit_fma_kernel.cu`` 1108
LoC smem-cached-B FMA + ``implicit_reduction.cu``, dispatched by
``nn/functional/sparse_conv_depth.py:657``).

Depthwise conv has no weight GEMM — per offset the op is an elementwise
scale-accumulate of gathered rows:

    out[o, c] = sum_k x[table[k, o], c] * w[k, c]

The XLA formulation (``_depth_fwd_impl``) pays one row-gather per (offset,
row): ~80M gathered rows/s on v5e regardless of row width (measured,
docs/user_guide/performance.md), i.e. ~88 ms for a 27-offset 262k-row layer.
This kernel reuses the implicit-GEMM machinery instead — lex-sorted maps
make each offset's gather source a contiguous window, ONE union-window DMA
per offset group feeds a zg-batched one-hot MXU gather, and the per-channel
weight multiply happens on the VPU right after:

    a3  = onehot[zg, tile_m, wt] @ window[wt, C]      (MXU, same as igemm)
    acc += sum_z a3[z] * w[g*zg + z]                  (VPU, ~free)

so the depthwise cost collapses to the igemm's *gather* cost alone — the
kernel that was already measured op-count-bound (C32 == C128) — with no
weight matmul at all. Windows/plans/overflow residuals are shared verbatim
with :mod:`warpconvnet_tpu.kernels.implicit_gemm` (:class:`ConvPlan`), so
every conv reusing a kernel map reuses its plan across dense and depthwise.

wgrad needs only ``dw[k, c] = sum_o x[table[k, o], c] * g[o, c]`` — the
reference's ``implicit_reduction`` — realized as a per-group masked-gather +
VPU multiply + sublane reduction into a resident [K, 1, C] accumulator.

For symmetric self-maps (the ConvNeXt-block case) the backward fuses dgrad
and wgrad into ONE pass over channel-concatenated ``[x ‖ g]`` windows,
mirroring :func:`implicit_gemm_bwd_fused`: dx rides the free K-flip
(``dx[i] = sum_k g[table[k, i], c] * w[K-1-k, c]``), dw rides the forward
table — one window DMA stream and one one-hot gather serve both.

Exactness: window-overflow pairs are corrected by the same plan-compacted
residual scheme as the dense kernel, with elementwise (not matmul) apply
functions — any overflow count, behind a ``lax.cond``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warpconvnet_tpu.kernels.implicit_gemm import (
    OF_CAP,
    ConvPlan,
    _flatten_x,
    _identity_ok,
    _pad_channels,
    _windows_of,
    flatten_table,
    make_plan,
)


# ---------------------------------------------------------------------------
# Overflow residuals (elementwise analogs of implicit_gemm's matmul applies)
# ---------------------------------------------------------------------------


def _apply_depth_fwd_pairs(x, weight, table, sel, out):
    """out[o] += x[i] * w[k] over the flat pair ids in ``sel`` (-1 = skip).

    Unlike the dense apply (per-offset masked matmuls), the depthwise weight
    row gather is only [R, C] — materialize it directly."""
    k, n_cols = table.shape
    sel_valid = sel >= 0
    sel_safe = jnp.maximum(sel, 0)
    k_idx = (sel_safe // n_cols).astype(jnp.int32)
    o_idx = (sel_safe % n_cols).astype(jnp.int32)
    i_idx = table.reshape(-1)[sel_safe]
    xi = jnp.where(sel_valid[:, None], x[jnp.maximum(i_idx, 0)], 0)
    wk = weight[k_idx]
    contrib = xi.astype(jnp.float32) * wk.astype(jnp.float32)
    o_scatter = jnp.where(sel_valid, o_idx, n_cols)
    return out.at[o_scatter].add(contrib.astype(out.dtype), mode="drop")


def _apply_depth_wgrad_pairs(x, gout, table, sel, dw):
    """dw[k] += x[i] * g[o] over flat pair ids in ``sel``."""
    k, n_cols = table.shape
    sel_valid = sel >= 0
    sel_safe = jnp.maximum(sel, 0)
    k_idx = (sel_safe // n_cols).astype(jnp.int32)
    o_idx = (sel_safe % n_cols).astype(jnp.int32)
    i_idx = table.reshape(-1)[sel_safe]
    xi = jnp.where(sel_valid[:, None], x[jnp.maximum(i_idx, 0)], 0)
    gi = jnp.where(
        sel_valid[:, None], gout[jnp.minimum(o_idx, gout.shape[0] - 1)], 0
    )
    contrib = xi.astype(jnp.float32) * gi.astype(jnp.float32)
    k_scatter = jnp.where(sel_valid, k_idx, k)
    return dw.at[k_scatter].add(contrib.astype(dw.dtype), mode="drop")


def _chunked_scan(apply_fn, overflow, state, chunk):
    """Exact correction for any overflow count — the same chunked compaction
    ``while_loop`` as implicit_gemm's full scans, parameterized on apply."""
    flat_of = overflow.reshape(-1)
    pos = jnp.cumsum(flat_of.astype(jnp.int32)) - 1
    pos = jnp.where(flat_of, pos, -1)
    total = jnp.sum(flat_of.astype(jnp.int32))
    flat_ids = lax.broadcasted_iota(jnp.int32, flat_of.shape, 0)

    def body(carry):
        i, st = carry
        local = pos - i * chunk
        sel_mask = (local >= 0) & (local < chunk)
        sel = (
            jnp.full((chunk + 1,), -1, jnp.int32)
            .at[jnp.where(sel_mask, local, chunk)]
            .set(jnp.where(sel_mask, flat_ids, -1), mode="drop")[:chunk]
        )
        return i + 1, apply_fn(sel, st)

    def cond(carry):
        i, _ = carry
        return i * chunk < total

    _, state = lax.while_loop(cond, body, (jnp.int32(0), state))
    return state


def _residual_depth(apply_fn, plan: ConvPlan, state, chunk):
    def fast(st):
        return apply_fn(plan.of_list, st)

    def slow(st):
        return _chunked_scan(apply_fn, plan.overflow, st, chunk)

    def correct(st):
        return lax.cond(plan.of_count <= OF_CAP, fast, slow, st)

    return lax.cond(plan.of_count > 0, correct, lambda s: s, state)


# ---------------------------------------------------------------------------
# The Pallas kernels
# ---------------------------------------------------------------------------


def _depth_fwd_kernel(
    starts_ref,  # [G, Ts] SMEM
    delta_ref,  # [G*S, Ts] SMEM
    ovalid_ref,  # [K, Ts] SMEM
    x_hbm,  # [N_flat, Cp] ANY (HBM)
    xid_ref,  # [s*tile_m, Cp] VMEM identity block (dummy when unused)
    local_ref,  # [1, K, 1, s*tile_m] VMEM
    w_ref,  # [G, zg, Cp] VMEM (full resident)
    out_ref,  # [s*tile_m, Cp]
    win_ref,  # [2, Wu, Cp] double buffer
    sem,  # DMA sems [2]
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
):
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
        idv = local_ref[0, identity_k, 0, :][:, None] >= 0
        xid = jnp.where(idv, xid_ref[:], 0)
        acc_ref[:] = (
            xid.astype(jnp.float32)
            * w_ref[identity_k // zg, identity_k % zg].astype(jnp.float32)
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
                            )  # [zg, tile_m, Cp]
                            # per-channel FMA: w_ref[g] is [zg, Cp];
                            # broadcast over the row (sublane) dim.
                            part = a3 * w_ref[g].astype(jnp.float32)[
                                :, None, :
                            ]
                            acc_ref[lo:lo + tile_m, :] += part.sum(0)

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _depth_wgrad_kernel(
    starts_ref,  # [G, Ts] SMEM
    delta_ref,  # [G*S, Ts] SMEM
    ovalid_ref,  # [K, Ts] SMEM
    x_hbm,  # [N_flat, Cp] ANY (HBM)
    xid_ref,  # [s*tile_m, Cp] VMEM identity block
    local_ref,  # [1, K, 1, s*tile_m] VMEM
    g_ref,  # [s*tile_m, Cp] VMEM (this super-tile's dout block)
    out_ref,  # [K, 1, Cp] f32 — same block every grid step (resident)
    win_ref,  # [2, Wu, Cp]
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
        prod = xid.astype(jnp.float32) * g_ref[:].astype(jnp.float32)
        out_ref[identity_k] += prod.sum(0)[None, :]

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
                            )
                            a3 = jax.lax.dot_general(
                                onehot3, sub,
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [zg, tile_m, Cp]
                            gtile = g_ref[lo:lo + tile_m, :].astype(
                                jnp.float32
                            )
                            dw3 = (a3 * gtile[None]).sum(1)  # [zg, Cp]
                            out_ref[pl.ds(g * zg, zg)] += dw3[:, None, :]

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)


def _depth_bwd_fused_kernel(
    starts_ref,  # [G, Ts] SMEM (FORWARD plan)
    delta_ref,  # [G*S, Ts] SMEM
    ovalid_ref,  # [K, Ts] SMEM
    x_hbm,  # [N_flat, Cp] ANY
    g_hbm,  # [N_flat, Cp] ANY — same flattened row space (self-map)
    xid_ref,  # [s*tile_m, Cp] VMEM identity x block
    gt_ref,  # [s*tile_m, Cp] VMEM dout block (this super-tile)
    local_ref,  # [1, K, 1, s*tile_m] VMEM
    wrev_ref,  # [G, zg, Cp] VMEM: slot (g, z) holds w[K-1-(g*zg+z)]
    dx_ref,  # out [s*tile_m, Cp]
    dw_ref,  # out [K, 1, Cp] f32 resident
    win_ref,  # [2, Wu, 2*Cp]: x rows in lanes [0:Cp], g in [Cp:2Cp]
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
    """Fused depthwise backward for symmetric self-maps — the elementwise
    analog of :func:`implicit_gemm._igemm_bwd_fused_kernel`:

        dx[i] = sum_k g[table[k, i]] * w[K-1-k]   (free K-flip reverse)
        dw[k] = sum_i x[table[k, i]] * g[i]

    ONE one-hot gather of the channel-concatenated ``[x ‖ g]`` window feeds
    both accumulators."""
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
        prod = xid.astype(jnp.float32) * gt_ref[:].astype(jnp.float32)
        dw_ref[identity_k] += prod.sum(0)[None, :]
        # flip(ident) == ident for a symmetric enumeration.
        acc_ref[:] = (
            gtv.astype(jnp.float32)
            * wrev_ref[identity_k // zg, identity_k % zg].astype(jnp.float32)
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
                            )
                            a3 = jax.lax.dot_general(
                                onehot3, sub,
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [zg, tile_m, 2*Cp]: x rows ‖ g rows
                            a3x = a3[:, :, :cp]
                            a3g = a3[:, :, cp:]
                            gtile = gt_ref[lo:lo + tile_m, :].astype(
                                jnp.float32
                            )
                            dw3 = (a3x * gtile[None]).sum(1)  # [zg, Cp]
                            dw_ref[pl.ds(g * zg, zg)] += dw3[:, None, :]
                            dxp = a3g * wrev_ref[g].astype(jnp.float32)[
                                :, None, :
                            ]
                            acc_ref[lo:lo + tile_m, :] += dxp.sum(0)

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)
    dx_ref[:] = acc_ref[:].astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# Flattened-batch entry points
# ---------------------------------------------------------------------------


def depthwise_fma_fwd(
    x: jnp.ndarray,  # [B, N_in, C]
    weight: jnp.ndarray,  # [K, C]
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
    """Batched depthwise forward: ``out[b, o, c] = sum_k x[b, table[b, k, o],
    c] * weight[k, c]`` -> [B, N_out, C]. Also serves dgrad with the reverse
    table (``dx = depthwise_fma_fwd(g, w, rev)`` — the per-channel weight is
    its own transpose)."""
    b, n_in, c = x.shape
    k, n_out = table.shape[1], table.shape[2]
    if k % zg != 0:
        zg = 1
    wt, wu, align = _windows_of(tile_m, window_factor, s, 1)
    tile = tile_m * s
    ident = _identity_ok(identity_k, n_in, n_out, tile)

    if plan is None or not plan.matches(tile_m, wt, zg, 1, s, ident, parity):
        plan = make_plan(
            table, n_in, tile_m=tile_m, window_factor=window_factor,
            zg=zg, s=s, identity_k=ident, parity=parity,
        )
    tbl_flat = flatten_table(table, n_in, tile)
    m_flat = tbl_flat.shape[1]
    ts = m_flat // tile

    x, cp = _pad_channels(x)
    w_pad = jnp.pad(weight, ((0, 0), (0, cp - c)))
    x_flat = _flatten_x(x, wu, align=align)
    if ident >= 0:
        xid_spec = pl.BlockSpec((tile, cp), lambda i, *_: (i, 0))
    else:
        xid_spec = pl.BlockSpec((16, cp), lambda i, *_: (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ts,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            xid_spec,
            pl.BlockSpec((1, k, 1, tile), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights resident
        ],
        out_specs=pl.BlockSpec((tile, cp), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wu, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tile, cp), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _depth_fwd_kernel, num_groups=k // zg, zg=zg, tile_m=tile_m, s=s,
        wt=wt, wu=wu, align=align, identity_k=ident,
    )

    w3 = w_pad.reshape(k // zg, zg, cp)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_flat, cp), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(plan.starts, plan.delta, plan.ovalid, x_flat, x_flat, plan.local, w3)

    out = _residual_depth(
        lambda sel, o: _apply_depth_fwd_pairs(x_flat, w_pad, tbl_flat, sel, o),
        plan, out, residual_chunk,
    )
    mp = m_flat // b
    return out.reshape(b, mp, cp)[:, :n_out, :c]


def depthwise_fma_wgrad(
    x: jnp.ndarray,  # [B, N_in, C]
    g: jnp.ndarray,  # [B, N_out, C]
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
    """Depthwise wgrad: ``dw[k, c] = sum_{b,o} x[b, table[b,k,o], c] *
    g[b, o, c]`` -> [K, C] fp32 (the reference's ``implicit_reduction``)."""
    b, n_in, c = x.shape
    k, n_out = table.shape[1], table.shape[2]
    if k % zg != 0:
        zg = 1
    wt, wu, align = _windows_of(tile_m, window_factor, s, 1)
    tile = tile_m * s
    ident = _identity_ok(identity_k, n_in, n_out, tile)

    if plan is None or not plan.matches(tile_m, wt, zg, 1, s, ident, parity):
        plan = make_plan(
            table, n_in, tile_m=tile_m, window_factor=window_factor,
            zg=zg, s=s, identity_k=ident, parity=parity,
        )
    tbl_flat = flatten_table(table, n_in, tile)
    m_flat = tbl_flat.shape[1]
    ts = m_flat // tile
    mp = m_flat // b

    x, cp = _pad_channels(x)
    g, _ = _pad_channels(g)
    x_flat = _flatten_x(x, wu, align=align)
    g_pad = jnp.pad(g, ((0, 0), (0, mp - n_out), (0, 0))).reshape(m_flat, cp)
    if ident >= 0:
        xid_spec = pl.BlockSpec((tile, cp), lambda i, *_: (i, 0))
    else:
        xid_spec = pl.BlockSpec((16, cp), lambda i, *_: (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ts,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            xid_spec,
            pl.BlockSpec((1, k, 1, tile), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((tile, cp), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((k, 1, cp), lambda i, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wu, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _depth_wgrad_kernel, num_groups=k // zg, zg=zg, tile_m=tile_m, s=s,
        wt=wt, wu=wu, align=align, identity_k=ident,
    )

    dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 1, cp), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(plan.starts, plan.delta, plan.ovalid, x_flat, x_flat, plan.local,
      g_pad)[:, 0, :]

    dw = _residual_depth(
        lambda sel, d: _apply_depth_wgrad_pairs(
            x_flat, g_pad, tbl_flat, sel, d
        ),
        plan, dw, residual_chunk,
    )
    return dw[:, :c]


def depthwise_fma_bwd_fused(
    x: jnp.ndarray,  # [B, N, C]
    g: jnp.ndarray,  # [B, N, C]
    weight: jnp.ndarray,  # [K, C]
    table: jnp.ndarray,  # [B, K, N] symmetric self-map pair table
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
    """Fused depthwise dgrad+wgrad for a symmetric SELF-map (``rev ==
    table[:, ::-1]``, n_in == n_out): returns ``(dx [B, N, C], dw [K, C]
    fp32)`` from ONE kernel pass sharing window DMAs and one-hot gathers."""
    b, n_in, c = x.shape
    k, n_out = table.shape[1], table.shape[2]
    if k % zg != 0:
        zg = 1
    wt, wu, align = _windows_of(tile_m, window_factor, s, 1)
    tile = tile_m * s
    if n_in != n_out:
        raise ValueError(
            f"fused bwd requires a SELF-map (n_in={n_in} != n_out={n_out})"
        )
    ident = _identity_ok(identity_k, n_in, n_out, tile)

    if plan is None or not plan.matches(tile_m, wt, zg, 1, s, ident, 0):
        plan = make_plan(
            table, n_in, tile_m=tile_m, window_factor=window_factor,
            zg=zg, s=s, identity_k=ident,
        )
    tbl_flat = flatten_table(table, n_in, tile)
    m_flat = tbl_flat.shape[1]
    ts = m_flat // tile
    mp = m_flat // b

    x, cp = _pad_channels(x)
    g, _ = _pad_channels(g)
    w_pad = jnp.pad(weight, ((0, 0), (0, cp - c)))
    x_flat = _flatten_x(x, wu, align=align)
    g_flat = _flatten_x(g, wu, align=align)
    g_tile = jnp.pad(g, ((0, 0), (0, mp - n_out), (0, 0))).reshape(m_flat, cp)

    wrev3 = w_pad[::-1].reshape(k // zg, zg, cp)

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
            pl.BlockSpec((k, 1, cp), lambda i, *_: (0, 0, 0)),  # dw
        ],
        scratch_shapes=[
            pltpu.VMEM((2, wu, 2 * cp), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((tile, cp), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _depth_bwd_fused_kernel, num_groups=k // zg, zg=zg, tile_m=tile_m,
        s=s, wt=wt, wu=wu, align=align, identity_k=ident, cp=cp,
    )

    dx, dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m_flat, cp), x.dtype),
            jax.ShapeDtypeStruct((k, 1, cp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(plan.starts, plan.delta, plan.ovalid, x_flat, g_flat, x_flat,
      g_tile, plan.local, wrev3)
    dw = dw[:, 0, :]

    # Exact overflow corrections: wgrad over the forward plan; dgrad over
    # its free K-flip (dx == depthwise_fwd(g, w, rev), rev = table[:, ::-1]).
    dw = _residual_depth(
        lambda sel, d: _apply_depth_wgrad_pairs(
            x_flat, g_tile, tbl_flat, sel, d
        ),
        plan, dw, residual_chunk,
    )
    rev_flat = flatten_table(table[:, ::-1, :], n_in, tile)
    rplan = plan.flip_k()
    dx = _residual_depth(
        lambda sel, o: _apply_depth_fwd_pairs(
            g_flat, w_pad, rev_flat, sel, o
        ),
        rplan, dx, residual_chunk,
    )

    dx = dx.reshape(b, mp, cp)[:, :n_in, :c]
    return dx, dw[:, :c]
