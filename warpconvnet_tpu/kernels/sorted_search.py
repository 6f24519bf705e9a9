"""Pallas fused kernel-map probe — sorted-key exact-match search.

TPU-native replacement for the reference's fused hash-probe
(``csrc/cuhash_kernel_map.cu`` ``packed_kernel_map_size``: probe K offsets x
M queries against a GPU hash table). Here the "table" is the lex-sorted key
array and the probe exploits the same monotonicity as the implicit-GEMM
kernel: query row k (``stride * out + offset_k``) is sorted, so one query
tile touches a *contiguous window* of the key array.

Per query tile (8 tiles per grid step for TPU block-shape alignment):
  1. sequential DMA of the key window keys[:, start : start+W] (HBM->VMEM);
  2. rank = compare-reduce of the TQ queries against the window (VPU only,
     no gathers — the measured killer on this chip is gather row rate);
  3. hit iff an equal key exists; position = window start + rank.

Windows that would overflow W fall back to the XLA bucketed search
(:func:`warpconvnet_tpu.ops.keys.lookup_in_sorted`) for just those tiles'
queries, keeping the result exact for any input.

Batch handling mirrors ``kernels/implicit_gemm.py``: scenes are flattened
into one key axis with ``window``-sized IMAX guard gaps between scenes (so a
window that runs past a scene's end sees only non-matching sentinels, never a
coordinate that happens to exist in the next scene), and one ``pallas_call``
serves the whole batch — no per-scene Python loop, no vmapped ``lax.cond``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warpconvnet_tpu.ops.keys import (
    Keys,
    lookup_in_sorted,
    searchsorted_keys,
)

_IMAX = jnp.iinfo(jnp.int32).max
_IMIN = jnp.iinfo(jnp.int32).min
_TILES_PER_STEP = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _probe_kernel(
    starts_ref,  # [G] SMEM; -1 = tile needs the XLA fallback
    keys_hbm,  # [2, N_pad] ANY
    qh_ref,  # [1, 8, TQ] VMEM
    ql_ref,  # [1, 8, TQ] VMEM
    out_ref,  # [1, 8, TQ] VMEM int32
    win_ref,  # [2, 2, W] VMEM double buffer
    sem,  # DMA sems [2]
    *,
    window: int,
    tile_q: int,
):
    step = pl.program_id(0)

    def dma(j, slot):
        start = starts_ref[step * _TILES_PER_STEP + j]
        return pltpu.make_async_copy(
            keys_hbm.at[
                :, pl.ds(pl.multiple_of(jnp.maximum(start, 0), 128), window)
            ],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[step * _TILES_PER_STEP] >= 0)
    def _():
        dma(0, 0).start()

    def body(j, _):
        slot = lax.rem(j, 2)
        nxt = lax.rem(j + 1, 2)
        start = starts_ref[step * _TILES_PER_STEP + j]

        @pl.when(
            (j + 1 < _TILES_PER_STEP)
            & (starts_ref[step * _TILES_PER_STEP + j + 1] >= 0)
        )
        def _():
            dma(j + 1, nxt).start()

        @pl.when(start >= 0)
        def _():
            dma(j, slot).wait()
            qh = qh_ref[0, j, :][:, None]  # [TQ, 1]
            ql = ql_ref[0, j, :][:, None]
            wh = win_ref[slot, 0:1, :]  # [1, W]
            wl = win_ref[slot, 1:2, :]
            heq = wh == qh
            lt = (wh < qh) | (heq & (wl < ql))  # [TQ, W]
            eq = heq & (wl == ql)
            # Rank + hit reductions on the (otherwise idle) MXU: a bf16
            # ones-matmul replaces two VPU cross-lane sum reductions.
            ones = jnp.ones((window, 128), jnp.bfloat16)
            cnt = jax.lax.dot(
                lt.astype(jnp.bfloat16), ones,
                preferred_element_type=jnp.float32,
            )[:, 0].astype(jnp.int32)
            nhit = jax.lax.dot(
                eq.astype(jnp.bfloat16), ones,
                preferred_element_type=jnp.float32,
            )[:, 0]
            pos = jnp.where(nhit > 0, start + cnt, -1)
            out_ref[0, j, :] = jnp.where(qh[:, 0] == _IMAX, -1, pos)

        @pl.when(start == -1)
        def _():
            out_ref[0, j, :] = jnp.full((tile_q,), -2, jnp.int32)

        @pl.when(start == -3)
        def _():
            # Proven-empty span: every query misses; no DMA, no compares.
            out_ref[0, j, :] = jnp.full((tile_q,), -1, jnp.int32)

        return ()

    lax.fori_loop(0, _TILES_PER_STEP, body, (), unroll=False)


def _tile_monotone(qh2: jnp.ndarray, ql2: jnp.ndarray) -> jnp.ndarray:
    """[g] bool — tile queries are lexicographically non-decreasing.

    The probe's span logic assumes monotone tiles (first/last query bound the
    whole tile's matches, IMAX sentinels form a suffix). Sentinel insertion is
    a per-coordinate range check, NOT lexicographic, so a sentinel can land
    mid-row (e.g. y + dy out of range while x keeps growing) and break both
    assumptions; unsorted caller coords break them wholesale. Non-monotone
    tiles must take the exact XLA fallback."""
    inc = (qh2[:, 1:] > qh2[:, :-1]) | (
        (qh2[:, 1:] == qh2[:, :-1]) & (ql2[:, 1:] >= ql2[:, :-1])
    )
    return jnp.all(inc, axis=1)


def _tile_spans(
    keys: Keys,  # tuple of [N] sorted
    qh2: jnp.ndarray,  # [g, tile_q]
    ql2: jnp.ndarray,
    window: int,
) -> jnp.ndarray:
    """Per-tile window starts for one scene: binary search of each tile's
    first/last valid query, aligned down to 128 lanes; -1 when the span
    exceeds the window or the tile is not monotone (kernel emits the
    fallback marker)."""
    firsts = (qh2[:, 0], ql2[:, 0])
    # The span that matters ends at the last *valid* (non-IMAX) query — the
    # IMAX padding tail would otherwise blow the span up to n and trip the
    # fallback on every row-boundary tile. (In a monotone tile the IMAX
    # entries are guaranteed to be a suffix; non-monotone tiles fall back.)
    nvt = jnp.sum((qh2 != _IMAX).astype(jnp.int32), axis=1)  # [g]
    last_idx = jnp.maximum(nvt - 1, 0)[:, None]
    lasts = (
        jnp.take_along_axis(qh2, last_idx, axis=1)[:, 0],
        jnp.take_along_axis(ql2, last_idx, axis=1)[:, 0],
    )
    lo = searchsorted_keys(keys, firsts, side="left")
    hi = searchsorted_keys(keys, lasts, side="right")
    hi = jnp.where(nvt > 0, hi, lo)  # all-pad tiles: empty span
    starts = (lo & ~jnp.int32(127)).astype(jnp.int32)
    fits = ((hi - starts) <= window) & _tile_monotone(qh2, ql2)
    return jnp.where(fits, starts, -1)


def _probe_call(
    keys_flat: jnp.ndarray,  # [2, N_flat]
    starts: jnp.ndarray,  # [G]
    qh: jnp.ndarray,  # [G, tile_q]
    ql: jnp.ndarray,
    window: int,
    tile_q: int,
    interpret: bool,
) -> jnp.ndarray:
    g = qh.shape[0]
    steps = g // _TILES_PER_STEP
    out = pl.pallas_call(
        functools.partial(_probe_kernel, window=window, tile_q=tile_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, _TILES_PER_STEP, tile_q), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, _TILES_PER_STEP, tile_q), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, _TILES_PER_STEP, tile_q), lambda i, *_: (i, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 2, window), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((steps, _TILES_PER_STEP, tile_q), jnp.int32),
        interpret=interpret,
    )(
        starts,
        keys_flat,
        qh.reshape(steps, _TILES_PER_STEP, tile_q),
        ql.reshape(steps, _TILES_PER_STEP, tile_q),
    )
    return out.reshape(-1)


def sorted_probe_batched(
    sorted_keys: Keys,  # tuple of [B, N] int32 (lex-sorted per scene)
    query_keys: Keys,  # tuple of [B, Q] int32 (monotone per tile_q tile)
    *,
    tile_q: int = 256,
    window_factor: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact-match scene-local positions of queries in per-scene sorted keys.

    Returns [B, Q] int32: index into scene b's sorted key array, or -1.
    ``Q`` must be divisible by ``tile_q * _TILES_PER_STEP`` (callers pad
    query rows with IMAX). One pallas_call serves all scenes.
    """
    assert len(sorted_keys) == 2, "probe kernel is specialized to 2-key packs"
    b, n = sorted_keys[0].shape
    q = query_keys[0].shape[1]
    assert q % (tile_q * _TILES_PER_STEP) == 0, (q, tile_q)
    # +128 absorbs the lane-alignment round-down of window starts, so the
    # span check never trips purely on alignment.
    window = window_factor * tile_q + 128

    # Flatten scenes with IMAX guard gaps so windows never read a *matching*
    # key from the next scene.
    gap = window + 128
    n_pad = _round_up(n, 128)
    scene_stride = n_pad + gap
    keys_flat = jnp.stack(
        [
            jnp.pad(
                k, ((0, 0), (0, scene_stride - n)), constant_values=_IMAX
            ).reshape(-1)
            for k in sorted_keys
        ]
    )  # [2, B*scene_stride]

    g_scene = q // tile_q
    qh2 = query_keys[0].reshape(b, g_scene, tile_q)
    ql2 = query_keys[1].reshape(b, g_scene, tile_q)
    starts = jax.vmap(
        lambda kh, kl, a, bb: _tile_spans((kh, kl), a, bb, window)
    )(sorted_keys[0], sorted_keys[1], qh2, ql2)  # [B, g_scene]
    scene_base = (jnp.arange(b, dtype=jnp.int32) * scene_stride)[:, None]
    starts = jnp.where(starts >= 0, starts + scene_base, starts).reshape(-1)

    pos = _probe_call(
        keys_flat,
        starts,
        qh2.reshape(-1, tile_q),
        ql2.reshape(-1, tile_q),
        window,
        tile_q,
        interpret,
    ).reshape(b, q)
    # Back to scene-local positions.
    pos = jnp.where(pos >= 0, pos - jnp.arange(b, dtype=jnp.int32)[:, None] * scene_stride, pos)

    # Exact fallback for overflow tiles (marker -2): XLA bucketed search,
    # selected per element. Sits behind a cond — steady state with
    # well-behaved windows pays only the predicate. (lookup_in_sorted is
    # cond-free, so the vmap here is safe.)
    need = pos == -2

    def fallback(pos):
        fb = jax.vmap(lambda kh, kl, ah, al: lookup_in_sorted((kh, kl), (ah, al)))(
            sorted_keys[0], sorted_keys[1], query_keys[0], query_keys[1]
        )
        return jnp.where(need, fb, pos)

    return lax.cond(jnp.any(need), fallback, lambda p: p, pos)


def _probe_kernel_mz(
    starts_ref,  # [G] SMEM; -1 = tile needs the XLA fallback
    dymask_ref,  # [G] SMEM; bit yi = dy-subspan y_deltas[yi] non-empty
    keys_hbm,  # [2, N_pad] ANY
    qh_ref,  # [1, 8, TQ] VMEM
    ql_ref,  # [1, 8, TQ] VMEM
    out_ref,  # [1, NDY*NDZ, 8, TQ] VMEM int32
    win_ref,  # [2, 2, W] VMEM double buffer
    sem,  # DMA sems [2]
    *,
    window: int,
    tile_q: int,
    y_deltas: Tuple[int, ...],
    z_deltas: Tuple[int, ...],
):
    """Multi-(y, z) probe: ONE window DMA serves all (dy, dz) offsets of a
    dx kernel-offset block. Queries differ from the block base only by
    integer deltas on both keys: the low key carries raw z (``ql + dz``),
    and the hi key ``x * 65536 + (y + 32768)`` is LINEAR in y, so
    ``qh + dy`` is the exact hi key of the dy-shifted query whenever
    ``y + dy`` stays in the valid coordinate range (the caller post-masks
    out-of-range ``y + dy``, whose wrapped hi could alias a neighboring-x
    voxel). This is the TPU answer to the reference's hierarchical
    coarse->fine kernel map (``hierarchical_search.py:25-66``): instead of
    pruning fine probes with a coarse occupancy pass, the whole (dy, dz)
    fan-out of a dx block is folded into one probe — window DMAs and grid
    steps drop by ~|y_deltas| * |z_deltas| per offset.
    """
    step = pl.program_id(0)

    def dma(j, slot):
        start = starts_ref[step * _TILES_PER_STEP + j]
        return pltpu.make_async_copy(
            keys_hbm.at[
                :, pl.ds(pl.multiple_of(jnp.maximum(start, 0), 128), window)
            ],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[step * _TILES_PER_STEP] >= 0)
    def _():
        dma(0, 0).start()

    ones = jnp.ones((window, 128), jnp.bfloat16)

    def body(j, _):
        slot = lax.rem(j, 2)
        nxt = lax.rem(j + 1, 2)
        start = starts_ref[step * _TILES_PER_STEP + j]

        @pl.when(
            (j + 1 < _TILES_PER_STEP)
            & (starts_ref[step * _TILES_PER_STEP + j + 1] >= 0)
        )
        def _():
            dma(j + 1, nxt).start()

        @pl.when(start >= 0)
        def _():
            dma(j, slot).wait()
            dymask = dymask_ref[step * _TILES_PER_STEP + j]
            qh0 = qh_ref[0, j, :][:, None]  # [TQ, 1] block-base hi (dy = 0)
            ql0 = ql_ref[0, j, :][:, None]
            wh = win_ref[slot, 0:1, :]  # [1, W]
            wl = win_ref[slot, 1:2, :]
            pad_q = qh0[:, 0] == _IMAX

            def rank_of(lt):
                return jax.lax.dot(
                    lt.astype(jnp.bfloat16), ones,
                    preferred_element_type=jnp.float32,
                )[:, 0].astype(jnp.int32)

            def hits_of(eq):
                return jax.lax.dot(
                    eq.astype(jnp.bfloat16), ones,
                    preferred_element_type=jnp.float32,
                )[:, 0].astype(jnp.int32)

            order = sorted(range(len(z_deltas)), key=lambda i: z_deltas[i])
            consecutive = all(
                z_deltas[order[i + 1]] == z_deltas[order[i]] + 1
                for i in range(len(order) - 1)
            )
            zgn = len(z_deltas)
            order_y = sorted(range(len(y_deltas)), key=lambda i: y_deltas[i])
            y_consec = all(
                y_deltas[order_y[i + 1]] == y_deltas[order_y[i]] + 1
                for i in range(len(order_y) - 1)
            )
            ndy = len(y_deltas)

            def emit_z_chain(nhit3, cnt0, slot_base):
                """Emit one dy's per-dz rows from the integer rank chain
                cnt(dz+1) = cnt(dz) + nhit(dz); nhit3 is the batched
                [zg*TQ] hit-count vector in ``order``-sorted dz order."""
                cnt = cnt0
                for ci, oz in enumerate(order):
                    nhit = nhit3[ci * tile_q:(ci + 1) * tile_q]
                    pos = jnp.where(nhit > 0, start + cnt, -1)
                    out_ref[0, slot_base + oz, j, :] = jnp.where(
                        pad_q, -1, pos
                    )
                    cnt = cnt + nhit

            if consecutive and y_consec and ndy > 1:
                # dy-batched path (the large-K win, 5^3/7^3): extend the
                # z integer-chain across dy. rank(dy+1, dz_min) =
                # rank(dy, dz_min) - #(hi==qh+dy & lo<ql+dz_min)
                #                  + #(hi==qh+dy) + #(hi==qh+dy+1 & lo<ql+dz_min),
                # so ONE batched [ndy*TQ, W] hi-eq compare + two batched
                # ones-matmuls replace the per-dy hlt/heq/rank chain (the
                # kernel is op-issue-bound; FLOPs are unchanged but the
                # dependent-op chain per dx block shrinks ~2x at K=125).
                dz0 = z_deltas[order[0]]
                dy0 = y_deltas[order_y[0]]
                dyv = dy0 + lax.broadcasted_iota(jnp.int32, (ndy, 1, 1), 0)
                heq3 = wh[None, :, :] == qh0[None, :, :] + dyv  # [ndy,TQ,W]
                eqc = jax.lax.dot(
                    heq3.reshape(ndy * tile_q, -1).astype(jnp.bfloat16),
                    ones, preferred_element_type=jnp.float32,
                )[:, 0].astype(jnp.int32)  # [ndy*TQ] #(hi == qh+dy)
                ltz3 = heq3 & (wl < ql0 + dz0)[None]
                ltzc = jax.lax.dot(
                    ltz3.reshape(ndy * tile_q, -1).astype(jnp.bfloat16),
                    ones, preferred_element_type=jnp.float32,
                )[:, 0].astype(jnp.int32)  # [ndy*TQ] #(hi==qh+dy & lo<ql+dz_min)
                run = rank_of(wh < qh0 + dy0)  # [TQ] #(hi < qh+dy_min)
                dzv = dz0 + lax.broadcasted_iota(jnp.int32, (zgn, 1, 1), 0)
                lo_eq3 = wl[None, :, :] == ql0[None, :, :] + dzv  # [zg,TQ,W]
                # Per-dy z-batched hit counts (a joint 4-D (dy, dz) batch is
                # a measured dead end: Mosaic lowers the [c, zg, TQ, W]
                # broadcast through an unsupported >2D gather).
                for cy in range(ndy):
                    oy = order_y[cy]

                    # Occupancy prune: skip the [zg*TQ, W] compare + matmul
                    # for dy rows whose key subspan is empty (coarse->fine
                    # analog; the rank bookkeeping run/eqc stays batched).
                    @pl.when(((dymask >> oy) & 1) == 1)
                    def _(cy=cy, oy=oy, run=run):
                        eq3 = heq3[cy] & lo_eq3  # [zg, TQ, W]
                        nhit3 = jax.lax.dot(
                            eq3.reshape(zgn * tile_q, -1).astype(jnp.bfloat16),
                            ones, preferred_element_type=jnp.float32,
                        )[:, 0].astype(jnp.int32)
                        emit_z_chain(
                            nhit3,
                            run + ltzc[cy * tile_q:(cy + 1) * tile_q],
                            oy * zgn,
                        )

                    @pl.when(((dymask >> oy) & 1) == 0)
                    def _(oy=oy):
                        for zi in range(zgn):
                            out_ref[0, oy * zgn + zi, j, :] = jnp.full(
                                (tile_q,), -1, jnp.int32
                            )

                    run = run + eqc[cy * tile_q:(cy + 1) * tile_q]
            else:
                for yi, dy in enumerate(y_deltas):
                    @pl.when(((dymask >> yi) & 1) == 0)
                    def _(yi=yi):
                        for zi in range(zgn):
                            out_ref[0, yi * zgn + zi, j, :] = jnp.full(
                                (tile_q,), -1, jnp.int32
                            )

                    occupied = ((dymask >> yi) & 1) == 1
                    qh = qh0 + dy
                    hlt = wh < qh  # shared across dz
                    heq = wh == qh
                    if consecutive:
                        # Integer-chain: cnt(dz+1) = cnt(dz) + #(heq & wl ==
                        # ql+dz), so only ONE lt compare/matmul (at dz_min) is
                        # needed. The per-dz hit counts are BATCHED into one
                        # [zg*TQ, W] compare + one ones-matmul (the kernel is
                        # issue-bound, not FLOP-bound — same lesson as the
                        # igemm v4 batching); only the [TQ]-sized chain
                        # accumulation stays per-dz.
                        @pl.when(occupied)
                        def _(yi=yi, hlt=hlt, heq=heq):
                            dz0 = z_deltas[order[0]]
                            cnt = rank_of(hlt | (heq & (wl < ql0 + dz0)))
                            # Consecutive deltas: dz of chain slot ci is
                            # dz0 + ci — build the delta vector with an iota
                            # (a jnp constant would be a captured array,
                            # which pallas kernels reject).
                            dzv = dz0 + lax.broadcasted_iota(
                                jnp.int32, (zgn, 1, 1), 0
                            )
                            eq3 = heq[None, :, :] & (
                                wl[None, :, :] == ql0[None, :, :] + dzv
                            )  # [zg, TQ, W]
                            nhit3 = jax.lax.dot(
                                eq3.reshape(zgn * tile_q, -1).astype(jnp.bfloat16),
                                ones,
                                preferred_element_type=jnp.float32,
                            )[:, 0].astype(jnp.int32)  # [zg*TQ]
                            emit_z_chain(nhit3, cnt, yi * zgn)
                    else:
                        @pl.when(occupied)
                        def _(yi=yi, hlt=hlt, heq=heq):
                            for zi, dz in enumerate(z_deltas):
                                ql = ql0 + dz
                                cnt = rank_of(hlt | (heq & (wl < ql)))
                                nhit = hits_of(heq & (wl == ql))
                                pos = jnp.where(nhit > 0, start + cnt, -1)
                                out_ref[0, yi * zgn + zi, j, :] = jnp.where(
                                    pad_q, -1, pos
                                )

        n_all = len(y_deltas) * len(z_deltas)

        @pl.when(start == -1)
        def _():
            for gi in range(n_all):
                out_ref[0, gi, j, :] = jnp.full((tile_q,), -2, jnp.int32)

        @pl.when(start == -3)
        def _():
            for gi in range(n_all):
                out_ref[0, gi, j, :] = jnp.full((tile_q,), -1, jnp.int32)

        return ()

    lax.fori_loop(0, _TILES_PER_STEP, body, (), unroll=False)


def sorted_probe_batched_mz(
    sorted_keys: Keys,  # tuple of [B, N] int32 (lex-sorted per scene)
    qh: jnp.ndarray,  # [B, Q] int32 block-base hi keys (monotone per tile)
    ql: jnp.ndarray,  # [B, Q] int32 base low keys (raw z)
    z_deltas: Tuple[int, ...],
    *,
    y_deltas: Tuple[int, ...] = (0,),
    tile_q: int = 256,
    window_factor: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-(y, z) batched probe. Returns [B, NDY*NDZ, Q] scene-local
    positions (slot yi * NDZ + zi = query (qh + y_deltas[yi], ql +
    z_deltas[zi])); -1 = no match. Fallback (-2 marker) tiles are resolved
    by the XLA bucketed search per (dy, dz).

    Exactness contract for ``y_deltas != (0,)``: ``qh + dy`` equals the hi
    key of the dy-shifted coordinate only while ``y + dy`` stays inside the
    valid range; out-of-range ``y + dy`` wraps into a neighboring-x hi and
    can FALSELY match. Callers must mask those slots (see
    ``ops/kernel_map.py`` ``_y_delta_valid``)."""
    assert len(sorted_keys) == 2
    b, n = sorted_keys[0].shape
    q = qh.shape[1]
    zgn = len(z_deltas)
    n_all = len(y_deltas) * zgn
    assert q % (tile_q * _TILES_PER_STEP) == 0, (q, tile_q)
    dz_min, dz_max = min(z_deltas), max(z_deltas)
    dy_min, dy_max = min(y_deltas), max(y_deltas)
    window = window_factor * tile_q + 128

    gap = window + 128
    n_pad = _round_up(n, 128)
    scene_stride = n_pad + gap
    keys_flat = jnp.stack(
        [
            jnp.pad(
                k, ((0, 0), (0, scene_stride - n)), constant_values=_IMAX
            ).reshape(-1)
            for k in sorted_keys
        ]
    )

    g_scene = q // tile_q
    qh2 = qh.reshape(b, g_scene, tile_q)
    ql2 = ql.reshape(b, g_scene, tile_q)

    def spans(kh, kl, qh2b, ql2b):
        # Span covering all deltas: [first + (dy_min, dz_min),
        # last + (dy_max, dz_max)] (qh is monotone per tile, so the
        # delta-shifted extremes of the first/last valid queries bound
        # every (dy, dz) shift of every query in the tile).
        nvt = jnp.sum((qh2b != _IMAX).astype(jnp.int32), axis=1)
        last_idx = jnp.maximum(nvt - 1, 0)[:, None]
        first_h, first_l = qh2b[:, 0], ql2b[:, 0]
        last_h = jnp.take_along_axis(qh2b, last_idx, axis=1)[:, 0]
        last_l = jnp.take_along_axis(ql2b, last_idx, axis=1)[:, 0]
        firsts = (first_h + dy_min, first_l + dz_min)
        lasts = (last_h + dy_max, last_l + dz_max)
        lo = searchsorted_keys((kh, kl), firsts, side="left")
        hi = searchsorted_keys((kh, kl), lasts, side="right")
        hi = jnp.where(nvt > 0, hi, lo)
        starts = (lo & ~jnp.int32(127)).astype(jnp.int32)
        mono = _tile_monotone(qh2b, ql2b)
        # An IMIN (below-range) sentinel leading a monotone tile wraps
        # under the `+ dz_min`/`+ dy_min` arithmetic above (IMIN - 1 ->
        # near IMAX), which would mark a tile holding REAL queries as
        # empty. Route such tiles to the exact fallback instead.
        has_imin = qh2b[:, 0] == _IMIN
        mono = mono & ~has_imin
        fits = ((hi - starts) <= window) & mono
        # Per-dy occupancy bitmask (the sorted-key analog of the reference's
        # coarse->fine occupancy pruning, ``hierarchical_search.py:25-66``):
        # bit yi set iff the dy-subspan [first + (dy, dz_min),
        # last + (dy, dz_max)] is non-empty. One searchsorted pair per
        # (tile, dy) lets the kernel skip the whole per-dy compare/matmul
        # chain for empty y-rows — on surface-like scenes most of a 5^3/7^3
        # block's y-rows see no voxels at all.
        ndy_l = len(y_deltas)
        dyv = jnp.asarray(y_deltas, jnp.int32)[:, None]  # [NDY, 1]
        lo_y = searchsorted_keys(
            (kh, kl),
            ((first_h[None] + dyv).reshape(-1),
             jnp.broadcast_to(first_l + dz_min, (ndy_l, first_l.shape[0])).reshape(-1)),
            side="left",
        ).reshape(ndy_l, -1)
        hi_y = searchsorted_keys(
            (kh, kl),
            ((last_h[None] + dyv).reshape(-1),
             jnp.broadcast_to(last_l + dz_max, (ndy_l, last_l.shape[0])).reshape(-1)),
            side="right",
        ).reshape(ndy_l, -1)
        occ = (hi_y > lo_y).astype(jnp.int32)  # [NDY, G]
        bits = (1 << jnp.arange(ndy_l, dtype=jnp.int32))[:, None]
        mask = jnp.sum(occ * bits, axis=0).astype(jnp.int32)  # [G]
        # Empty delta-extended span (or all dy-subspans empty) on a monotone
        # tile: no (dy, dz) of the block can match anything -> definitive
        # -1, no DMA (-3).
        empty = ((hi <= lo) | (mask == 0)) & mono
        return jnp.where(empty, -3, jnp.where(fits, starts, -1)), mask

    starts, dymask = jax.vmap(spans)(sorted_keys[0], sorted_keys[1], qh2, ql2)
    dymask = dymask.reshape(-1)
    scene_base = (jnp.arange(b, dtype=jnp.int32) * scene_stride)[:, None]
    starts = jnp.where(starts >= 0, starts + scene_base, starts).reshape(-1)

    g = b * g_scene
    steps = g // _TILES_PER_STEP
    out = pl.pallas_call(
        functools.partial(
            _probe_kernel_mz, window=window, tile_q=tile_q,
            y_deltas=tuple(int(d) for d in y_deltas),
            z_deltas=tuple(int(d) for d in z_deltas),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, _TILES_PER_STEP, tile_q), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, _TILES_PER_STEP, tile_q), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, n_all, _TILES_PER_STEP, tile_q), lambda i, *_: (i, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 2, window), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (steps, n_all, _TILES_PER_STEP, tile_q), jnp.int32
        ),
        interpret=interpret,
    )(
        starts,
        dymask,
        keys_flat,
        qh2.reshape(steps, _TILES_PER_STEP, tile_q),
        ql2.reshape(steps, _TILES_PER_STEP, tile_q),
    )
    # [steps, NDY*NDZ, 8, TQ] -> [B, NDY*NDZ, Q]
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(n_all, b, q)
    out = jnp.transpose(out, (1, 0, 2))
    out = jnp.where(
        out >= 0,
        out - (jnp.arange(b, dtype=jnp.int32) * scene_stride)[:, None, None],
        out,
    )

    need = out == -2

    def fallback(out):
        def one(kh, kl, ah, al):
            res = []
            for dy in y_deltas:
                for dz in z_deltas:
                    res.append(lookup_in_sorted((kh, kl), (ah + dy, al + dz)))
            return jnp.stack(res)

        fb = jax.vmap(one)(sorted_keys[0], sorted_keys[1], qh, ql)
        return jnp.where(need, fb, out)

    return lax.cond(jnp.any(need), fallback, lambda p: p, out)


def sorted_probe(
    sorted_keys: Keys,
    query_keys: Keys,
    *,
    tile_q: int = 256,
    window_factor: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-scene probe: positions of queries in sorted 2-key arrays.

    ``query_keys``: tuple of [Q] int32, **monotone per ``tile_q`` tile**
    (holds when Q = K x M with each offset row monotone and
    M % tile_q == 0). Returns [Q] int32 position or -1.
    """
    q = query_keys[0].shape[0]
    q_pad = _round_up(q, tile_q * _TILES_PER_STEP)
    qk = tuple(
        jnp.pad(x, (0, q_pad - q), constant_values=_IMAX)[None]
        for x in query_keys
    )
    sk = tuple(k[None] for k in sorted_keys)
    return sorted_probe_batched(
        sk, qk, tile_q=tile_q, window_factor=window_factor, interpret=interpret
    )[0, :q]
