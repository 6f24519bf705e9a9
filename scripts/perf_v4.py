"""igemm v4 experiments on the real chip.

Hypothesis (from perf_v3 + packed-C32 evidence): the kernel is bound by the
count of small dependent ops per (sub-tile, offset), not gather FLOPs
(C32 with 5x fewer FLOPs runs at C128 speed; s=4 didn't move C32).

Variants (all exact, all reuse the production ConvPlan):
  loop  — production v3 inner loop, but local table in [K, Ts, tile] layout
          (K on an untiled dim: legal dynamic indexing at ANY tile_m).
  batch — one [zg*tile, wt] gather matmul + one zg-BATCHED weight matmul +
          one dz-sum per (group, sub-tile): ~6 ops instead of ~15 for zg=3.
  t128  — loop variant at tile_m=128 (gather FLOPs halve; tests whether
          FLOPs or op-count dominates).
"""

import functools
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene

from warpconvnet_tpu import constants

constants.set_compute_dtype("bfloat16")
constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    _flatten_x,
    _pad_channels,
    _windows_of,
    flatten_table,
    make_plan,
)
from warpconvnet_tpu.nn.functional.sparse_conv import build_batched_pair_table
from warpconvnet_tpu.ops.kernel_map import kernel_offsets
from warpconvnet_tpu.ops.keys import PAD_COORD


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:56s} {ms:8.2f} ms", flush=True)
    return ms


def _kernel_v4(
    starts_ref,  # [G, Ts] SMEM
    delta_ref,  # [G*S, Ts] SMEM
    ovalid_ref,  # [K, Ts] SMEM
    x_hbm,  # [N_flat, C_in] ANY
    local_ref,  # [1, K, 1, s*tile_m] VMEM  (K untiled -> dynamic ok)
    w_ref,  # [G, zg, C_in, C_out] VMEM
    out_ref,  # [s*tile_m, C_out] VMEM
    win_ref,
    sem,
    acc_ref,
    *,
    num_groups,
    zg,
    tile_m,
    s,
    wt,
    wu,
    align,
    mode,  # "loop" | "batch"
):
    t = pl.program_id(0)

    def dma(g, slot):
        return pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(pl.multiple_of(jnp.maximum(starts_ref[g, t], 0), align), wu),
                :,
            ],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(starts_ref[0, t] >= 0)
    def _():
        dma(0, 0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    iota_wt = lax.broadcasted_iota(jnp.int32, (tile_m, wt), 1)

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
                            if mode == "loop":
                                for dz in range(zg):
                                    k = g * zg + dz

                                    @pl.when(ovalid_ref[k, t] > 0)
                                    def _(k=k, dz=dz, sub=sub, lo=lo):
                                        idx = local_ref[0, k, 0, lo:lo + tile_m]
                                        onehot = (
                                            idx[:, None] == iota_wt
                                        ).astype(win_ref.dtype)
                                        a = jax.lax.dot(
                                            onehot, sub,
                                            preferred_element_type=jnp.float32,
                                        )
                                        acc_ref[lo:lo + tile_m, :] += (
                                            jax.lax.dot(
                                                a.astype(w_ref.dtype),
                                                w_ref[g, dz],
                                                preferred_element_type=jnp.float32,
                                            )
                                        )
                            else:  # batch
                                idxs = local_ref[
                                    0:1, pl.ds(g * zg, zg), 0:1,
                                    lo:lo + tile_m,
                                ].reshape(zg, tile_m)
                                onehot3 = (
                                    idxs[:, :, None]
                                    == lax.broadcasted_iota(
                                        jnp.int32, (1, 1, wt), 2
                                    )
                                ).astype(win_ref.dtype)  # [zg, tile, wt]
                                a3 = jax.lax.dot_general(
                                    onehot3, sub,
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )  # [zg, tile, C_in]
                                part = jax.lax.dot_general(
                                    a3.astype(w_ref.dtype), w_ref[g],
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32,
                                )  # [zg, tile, C_out]
                                acc_ref[lo:lo + tile_m, :] += part.sum(0)

        return ()

    lax.fori_loop(0, num_groups, body, (), unroll=False)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def igemm_v4(x, weight, table, *, tile_m, window_factor, zg, s, mode,
             interpret=False):
    b, n_in, c_in = x.shape
    k, n_out = table.shape[1], table.shape[2]
    c_out = weight.shape[-1]
    wt, wu, align = _windows_of(tile_m, window_factor, s, 1)
    tile = tile_m * s
    plan = make_plan(
        table, n_in, tile_m=tile_m, window_factor=window_factor, zg=zg, s=s,
    )
    tbl_flat = flatten_table(table, n_in, tile)
    m_flat = tbl_flat.shape[1]
    ts = m_flat // tile
    g = k // zg

    x, c_in_pad = _pad_channels(x)
    weight, _ = _pad_channels(jnp.swapaxes(weight, 1, 2))
    weight = jnp.swapaxes(weight, 1, 2)
    weight, c_out_pad = _pad_channels(weight)
    w4 = weight.reshape(g, zg, c_in_pad, c_out_pad)

    x_flat = _flatten_x(x, wu, align=align)
    local_t = plan.local  # [Ts, K, 1, tile] canonical layout

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ts,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k, 1, tile), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c_out_pad), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wu, c_in_pad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tile, c_out_pad), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_v4, num_groups=g, zg=zg, tile_m=tile_m, s=s, wt=wt, wu=wu,
        align=align, mode=mode,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_flat, c_out_pad), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(plan.starts, plan.delta, plan.ovalid, x_flat, local_t, w4)
    mp = m_flat // b
    return out.reshape(b, mp, c_out_pad)[:, :n_out, :c_out], plan


def main():
    rng = np.random.default_rng(0)
    b, n_cap = 2, 1 << 17
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = make_surface_scene(rng, n_cap)
        nv[i] = len(c)
        coords[i, : len(c)] = c
    vox = Voxels.create(
        coords, np.zeros((b, n_cap, 1), np.float32), nv
    ).lex_sort()
    print("devices:", jax.devices(), flush=True)

    offsets = kernel_offsets(3)

    @jax.jit
    def table_of(v):
        return build_batched_pair_table(
            v.coords, v.num_valid, v.coords, v.num_valid, offsets,
            self_map=True, assume_sorted=True,
        )

    bpt = table_of(vox)
    tbl = jnp.asarray(jax.device_get(bpt.table))

    for cch in (128, 32):
        x = jnp.asarray(rng.standard_normal((b, n_cap, cch)), jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((27, cch, cch)) * 0.05, jnp.bfloat16
        )
        cfgs = [
            ("batch t256 wf1.5  s4", 256, 1.5, 4, "batch"),
            ("batch t256 wf1.25 s4", 256, 1.25, 4, "batch"),
            ("batch t128 wf1.5  s8", 128, 1.5, 8, "batch"),
        ]
        for tag, tm, wf, s, mode in cfgs:
            try:
                fn = jax.jit(
                    lambda x, w, t, tm=tm, wf=wf, s=s, mode=mode: igemm_v4(
                        x, w, t, tile_m=tm, window_factor=wf, zg=3, s=s,
                        mode=mode,
                    )[0].astype(jnp.float32).sum()
                )
                timeit(f"fwd C{cch} {tag}", fn, x, w, tbl)
            except Exception as e:
                print(f"fwd C{cch} {tag} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
