"""Ablate the igemm kernel on the real chip: full kernel vs no-onehot
(contiguous slice instead of gather) vs no-compute (DMA+loop only) vs
matmul-only (no DMA wait). Identifies the true bottleneck."""

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

constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    flatten_table, make_plan, _flatten_x, _pad_channels, _round_up,
)
from warpconvnet_tpu.nn.functional.sparse_conv import build_batched_pair_table
from warpconvnet_tpu.ops.kernel_map import kernel_offsets
from warpconvnet_tpu.ops.keys import PAD_COORD

TILE = 256
WINDOW = 512
K = 27


def kernel(starts_ref, ovalid_ref, x_hbm, local_ref, w_ref, out_ref,
           win_ref, sem, acc_ref, *, variant):
    t = pl.program_id(0)

    def dma(k, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(jnp.maximum(starts_ref[k, t], 0), 16), WINDOW), :],
            win_ref.at[slot], sem.at[slot])

    @pl.when(starts_ref[0, t] >= 0)
    def _():
        dma(0, 0).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    iota_w = lax.broadcasted_iota(jnp.int32, (TILE, WINDOW), 1)

    def body(k, _):
        slot = lax.rem(k, 2)
        nxt = lax.rem(k + 1, 2)

        @pl.when((k + 1 < K) & (starts_ref[k + 1, t] >= 0))
        def _():
            dma(k + 1, nxt).start()

        @pl.when(starts_ref[k, t] >= 0)
        def _():
            dma(k, slot).wait()
            if variant == "dma_only":
                acc_ref[0:1, 0:1] += win_ref[slot, 0:1, 0:1].astype(jnp.float32)
                return
            idx = local_ref[0, k, :]
            if variant == "no_onehot":
                a32 = win_ref[slot, :TILE, :]
                acc_ref[:] += jax.lax.dot(
                    a32.astype(w_ref.dtype), w_ref[k],
                    preferred_element_type=jnp.float32)
                return
            if variant == "onehot_only":
                onehot = (idx[:, None] == iota_w).astype(win_ref.dtype)
                acc_ref[:, :1] += jnp.sum(
                    onehot, axis=1, keepdims=True).astype(jnp.float32)
                return
            onehot = (idx[:, None] == iota_w).astype(win_ref.dtype)
            a = jax.lax.dot(onehot, win_ref[slot],
                            preferred_element_type=jnp.float32)
            acc_ref[:] += jax.lax.dot(
                a.astype(w_ref.dtype), w_ref[k],
                preferred_element_type=jnp.float32)

        return ()

    lax.fori_loop(0, K, body, (), unroll=False)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def run(variant, starts, ovalid, x_flat, local, w, m_flat, c):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(m_flat // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, K, TILE), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, WINDOW, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((TILE, c), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_flat, c), jnp.bfloat16),
    )(starts, ovalid, x_flat, local, w)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    b, n_cap = 2, 1 << 17
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        cc = make_surface_scene(rng, n_cap)
        nv[i] = len(cc)
        coords[i, : len(cc)] = cc
    vox = Voxels.create(coords, np.zeros((b, n_cap, 1), np.float32), nv).lex_sort()
    print("devices:", jax.devices(), flush=True)

    offsets = kernel_offsets(3)
    bpt = jax.jit(lambda v: build_batched_pair_table(
        v.coords, v.num_valid, v.coords, v.num_valid, offsets,
        self_map=True, assume_sorted=True))(vox)
    tbl = jnp.asarray(jax.device_get(bpt.table))

    c = 128
    x = jnp.asarray(rng.standard_normal((b, n_cap, c)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, c, c)) * 0.05, jnp.bfloat16)
    plan = jax.jit(lambda t: make_plan(t, n_cap, tile_m=TILE, window_factor=2))(tbl)
    tf = flatten_table(tbl, n_cap, TILE)
    m_flat = tf.shape[1]
    x_flat = _flatten_x(x, WINDOW)
    starts, ovalid, local = (jnp.asarray(jax.device_get(v))
                             for v in (plan.starts, plan.ovalid, plan.local))

    for variant in ["full", "no_onehot", "onehot_only", "dma_only"]:
        fn = jax.jit(
            lambda s, o, xf, l, ww, v=variant: run(
                v, s, o, xf, l, ww, m_flat, c
            ).astype(jnp.float32).sum()
        )
        timeit(f"igemm variant={variant}", fn, starts, ovalid, x_flat, local, w)


if __name__ == "__main__":
    main()
