"""z-grouped DMA igemm vs ungrouped, on the real chip at bench shapes."""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene

from warpconvnet_tpu import constants

constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_fwd,
    implicit_gemm_wgrad,
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
    print(f"{name:58s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    b, n_cap = 2, 1 << 17
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = make_surface_scene(rng, n_cap)
        nv[i] = len(c)
        coords[i, : len(c)] = c
    vox = Voxels.create(coords, np.zeros((b, n_cap, 1), np.float32), nv).lex_sort()
    print("devices:", jax.devices(), flush=True)

    offsets = kernel_offsets(3)
    bpt = jax.jit(
        lambda v: build_batched_pair_table(
            v.coords, v.num_valid, v.coords, v.num_valid, offsets,
            self_map=True, assume_sorted=True,
        )
    )(vox)
    tbl = jnp.asarray(jax.device_get(bpt.table))

    cin = cout = 128
    x = jnp.asarray(rng.standard_normal((b, n_cap, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, n_cap, cout)), jnp.bfloat16)

    for zg, wf, tm in [(3, 2, 256), (3, 1.5, 256), (3, 1.25, 256), (9, 1.5, 256)]:
        plan = jax.jit(
            lambda t: make_plan(t, n_cap, tile_m=tm, window_factor=wf, zg=zg)
        )(tbl)
        ovf = int(jnp.sum(plan.overflow))
        timeit(
            f"igemm fwd C128 tile{tm} wf{wf} zg{zg} (ovf={ovf})",
            jax.jit(lambda x, w, t, p: implicit_gemm_fwd(
                x, w, t, p, tile_m=tm, window_factor=wf, zg=zg).sum()),
            x, w, tbl, plan,
        )
    plan = jax.jit(
        lambda t: make_plan(t, n_cap, tile_m=256, window_factor=2, zg=3)
    )(tbl)
    timeit(
        "igemm wgrad C128 tile256 wf2 zg3",
        jax.jit(lambda x, g, t, p: implicit_gemm_wgrad(
            x, g, t, p, tile_m=256, window_factor=2, zg=3).sum()),
        x, g, tbl, plan,
    )


if __name__ == "__main__":
    main()
