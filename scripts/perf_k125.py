"""Large-kernel (K=125) plan cost vs 3^3 — evidence for the multi-z probe's
hierarchical-map claim (VERDICT round 1 done-criterion: 5^3 plan <= 2x the
3^3 plan; naive scaling would be 125/27 = 4.6x)."""

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
from warpconvnet_tpu.nn.functional.sparse_conv import build_batched_pair_table
from warpconvnet_tpu.ops.kernel_map import kernel_offsets
from warpconvnet_tpu.ops.keys import PAD_COORD


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


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

    times = {}
    for ks in (3, 5, 7):
        offsets = kernel_offsets(ks)

        def submap(v, offsets=offsets):
            t = build_batched_pair_table(
                v.coords, v.num_valid, v.coords, v.num_valid, offsets,
                self_map=True, assume_sorted=True,
            )
            return t.table.sum()

        times[ks] = timeit(
            f"submanifold {ks}^3 map (K={ks**3}, mz probe)",
            jax.jit(submap), vox,
        )
    print(f"5^3 / 3^3 plan ratio: {times[5] / times[3]:.2f} (naive "
          f"K-scaling {125/27:.2f})", flush=True)
    print(f"7^3 / 3^3 plan ratio: {times[7] / times[3]:.2f} (naive "
          f"K-scaling {343/27:.2f})", flush=True)


if __name__ == "__main__":
    main()
