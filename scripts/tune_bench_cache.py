"""Pre-populate the autotune cache for bench.py's exact shape bins on REAL
kernel maps at every MinkUNet18 level (VERDICT r2 item 3: "commit a
pre-populated cache for bench.py's shape bins so the headline number
reflects tuned winners"). Run on the chip; writes the cache to the
directory given by WARPCONVNET_TPU_BENCHMARK_CACHE_DIR (point it at data/ to commit).

Usage:
  WARPCONVNET_TPU_BENCHMARK_CACHE_DIR=data python scripts/tune_bench_cache.py
"""

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

constants.set_compute_dtype("bfloat16")

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.autotune import pre_autotune_voxels
from warpconvnet_tpu.nn.functional.sparse_pool import sparse_max_pool
from warpconvnet_tpu.ops.keys import PAD_COORD
from warpconvnet_tpu.utils.benchmark_cache import get_benchmark_cache


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

    # MinkUNet18 GEMM shapes per level (planes 32/64/128/256 enc,
    # 256/128/96/96 dec; capacities halve per level).
    # (level_vox, [(c_in, c_out, ks, stride), ...])
    levels = [vox]
    for _ in range(4):
        pooled, _ = sparse_max_pool(levels[-1], 2)
        levels.append(pooled.replace(features=jnp.zeros(
            (b, pooled.max_num_points, 1), jnp.float32)))

    specs = [
        # L1 (full res): stem/stage1 submanifold + down ks2 + decoder 96s
        (0, [(32, 32, 3, 1), (96, 96, 3, 1), (32, 64, 2, 2)]),
        (1, [(64, 64, 3, 1), (96, 96, 3, 1), (64, 128, 2, 2)]),
        (2, [(128, 128, 3, 1), (128, 256, 2, 2)]),
        (3, [(256, 256, 3, 1), (256, 256, 2, 2)]),
        (4, [(256, 256, 3, 1)]),
    ]
    t0 = time.perf_counter()
    for li, cs in specs:
        print(f"-- level {li} ({int(np.asarray(levels[li].num_valid).sum())} "
              f"voxels): {cs}", flush=True)
        pre_autotune_voxels(levels[li], cs, skip_cached=True)
    print(f"total tune wall: {time.perf_counter() - t0:.0f}s", flush=True)

    cache = get_benchmark_cache()
    for ns, entries in cache._data.items():  # noqa: SLF001
        print(f"[{ns}]")
        for k, v in sorted(entries.items()):
            print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
