"""Chip validation of the dy-batched mz probe (tiny shapes, fast compile):
exactness of the batched rank/hit chain vs the XLA bucketed lookup on a
random scene, for 3^3 / 5^3 / 7^3 submanifold maps."""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.ops.kernel_map import (
    build_pair_tables_batched,
    kernel_offsets,
)
from warpconvnet_tpu.ops.keys import PAD_COORD


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    b, n_cap = 2, 4096
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = np.unique(
            rng.integers(0, 40, size=(n_cap, 3)).astype(np.int32), axis=0
        )
        nv[i] = len(c)
        coords[i, : len(c)] = c
    vox = Voxels.create(coords, np.zeros((b, n_cap, 1), np.float32), nv)
    vox = vox.lex_sort()

    for ks in (3, 5, 7):
        offs = kernel_offsets(ks)
        t0 = time.perf_counter()
        probe = jax.jit(
            lambda c, v, offs=offs: build_pair_tables_batched(
                c, v, c, v, offs, assume_sorted=True, use_probe=True,
                queries_sorted=True,
            )
        )(vox.coords, vox.num_valid)
        probe = np.asarray(probe)
        dt = time.perf_counter() - t0
        ref = jax.jit(
            lambda c, v, offs=offs: build_pair_tables_batched(
                c, v, c, v, offs, assume_sorted=True, use_probe=False,
            )
        )(vox.coords, vox.num_valid)
        ref = np.asarray(ref)
        same = (probe == ref).all()
        print(
            f"{ks}^3 (K={ks**3}): probe==xla {same}  "
            f"(hits {(ref >= 0).sum()}, first call {dt:.1f}s)",
            flush=True,
        )
        assert same, f"{ks}^3 probe mismatch"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
