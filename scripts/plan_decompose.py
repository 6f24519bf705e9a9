"""Decompose the coordinate-plan cost: submanifold map alone, strided map
alone, stride_coords alone, probe alone — on the real chip with bench flags."""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene

from warpconvnet_tpu import constants

constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import (
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.keys import PAD_COORD, argsort_keys, pack_coords
from warpconvnet_tpu.ops.kernel_map import stride_coords, kernel_offsets
from warpconvnet_tpu.kernels.sorted_search import sorted_probe
from jax import lax


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms", flush=True)


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

    @jax.jit
    def submap(v):
        _, _, t, _ = generate_output_coords_and_kernel_map(v, 3, 1)
        return t.table.sum() + t.rev.sum()

    timeit("submanifold 3^3 map (probe + flip rev)", submap, vox)

    @jax.jit
    def submap_norev(v):
        from warpconvnet_tpu.nn.functional.sparse_conv import (
            build_batched_pair_table,
        )
        from warpconvnet_tpu.ops.kernel_map import kernel_offsets as ko

        t = jax.vmap(
            lambda c, k: __import__(
                "warpconvnet_tpu.ops.kernel_map", fromlist=["build_pair_table"]
            ).build_pair_table(
                c, lax.broadcasted_iota(jnp.int32, (c.shape[0],), 0) < k,
                c, ko(3),
            ).table
        )(v.coords, v.num_valid)
        return t.sum()

    timeit("submanifold table only (no rev)", submap_norev, vox)

    @jax.jit
    def strided(v):
        _, _, t, _ = generate_output_coords_and_kernel_map(
            v, 2, 2, out_capacity=n_cap // 2
        )
        return t.table.sum() + t.rev.sum()

    timeit("strided 2^3 map (incl. unique + rev)", strided, vox)

    @jax.jit
    def stride_only(v):
        def one(c, k):
            valid = lax.broadcasted_iota(jnp.int32, (c.shape[0],), 0) < k
            res = stride_coords(c, valid, (2, 2, 2), max_out=n_cap // 2)
            return res.coords.sum()

        return jax.vmap(one)(v.coords, v.num_valid)

    timeit("stride_coords (sort+unique) only", stride_only, vox)

    # probe alone on prebuilt keys/queries
    offsets = kernel_offsets(3)

    @jax.jit
    def probe_only(v):
        def one(c, k):
            valid = lax.broadcasted_iota(jnp.int32, (c.shape[0],), 0) < k
            cc = jnp.where(valid[:, None], c, PAD_COORD)
            keys = pack_coords(cc)
            q = jnp.clip(
                cc[None] + jnp.asarray(offsets, jnp.int32)[:, None],
                -(PAD_COORD - 1), PAD_COORD - 1,
            )
            qk = pack_coords(q)
            qk = tuple(x.reshape(-1) for x in qk)
            return sorted_probe(keys, qk).sum()

        return jax.vmap(one)(v.coords, v.num_valid)

    timeit("probe only (27 x 131k queries)", probe_only, vox)


if __name__ == "__main__":
    main()
