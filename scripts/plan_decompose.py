"""Micro-decompose the plan phase (126 ms of the 532 ms step) on the chip.

At MinkUNet L0 scale (B=2, N=131072 surface scenes):
  (a) raw key sort (argsort_keys)            — the sort-cost floor
  (b) stride_coords alone                    — unique of divided coords
  (c) strided K=8 probe, given out coords    — table only
  (d) strided rev build (with_reverse)
  (e) submanifold 3^3 map table-only / +free-flip rev
  (f) full generate_output_coords_and_kernel_map for both variants
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene

from warpconvnet_tpu import constants

constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import (
    build_batched_pair_table,
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.kernel_map import kernel_offsets, stride_coords
from warpconvnet_tpu.ops.keys import PAD_COORD, argsort_keys, pack_coords


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:8.2f} ms", flush=True)
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
    vox = Voxels.create(
        coords, np.zeros((b, n_cap, 1), np.float32), nv
    ).lex_sort()
    print("devices:", jax.devices(), flush=True)
    print("n valid:", np.asarray(vox.num_valid), flush=True)

    offs2 = kernel_offsets(2)
    offs3 = kernel_offsets(3)
    cap2 = n_cap // 2

    # (a) sort floor
    @jax.jit
    def sort_only(v):
        keys = pack_coords(v.coords)
        sk, perm = jax.vmap(lambda *ks: argsort_keys(ks))(*keys)
        return sk[0].sum() + perm.sum()

    timeit("argsort_keys 2x131k", sort_only, vox)

    # (b) stride_coords alone
    @jax.jit
    def sc_only(v):
        def one(c, nvv):
            valid = lax.broadcasted_iota(jnp.int32, (c.shape[0],), 0) < nvv
            res = stride_coords(c, valid, (2, 2, 2), max_out=cap2)
            return res.coords, jnp.minimum(res.num_unique, cap2)

        oc, onv = jax.vmap(one)(v.coords, v.num_valid)
        return oc.sum() + onv.sum()

    timeit("stride_coords (unique of divided, cap 65k)", sc_only, vox)

    # precompute out coords on device for probe-only timing
    @jax.jit
    def sc_out(v):
        def one(c, nvv):
            valid = lax.broadcasted_iota(jnp.int32, (c.shape[0],), 0) < nvv
            res = stride_coords(c, valid, (2, 2, 2), max_out=cap2)
            return res.coords, jnp.minimum(res.num_unique, cap2)

        return jax.vmap(one)(v.coords, v.num_valid)

    oc, onv = jax.block_until_ready(sc_out(vox))

    # (c) strided probe only
    @jax.jit
    def probe2(v, oc, onv):
        t = build_batched_pair_table(
            v.coords, v.num_valid, oc, onv, offs2, stride=2,
            assume_sorted=True, queries_sorted=True,
        )
        return t.table.sum()

    timeit("strided K=8 probe (table only, out precomputed)", probe2, vox, oc, onv)

    # (d) strided rev build
    @jax.jit
    def probe2_rev(v, oc, onv):
        t = build_batched_pair_table(
            v.coords, v.num_valid, oc, onv, offs2, stride=2,
            assume_sorted=True, queries_sorted=True,
        )
        t = t.with_reverse(v.coords.shape[1])
        return t.table.sum() + t.rev.sum()

    timeit("strided K=8 probe + rev", probe2_rev, vox, oc, onv)

    # (e) submanifold 3^3
    @jax.jit
    def sub3(v):
        t = build_batched_pair_table(
            v.coords, v.num_valid, v.coords, v.num_valid, offs3,
            self_map=True, assume_sorted=True,
        )
        return t.table.sum()

    timeit("submanifold 3^3 table only", sub3, vox)

    @jax.jit
    def sub3_rev(v):
        t = build_batched_pair_table(
            v.coords, v.num_valid, v.coords, v.num_valid, offs3,
            self_map=True, assume_sorted=True,
        )
        t = t.with_reverse(v.coords.shape[1])
        return t.table.sum() + t.rev.sum()

    timeit("submanifold 3^3 table + rev (free K-flip)", sub3_rev, vox)

    # (f) full generator calls as the model uses them
    @jax.jit
    def gen_sub(v):
        _, _, t, _ = generate_output_coords_and_kernel_map(v, 3, 1)
        return t.table.sum() + t.rev.sum()

    timeit("generate_... submanifold 3^3 (+rev)", gen_sub, vox)

    @jax.jit
    def gen_dn(v):
        oc_, onv_, t, _ = generate_output_coords_and_kernel_map(
            v, 2, 2, out_capacity=cap2
        )
        return t.table.sum() + t.rev.sum() + oc_.sum()

    timeit("generate_... strided 2^3 (+rev)", gen_dn, vox)


if __name__ == "__main__":
    main()
