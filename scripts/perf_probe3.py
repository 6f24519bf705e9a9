"""Isolate the 3^3 submanifold map cost at L0/L1 (regression hunt):
(a) full build_batched_pair_table (probe + fallback cond + assembly),
(b) the raw mz probe kernel alone,
(c) the XLA bucketed path (probe off) for reference.
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

constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import build_batched_pair_table
from warpconvnet_tpu.ops.kernel_map import (
    _PROBE_TILE_Q,
    _PROBE_TILES_PER_STEP,
    _sentinel_queries_mz,
    build_pair_tables_batched,
    kernel_offsets,
)
from warpconvnet_tpu.ops.keys import PAD_COORD, pack_coords


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


def scene_voxels(rng, b, n_cap):
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = make_surface_scene(rng, n_cap)
        nv[i] = len(c)
        coords[i, : len(c)] = c
    return Voxels.create(coords, np.zeros((b, n_cap, 1), np.float32), nv).lex_sort()


def main():
    rng = np.random.default_rng(0)
    b = 2
    offs3 = kernel_offsets(3)
    print("devices:", jax.devices(), flush=True)

    for n_cap in (1 << 17, 1 << 16):
        vox = scene_voxels(rng, b, n_cap)

        @jax.jit
        def full_map(v):
            t = build_batched_pair_table(
                v.coords, v.num_valid, v.coords, v.num_valid, offs3,
                self_map=True, assume_sorted=True,
            )
            return t.table.sum()

        timeit(f"3^3 self-map full build (N={n_cap})", full_map, vox)

        @jax.jit
        def probe_only(v):
            from warpconvnet_tpu.kernels.sorted_search import (
                sorted_probe_batched_mz,
            )

            iv = (
                jax.lax.broadcasted_iota(jnp.int32, v.coords.shape[:2], 1)
                < v.num_valid[:, None]
            )
            in_c = jnp.where(iv[..., None], v.coords, PAD_COORD)
            keys = pack_coords(in_c, (16, 16, 16))
            base = in_c[:, None, :, :]
            goffs = np.asarray(offs3)[::3].copy()
            goffs[:, 2] = 0
            qg = base + jnp.asarray(goffs, jnp.int32)[None, :, None, :]
            gqk = _sentinel_queries_mz(qg, iv[:, None, :])
            g = 9
            m = v.coords.shape[1]
            tq = _PROBE_TILE_Q
            mq = -(-m // tq) * tq
            q_tot = g * mq
            q_pad = -(-q_tot // (tq * _PROBE_TILES_PER_STEP)) * (
                tq * _PROBE_TILES_PER_STEP
            )

            def padq(x):
                x = jnp.pad(
                    x, ((0, 0), (0, 0), (0, mq - m)),
                    constant_values=np.int32(2**31 - 1),
                ).reshape(b, q_tot)
                return jnp.pad(
                    x, ((0, 0), (0, q_pad - q_tot)),
                    constant_values=np.int32(2**31 - 1),
                )

            pos = sorted_probe_batched_mz(
                keys, padq(gqk[0]), padq(gqk[1]), (-1, 0, 1), tile_q=tq,
            )
            return pos.sum(), jnp.sum(pos == -2), jnp.sum(pos >= 0)

        s, nfb, nhit = jax.jit(probe_only)(vox)
        r = timeit(f"3^3 mz probe kernel only (N={n_cap})", probe_only, vox)
        print(
            f"  fallback-marked entries: {int(nfb)}  hits: {int(nhit)}",
            flush=True,
        )

        constants.WCT_KERNEL_MAP_PROBE = False

        @jax.jit
        def full_map_noprobe(v):
            t = build_batched_pair_table(
                v.coords, v.num_valid, v.coords, v.num_valid, offs3,
                self_map=True, assume_sorted=True,
            )
            return t.table.sum()

        timeit(
            f"3^3 self-map XLA bucketed (N={n_cap})", full_map_noprobe, vox
        )
        constants.WCT_KERNEL_MAP_PROBE = True


if __name__ == "__main__":
    main()
