"""Round-2 perf decomposition on the real chip.

Measures, with Python-loop per-scene semantics (real lax.cond branches, the
bench path), each plan-phase and GEMM-phase piece at bench shapes, so the
optimization targets are grounded in hardware numbers rather than vmapped
approximations (round-1 plan_decompose.py vmapped the probe, which forces
both cond branches and overstates probe cost).
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
from warpconvnet_tpu.ops.keys import PAD_COORD, pack_coords, lookup_in_sorted
from warpconvnet_tpu.ops.kernel_map import build_pair_table, kernel_offsets, stride_coords
from warpconvnet_tpu.kernels.sorted_search import sorted_probe
from warpconvnet_tpu.kernels.implicit_gemm import implicit_gemm_raw, implicit_gemm_wgrad_raw
from warpconvnet_tpu.nn.functional.sparse_conv import _fwd_impl, _dgrad_impl, _wgrad_impl


def timeit(name, fn, *args, iters=10):
    out = fn(*args)  # compile
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    n_cap = 1 << 17
    c = make_surface_scene(rng, n_cap)
    n = len(c)
    coords = np.full((n_cap, 3), PAD_COORD, np.int32)
    coords[:n] = c
    # lex sort
    keys_np = coords[:, 0].astype(np.int64) * (1 << 32) + (
        coords[:, 1].astype(np.int64) * 65536 + coords[:, 2] + (1 << 31)
    )
    order = np.argsort(keys_np, kind="stable")
    coords = coords[order]
    coords_d = jnp.asarray(coords)
    nv = jnp.int32(n)
    print(f"devices: {jax.devices()}  n={n}", flush=True)

    offsets = kernel_offsets(3)
    valid_fn = lambda k: lax.broadcasted_iota(jnp.int32, (n_cap,), 0) < k

    # --- plan pieces -------------------------------------------------------
    @jax.jit
    def queries(cd, k):
        v = valid_fn(k)
        cc = jnp.where(v[:, None], cd, PAD_COORD)
        keys = pack_coords(cc)
        q = jnp.clip(
            cc[None] + jnp.asarray(offsets, jnp.int32)[:, None],
            -(PAD_COORD - 1), PAD_COORD - 1,
        )
        qk = pack_coords(q)
        return keys, tuple(x.reshape(-1) for x in qk)

    timeit("query build (pack 27x131k)", queries, coords_d, nv)

    keys, qk = jax.jit(queries)(coords_d, nv)

    @jax.jit
    def probe_prebuilt(keys, qk):
        return sorted_probe(keys, qk).sum()

    timeit("sorted_probe (prebuilt queries, no vmap)", probe_prebuilt, keys, qk)

    @jax.jit
    def lookup_prebuilt(keys, qk):
        return lookup_in_sorted(keys, qk).sum()

    timeit("lookup_in_sorted (prebuilt queries)", lookup_prebuilt, keys, qk)

    @jax.jit
    def submap_probe(cd, k):
        v = valid_fn(k)
        t = build_pair_table(cd, v, cd, offsets, use_probe=True)
        return t.table.sum()

    timeit("submanifold 3^3 table (probe)", submap_probe, coords_d, nv)

    @jax.jit
    def submap_lookup(cd, k):
        v = valid_fn(k)
        t = build_pair_table(cd, v, cd, offsets, use_probe=False)
        return t.table.sum()

    timeit("submanifold 3^3 table (lookup)", submap_lookup, coords_d, nv)

    @jax.jit
    def stride_only(cd, k):
        v = valid_fn(k)
        res = stride_coords(cd, v, (2, 2, 2), max_out=n_cap // 2)
        return res.coords.sum()

    timeit("stride_coords (sort+unique)", stride_only, coords_d, nv)

    # reverse-table scatter cost (the mirror-offset trick's price)
    @jax.jit
    def rev_scatter(table):
        k, n_out = table.shape
        rev = jnp.full((k, n_cap), -1, jnp.int32)
        out_ids = jnp.broadcast_to(
            lax.broadcasted_iota(jnp.int32, (k, n_out), 1), (k, n_out))
        rows = jnp.where(table >= 0, table, n_cap)
        k_ids = lax.broadcasted_iota(jnp.int32, (k, n_out), 0)
        rev = rev.at[k_ids.reshape(-1), rows.reshape(-1)].set(
            out_ids.reshape(-1), mode="drop")
        return rev.sum()

    table13 = jax.jit(
        lambda cd, k: build_pair_table(cd, valid_fn(k), cd, offsets[:13])
    )(coords_d, nv).table
    timeit("reverse scatter (13 offsets x 131k)", rev_scatter, table13)

    # --- GEMM pieces at representative layer shapes ------------------------
    full = jax.jit(
        lambda cd, k: build_pair_table(cd, valid_fn(k), cd, offsets)
    )(coords_d, nv)
    tbl = full.table
    rev = tbl[::-1]  # self-map mirror

    for cin, cout in [(32, 32), (128, 128), (256, 256)]:
        x = jnp.asarray(
            rng.standard_normal((n_cap, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((27, cin, cout)) * 0.05, jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((n_cap, cout)), jnp.bfloat16)

        timeit(f"igemm fwd C{cin}->{cout}",
               jax.jit(lambda x, w, t: implicit_gemm_raw(x, w, t).sum()), x, w, tbl)
        timeit(f"explicit fwd C{cin}->{cout}",
               jax.jit(lambda x, w, t: _fwd_impl(
                   x[None], w, t[None], jnp.float32).sum()), x, w, tbl)
        timeit(f"igemm wgrad C{cin}->{cout}",
               jax.jit(lambda x, g, t: implicit_gemm_wgrad_raw(x, g, t).sum()),
               x, g, tbl)
        timeit(f"explicit wgrad C{cin}->{cout}",
               jax.jit(lambda x, g, t: _wgrad_impl(
                   x[None], g[None], t[None], jnp.float32).sum()), x, g, tbl)


if __name__ == "__main__":
    main()
