"""Perf forensics on the real TPU: time the pieces of the MinkUNet train step
separately to find where the 10 s/step goes.

Pieces:
  A. kernel-map build only (all the sort/searchsorted coordinate work)
  B. conv compute only (prebuilt maps, fwd)
  C. fwd+bwd compute only (prebuilt maps)
  D. full train step (maps rebuilt inside, fwd+bwd+opt)

Timing on the tunneled chip: block_until_ready does not synchronize — chain
``n`` dispatches and fetch one scalar at the end.
"""

import time
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import (
    build_batched_pair_table,
    conv_gemm,
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.keys import PAD_COORD


def make_scene(rng, n_cap, coord_range=512, n_points=120_000):
    # Surface-like scene (same generator family as bench.py).
    n_raw = int(n_points * 1.3)
    pts = rng.standard_normal((n_raw, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True) + 1e-9
    r = coord_range * 0.4 * (1 + 0.1 * rng.standard_normal((n_raw, 1)))
    coords = np.round(pts * r + coord_range / 2).astype(np.int32)
    uniq = np.unique(coords, axis=0)
    rng.shuffle(uniq)
    uniq = uniq[:n_cap]
    out = np.full((n_cap, 3), PAD_COORD, np.int32)
    out[: len(uniq)] = uniq
    return out, len(uniq)


def timeit(name, fn, *args, iters=5):
    # fn must return a scalar-fetchable array.
    out = fn(*args)
    t0 = time.perf_counter()
    _ = float(np.asarray(jax.device_get(out)).ravel()[0])
    compile_plus = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(jax.device_get(out)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:10.1f} ms   (first-call wait {compile_plus:.1f}s)")
    return dt


def main():
    rng = np.random.default_rng(0)
    b, n_cap = 2, 131072
    coords, feats, nv = [], [], []
    for i in range(b):
        c, k = make_scene(rng, n_cap)
        coords.append(c)
        f = np.zeros((n_cap, 4), np.float32)
        f[:k] = rng.standard_normal((k, 4))
        feats.append(f)
        nv.append(k)
    vox = Voxels.create(np.stack(coords), np.stack(feats), np.array(nv))
    print(f"devices: {jax.devices()}  n_valid={nv}")

    # --- A: kernel-map build (3^3 submanifold) -----------------------------
    @jax.jit
    def build_map(v: Voxels):
        oc, onv, table, _ = generate_output_coords_and_kernel_map(v, 3, 1)
        return jnp.sum(table.table) + jnp.sum(table.rev)

    timeit("A1 kernel-map 3^3 submanifold", build_map, vox)

    @jax.jit
    def build_map_strided(v: Voxels):
        oc, onv, table, _ = generate_output_coords_and_kernel_map(v, 2, 2)
        return jnp.sum(table.table) + jnp.sum(table.rev)

    timeit("A2 kernel-map 2^3 stride-2", build_map_strided, vox)

    # --- B/C: conv compute with prebuilt maps ------------------------------
    oc, onv, table, _ = jax.jit(
        lambda v: generate_output_coords_and_kernel_map(v, 3, 1)
    )(vox)
    table = jax.tree.map(jax.device_put, table)

    for c_in, c_out in [(32, 32), (128, 128), (256, 256)]:
        x = jnp.asarray(rng.standard_normal((b, n_cap, c_in)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((27, c_in, c_out)), jnp.float32) * 0.05

        @jax.jit
        def fwd(x, w, t=table):
            out = conv_gemm(x, w, t.table, t.rev, "float32")
            return jnp.sum(out[..., 0])

        ms = timeit(f"B fwd conv {c_in}->{c_out} fp32", fwd, x, w)
        flops = 2 * 27 * b * n_cap * c_in * c_out
        print(f"   -> {flops / (ms / 1e3) / 1e12:.2f} TFLOP/s (dense-padded)")

        xb = x.astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)

        @jax.jit
        def fwd_bf16(x, w, t=table):
            out = conv_gemm(x, w, t.table, t.rev, "float32")
            return jnp.sum(out[..., 0].astype(jnp.float32))

        ms = timeit(f"B fwd conv {c_in}->{c_out} bf16", fwd_bf16, xb, wb)
        print(f"   -> {flops / (ms / 1e3) / 1e12:.2f} TFLOP/s (dense-padded)")

        @jax.jit
        def fwdbwd(x, w, t=table):
            def loss(x, w):
                out = conv_gemm(x, w, t.table, t.rev, "float32")
                return jnp.sum(out * out)

            l, g = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
            return l + jnp.sum(g[0][..., 0]) + jnp.sum(g[1][..., 0, 0])

        ms = timeit(f"C fwd+bwd conv {c_in}->{c_out} fp32", fwdbwd, x, w)
        print(f"   -> {3 * flops / (ms / 1e3) / 1e12:.2f} TFLOP/s eq")


if __name__ == "__main__":
    main()
