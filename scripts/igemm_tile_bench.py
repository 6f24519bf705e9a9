"""Time implicit_gemm_raw across tile sizes on the real chip."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")

import jax.numpy as jnp

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import implicit_gemm_raw
from warpconvnet_tpu.nn.functional.sparse_conv import (
    generate_output_coords_and_kernel_map,
    _fwd_impl,
)
from warpconvnet_tpu.ops.keys import PAD_COORD
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_surface_scene


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    _ = np.asarray(jax.device_get(out)).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(out)).ravel()[:1]
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    n_cap = 1 << 17
    c = make_surface_scene(rng, n_cap)
    coords = np.full((1, n_cap, 3), PAD_COORD, np.int32)
    coords[0, : len(c)] = c
    vox = Voxels.create(
        coords, np.zeros((1, n_cap, 1), np.float32), np.array([len(c)], np.int32)
    ).lex_sort()
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, 1)
    table = bpt.table[0]
    print("devices:", jax.devices(), flush=True)

    for cch, dtype in ((128, jnp.bfloat16), (128, jnp.float32)):
        x = jnp.asarray(rng.standard_normal((n_cap, cch)), dtype)
        w = jnp.asarray(rng.standard_normal((27, cch, cch)) * 0.05, dtype)

        @jax.jit
        def ref(x, w):
            return _fwd_impl(x[None], w, table[None], jnp.float32)[0].sum()

        timeit(f"explicit C={cch} {dtype.__name__}", ref, x, w)
        for tile_m in (256, 512, 1024):
            @jax.jit
            def f(x, w, tm=tile_m):
                return implicit_gemm_raw(x, w, table, tile_m=tm).sum()

            timeit(f"igemm tile={tile_m} C={cch} {dtype.__name__}", f, x, w)


if __name__ == "__main__":
    main()
