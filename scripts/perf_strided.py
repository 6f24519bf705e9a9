"""Round-3 regression hunt on the real chip: where did 906 - 686 ms go?

Times, at MinkUNet L0/L1 shapes on surface scenes:
  (1) full `spatially_sparse_conv` strided 2^3 fwd and fwd+bwd, explicit vs
      auto (parity igemm) — the production path including perms/remaps/plans;
  (2) the missing v3 wgrad micro numbers (unit stride, C128);
  (3) plan components: strided map table-only vs +rev, parity perm,
      make_plan (strided parity).
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
constants.WCT_ASSUME_LEX_SORTED = True
constants.WCT_KERNEL_MAP_PROBE = True
constants.WCT_AUTOTUNE = False  # heuristic path, same as bench cache-miss

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_fwd,
    implicit_gemm_wgrad,
    make_plan,
)
from warpconvnet_tpu.nn.functional import sparse_conv as sc
from warpconvnet_tpu.nn.functional.sparse_conv import (
    build_batched_pair_table,
    spatially_sparse_conv,
)
from warpconvnet_tpu.ops.kernel_map import kernel_offsets
from warpconvnet_tpu.ops.keys import PAD_COORD


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:64s} {ms:8.2f} ms", flush=True)
    return ms


def scene_voxels(rng, b, n_cap):
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n_cap, 3), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        c = make_surface_scene(rng, n_cap)
        nv[i] = len(c)
        coords[i, : len(c)] = c
        feats[i, : len(c)] = rng.standard_normal((len(c), 3))
    return Voxels.create(coords, feats, nv).lex_sort()


def with_feats(vox, rng, c):
    f = jnp.asarray(
        rng.standard_normal(vox.coords.shape[:2] + (c,)), jnp.bfloat16
    )
    return Voxels(
        coords=vox.coords, features=f, num_valid=vox.num_valid,
        voxel_size=vox.voxel_size, tensor_stride=vox.tensor_stride,
        lex_sorted=True,
    )


def conv_modes(vox, w, stride, out_cap, tag):
    """Time fwd and fwd+bwd of one strided conv, explicit vs auto."""
    def run(mode):
        constants.WCT_FWD_ALGO_MODE = mode
        constants.WCT_DGRAD_ALGO_MODE = mode
        constants.WCT_WGRAD_ALGO_MODE = mode

        @jax.jit
        def fwd(v, w):
            out, _ = spatially_sparse_conv(
                v, w, kernel_size=2, stride=stride, out_capacity=out_cap
            )
            return out.features.astype(jnp.float32).sum()

        @jax.jit
        def both(v, w):
            def loss(f, w):
                vv = Voxels(
                    coords=v.coords, features=f, num_valid=v.num_valid,
                    voxel_size=v.voxel_size, tensor_stride=v.tensor_stride,
                    lex_sorted=True,
                )
                out, _ = spatially_sparse_conv(
                    vv, w, kernel_size=2, stride=stride, out_capacity=out_cap
                )
                return out.features.astype(jnp.float32).sum()

            df, dw = jax.grad(loss, argnums=(0, 1))(v.features, w)
            return df.astype(jnp.float32).sum() + dw.astype(jnp.float32).sum()

        timeit(f"{tag} fwd   [{mode}]", fwd, vox, w)
        timeit(f"{tag} f+bwd [{mode}]", both, vox, w)

    run("explicit")
    run("implicit_pallas")
    constants.WCT_FWD_ALGO_MODE = "auto"
    constants.WCT_DGRAD_ALGO_MODE = "auto"
    constants.WCT_WGRAD_ALGO_MODE = "auto"


def main():
    rng = np.random.default_rng(0)
    b, n_cap = 2, 1 << 17
    vox0 = scene_voxels(rng, b, n_cap)
    print("devices:", jax.devices(), flush=True)
    print(f"n valid: {np.asarray(vox0.num_valid)}", flush=True)

    # ---- (3) plan components at L0 (strided 2^3 map) --------------------
    offs2 = kernel_offsets(2)

    def _strided_out(v):
        from warpconvnet_tpu.ops.kernel_map import stride_coords

        def one(c, nvv):
            valid = jnp.arange(c.shape[0]) < nvv
            res = stride_coords(c, valid, (2, 2, 2), max_out=n_cap // 2)
            return res.coords, jnp.minimum(res.num_unique, n_cap // 2)

        return jax.vmap(one)(v.coords, v.num_valid)

    @jax.jit
    def stab_only(v):
        t = build_batched_pair_table(
            v.coords, v.num_valid, *_strided_out(v), offs2,
            stride=2, assume_sorted=True, queries_sorted=True,
        )
        return t.table.sum()

    @jax.jit
    def stab_rev(v):
        t = build_batched_pair_table(
            v.coords, v.num_valid, *_strided_out(v), offs2,
            stride=2, assume_sorted=True, queries_sorted=True,
        )
        return t.table.sum() + t.rev.sum()

    timeit("L0 strided map, table only (rev DCE'd)", stab_only, vox0)
    timeit("L0 strided map, table + rev", stab_rev, vox0)

    @jax.jit
    def pperm(v):
        p, i = sc._parity_perm(v.coords, v.num_valid, (1, 1, 1), 2)
        return p.sum() + i.sum()

    timeit("L0 _parity_perm (argsort 2x131k)", pperm, vox0)

    # ---- (2) unit-stride v3 wgrad vs r2 wgrad (C128) --------------------
    offs3 = kernel_offsets(3)

    @jax.jit
    def table3(v):
        return build_batched_pair_table(
            v.coords, v.num_valid, v.coords, v.num_valid, offs3,
            self_map=True, assume_sorted=True,
        )

    bpt = table3(vox0)
    tbl = jnp.asarray(jax.device_get(bpt.table))
    x = jnp.asarray(rng.standard_normal((b, n_cap, 128)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, n_cap, 128)), jnp.bfloat16)
    for tag, tm, wf, s, ident, zg in [
        ("r2 t256 wf1.5 s1      zg3", 256, 1.5, 1, None, 3),
        ("v3 t256 wf1.25 s4 id13 zg3", 256, 1.25, 4, 13, 3),
    ]:
        plan = jax.jit(
            lambda t, tm=tm, wf=wf, s=s, ident=ident, zg=zg: make_plan(
                t, n_cap, tile_m=tm, window_factor=wf, zg=zg, s=s,
                identity_k=ident,
            )
        )(tbl)
        timeit(
            f"wgrad C128 {tag}",
            jax.jit(
                lambda x, g, t, p, tm=tm, wf=wf, s=s, ident=ident, zg=zg:
                implicit_gemm_wgrad(
                    x, g, t, p, tile_m=tm, window_factor=wf, zg=zg, s=s,
                    identity_k=ident,
                ).sum()
            ),
            x, g, tbl, plan,
        )

    # ---- (1) production strided conv, explicit vs parity igemm ----------
    w32_64 = jnp.asarray(
        rng.standard_normal((8, 32, 64)) * 0.05, jnp.bfloat16
    )
    conv_modes(
        with_feats(vox0, rng, 32), w32_64, 2, n_cap // 2, "L0 s2 C32->64 "
    )

    w128_256 = jnp.asarray(
        rng.standard_normal((8, 128, 256)) * 0.05, jnp.bfloat16
    )
    vox2 = scene_voxels(np.random.default_rng(1), b, n_cap // 4)
    conv_modes(
        with_feats(vox2, rng, 128), w128_256, 2, n_cap // 8,
        "L2 s2 C128->256",
    )


if __name__ == "__main__":
    main()
