"""Per-model steady-state step time on the real chip at >=100k voxels
(VERDICT r2 item 5: validate_models_tpu.py reported compile-inclusive
times only). Measures fwd-only and fwd+grad ms/step post-compile for
MinkUNet18, PTv3, SpaCeFormer, and Volt, printing a README-ready table."""

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
from warpconvnet_tpu.ops.keys import PAD_COORD


def make_vox(rng, b=1, n_cap=1 << 17, c=3):
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n_cap, c), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        cc = make_surface_scene(rng, n_cap, coord_range=512, n_points=120_000)
        nv[i] = len(cc)
        coords[i, : len(cc)] = cc
        feats[i, : len(cc)] = rng.standard_normal((len(cc), c))
    return Voxels.create(coords, feats, nv).lex_sort(), int(nv.sum())


def steady(name, model, vox, npts, iters=5, **apply_kw):
    t0 = time.perf_counter()
    variables = model.init(jax.random.PRNGKey(0), vox, **apply_kw)

    def loss_fn(v, vx):
        out = model.apply(v, vx, **apply_kw)
        f = out.features if hasattr(out, "features") else out
        return jnp.sum(f.astype(jnp.float32) ** 2)

    fwd = jax.jit(loss_fn)

    @jax.jit
    def fwd_grad(v, vx):
        loss, grads = jax.value_and_grad(loss_fn)(v, vx)
        gn = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2), grads, 0.0
        )
        return loss + 0 * gn

    def time_steady(fn):
        out = fn(variables, vox)
        _ = float(out)  # sync through the tunnel
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(variables, vox)
        _ = float(out)
        return (time.perf_counter() - t0) / iters * 1e3

    f_ms = time_steady(fwd)
    g_ms = time_steady(fwd_grad)
    compile_s = time.perf_counter() - t0 - (f_ms + g_ms) * iters / 1e3
    print(
        f"| {name:<14s} | {npts:>7d} | {f_ms:8.1f} | {g_ms:8.1f} | "
        f"{npts / (g_ms / 1e3):>12,.0f} | (compile ~{compile_s:.0f}s)",
        flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    vox, npts = make_vox(rng)
    print("| model | voxels | fwd ms | fwd+grad ms | pts/s (train) |",
          flush=True)

    from warpconvnet_tpu.models.mink_unet import MinkUNet18
    steady("MinkUNet18", MinkUNet18(in_channels=3, out_channels=20),
           vox, npts, train=False)

    from warpconvnet_tpu.models.point_transformer_v3 import PointTransformerV3
    steady(
        "PTv3",
        PointTransformerV3(
            in_channels=3, out_channels=20,
            enc_depths=(2, 2, 2), enc_channels=(32, 64, 128),
            enc_num_head=(2, 4, 8), enc_patch_size=(1024, 1024, 1024),
            dec_depths=(2, 2), dec_channels=(32, 64),
            dec_num_head=(4, 4), dec_patch_size=(1024, 1024),
        ),
        vox, npts, train=False,
    )

    from warpconvnet_tpu.models.space_former import SpaCeFormer
    steady(
        "SpaCeFormer",
        SpaCeFormer(
            in_channels=3, out_channels=20,
            dims=(32, 64), depths=(2, 2), num_heads=(2, 4),
            dec_depths=(2,),
        ),
        vox, npts,
    )

    from warpconvnet_tpu.models.volt import build_volt
    steady("Volt-s", build_volt("volt-s", depth=4, dim=128, num_heads=8,
                                stem_dim=32),
           vox, npts, train=False)

    # groups>1 ablation (VERDICT r2 item 4): one grouped 3^3 conv layer at
    # L0 scale through the block-diagonal igemm fast path vs groups=1.
    import time as _time
    import jax.numpy as jnp
    from warpconvnet_tpu.nn.functional.sparse_conv import (
        spatially_sparse_conv,
    )

    rngg = np.random.default_rng(7)
    for g in (1, 4):
        cin = cout = 64
        if g == 1:
            w = jnp.asarray(
                rngg.standard_normal((27, cin, cout)) * 0.05, jnp.bfloat16
            )
        else:
            w = jnp.asarray(
                rngg.standard_normal((27, g, cin // g, cout // g)) * 0.05,
                jnp.bfloat16,
            )
        feats = jnp.asarray(
            rngg.standard_normal(vox.coords.shape[:2] + (cin,)), jnp.bfloat16
        )
        vg = vox.replace(features=feats)

        fn = jax.jit(
            lambda v, w=w, g=g: spatially_sparse_conv(v, w, 3, groups=g)[0]
            .features.astype(jnp.float32).sum()
        )
        out = fn(vg); _ = float(out)
        t0 = _time.perf_counter()
        for _ in range(5):
            out = fn(vg)
        _ = float(out)
        ms = (_time.perf_counter() - t0) / 5 * 1e3
        print(f"| conv3 C64 groups={g} | {npts:>7d} | {ms:8.1f} | (fwd only,"
              f" block-diag igemm path)", flush=True)


if __name__ == "__main__":
    main()
