"""Drive the attention-based models (PTv3, SpaCeFormer, Volt) forward+grad
on the real chip at moderate scale — confirms the flash-attention path and
the conv fast paths compose inside whole models on TPU."""

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


def make_vox(rng, b=1, n_cap=1 << 15, c=3):
    coords = np.full((b, n_cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n_cap, c), np.float32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        cc = make_surface_scene(rng, n_cap, coord_range=256, n_points=40_000)
        nv[i] = len(cc)
        coords[i, : len(cc)] = cc
        feats[i, : len(cc)] = rng.standard_normal((len(cc), c))
    return Voxels.create(coords, feats, nv).lex_sort()


def drive(name, model, vox, **init_kw):
    t0 = time.perf_counter()
    variables = model.init(jax.random.PRNGKey(0), vox, **init_kw)

    def loss_fn(v):
        out = model.apply(v, vox, **init_kw)
        f = out.features if hasattr(out, "features") else out
        return jnp.sum(f.astype(jnp.float32) ** 2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables)
    gn = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32) ** 2), grads, 0.0
    )
    loss, gn = float(loss), float(jnp.sqrt(gn))
    dt = time.perf_counter() - t0
    ok = np.isfinite(loss) and np.isfinite(gn)
    print(f"{name:14s} loss={loss:.3e} grad_norm={gn:.3e} "
          f"finite={ok} ({dt:.0f}s incl. compile)", flush=True)
    assert ok, name


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    vox = make_vox(rng)

    from warpconvnet_tpu.models.point_transformer_v3 import PointTransformerV3
    drive(
        "PTv3",
        PointTransformerV3(
            in_channels=3, out_channels=20,
            enc_depths=(1, 1, 1), enc_channels=(16, 32, 64),
            enc_num_head=(2, 4, 8), enc_patch_size=(1024, 1024, 1024),
            dec_depths=(1, 1), dec_channels=(32, 32),
            dec_num_head=(4, 4), dec_patch_size=(1024, 1024),
        ),
        vox, train=False,
    )

    from warpconvnet_tpu.models.space_former import SpaCeFormer
    drive(
        "SpaCeFormer",
        SpaCeFormer(
            in_channels=3, out_channels=20,
            dims=(32, 64), depths=(1, 1), num_heads=(2, 4),
            dec_depths=(1,),
        ),
        vox,
    )

    from warpconvnet_tpu.models.volt import build_volt
    drive(
        "Volt-s(tiny)",
        build_volt("volt-s", depth=2, dim=64, num_heads=4, stem_dim=16),
        vox, train=False,
    )


if __name__ == "__main__":
    main()
