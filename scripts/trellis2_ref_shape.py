"""TRELLIS.2 pipeline at the PUBLISHED model shapes (VERDICT r2 item 7).

Runs every stage end-to-end on the real chip at the reference's actual
latent resolutions and channel widths (synthetic weight VALUES, real
shapes — the published 4B checkpoint layout, reference
``tests/models/test_trellis2_phase3.py:190-210`` and
``test_trellis2_real_weights.py``):

  cond:   DINOv3-L ViT (1024 d, 24 blocks, patch 16) on a 512x512 image
  ss:     flow DiT on the 16^3 x 8 structure latent — dim 1536, 30
          blocks, 12 heads (the 4B config), 2 euler steps
  ss_dec: occupancy decoder 16^3 -> 32^3 (the "512" pipeline's
          ss_resolution, pipeline.py:50)
  slat:   sparse flow transformer on the active voxels at 64^3 — dim
          1536, 24 blocks
  vae:    shape decoder (1024, 512, 256) channel cascade -> dual-grid
          field -> mesh extraction

Weight-loading recipe (real checkpoints): load the safetensors state
dicts from microsoft/TRELLIS.2-4B with torch, then map them through
``models/trellis2/weights.py`` (``convert_trellis2_state_dict`` per
stage, ``convert_dinov3_vit`` for the conditioner) and pass the
resulting params here in place of ``module.init``.
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

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.models.trellis2.mesh_extract import flexi_dual_grid_mesh
from warpconvnet_tpu.models.trellis2.shape_vae import ShapeVaeDecoder
from warpconvnet_tpu.models.trellis2.slat_flow import SLatFlowModel
from warpconvnet_tpu.models.trellis2.sparse_structure import (
    SparseStructureDecoder,
    SparseStructureFlowModel,
)
from warpconvnet_tpu.models.trellis2.vit_cond import vit_conditioner_dinov3_l
from warpconvnet_tpu.nn.samplers import flow_euler_sample
from warpconvnet_tpu.ops.keys import PAD_COORD


def stage(name):
    print(f"== {name}", flush=True)
    return time.perf_counter()


def done(t0, **info):
    print(f"   done in {time.perf_counter() - t0:.1f}s "
          + " ".join(f"{k}={v}" for k, v in info.items()), flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    b = 1

    # --- conditioner: DINOv3-L on 512x512 ------------------------------
    t0 = stage("cond: DINOv3-L ViT (1024d x 24 blocks, 512x512 image)")
    vit = vit_conditioner_dinov3_l()
    img = jax.random.normal(key, (b, 512, 512, 3), jnp.bfloat16)
    vit_params = jax.jit(vit.init)(key, img)
    ctx = jax.jit(vit.apply)(vit_params, img)
    ctx = jnp.asarray(ctx, jnp.bfloat16)
    done(t0, tokens=ctx.shape)
    del vit_params

    # --- sparse-structure flow: 16^3 x 8, dim 1536, 30 blocks ----------
    t0 = stage("ss flow: 16^3 latent, dim 1536, depth 30, heads 12")
    ss = SparseStructureFlowModel(
        resolution=16, in_channels=8, dim=1536, depth=30, num_heads=12
    )
    x0 = jax.random.normal(key, (b, 16, 16, 16, 8), jnp.float32)
    ss_params = jax.jit(ss.init)(key, x0, jnp.zeros((b,)), ctx)

    @jax.jit
    def ss_vel(x, t):
        return ss.apply(ss_params, x, t, ctx)

    z_ss = flow_euler_sample(ss_vel, x0, num_steps=2)
    done(t0, latent=z_ss.shape, finite=bool(jnp.isfinite(z_ss).all()))

    # --- ss decoder: 16^3 -> 32^3 occupancy ----------------------------
    t0 = stage("ss decoder: 16^3 -> 32^3 occupancy")
    dec = SparseStructureDecoder(channels=(512, 128))
    dec_params = jax.jit(dec.init)(key, z_ss)
    occ = jax.jit(dec.apply)(dec_params, z_ss)
    done(t0, occupancy=occ.shape)
    del ss_params, dec_params

    # Active voxels at 64^3 (occupancy upsampled x2): host-side compaction
    # is the pipeline boundary (same as the reference's cascade).
    occ_host = np.asarray(occ[..., 0])
    thresh = np.quantile(occ_host, 0.90)  # keep ~10% -> ~26k voxels at 64^3
    cap = 32768
    coords = np.full((b, cap, 3), PAD_COORD, np.int32)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        cc = np.stack(np.where(occ_host[i] > thresh), axis=1).astype(np.int32)
        cc = np.repeat(cc * 2, 2, axis=0)
        cc[1::2, 2] += 1  # densify to 64^3-ish occupancy
        cc = np.unique(cc, axis=0)[:cap]
        nv[i] = len(cc)
        coords[i, : len(cc)] = cc
    feats = np.asarray(
        jax.random.normal(key, (b, cap, 8), jnp.float32)
    )
    slat_in = Voxels.create(coords, feats, nv).lex_sort()
    print(f"   active voxels at 64^3: {nv.tolist()}", flush=True)

    # --- slat flow: dim 1536, 24 blocks on the active voxels -----------
    t0 = stage("slat flow: dim 1536, depth 24 on active voxels")
    slat = SLatFlowModel(
        in_channels=8, dim=1536, depth=24, num_heads=12, window_size=1024
    )
    slat_params = jax.jit(slat.init)(
        key, slat_in, jnp.zeros((b,)), ctx
    )

    @jax.jit
    def slat_vel(feats, t):
        out = slat.apply(
            slat_params, slat_in.replace(features=feats), t, ctx
        )
        return out.features

    zf = flow_euler_sample(slat_vel, slat_in.features, num_steps=2)
    slat_out = slat_in.replace(features=zf)
    done(t0, slat=zf.shape, finite=bool(jnp.isfinite(zf).all()))
    del slat_params

    # --- shape VAE decode + mesh --------------------------------------
    t0 = stage("shape decoder (1024, 512, 256) -> dual grid -> mesh")
    vae = ShapeVaeDecoder(
        latent_channels=8, channels=(1024, 512, 256), blocks_per_stage=2
    )
    vae_params = jax.jit(vae.init)(key, slat_out)
    field = jax.jit(vae.apply)(vae_params, slat_out)
    attrs = ShapeVaeDecoder.decode_attrs(field)
    meshes = flexi_dual_grid_mesh(*attrs)
    done(t0, field=field.features.shape,
         verts=[m[0].shape[0] for m in meshes],
         faces=[m[1].shape[0] for m in meshes])
    print("OK", flush=True)


if __name__ == "__main__":
    main()
