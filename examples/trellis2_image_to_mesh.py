"""TRELLIS.2 image -> 3D mesh inference example (reference
``examples/inference/trellis2_image_to_mesh.py``).

Without released TPU weights this runs the full pipeline graph end-to-end
with randomly initialized stage models (structure flow -> occupancy ->
sparse latent flow -> shape VAE -> dual-grid mesh) and writes an OBJ. Swap
``init_params`` for loaded checkpoints (utils/checkpoint.py) to run real
weights.

Usage: python examples/trellis2_image_to_mesh.py [--out /tmp/mesh.obj] [--cpu]
"""

from __future__ import annotations

import argparse
import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.models.trellis2 import (
    ShapeVaeDecoder,
    SLatFlowModel,
    SparseStructureDecoder,
    SparseStructureFlowModel,
    Trellis2ImageTo3DPipeline,
)
from warpconvnet_tpu.models.trellis2.pipeline import image_conditioner


def write_obj(path, verts, faces):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/trellis2_mesh.obj")
    ap.add_argument("--resolution", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)

    dim = 64
    ss_flow = SparseStructureFlowModel(
        resolution=args.resolution, in_channels=8, dim=dim, depth=2, num_heads=4
    )
    ss_dec = SparseStructureDecoder(channels=(16, 16))
    slat = SLatFlowModel(in_channels=8, dim=dim, depth=2, num_heads=4,
                         window_size=256)
    shape_dec = ShapeVaeDecoder(latent_channels=8, channels=(16,))

    key = jax.random.PRNGKey(0)
    ctx = image_conditioner(image, dim)
    r = args.resolution
    z0 = jnp.zeros((1, r, r, r, 8))
    t0 = jnp.zeros((1,))
    vox0 = Voxels.create(
        np.zeros((1, 512, 3), np.int32), np.zeros((1, 512, 8), np.float32),
        np.array([1], np.int32),
    )
    pipe = Trellis2ImageTo3DPipeline(
        ss_flow=ss_flow,
        ss_decoder=ss_dec,
        slat_flow=slat,
        shape_decoder=shape_dec,
        ss_flow_params=ss_flow.init(key, z0, t0, ctx),
        ss_decoder_params=ss_dec.init(key, z0),
        slat_flow_params=slat.init(key, vox0, t0, ctx),
        shape_decoder_params=shape_dec.init(key, vox0),
        voxel_capacity=512,
        num_steps=args.steps,
    )
    meshes = pipe.run(image)
    verts, faces = meshes[0]
    print(f"mesh: {len(verts)} vertices, {len(faces)} faces")
    if len(faces):
        write_obj(args.out, verts, faces)
        print(f"wrote {args.out}")
    else:
        print("(random weights produced an empty surface — expected without "
              "a checkpoint; the pipeline graph itself ran end-to-end)")


if __name__ == "__main__":
    main()
