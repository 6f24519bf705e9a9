"""TRELLIS.2 image -> 3D pipeline (reference
``models/trellis2/pipeline.py:124`` ``Trellis2ImageTo3DPipeline``):

1. image conditioner (DINO features; gated on `transformers` availability,
   with a deterministic patch-embed fallback so the pipeline runs offline),
2. sparse-structure flow sampling -> occupancy -> active voxel coords,
3. structured-latent (SLat) flow sampling on those voxels,
4. shape-VAE decode -> dual-grid field -> mesh extraction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.models.trellis2.mesh_extract import flexi_dual_grid_mesh
from warpconvnet_tpu.models.trellis2.shape_vae import ShapeVaeDecoder
from warpconvnet_tpu.models.trellis2.slat_flow import SLatFlowModel
from warpconvnet_tpu.models.trellis2.sparse_structure import (
    SparseStructureDecoder,
    SparseStructureFlowModel,
)
from warpconvnet_tpu.nn.samplers import flow_euler_sample
from warpconvnet_tpu.ops.keys import PAD_COORD


def image_conditioner(
    image: jnp.ndarray,
    dim: int = 256,
    params: Optional[dict] = None,
    module=None,
    depth: int = 4,
) -> jnp.ndarray:
    """Image [B, H, W, 3] -> conditioning tokens [B, S, dim].

    A real DINOv3-shaped ViT forward (:class:`ViTConditioner` — patch-16
    conv embed, cls + register tokens, 2D axial RoPE, pre-norm blocks,
    final layer norm; the reference's conditioner is
    ``image_cond.py:21-70`` DinoV3FeatureExtractor). With ``params=None``
    the weights are seeded-random (offline-deterministic); load a real
    DINOv3 checkpoint via ``weights.convert_dinov3_vit`` and pass it here.
    """
    from warpconvnet_tpu.models.trellis2.vit_cond import ViTConditioner

    if module is None:
        module = ViTConditioner(
            dim=dim, depth=depth, num_heads=max(4, dim // 64)
        )
    if params is None:
        shape_probe = jnp.zeros((1, 32, 32, 3), image.dtype)
        params = module.init(jax.random.PRNGKey(0), shape_probe)
    return module.apply(params, image)


@dataclasses.dataclass
class Trellis2ImageTo3DPipeline:
    """Holds the stage models + their params; ``run`` goes image -> mesh.

    Models are flax modules; params are passed explicitly (functional).
    """

    ss_flow: SparseStructureFlowModel
    ss_decoder: SparseStructureDecoder
    slat_flow: SLatFlowModel
    shape_decoder: ShapeVaeDecoder
    ss_flow_params: dict
    ss_decoder_params: dict
    slat_flow_params: dict
    shape_decoder_params: dict
    latent_channels: int = 8
    voxel_capacity: int = 4096
    num_steps: int = 25

    def sample_sparse_structure(self, key, context) -> Tuple[np.ndarray, np.ndarray]:
        """Flow-sample the structure latent, decode occupancy, return active
        voxel coords [B, cap, 3] + counts (host-side compaction — this is the
        pipeline boundary, not a jitted train step)."""
        b = context.shape[0]
        r = self.ss_flow.resolution
        x0 = jax.random.normal(
            key, (b, r, r, r, self.ss_flow.in_channels), jnp.float32
        )

        def vel(x, t):
            return self.ss_flow.apply(
                self.ss_flow_params, x, jnp.full((b,), t), context
            )

        z = flow_euler_sample(vel, x0, num_steps=self.num_steps)
        occ_logits = self.ss_decoder.apply(self.ss_decoder_params, z)[..., 0]
        occ = np.asarray(occ_logits > 0)
        coords = np.full((b, self.voxel_capacity, 3), PAD_COORD, np.int32)
        counts = np.zeros((b,), np.int32)
        for i in range(b):
            act = np.argwhere(occ[i])
            # Highest-logit voxels first if over capacity.
            if len(act) > self.voxel_capacity:
                logit = np.asarray(occ_logits[i])[tuple(act.T)]
                act = act[np.argsort(-logit)[: self.voxel_capacity]]
            counts[i] = len(act)
            coords[i, : len(act)] = act
        return coords, counts

    def sample_slat(self, key, coords, counts, context) -> Voxels:
        b = coords.shape[0]
        n = coords.shape[1]
        vox0 = Voxels.create(
            coords,
            jax.random.normal(key, (b, n, self.latent_channels), jnp.float32),
            counts,
        )

        def vel(feats, t):
            v = self.slat_flow.apply(
                self.slat_flow_params,
                vox0.replace(features=feats),
                jnp.full((b,), t),
                context,
            )
            return v.features

        z = flow_euler_sample(vel, vox0.features, num_steps=self.num_steps)
        z = jnp.where(vox0.valid_mask()[..., None], z, 0)
        return vox0.replace(features=z)

    def decode_to_mesh(self, slat: Voxels):
        field = self.shape_decoder.apply(self.shape_decoder_params, slat)
        attrs = ShapeVaeDecoder.decode_attrs(field)
        return flexi_dual_grid_mesh(*attrs)

    def run(self, image: jnp.ndarray, seed: int = 0):
        """Image [B, H, W, 3] in [0,1] -> list of (vertices, faces)."""
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        context = image_conditioner(image, self.ss_flow.dim)
        coords, counts = self.sample_sparse_structure(k1, context)
        slat = self.sample_slat(k2, coords, counts, context)
        return self.decode_to_mesh(slat)
