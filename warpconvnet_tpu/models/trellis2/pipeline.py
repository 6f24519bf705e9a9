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
class PipelineConfig:
    """Sampling configuration (reference ``PipelineConfig``,
    ``pipeline.py:58-121``): pipeline type drives resolutions; the slat_*
    knobs parameterize the guidance-interval Euler sampler.

    pipeline_type -> (ss_resolution, output mesh resolution):
      "512" -> (32, 512); "1024" -> (64, 1024);
      "1024_cascade"/"1536_cascade" -> (32, then LR 512 -> HR cascade).
    """

    pipeline_type: str = "512"
    ss_steps: int = 25
    ss_rescale_t: float = 3.0
    ss_guidance_strength: float = 7.5
    ss_guidance_rescale: float = 0.0
    ss_guidance_interval: Tuple[float, float] = (0.0, 1.0)
    slat_steps: int = 25
    slat_rescale_t: float = 3.0
    slat_guidance_strength: float = 3.0
    slat_guidance_rescale: float = 0.0
    slat_guidance_interval: Tuple[float, float] = (0.0, 1.0)
    cascade_max_tokens: int = 1 << 20

    TYPE_TABLE = {
        "512": (32, 512),
        "1024": (64, 1024),
        "1024_cascade": (32, 1024),
        "1536_cascade": (32, 1536),
    }

    @property
    def ss_resolution(self) -> int:
        return self.TYPE_TABLE[self.pipeline_type][0]

    @property
    def output_resolution(self) -> int:
        return self.TYPE_TABLE[self.pipeline_type][1]


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
    config: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)
    # Optional HR flow model for the cascade pipelines (the reference's
    # slat_flow_1024; ``slat_flow`` plays the 512 role).
    slat_flow_hr: Optional[SLatFlowModel] = None
    slat_flow_hr_params: Optional[dict] = None
    # Per-channel latent de-normalization (reference slat_normalization).
    slat_mean: Optional[jnp.ndarray] = None
    slat_std: Optional[jnp.ndarray] = None

    def sample_sparse_structure(
        self, key, context, neg_context=None,
        ss_resolution: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Flow-sample the structure latent, decode occupancy, return active
        voxel coords [B, cap, 3] + counts (host-side compaction — this is the
        pipeline boundary, not a jitted train step). With ``neg_context``
        the guidance-interval sampler drives the flow (reference
        ``sample_sparse_structure``, pipeline.py:163-193); a coarser
        ``ss_resolution`` max-pools the decoded occupancy down."""
        b = context.shape[0]
        r = self.ss_flow.resolution
        x0 = jax.random.normal(
            key, (b, r, r, r, self.ss_flow.in_channels), jnp.float32
        )

        if neg_context is not None:
            from warpconvnet_tpu.nn.samplers import flow_euler_guided_sample

            def velc(x, t, ctx):
                return self.ss_flow.apply(
                    self.ss_flow_params, x, jnp.full((b,), t), ctx
                )

            cfg = self.config
            z = flow_euler_guided_sample(
                velc, x0, context, neg_context,
                num_steps=cfg.ss_steps,
                rescale_t=cfg.ss_rescale_t,
                guidance_strength=cfg.ss_guidance_strength,
                guidance_interval=cfg.ss_guidance_interval,
                guidance_rescale=cfg.ss_guidance_rescale,
            )
        else:
            def vel(x, t):
                return self.ss_flow.apply(
                    self.ss_flow_params, x, jnp.full((b,), t), context
                )

            z = flow_euler_sample(vel, x0, num_steps=self.num_steps)
        occ_logits = self.ss_decoder.apply(self.ss_decoder_params, z)[..., 0]
        if ss_resolution is not None and ss_resolution != occ_logits.shape[1]:
            ratio = occ_logits.shape[1] // ss_resolution
            occ_logits = jax.lax.reduce_window(
                occ_logits, -jnp.inf, jax.lax.max,
                (1, ratio, ratio, ratio), (1, ratio, ratio, ratio), "VALID",
            )
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

    def sample_slat(
        self, key, coords, counts, context, neg_context=None,
        flow_model=None, flow_params=None,
    ) -> Voxels:
        """One SLat sampling stage (reference ``_sample_slat``,
        pipeline.py:196-226): guidance-interval Euler when a negative
        context is given, plain Euler otherwise; de-normalize with the
        published slat mean/std when provided."""
        flow_model = flow_model or self.slat_flow
        flow_params = flow_params or self.slat_flow_params
        b = coords.shape[0]
        n = coords.shape[1]
        vox0 = Voxels.create(
            coords,
            jax.random.normal(key, (b, n, self.latent_channels), jnp.float32),
            counts,
        )

        if neg_context is not None:
            from warpconvnet_tpu.nn.samplers import flow_euler_guided_sample

            def velc(feats, t, ctx):
                v = flow_model.apply(
                    flow_params, vox0.replace(features=feats),
                    jnp.full((b,), t), ctx,
                )
                return v.features

            cfg = self.config
            z = flow_euler_guided_sample(
                velc, vox0.features, context, neg_context,
                num_steps=cfg.slat_steps,
                rescale_t=cfg.slat_rescale_t,
                guidance_strength=cfg.slat_guidance_strength,
                guidance_interval=cfg.slat_guidance_interval,
                guidance_rescale=cfg.slat_guidance_rescale,
            )
        else:
            def vel(feats, t):
                v = flow_model.apply(
                    flow_params, vox0.replace(features=feats),
                    jnp.full((b,), t), context,
                )
                return v.features

            z = flow_euler_sample(vel, vox0.features, num_steps=self.num_steps)
        if self.slat_std is not None:
            z = z * self.slat_std + self.slat_mean
        z = jnp.where(vox0.valid_mask()[..., None], z, 0)
        return vox0.replace(features=z)

    def sample_slat_cascade(
        self, key, coords, counts, context, neg_context=None,
        upsample_times: int = 4, hr_capacity: Optional[int] = None,
    ) -> Voxels:
        """LR -> HR SLat cascade (reference ``sample_shape_slat_cascade``,
        pipeline.py:228-286): sample the LR SLat, upsample its coordinates
        through the shape decoder's predicted-subdivision C2S stages,
        quantize to the HR grid (shrinking the target by 128 while the
        unique-coordinate count exceeds the token budget), then sample the
        HR SLat on those coordinates with the HR flow model."""
        assert self.slat_flow_hr is not None, "cascade requires slat_flow_hr"
        k1, k2 = jax.random.split(key)
        lr = self.sample_slat(k1, coords, counts, context, neg_context)

        up = self.shape_decoder.apply(
            self.shape_decoder_params, lr, upsample_times=upsample_times
        )
        cfg = self.config
        lr_res = cfg.ss_resolution * 16
        hr_res = cfg.output_resolution
        up_c = np.asarray(up.coords)
        up_nv = np.asarray(up.num_valid)
        b = up_c.shape[0]
        cap = hr_capacity or self.voxel_capacity
        while True:
            scale = (hr_res // 16) / lr_res
            qc = [
                np.unique(
                    (up_c[i, : up_nv[i]].astype(np.float64) + 0.5) * scale,
                    axis=0,
                ).astype(np.int32)
                for i in range(b)
            ]
            if max(len(q) for q in qc) <= min(
                cfg.cascade_max_tokens, cap
            ) or hr_res <= 1024:
                break
            hr_res -= 128
        coords_hr = np.full((b, cap, 3), PAD_COORD, np.int32)
        counts_hr = np.zeros((b,), np.int32)
        for i in range(b):
            q = qc[i][:cap]
            counts_hr[i] = len(q)
            coords_hr[i, : len(q)] = q
        return self.sample_slat(
            k2, coords_hr, counts_hr, context, neg_context,
            flow_model=self.slat_flow_hr,
            flow_params=self.slat_flow_hr_params,
        )

    def decode_to_mesh(self, slat: Voxels):
        field = self.shape_decoder.apply(self.shape_decoder_params, slat)
        attrs = ShapeVaeDecoder.decode_attrs(field)
        return flexi_dual_grid_mesh(*attrs)

    def run(self, image: jnp.ndarray, seed: int = 0, guidance: bool = False):
        """Image [B, H, W, 3] in [0,1] -> list of (vertices, faces).

        ``guidance``: classifier-free guidance with a zero negative context
        (the reference ``get_cond`` returns cond + neg_cond; zeros is its
        unconditional embedding stand-in)."""
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        context = image_conditioner(image, self.ss_flow.dim)
        neg = jnp.zeros_like(context) if guidance else None
        coords, counts = self.sample_sparse_structure(
            k1, context, neg_context=neg
        )
        if self.config.pipeline_type.endswith("_cascade"):
            slat = self.sample_slat_cascade(
                k2, coords, counts, context, neg_context=neg
            )
        else:
            slat = self.sample_slat(
                k2, coords, counts, context, neg_context=neg
            )
        return self.decode_to_mesh(slat)
