"""TRELLIS.2 stage tests: structure flow/decoder, shape VAE, slat flow, mesh
extraction, end-to-end tiny pipeline (reference tests/models trellis suite)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.ops.keys import PAD_COORD


def _voxels(rng, b=2, n=64, grid=8, c=8):
    coords_list, feats_list, nv = [], [], []
    for _ in range(b):
        raw = rng.integers(0, grid, size=(n, 3)).astype(np.int32)
        uniq = np.unique(raw, axis=0)
        nv.append(len(uniq))
        cpad = np.full((n, 3), PAD_COORD, np.int32)
        cpad[: len(uniq)] = uniq
        f = np.zeros((n, c), np.float32)
        f[: len(uniq)] = rng.standard_normal((len(uniq), c))
        coords_list.append(cpad)
        feats_list.append(f)
    return Voxels.create(np.stack(coords_list), np.stack(feats_list), np.array(nv))


def test_sparse_structure_flow_and_decoder():
    from warpconvnet_tpu.models.trellis2.sparse_structure import (
        SparseStructureDecoder,
        SparseStructureFlowModel,
    )

    rng = np.random.default_rng(0)
    model = SparseStructureFlowModel(resolution=8, in_channels=4, dim=32,
                                     depth=2, num_heads=4)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([0.5, 0.9])
    ctx = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    v = model.apply(params, x, t, ctx)
    assert v.shape == x.shape
    # zero-init output head -> zero velocity at init
    np.testing.assert_allclose(np.asarray(v), 0, atol=1e-6)

    dec = SparseStructureDecoder(channels=(16, 8, 8))
    z = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 4)), jnp.float32)
    dparams = dec.init(jax.random.PRNGKey(1), z)
    occ = dec.apply(dparams, z)
    # reference layout: upsample BETWEEN stages -> len(channels)-1 doublings
    assert occ.shape == (1, 16, 16, 16, 1)


@pytest.mark.slow
def test_shape_vae_roundtrip_shapes():
    from warpconvnet_tpu.models.trellis2.shape_vae import (
        ShapeVaeDecoder,
        ShapeVaeEncoder,
        reparameterize,
    )

    rng = np.random.default_rng(1)
    # Encoder downsamples once (s2c) -> coords must be pairable; use grid 8.
    vox = _voxels(rng, n=64, grid=8, c=4)
    enc = ShapeVaeEncoder(in_channels=4, latent_channels=4, channels=(8, 16))
    eparams = enc.init(jax.random.PRNGKey(0), vox)
    mean, logvar = enc.apply(eparams, vox)
    assert mean.features.shape[-1] == 4
    assert logvar.shape == mean.features.shape

    z = reparameterize(jax.random.PRNGKey(1), mean, logvar)
    dec = ShapeVaeDecoder(latent_channels=4, channels=(16, 8))
    dparams = dec.init(jax.random.PRNGKey(2), z)
    field = dec.apply(dparams, z)
    assert field.features.shape[-1] == 7  # FlexiDualGrid attrs
    # decoder upsamples once -> capacity 8x the latent rows; the predicted
    # subdivision mask keeps a data-dependent subset (>= 1 child/parent).
    assert field.coords.shape[1] == mean.coords.shape[1] * 8
    assert int(np.asarray(field.num_valid).sum()) >= int(
        np.asarray(mean.num_valid).sum()
    )
    verts, inter, ql = ShapeVaeDecoder.decode_attrs(field)
    v = np.asarray(verts.features)
    assert (v >= -0.5 - 1e-6).all() and (v <= 1.5 + 1e-6).all()
    assert inter.features.dtype == bool
    assert (np.asarray(ql.features) >= 0).all()


def test_slat_flow_zero_init_velocity():
    from warpconvnet_tpu.models.trellis2.slat_flow import SLatFlowModel

    rng = np.random.default_rng(2)
    vox = _voxels(rng, n=64, c=4)
    model = SLatFlowModel(in_channels=4, dim=32, depth=2, num_heads=4,
                          window_size=64)
    t = jnp.asarray([0.3, 0.7])
    ctx = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), vox, t, ctx)
    v = model.apply(params, vox, t, ctx)
    np.testing.assert_allclose(np.asarray(v.features), 0, atol=1e-6)


def test_dual_grid_mesh_sphere():
    """Extraction of an implicit sphere produces a closed-ish mesh with
    sane vertex count."""
    from warpconvnet_tpu.models.trellis2.mesh_extract import dual_grid_mesh_single

    g = 12
    cc = np.stack(np.meshgrid(*[np.arange(g)] * 3, indexing="ij"), -1).reshape(-1, 3)
    center = (g - 1) / 2
    sdf = np.linalg.norm(cc + 0.5 - center, axis=-1) - g / 3.5
    keep = np.abs(sdf) < 2.5  # narrow band (sparse active set)
    coords = cc[keep]
    verts, faces = dual_grid_mesh_single(
        coords, sdf[keep], np.zeros((keep.sum(), 3), np.float32)
    )
    assert len(faces) > 100
    assert faces.max() < len(verts)
    # All face vertices near the zero level set.
    d = np.linalg.norm(verts[faces.reshape(-1)] - center, axis=-1) - g / 3.5
    assert np.abs(d).max() < 2.0


@pytest.mark.slow
def test_pipeline_end_to_end_tiny():
    from warpconvnet_tpu.models.trellis2.pipeline import (
        Trellis2ImageTo3DPipeline,
        image_conditioner,
    )
    from warpconvnet_tpu.models.trellis2.shape_vae import ShapeVaeDecoder
    from warpconvnet_tpu.models.trellis2.slat_flow import SLatFlowModel
    from warpconvnet_tpu.models.trellis2.sparse_structure import (
        SparseStructureDecoder,
        SparseStructureFlowModel,
    )

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    ctx = image_conditioner(img, 32)
    assert ctx.shape[0] == 1 and ctx.shape[-1] == 32

    ss_flow = SparseStructureFlowModel(resolution=4, in_channels=4, dim=32,
                                       depth=1, num_heads=4)
    ss_dec = SparseStructureDecoder(channels=(8,))
    slat = SLatFlowModel(in_channels=4, dim=32, depth=1, num_heads=4,
                         window_size=64)
    shape_dec = ShapeVaeDecoder(latent_channels=4, channels=(8,))

    key = jax.random.PRNGKey(0)
    z0 = jnp.zeros((1, 4, 4, 4, 4))
    t0 = jnp.zeros((1,))
    vox0 = Voxels.create(
        np.zeros((1, 64, 3), np.int32), np.zeros((1, 64, 4), np.float32),
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
        latent_channels=4,
        voxel_capacity=64,
        num_steps=2,
    )
    meshes = pipe.run(img)
    assert len(meshes) == 1
    verts, faces = meshes[0]
    assert verts.ndim == 2 and verts.shape[1] == 3
    assert faces.ndim == 2 and faces.shape[1] == 3


def test_vit_conditioner_and_dinov3_converter():
    """Real ViT conditioner forward + DINOv3 torch-naming weight load
    (both fused-qkv and transformers split q/k/v naming)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu.models.trellis2.vit_cond import ViTConditioner
    from warpconvnet_tpu.models.trellis2.weights import convert_dinov3_vit

    rng = np.random.default_rng(50)
    d, depth, heads, p, nreg = 32, 2, 4, 16, 4
    m = ViTConditioner(dim=d, depth=depth, num_heads=heads,
                       num_registers=nreg)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    ref_params = m.init(jax.random.PRNGKey(1), img)

    # Synthetic torch-style DINOv3 dict (transformers>=5 split naming).
    sd = {
        "embeddings.patch_embeddings.weight":
            rng.standard_normal((d, 3, p, p)).astype(np.float32),
        "embeddings.patch_embeddings.bias":
            rng.standard_normal((d,)).astype(np.float32),
        "embeddings.cls_token": rng.standard_normal((1, 1, d)).astype(np.float32),
        "embeddings.register_tokens":
            rng.standard_normal((1, nreg, d)).astype(np.float32),
    }
    for i in range(depth):
        pre = f"layer.{i}."
        sd[pre + "norm1.weight"] = np.ones((d,), np.float32)
        sd[pre + "norm1.bias"] = np.zeros((d,), np.float32)
        sd[pre + "norm2.weight"] = np.ones((d,), np.float32)
        sd[pre + "norm2.bias"] = np.zeros((d,), np.float32)
        for prj in ("q_proj", "k_proj", "v_proj"):
            sd[pre + f"attention.{prj}.weight"] = (
                rng.standard_normal((d, d)).astype(np.float32) * 0.05)
            sd[pre + f"attention.{prj}.bias"] = np.zeros((d,), np.float32)
        sd[pre + "attention.o_proj.weight"] = (
            rng.standard_normal((d, d)).astype(np.float32) * 0.05)
        sd[pre + "attention.o_proj.bias"] = np.zeros((d,), np.float32)
        sd[pre + "mlp.fc1.weight"] = (
            rng.standard_normal((4 * d, d)).astype(np.float32) * 0.05)
        sd[pre + "mlp.fc1.bias"] = np.zeros((4 * d,), np.float32)
        sd[pre + "mlp.fc2.weight"] = (
            rng.standard_normal((d, 4 * d)).astype(np.float32) * 0.05)
        sd[pre + "mlp.fc2.bias"] = np.zeros((d,), np.float32)
        sd[pre + "layer_scale1.lambda1"] = np.full((d,), 1e-5, np.float32)
        sd[pre + "layer_scale2.lambda1"] = np.full((d,), 1e-5, np.float32)

    conv = convert_dinov3_vit(sd)
    # Same tree structure (paths + shapes) as a fresh init.
    ref_flat = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(conv)[0]
    ref_paths = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
    got_paths = {jax.tree_util.keystr(k): v.shape for k, v in got_flat}
    assert ref_paths == got_paths, (
        set(ref_paths) ^ set(got_paths),
        {k: (ref_paths.get(k), got_paths.get(k))
         for k in ref_paths if got_paths.get(k) != ref_paths[k]},
    )
    out = m.apply(conv, img)
    assert out.shape == (2, 1 + nreg + 16, d)
    assert bool(jnp.isfinite(out).all())
    # Converted patch-embed weights actually flow through: permuted conv
    # kernel matches torch semantics.
    w_flax = np.asarray(conv["params"]["patch_embed"]["kernel"])
    np.testing.assert_allclose(
        w_flax,
        np.transpose(sd["embeddings.patch_embeddings.weight"], (2, 3, 1, 0)),
    )


def test_flexi_dual_grid_mesh_plane():
    """FlexiDualGrid extraction on a flat z-plane slab: every z-edge on the
    interface is intersected -> a quad sheet (2 triangles per interior
    cell), vertices inside [-margin, 1+margin] around their voxel."""
    from warpconvnet_tpu.models.trellis2.mesh_extract import (
        flexi_dual_grid_mesh_single,
    )

    m = 6
    coords = np.stack(
        np.meshgrid(np.arange(m), np.arange(m), np.arange(2), indexing="ij"),
        -1,
    ).reshape(-1, 3).astype(np.int32)
    n = len(coords)
    vertices = np.full((n, 3), 0.5, np.float32)
    intersected = np.zeros((n, 3), bool)
    intersected[coords[:, 2] == 0, 2] = True  # z-edge 0 -> 1 crosses
    quad_lerp = np.ones((n, 1), np.float32)
    verts, faces = flexi_dual_grid_mesh_single(
        coords, vertices, intersected, quad_lerp
    )
    assert len(verts) == n
    # (m-1)^2 interior edge-quads x 2 triangles
    assert len(faces) == 2 * (m - 1) * (m - 1)
    assert faces.min() >= 0 and faces.max() < n


def test_c2s_subdiv_mask_compaction():
    """Masked channel-to-spatial keeps only masked children, front-packed
    and lex-sorted."""
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu.geometry.voxels import Voxels
    from warpconvnet_tpu.nn.modules.sparse_resample import (
        SparseChannel2Spatial,
    )
    from warpconvnet_tpu.ops.keys import PAD_COORD, pack_coords

    rng = np.random.default_rng(5)
    b, n, c = 2, 16, 16
    coords = np.full((b, n, 3), PAD_COORD, np.int32)
    nv = np.array([12, 9], np.int32)
    for i in range(b):
        raw = np.unique(
            rng.integers(0, 6, size=(nv[i] + 6, 3)).astype(np.int32), axis=0
        )[: nv[i]]
        nv[i] = len(raw)
        coords[i, : len(raw)] = raw
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    vox = Voxels.create(coords, jnp.asarray(feats), jnp.asarray(nv)).lex_sort()

    mask = jnp.asarray(rng.uniform(size=(b, n, 8)) > 0.4)
    mod = SparseChannel2Spatial()
    out = mod.apply({}, vox, subdiv_mask=mask)

    kept = np.asarray(
        mask & np.asarray(vox.valid_mask())[..., None]
    ).reshape(b, -1)
    np.testing.assert_array_equal(
        np.asarray(out.num_valid), kept.sum(1).astype(np.int32)
    )
    # valid rows front-packed and lex-sorted
    oc = np.asarray(out.coords)
    for i in range(b):
        k = int(out.num_valid[i])
        assert not (oc[i, :k] >= PAD_COORD).any()
        assert (oc[i, k:] == PAD_COORD).all()
        keys = [tuple(r) for r in oc[i, :k]]
        assert keys == sorted(keys)


def test_guided_sampler_reduces_to_plain_at_strength_one():
    """flow_euler_guided_sample with strength=1 must equal the plain Euler
    path on the same velocity."""
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu.nn.samplers import (
        flow_euler_guided_sample,
        flow_euler_sample,
    )

    def vel(x, t, ctx):
        return -x * (1 + 0.1 * ctx)

    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)))
    a = flow_euler_guided_sample(
        vel, x0, 1.0, 0.0, num_steps=8, rescale_t=1.0, guidance_strength=1.0
    )
    b = flow_euler_sample(lambda x, t: vel(x, t, 1.0), x0, num_steps=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # rescale_t warps the grid -> different trajectory, still finite.
    c = flow_euler_guided_sample(
        vel, x0, 1.0, 0.0, num_steps=8, rescale_t=3.0,
        guidance_strength=2.0, guidance_rescale=0.5,
        guidance_interval=(0.2, 0.8),
    )
    assert bool(jnp.all(jnp.isfinite(c)))


@pytest.mark.slow
def test_slat_cascade_tiny():
    """LR->HR cascade produces HR coords within capacity and a finite SLat."""
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu.models.trellis2.pipeline import (
        PipelineConfig,
        Trellis2ImageTo3DPipeline,
    )
    from warpconvnet_tpu.models.trellis2.shape_vae import ShapeVaeDecoder
    from warpconvnet_tpu.models.trellis2.slat_flow import SLatFlowModel
    from warpconvnet_tpu.models.trellis2.sparse_structure import (
        SparseStructureDecoder,
        SparseStructureFlowModel,
    )

    rng = np.random.default_rng(9)
    ss_flow = SparseStructureFlowModel(resolution=4, in_channels=4, dim=32,
                                       depth=1, num_heads=4)
    ss_dec = SparseStructureDecoder(channels=(8,))
    slat = SLatFlowModel(in_channels=4, dim=32, depth=1, num_heads=4,
                         window_size=64)
    slat_hr = SLatFlowModel(in_channels=4, dim=32, depth=1, num_heads=4,
                            window_size=64)
    # decoder with 2 C2S stages -> upsample_times up to 2
    shape_dec = ShapeVaeDecoder(latent_channels=4, channels=(8, 8, 8))

    key = jax.random.PRNGKey(0)
    z0 = jnp.zeros((1, 4, 4, 4, 4))
    t0 = jnp.zeros((1,))
    vox0 = Voxels.create(
        np.zeros((1, 64, 3), np.int32), np.zeros((1, 64, 4), np.float32),
        np.array([1], np.int32),
    )
    ctx = jnp.zeros((1, 4, 32))
    pipe = Trellis2ImageTo3DPipeline(
        ss_flow=ss_flow,
        ss_decoder=ss_dec,
        slat_flow=slat,
        shape_decoder=shape_dec,
        ss_flow_params=ss_flow.init(key, z0, t0, ctx),
        ss_decoder_params=ss_dec.init(key, z0),
        slat_flow_params=slat.init(key, vox0, t0, ctx),
        shape_decoder_params=shape_dec.init(key, vox0),
        latent_channels=4,
        voxel_capacity=512,
        num_steps=2,
        config=PipelineConfig(pipeline_type="1024_cascade", slat_steps=2),
        slat_flow_hr=slat_hr,
        slat_flow_hr_params=slat_hr.init(key, vox0, t0, ctx),
    )
    coords = np.zeros((1, 64, 3), np.int32)
    coords[0, :8] = np.argwhere(np.ones((2, 2, 2)))
    counts = np.array([8], np.int32)
    out = pipe.sample_slat_cascade(
        jax.random.PRNGKey(1), coords, counts, ctx, neg_context=0 * ctx,
        upsample_times=2,
    )
    assert int(out.num_valid[0]) > 0
    assert bool(jnp.all(jnp.isfinite(out.features)))


def test_slat_flow_share_mod_and_ape():
    """share_mod: one shared adaLN head, none per block; pe_mode='ape' adds
    a coord embedding; forward stays finite and zero-init at t=0."""
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu.models.trellis2.slat_flow import SLatFlowModel

    m = SLatFlowModel(in_channels=4, dim=32, depth=2, num_heads=4,
                      window_size=64, share_mod=True, pe_mode="ape")
    vox = Voxels.create(
        np.zeros((1, 64, 3), np.int32), np.zeros((1, 64, 4), np.float32),
        np.array([8], np.int32),
    )
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 4, 32))
    p = m.init(jax.random.PRNGKey(0), vox, t, ctx)
    import jax.tree_util as jtu

    names = [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(p)[0]]
    assert not any("block0" in n and "adaLN'" in n for n in names)
    assert any("adaLN_shared" in n for n in names)
    v = m.apply(p, vox, t, ctx)
    assert bool(jnp.all(jnp.isfinite(v.features)))
