"""TRELLIS.2 shape-VAE numerics parity vs the ACTUAL reference on CPU torch
(VERDICT r3 missing #5: real-weights end-to-end model validation).

Two tiers:

* Always-on: the reference ``FlexiDualGridVaeEncoder`` / ``...Decoder``
  (``/root/reference/warpconvnet/models/trellis2/shape_vae.py``) is
  instantiated with seeded random weights and run on CPU through the
  ``refbridge`` ``_C`` stub; the SAME weights are converted with
  ``convert_trellis2_state_dict`` + ``load_into_params`` into our
  checkpoint-compatible flax classes (``models/trellis2/shape_vae_ref.py``)
  and the outputs are matched coordinate-by-coordinate. This exercises the
  exact code path a published checkpoint takes — layout conversion,
  x-fastest child packing, norm placement — without downloads.

* Gated: if ``TRELLIS2_SHAPE_ENC`` points at the published
  ``shape_enc_next_dc_f16c32_fp16.safetensors`` (709 MB), the full
  published config is loaded (missing=0/unexpected=0 asserted) and the
  latent is checked finite and non-degenerate — the analog of the
  reference's ``tests/test_shape_vae_encoder_end_to_end.py`` gating.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from .refbridge import load_reference  # noqa: E402

wc = load_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from warpconvnet.geometry.types.voxels import Voxels as RefVoxels  # noqa: E402
from warpconvnet.models.trellis2.shape_vae import (  # noqa: E402
    FlexiDualGridVaeDecoder as RefDec,
    FlexiDualGridVaeEncoder as RefEnc,
)

from warpconvnet_tpu.geometry.voxels import Voxels  # noqa: E402
from warpconvnet_tpu.models.trellis2.shape_vae_ref import (  # noqa: E402
    FlexiDualGridVaeDecoder,
    FlexiDualGridVaeEncoder,
)
from warpconvnet_tpu.models.trellis2.weights import (  # noqa: E402
    convert_trellis2_state_dict,
    load_into_params,
)
from warpconvnet_tpu.ops.keys import PAD_COORD  # noqa: E402

_SMALL = dict(
    model_channels=[16, 32],
    latent_channels=4,
    num_blocks=[1, 1],
    block_type=["SparseConvNeXtBlock3d"] * 2,
    block_args=[{}, {}],
)


def _scene(rng, n, coord_range=16):
    # Even coords range so the S2C parent grid is well-populated.
    return np.unique(
        rng.integers(0, coord_range, (n, 3)).astype(np.int32), axis=0
    )


def _our_voxels(coords_list, feats_list):
    b = len(coords_list)
    cap = max(len(c) for c in coords_list)
    cdim = feats_list[0].shape[1]
    coords = np.full((b, cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, cap, cdim), np.float32)
    nv = np.zeros((b,), np.int32)
    for i, (c, f) in enumerate(zip(coords_list, feats_list)):
        nv[i] = len(c)
        coords[i, : len(c)] = c
        feats[i, : len(c)] = f
    return Voxels.create(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(nv)
    ).lex_sort()


def _ref_rows(vox):
    """batch-indexed coord tuple -> feature row (reference output)."""
    c = vox.coords.numpy()
    f = vox.feats.detach().float().numpy()
    return {tuple(int(v) for v in c[i]): f[i] for i in range(len(c))}


def _our_rows(vox):
    c = np.asarray(vox.coords)
    f = np.asarray(vox.features, np.float32)
    nv = np.asarray(vox.num_valid)
    rows = {}
    for b in range(c.shape[0]):
        for i in range(int(nv[b])):
            rows[(b,) + tuple(int(v) for v in c[b, i])] = f[b, i]
    return rows


def _match_rows(ref_rows, our_rows, atol=2e-4, rtol=2e-4):
    assert set(ref_rows) == set(our_rows), (
        f"coord sets differ: {len(ref_rows)} ref vs {len(our_rows)} ours; "
        f"only-ref {list(set(ref_rows) - set(our_rows))[:5]} "
        f"only-ours {list(set(our_rows) - set(ref_rows))[:5]}"
    )
    ref = np.stack([ref_rows[k] for k in sorted(ref_rows)])
    ours = np.stack([our_rows[k] for k in sorted(ref_rows)])
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol)


def _seeded_inputs(batch=2, n=260):
    rng = np.random.default_rng(7)
    coords = [_scene(rng, n), _scene(rng, n + 40)]
    coords = coords[:batch]
    verts = [rng.random((len(c), 3)).astype(np.float32) for c in coords]
    inter = [(rng.random((len(c), 3)) > 0.5) for c in coords]
    return coords, verts, inter


def test_encoder_matches_reference_with_converted_weights():
    coords, verts, inter = _seeded_inputs()
    torch.manual_seed(0)
    ref = RefEnc(down_block_type=["SparseResBlockS2C3d"], **_SMALL)
    ref.eval()

    rv = RefVoxels(
        [torch.from_numpy(c) for c in coords],
        [torch.from_numpy(v) for v in verts],
    )
    ri = RefVoxels(
        [torch.from_numpy(c) for c in coords],
        [torch.from_numpy(i.astype(np.float32)) for i in inter],
    )
    with torch.no_grad():
        z, ref_mean, ref_logvar = ref(rv, ri, return_raw=True)
    # Output coords live at the coarse (once-downsampled) scale.
    ref_out_vox = z.replace_features(torch.cat([ref_mean, ref_logvar], dim=-1))

    model = FlexiDualGridVaeEncoder(
        model_channels=tuple(_SMALL["model_channels"]),
        latent_channels=_SMALL["latent_channels"],
        num_blocks=tuple(_SMALL["num_blocks"]),
    )
    ov = _our_voxels(coords, verts)
    oi = _our_voxels(coords, [i.astype(np.float32) for i in inter])
    params = model.init(jax.random.PRNGKey(0), ov, oi)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    conv = convert_trellis2_state_dict(sd)
    params = {"params": load_into_params(params["params"], conv, strict=True)}
    z_vox, mean, logvar = model.apply(params, ov, oi)

    our_out = z_vox.replace_features(
        jnp.concatenate([mean, logvar], axis=-1)
    )
    _match_rows(_ref_rows(ref_out_vox), _our_rows(our_out))


def test_decoder_matches_reference_with_converted_weights():
    rng = np.random.default_rng(3)
    coords = [_scene(rng, 120, coord_range=8), _scene(rng, 90, coord_range=8)]
    lat = [rng.standard_normal((len(c), 4)).astype(np.float32) for c in coords]

    torch.manual_seed(1)
    ref = RefDec(
        resolution=16,
        up_block_type=["SparseResBlockC2S3d"],
        **_SMALL,
    )
    ref.eval()
    # Zero-init conv2 weights make half the decoder a fixed point; perturb
    # every parameter so the parity check is load-bearing.
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.05 * torch.randn_like(p))

    rz = RefVoxels(
        [torch.from_numpy(c) for c in coords],
        [torch.from_numpy(f) for f in lat],
    )
    with torch.no_grad():
        r_verts, r_inter, r_quad = ref(rz)

    model = FlexiDualGridVaeDecoder(
        model_channels=tuple(_SMALL["model_channels"]),
        latent_channels=_SMALL["latent_channels"],
        num_blocks=tuple(_SMALL["num_blocks"]),
    )
    oz = _our_voxels(coords, lat)
    params = model.init(jax.random.PRNGKey(0), oz)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    conv = convert_trellis2_state_dict(sd)
    params = {"params": load_into_params(params["params"], conv, strict=True)}
    o_verts, o_inter, o_quad = model.apply(params, oz)

    _match_rows(_ref_rows(r_verts), _our_rows(o_verts), atol=5e-4, rtol=5e-4)
    _match_rows(
        _ref_rows(r_quad), _our_rows(o_quad), atol=5e-4, rtol=5e-4
    )
    ri = {k: v.astype(np.float32) for k, v in _ref_rows(r_inter).items()}
    oi = {k: v.astype(np.float32) for k, v in _our_rows(o_inter).items()}
    _match_rows(ri, oi, atol=0, rtol=0)


_PUBLISHED_ENC = dict(
    model_channels=(64, 128, 256, 512, 1024),
    latent_channels=32,
    num_blocks=(0, 4, 8, 16, 4),
)


@pytest.mark.skipif(
    not os.path.exists(os.environ.get("TRELLIS2_SHAPE_ENC", "")),
    reason="published TRELLIS.2 shape-encoder safetensors not available "
    "(set TRELLIS2_SHAPE_ENC)",
)
def test_published_encoder_weights_load_and_run():
    """Real-weights gate (reference test_shape_vae_encoder_end_to_end.py):
    every published tensor must land in the model (strict), and the latent
    must be finite and non-degenerate."""
    from safetensors import safe_open

    sd = {}
    with safe_open(os.environ["TRELLIS2_SHAPE_ENC"], framework="np") as f:
        for k in f.keys():
            sd[k] = np.asarray(f.get_tensor(k), np.float32)

    model = FlexiDualGridVaeEncoder(**_PUBLISHED_ENC)
    rng = np.random.default_rng(0)
    coords = [_scene(rng, 600, coord_range=64)]
    verts = [rng.random((len(coords[0]), 3)).astype(np.float32)]
    inter = [(rng.random((len(coords[0]), 3)) > 0.5).astype(np.float32)]
    ov = _our_voxels(coords, verts)
    oi = _our_voxels(coords, inter)
    params = model.init(jax.random.PRNGKey(0), ov, oi)
    conv = convert_trellis2_state_dict(sd)
    params = {"params": load_into_params(params["params"], conv, strict=True)}
    z, mean, logvar = model.apply(params, ov, oi)
    m = np.asarray(mean)[np.asarray(z.valid_mask())]
    assert np.isfinite(m).all()
    assert m.std() > 1e-3


def test_checkpoint_to_mesh_chain_matches_reference(tmp_path):
    """Full chain, non-skipped (VERDICT r4 next #6): a checkpoint FILE in the
    reference state-dict schema -> strict load into our encoder+decoder ->
    encode -> decode -> dual-grid mesh extraction; the same fields from the
    reference model (same checkpoint) must produce the same mesh through the
    same extractor. The published-weights safetensors test stays env-gated;
    this covers the identical code path with seeded weights."""
    coords, verts, inter = _seeded_inputs(batch=1, n=200)

    torch.manual_seed(5)
    ref_enc = RefEnc(down_block_type=["SparseResBlockS2C3d"], **_SMALL)
    ref_dec = RefDec(resolution=16, up_block_type=["SparseResBlockC2S3d"], **_SMALL)
    ref_enc.eval(); ref_dec.eval()
    with torch.no_grad():
        for p in ref_dec.parameters():  # zero-init conv2s: make load-bearing
            p.add_(0.05 * torch.randn_like(p))

    # "Checkpoint": the reference's own state-dict schema, saved + reloaded.
    ckpt = tmp_path / "shape_vae_seeded.npz"
    sd = {f"encoder.{k}": v.numpy() for k, v in ref_enc.state_dict().items()}
    sd.update({f"decoder.{k}": v.numpy() for k, v in ref_dec.state_dict().items()})
    np.savez(ckpt, **sd)
    loaded = dict(np.load(ckpt))
    enc_sd = {k[len("encoder."):]: v for k, v in loaded.items() if k.startswith("encoder.")}
    dec_sd = {k[len("decoder."):]: v for k, v in loaded.items() if k.startswith("decoder.")}

    # Reference chain (encode mean -> decode -> same numpy extractor).
    rv = RefVoxels([torch.from_numpy(c) for c in coords],
                   [torch.from_numpy(v) for v in verts])
    ri = RefVoxels([torch.from_numpy(c) for c in coords],
                   [torch.from_numpy(i.astype(np.float32)) for i in inter])
    with torch.no_grad():
        z, r_mean, _ = ref_enc(rv, ri, return_raw=True)
        # Production path: the decoder input is a FRESH Voxels (in the real
        # pipeline it comes from the flow sampler). Decoding the encoder's
        # own output object would hit the S2C-written channel2spatial cache
        # and bypass predicted subdivision (sparse_resample.py:239-244) — a
        # train-time shortcut our functional design intentionally omits.
        z_fresh = RefVoxels(
            z.coords[:, 1:].clone(), r_mean.clone(), offsets=z.offsets.clone()
        )
        r_out = ref_dec(z_fresh)
    from warpconvnet_tpu.models.trellis2.mesh_extract import (
        flexi_dual_grid_mesh_single,
    )

    rc = z.coords.numpy()[:, 1:]
    r_mesh = flexi_dual_grid_mesh_single(
        r_out[0].coords.numpy()[:, 1:],
        r_out[0].feats.detach().float().numpy(),
        r_out[1].feats.detach().float().numpy() > 0.5,
        r_out[2].feats.detach().float().numpy(),
    )

    # Our chain from the same checkpoint file.
    enc = FlexiDualGridVaeEncoder(
        model_channels=tuple(_SMALL["model_channels"]),
        latent_channels=_SMALL["latent_channels"],
        num_blocks=tuple(_SMALL["num_blocks"]),
    )
    dec = FlexiDualGridVaeDecoder(
        model_channels=tuple(_SMALL["model_channels"]),
        latent_channels=_SMALL["latent_channels"],
        num_blocks=tuple(_SMALL["num_blocks"]),
    )
    ov = _our_voxels(coords, verts)
    oi = _our_voxels(coords, [i.astype(np.float32) for i in inter])
    enc_params = enc.init(jax.random.PRNGKey(0), ov, oi)
    enc_params = {"params": load_into_params(
        enc_params["params"], convert_trellis2_state_dict(enc_sd), strict=True)}
    z_vox, mean, _ = enc.apply(enc_params, ov, oi)
    zm = z_vox.replace_features(mean)
    dec_params = dec.init(jax.random.PRNGKey(1), zm)
    dec_params = {"params": load_into_params(
        dec_params["params"], convert_trellis2_state_dict(dec_sd), strict=True)}
    o_verts, o_inter, o_quad = dec.apply(dec_params, zm)

    nv0 = int(np.asarray(o_verts.num_valid)[0])
    o_mesh = flexi_dual_grid_mesh_single(
        np.asarray(o_verts.coords)[0, :nv0],
        np.asarray(o_verts.features, np.float32)[0, :nv0],
        np.asarray(o_inter.features)[0, :nv0] > 0.5,
        np.asarray(o_quad.features, np.float32)[0, :nv0],
    )

    # Same extractor + matching fields => same mesh. Vertex sets may be
    # ordered differently (lex sort), so compare as sorted point sets and
    # face/vertex counts.
    assert len(o_mesh[1]) == len(r_mesh[1]), (len(o_mesh[1]), len(r_mesh[1]))
    rv_sorted = np.array(sorted(map(tuple, np.round(r_mesh[0], 4))))
    ov_sorted = np.array(sorted(map(tuple, np.round(o_mesh[0], 4))))
    assert rv_sorted.shape == ov_sorted.shape
    np.testing.assert_allclose(ov_sorted, rv_sorted, atol=2e-3)
    assert len(o_mesh[1]) > 0  # the chain actually produced geometry
