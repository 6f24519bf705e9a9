"""PTv3 seeded-weight forward parity vs the ACTUAL reference on CPU
(VERDICT r4 next #8): the reference ``PatchAttentionBlock`` / full
``PointTransformerV3`` (models/point_transformer_v3.py) runs through the
refbridge CPU stubs (explicit conv, CPU Morton, exact flash-attn stand-in)
and must match our flax modules with converted weights row-for-row.

Order note: the reference Morton kernel places z in the top interleave slot
(csrc/morton_code.cu:33), so reference MORTON_ZYX == our "xyz" ordering /
identity column permutation. Scenes pin a point at the origin so the
reference's global min-shift and our per-scene min-shift coincide.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from .refbridge import load_reference  # noqa: E402

wc = load_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from warpconvnet.geometry.types.voxels import Voxels as RefVoxels  # noqa: E402
from warpconvnet.geometry.coords.ops.serialization import POINT_ORDERING  # noqa: E402
from warpconvnet.models.point_transformer_v3 import (  # noqa: E402
    PatchAttentionBlock as RefBlock,
)

from warpconvnet_tpu.geometry.voxels import Voxels  # noqa: E402
from warpconvnet_tpu.models.point_transformer_v3 import (  # noqa: E402
    PatchAttentionBlock,
)
from warpconvnet_tpu.ops.keys import PAD_COORD  # noqa: E402

C, P, H = 16, 32, 4
CAP = 256


def _scenes(rng, sizes, coord_range=32):
    out = []
    for n in sizes:
        c = np.unique(rng.integers(0, coord_range, (n, 3)).astype(np.int32), axis=0)
        c[0] = 0  # pin origin: global min == per-scene min for Morton parity
        # host lex order so reference cat order == our padded order
        o = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
        out.append(c[o])
    return out


def _both_voxels(coords_list, feats_list, cap=CAP):
    ref = RefVoxels(
        [torch.from_numpy(c) for c in coords_list],
        [torch.from_numpy(f) for f in feats_list],
    )
    b = len(coords_list)
    coords = np.full((b, cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, cap, feats_list[0].shape[1]), np.float32)
    nv = np.zeros((b,), np.int32)
    for i, (c, f) in enumerate(zip(coords_list, feats_list)):
        nv[i] = len(c)
        coords[i, : len(c)] = c
        feats[i, : len(c)] = f
    ours = Voxels.create(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(nv)
    ).lex_sort()
    return ref, ours


def _rows_ref(vox, feats):
    c = vox.batch_indexed_coordinates.numpy()
    f = feats.detach().numpy()
    return {tuple(c[i]): f[i] for i in range(len(c))}


def _rows_ours(vox):
    c = np.asarray(vox.coords)
    f = np.asarray(vox.features)
    nv = np.asarray(vox.num_valid)
    return {
        (b,) + tuple(c[b, i]): f[b, i]
        for b in range(c.shape[0])
        for i in range(int(nv[b]))
    }


def _assert_rows_close(ref_rows, our_rows, atol, rtol=2e-3):
    assert set(ref_rows) == set(our_rows)
    worst = 0.0
    for key, rf in ref_rows.items():
        of = our_rows[key]
        worst = max(worst, float(np.abs(rf - of).max()))
        np.testing.assert_allclose(of, rf, atol=atol, rtol=rtol, err_msg=str(key))
    return worst


def _t(x):
    return np.asarray(x.detach())


def convert_block_params(ref_block):
    """Reference PatchAttentionBlock state_dict -> our flax param tree."""
    sd = {k: _t(v) for k, v in ref_block.state_dict().items()}
    dim = sd["conv.1.weight"].shape[0]
    return {
        "cpe_conv": {"kernel": sd["conv.0.weight"], "bias": sd["conv.0.bias"]},
        "cpe_proj": {"kernel": sd["conv.1.weight"].T, "bias": sd["conv.1.bias"]},
        "cpe_norm": {"scale": sd["conv.2.norm.weight"], "bias": sd["conv.2.norm.bias"]},
        "LayerNorm_0": {"scale": sd["norm1.norm.weight"], "bias": sd["norm1.norm.bias"]},
        "attn": {
            "attn": {
                "qkv": {
                    "kernel": sd["attention.qkv.weight"],
                    "bias": sd["attention.qkv.bias"].reshape(3, dim),
                },
                "proj": {
                    "kernel": sd["attention.proj.weight"].T,
                    "bias": sd["attention.proj.bias"],
                },
            }
        },
        "LayerNorm_1": {"scale": sd["norm2.norm.weight"], "bias": sd["norm2.norm.bias"]},
        "Dense_0": {"kernel": sd["mlp.mlp.0.weight"].T, "bias": sd["mlp.mlp.0.bias"]},
        "Dense_1": {"kernel": sd["mlp.mlp.3.weight"].T, "bias": sd["mlp.mlp.3.bias"]},
    }


def test_patch_attention_block_matches_reference():
    rng = np.random.default_rng(3)
    coords_list = _scenes(rng, (250, 180))
    feats_list = [
        (rng.standard_normal((len(c), C)) * 0.5).astype(np.float32)
        for c in coords_list
    ]
    ref_vox, our_vox = _both_voxels(coords_list, feats_list)

    torch.manual_seed(0)
    ref_block = RefBlock(
        in_channels=C,
        attention_channels=C,
        patch_size=P,
        num_heads=H,
        order=POINT_ORDERING.MORTON_ZYX,
    ).eval()
    with torch.no_grad():
        ref_out = ref_block(ref_vox)

    blk = PatchAttentionBlock(dim=C, patch_size=P, num_heads=H, rope_base=None)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_block_params(ref_block)
    )
    our_out = blk.apply(
        {"params": params}, our_vox, jnp.asarray([0, 1, 2], jnp.int32)
    )

    worst = _assert_rows_close(
        _rows_ref(ref_out, ref_out.features), _rows_ours(our_out), atol=3e-3
    )
    # fp16 qkv cast inside the reference attention bounds the gap
    assert worst < 3e-3


def _bn(sd, p):
    return (
        {"scale": sd[p + "weight"], "bias": sd[p + "bias"]},
        {"mean": sd[p + "running_mean"], "var": sd[p + "running_var"]},
    )


def _block_from_sd(sd, p):
    dim = sd[p + "conv.1.weight"].shape[0]
    return {
        "cpe_conv": {"kernel": sd[p + "conv.0.weight"], "bias": sd[p + "conv.0.bias"]},
        "cpe_proj": {"kernel": sd[p + "conv.1.weight"].T, "bias": sd[p + "conv.1.bias"]},
        "cpe_norm": {
            "scale": sd[p + "conv.2.norm.weight"],
            "bias": sd[p + "conv.2.norm.bias"],
        },
        "LayerNorm_0": {
            "scale": sd[p + "norm1.norm.weight"],
            "bias": sd[p + "norm1.norm.bias"],
        },
        "attn": {
            "attn": {
                "qkv": {
                    "kernel": sd[p + "attention.qkv.weight"],
                    "bias": sd[p + "attention.qkv.bias"].reshape(3, dim),
                },
                "proj": {
                    "kernel": sd[p + "attention.proj.weight"].T,
                    "bias": sd[p + "attention.proj.bias"],
                },
            }
        },
        "LayerNorm_1": {
            "scale": sd[p + "norm2.norm.weight"],
            "bias": sd[p + "norm2.norm.bias"],
        },
        "Dense_0": {"kernel": sd[p + "mlp.mlp.0.weight"].T, "bias": sd[p + "mlp.mlp.0.bias"]},
        "Dense_1": {"kernel": sd[p + "mlp.mlp.3.weight"].T, "bias": sd[p + "mlp.mlp.3.bias"]},
    }


def convert_model_params(ref_model, enc_depths, dec_depths):
    """Reference PointTransformerV3 state_dict -> (params, batch_stats)."""
    sd = {k: _t(v) for k, v in ref_model.state_dict().items()}
    num_level = len(enc_depths)
    params = {
        "stem": {"kernel": sd["conv.0.weight"]},
        "final": {"kernel": sd["final.block.weight"].T, "bias": sd["final.block.bias"]},
    }
    stats = {}
    params["stem_norm"], stats["stem_norm"] = _bn(sd, "conv.1.")
    for i in range(num_level):
        for d in range(enc_depths[i]):
            params[f"enc{i}_blk{d}"] = _block_from_sd(sd, f"encs.{i}.{d}.")
        if i < num_level - 1:
            params[f"down{i}_proj"] = {
                "kernel": sd[f"down_convs.{i}.0.weight"].T,
                "bias": sd[f"down_convs.{i}.0.bias"],
            }
            params[f"down{i}_norm"], stats[f"down{i}_norm"] = _bn(
                sd, f"down_convs.{i}.2."
            )
    # up_convs/decs lists were built deepest-first (reversed(range(num_level-1)))
    for j, i in enumerate(reversed(range(num_level - 1))):
        up = {
            "proj": {
                "kernel": sd[f"up_convs.{j}.proj.0.weight"].T,
                "bias": sd[f"up_convs.{j}.proj.0.bias"],
            },
            "proj_skip": {
                "kernel": sd[f"up_convs.{j}.proj_skip.0.weight"].T,
                "bias": sd[f"up_convs.{j}.proj_skip.0.bias"],
            },
        }
        up["proj_norm"], pn_stats = _bn(sd, f"up_convs.{j}.proj.1.")
        up["skip_norm"], sn_stats = _bn(sd, f"up_convs.{j}.proj_skip.1.")
        params[f"up{i}"] = up
        stats[f"up{i}"] = {"proj_norm": pn_stats, "skip_norm": sn_stats}
        for d in range(dec_depths[i]):
            params[f"dec{i}_blk{d}"] = _block_from_sd(sd, f"decs.{j}.{d}.")
    return params, stats


def test_ptv3_model_matches_reference():
    """Full forward: stem conv -> 3 encoder levels (patch attention +
    max-pool downs) -> SerializedUnpooling decoder -> final head, with the
    per-block order cycle mapped between the two Morton conventions."""
    from warpconvnet.models.point_transformer_v3 import (
        PointTransformerV3 as RefPTv3,
    )
    from warpconvnet_tpu.models.point_transformer_v3 import PointTransformerV3

    rng = np.random.default_rng(11)
    coords_list = _scenes(rng, (240, 170))
    cin = 4
    feats_list = [
        (rng.standard_normal((len(c), cin)) * 0.5).astype(np.float32)
        for c in coords_list
    ]
    ref_vox, our_vox = _both_voxels(coords_list, feats_list)

    enc_depths, dec_depths = (1, 1, 1), (1, 1)
    kw = dict(
        in_channels=cin,
        out_channels=5,
        enc_depths=enc_depths,
        enc_channels=(16, 32, 48),
        enc_num_head=(2, 4, 8),
        enc_patch_size=(P, P, P),
        dec_depths=dec_depths,
        dec_channels=(16, 32),
        dec_num_head=(2, 4),
        dec_patch_size=(P, P),
        shuffle_orders=False,
    )
    # Our perm cycle index j maps to the reference order with the REVERSED
    # permutation (reference Morton puts z in the top interleave slot).
    ref_orders = (
        POINT_ORDERING.MORTON_ZYX,
        POINT_ORDERING.MORTON_YZX,
        POINT_ORDERING.MORTON_ZXY,
        POINT_ORDERING.MORTON_XZY,
        POINT_ORDERING.MORTON_YXZ,
        POINT_ORDERING.MORTON_XYZ,
    )
    torch.manual_seed(0)
    ref = RefPTv3(drop_path=0.0, orders=ref_orders, **kw).eval()
    # Randomize BN running stats so eval-mode normalization is non-trivial.
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn_like(buf) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(1.0 + 0.5 * torch.rand_like(buf))
    with torch.no_grad():
        ref_out = ref(ref_vox)

    model = PointTransformerV3(capacities=(CAP, CAP, CAP), **kw)
    params, stats = convert_model_params(ref, enc_depths, dec_depths)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }
    our_out = model.apply(variables, our_vox, train=False)

    worst = _assert_rows_close(
        _rows_ref(ref_out, ref_out.features), _rows_ours(our_out),
        atol=5e-3, rtol=5e-3,
    )
    assert worst < 5e-3
