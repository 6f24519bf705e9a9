"""Numerics parity vs the ACTUAL reference (/root/reference) on CPU torch.

BASELINE.md: "kernel maps and outputs matching reference to fp32 tolerance".
These tests run the reference's own coordinate + explicit-GEMM code
(``helper.generate_output_coords_and_kernel_map`` +
``detail/explicit.py:SpatiallySparseConvExplicitGEMMFunction``) through the
CPU ``_C`` stub (see refbridge.py) on shared random scenes and assert our
kernel maps (as pair sets) and conv outputs/gradients match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from .refbridge import load_reference  # noqa: E402

wc = load_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from warpconvnet.geometry.types.voxels import Voxels as RefVoxels  # noqa: E402
from warpconvnet.nn.functional.sparse_conv.helper import (  # noqa: E402
    generate_output_coords_and_kernel_map as ref_gen_map,
)
from warpconvnet.nn.functional.sparse_conv.detail.explicit import (  # noqa: E402
    SpatiallySparseConvExplicitGEMMFunction as RefExplicit,
)

from warpconvnet_tpu.geometry.voxels import Voxels  # noqa: E402
from warpconvnet_tpu.nn.functional.sparse_conv import (  # noqa: E402
    spatially_sparse_conv,
)
from warpconvnet_tpu.ops.keys import PAD_COORD  # noqa: E402


def _scenes(rng, sizes, coord_range=24):
    out = []
    for n in sizes:
        c = np.unique(rng.integers(0, coord_range, (n, 3)).astype(np.int32), axis=0)
        out.append(c)
    return out


def _ref_voxels(coords_list, feats_list):
    return RefVoxels(
        [torch.from_numpy(c) for c in coords_list],
        [torch.from_numpy(f) for f in feats_list],
    )


def _our_voxels(coords_list, feats_list, cap=None):
    b = len(coords_list)
    cap = cap or max(len(c) for c in coords_list)
    cdim = feats_list[0].shape[1]
    coords = np.full((b, cap, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, cap, cdim), np.float32)
    nv = np.zeros((b,), np.int32)
    for i, (c, f) in enumerate(zip(coords_list, feats_list)):
        nv[i] = len(c)
        coords[i, : len(c)] = c
        feats[i, : len(c)] = f
    return Voxels.create(jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(nv)).lex_sort()


def _ref_out_rows(bic_out, out_feats):
    """coord tuple -> feature row, from reference batch-indexed coords."""
    c = bic_out.numpy()
    f = out_feats.detach().numpy()
    return {tuple(c[i]): f[i] for i in range(len(c))}


def _our_out_rows(vox_out):
    c = np.asarray(vox_out.coords)
    f = np.asarray(vox_out.features)
    nv = np.asarray(vox_out.num_valid)
    rows = {}
    for b in range(c.shape[0]):
        for i in range(int(nv[b])):
            rows[(b,) + tuple(c[b, i])] = f[b, i]
    return rows


def _triples_ref(km, bic_in, bic_out):
    """Reference kernel map -> set of (in_coord, out_coord) pairs tagged by
    their IMPLIED spatial delta, robust to offset enumeration order."""
    ci, co = bic_in.numpy(), bic_out.numpy()
    trips = set()
    for k in range(len(km)):
        im, om = km[k]
        for i, o in zip(im.numpy(), om.numpy()):
            trips.add((tuple(ci[i]), tuple(co[o])))
    return trips


def _triples_ours(bpt, vox_in, oc, onv):
    ci = np.asarray(vox_in.coords)
    co = np.asarray(oc)
    nvi = np.asarray(vox_in.num_valid)
    table = np.asarray(bpt.table)
    trips = set()
    b, k, m = table.shape
    onv = np.asarray(onv)
    for bb in range(b):
        for kk in range(k):
            for o in range(int(onv[bb])):
                i = table[bb, kk, o]
                if i >= 0:
                    trips.add(
                        ((bb,) + tuple(ci[bb, i]), (bb,) + tuple(co[bb, o]))
                    )
    return trips


def _run_ref(coords_list, feats_list, w, ks, stride=1, dilation=1,
             transposed=False, generative=False, out_tensor=None):
    vox = _ref_voxels(coords_list, feats_list)
    ks3 = (ks,) * 3 if isinstance(ks, int) else tuple(ks)
    st3 = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
    dil3 = (dilation,) * 3 if isinstance(dilation, int) else tuple(dilation)
    oc, ooff, km = ref_gen_map(
        vox, ks3, dil3, st3, generative=generative, transposed=transposed,
        output_spatially_sparse_tensor=out_tensor,
    )
    wt = torch.from_numpy(w).requires_grad_(True)
    feats = vox.features.detach().requires_grad_(True)
    out = RefExplicit.apply(feats, wt, km, oc.shape[0], None)
    return vox, oc, km, out, feats, wt


def _grad_ref(out, feats, wt, g):
    out.backward(torch.from_numpy(g))
    return feats.grad.numpy(), wt.grad.numpy()


CIN, COUT = 8, 12


@pytest.fixture
def data():
    rng = np.random.default_rng(42)
    coords = _scenes(rng, [900, 700])
    feats = [rng.standard_normal((len(c), CIN)).astype(np.float32) for c in coords]
    w = (rng.standard_normal((27, CIN, COUT)) * 0.2).astype(np.float32)
    return rng, coords, feats, w


def test_kernel_map_parity_submanifold(data):
    rng, coords, feats, w = data
    vox, oc, km, *_ = _run_ref(coords, feats, w, 3)
    ours = _our_voxels(coords, feats)
    out_vox, bpt = spatially_sparse_conv(ours, jnp.asarray(w), 3)
    ref_t = _triples_ref(km, vox.batch_indexed_coordinates, oc)
    our_t = _triples_ours(bpt, ours, out_vox.coords, out_vox.num_valid)
    assert ref_t == our_t


def test_kernel_map_parity_dilated(data):
    """Dilation goes through the reference's method='offset' probe
    (helper's size method rejects dilation, torch_discrete.py:398)."""
    from warpconvnet.geometry.coords.search.torch_discrete import (
        generate_kernel_map,
    )

    rng, coords, feats, w = data
    # Out coords = strict subset, so the reference does not take its
    # identity-truncation path (torch_discrete.py:131-135, which is
    # inconsistent with _kernel_map_from_offsets' own index assert).
    out_coords = [c[:-3] for c in coords]
    vox = _ref_voxels(coords, feats)
    out_ref_vox = _ref_voxels(out_coords, [f[:-3] for f in feats])
    bic = vox.batch_indexed_coordinates
    bic_out = out_ref_vox.batch_indexed_coordinates
    km = generate_kernel_map(bic, bic_out, (1, 1, 1), (3, 3, 3), (2, 2, 2),
                             method="offset")
    ours = _our_voxels(coords, feats)
    ours_out = _our_voxels(out_coords, [f[:-3] for f in feats])
    out_vox, bpt = spatially_sparse_conv(
        ours, jnp.asarray(w), 3, dilation=2, out_coords=ours_out
    )
    ref_t = _triples_ref(km, bic, bic_out)
    our_t = _triples_ours(bpt, ours, out_vox.coords, out_vox.num_valid)
    assert ref_t == our_t


@pytest.mark.parametrize("ks,stride,dil", [(3, 2, 1), (2, 2, 1)])
def test_kernel_map_parity_variants(data, ks, stride, dil):
    rng, coords, feats, w = data
    k_vol = ks ** 3
    w = (rng.standard_normal((k_vol, CIN, COUT)) * 0.2).astype(np.float32)
    vox, oc, km, *_ = _run_ref(coords, feats, w, ks, stride=stride, dilation=dil)
    ours = _our_voxels(coords, feats)
    out_vox, bpt = spatially_sparse_conv(
        ours, jnp.asarray(w), ks, stride=stride, dilation=dil
    )
    ref_t = _triples_ref(km, vox.batch_indexed_coordinates, oc)
    our_t = _triples_ours(bpt, ours, out_vox.coords, out_vox.num_valid)
    assert ref_t == our_t
    # Output coordinate SETS must match too (divided-scale contract).
    ref_coords = {tuple(r) for r in oc.numpy()}
    our_coords = set()
    c = np.asarray(out_vox.coords)
    nv = np.asarray(out_vox.num_valid)
    for b in range(c.shape[0]):
        for i in range(int(nv[b])):
            our_coords.add((b,) + tuple(c[b, i]))
    assert ref_coords == our_coords


def test_conv_output_and_grad_parity_submanifold(data):
    rng, coords, feats, w = data
    vox, oc, km, out, rfeats, rwt = _run_ref(coords, feats, w, 3)
    g = rng.standard_normal(out.shape).astype(np.float32)
    ref_dx, ref_dw = _grad_ref(out, rfeats, rwt, g)
    ref_rows = _ref_out_rows(oc, out)
    ref_dx_rows = {
        tuple(vox.batch_indexed_coordinates.numpy()[i]): ref_dx[i]
        for i in range(len(ref_dx))
    }

    ours = _our_voxels(coords, feats)
    wj = jnp.asarray(w)

    def f(feats_arr, weight):
        v = ours.replace(features=feats_arr)
        out_v, _ = spatially_sparse_conv(v, weight, 3)
        return out_v.features, out_v

    out_f, vjp, out_vox = jax.vjp(f, ours.features, wj, has_aux=True)
    our_rows = _our_out_rows(out_vox.replace(features=out_f))
    assert set(ref_rows) == set(our_rows)
    for key, rf in ref_rows.items():
        np.testing.assert_allclose(our_rows[key], rf, rtol=2e-4, atol=2e-4)

    # Upstream grad laid out per our row order, matched by coordinate.
    gj = np.zeros(np.asarray(out_f).shape, np.float32)
    oc_np = np.asarray(out_vox.coords)
    nv = np.asarray(out_vox.num_valid)
    ref_c = oc.numpy()
    ref_row_of = {tuple(ref_c[i]): i for i in range(len(ref_c))}
    for b in range(gj.shape[0]):
        for i in range(int(nv[b])):
            gj[b, i] = g[ref_row_of[(b,) + tuple(oc_np[b, i])]]
    dx, dw = vjp(jnp.asarray(gj))
    np.testing.assert_allclose(np.asarray(dw), ref_dw, rtol=3e-4, atol=3e-4)
    dx_np = np.asarray(dx)
    c_np = np.asarray(ours.coords)
    nvi = np.asarray(ours.num_valid)
    for b in range(dx_np.shape[0]):
        for i in range(int(nvi[b])):
            np.testing.assert_allclose(
                dx_np[b, i], ref_dx_rows[(b,) + tuple(c_np[b, i])],
                rtol=3e-4, atol=3e-4,
            )


@pytest.mark.parametrize("ks,stride", [(3, 2), (2, 2)])
def test_conv_output_parity_strided(data, ks, stride):
    rng, coords, feats, w = data
    w = (rng.standard_normal((ks ** 3, CIN, COUT)) * 0.2).astype(np.float32)
    vox, oc, km, out, *_ = _run_ref(coords, feats, w, ks, stride=stride)
    ref_rows = _ref_out_rows(oc, out)
    ours = _our_voxels(coords, feats)
    out_vox, _ = spatially_sparse_conv(ours, jnp.asarray(w), ks, stride=stride)
    our_rows = _our_out_rows(out_vox)
    assert set(ref_rows) == set(our_rows)
    for key, rf in ref_rows.items():
        np.testing.assert_allclose(our_rows[key], rf, rtol=2e-4, atol=2e-4)


def test_conv_output_parity_transposed(data):
    """Down-conv stride 2, then transposed conv back to the fine coords —
    the decoder pattern (reference helper.py:462-512)."""
    rng, coords, feats, w = data
    # Reference: forward strided conv to get the coarse tensor.
    vox = _ref_voxels(coords, feats)
    oc_c, ooff_c, km_down = ref_gen_map(vox, (3,) * 3, (1,) * 3, (2,) * 3)
    coarse_feats_np = [
        rng.standard_normal(
            (int(ooff_c[i + 1] - ooff_c[i]), CIN)
        ).astype(np.float32)
        for i in range(len(coords))
    ]
    coarse_cat = np.concatenate(coarse_feats_np)
    # Build the reference coarse Voxels (coords at divided scale).
    oc_np = oc_c.numpy()
    coarse_coords = [
        oc_np[int(ooff_c[i]) : int(ooff_c[i + 1]), 1:].copy()
        for i in range(len(coords))
    ]
    ref_coarse = _ref_voxels(coarse_coords, coarse_feats_np)
    oc_t, ooff_t, km_t = ref_gen_map(
        ref_coarse, (3,) * 3, (1,) * 3, (2,) * 3, transposed=True,
        output_spatially_sparse_tensor=vox,
    )
    wt = torch.from_numpy(w)
    out_ref = RefExplicit.apply(
        ref_coarse.features, wt, km_t, oc_t.shape[0], None
    )
    ref_rows = _ref_out_rows(oc_t, out_ref)

    # Ours: transposed conv from the same coarse tensor to the same targets.
    ours_fine = _our_voxels(coords, feats)
    ours_coarse = _our_voxels(coarse_coords, coarse_feats_np)
    ours_coarse = ours_coarse.replace(
        tensor_stride=(2, 2, 2), voxel_size=ours_coarse.voxel_size
    )
    out_vox, _ = spatially_sparse_conv(
        ours_coarse, jnp.asarray(w), 3, stride=2, transposed=True,
        out_coords=ours_fine,
    )
    our_rows = _our_out_rows(out_vox)
    assert set(ref_rows) == set(our_rows)
    for key, rf in ref_rows.items():
        np.testing.assert_allclose(our_rows[key], rf, rtol=2e-4, atol=2e-4)


def test_conv_output_parity_generative(data):
    rng, coords, feats, w = data
    vox, oc, km, out, *_ = _run_ref(coords, feats, w, 3, generative=True)
    ref_rows = _ref_out_rows(oc, out)
    ours = _our_voxels(coords, feats)
    out_vox, _ = spatially_sparse_conv(
        ours, jnp.asarray(w), 3, generative=True,
        out_capacity=max(int(v) for v in np.asarray(ours.num_valid)) * 27,
    )
    our_rows = _our_out_rows(out_vox)
    assert set(ref_rows) == set(our_rows)
    for key, rf in ref_rows.items():
        np.testing.assert_allclose(our_rows[key], rf, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("reduction", ["max", "mean"])
def test_pool_output_parity(data, reduction):
    """sparse max/avg pooling outputs match the reference's sparse_reduce
    (``/root/reference/warpconvnet/nn/functional/sparse_pool.py:25-118``)
    per output coordinate (divided-scale coords on both sides)."""
    from warpconvnet.nn.functional.sparse_pool import (
        sparse_avg_pool as ref_avg,
        sparse_max_pool as ref_max,
    )

    from warpconvnet_tpu.nn.functional.sparse_pool import (
        sparse_avg_pool,
        sparse_max_pool,
    )

    rng, coords, feats, _ = data
    vox_ref = _ref_voxels(coords, feats)
    ref_fn = ref_max if reduction == "max" else ref_avg
    out_ref = ref_fn(vox_ref, kernel_size=2, stride=2)
    ref_rows = _ref_out_rows(
        out_ref.batch_indexed_coordinates, out_ref.feature_tensor
    )

    ours = _our_voxels(coords, feats)
    our_fn = sparse_max_pool if reduction == "max" else sparse_avg_pool
    out_vox, _ = our_fn(ours, 2, stride=2)
    our_rows = _our_out_rows(out_vox)

    assert set(ref_rows) == set(our_rows)
    for key, rf in ref_rows.items():
        np.testing.assert_allclose(our_rows[key], rf, rtol=2e-5, atol=2e-5)
