"""Sparse conv correctness vs dense convolution (the reference's
``explicit_gemm``-anchored strategy, ``tests/nn/test_kernel_correctness.py``):
a sparse conv over active sites with zero features elsewhere must equal a
dense conv sampled at those sites."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import (
    conv_gemm,
    spatially_sparse_conv,
    generate_output_coords_and_kernel_map,
    _fwd_impl,
)
from warpconvnet_tpu.ops.keys import PAD_COORD

pytestmark = pytest.mark.smoke  # pre-commit smoke tier (tests/README.md)



def _make_voxels(rng, b=2, n=128, grid=8, c=4, dtype=np.float32):
    coords_list, feats_list, nv = [], [], []
    for _ in range(b):
        k = rng.integers(n // 2, n - 8)
        raw = rng.integers(0, grid, size=(k, 3)).astype(np.int32)
        uniq = np.unique(raw, axis=0)
        nv.append(len(uniq))
        cpad = np.full((n, 3), PAD_COORD, np.int32)
        cpad[: len(uniq)] = uniq
        f = np.zeros((n, c), dtype)
        f[: len(uniq)] = rng.standard_normal((len(uniq), c)).astype(dtype)
        coords_list.append(cpad)
        feats_list.append(f)
    return Voxels.create(np.stack(coords_list), np.stack(feats_list), np.array(nv))


def _dense_from_voxels(vox, grid):
    b, n, c = vox.features.shape
    dense = np.zeros((b, grid, grid, grid, c), np.float32)
    for i in range(b):
        nv = int(vox.num_valid[i])
        cc = np.asarray(vox.coords[i, :nv])
        dense[i, cc[:, 0], cc[:, 1], cc[:, 2]] = np.asarray(vox.features[i, :nv])
    return dense


def _dense_conv(dense, w_dense, stride):
    # dense: [B, X, Y, Z, C]; w_dense: [kx, ky, kz, Cin, Cout]
    return jax.lax.conv_general_dilated(
        jnp.asarray(dense),
        jnp.asarray(w_dense),
        window_strides=(stride,) * 3,
        padding=[(1, 1)] * 3,
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )


@pytest.mark.parametrize("stride", [1, 2])
def test_sparse_conv_matches_dense(stride):
    rng = np.random.default_rng(0)
    grid, cin, cout = 8, 4, 6
    vox = _make_voxels(rng, b=2, n=128, grid=grid, c=cin)
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.3

    out, table = spatially_sparse_conv(vox, jnp.asarray(w), kernel_size=3, stride=stride)

    dense = _dense_from_voxels(vox, grid)
    # weight [K, Cin, Cout] with K enumerated in meshgrid(ij) order == (kx,ky,kz) raveled
    w_dense = w.reshape(3, 3, 3, cin, cout)
    ref = np.asarray(_dense_conv(dense, w_dense, stride))

    for b in range(2):
        nv = int(out.num_valid[b])
        oc = np.asarray(out.coords[b, :nv])
        got = np.asarray(out.features[b, :nv])
        want = ref[b, oc[:, 0], oc[:, 1], oc[:, 2]]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # padded rows are zero
    for b in range(2):
        nv = int(out.num_valid[b])
        assert np.all(np.asarray(out.features[b, nv:]) == 0)


def test_strided_output_coords():
    rng = np.random.default_rng(1)
    vox = _make_voxels(rng, b=1, n=64, grid=8, c=2)
    out, _ = spatially_sparse_conv(
        vox, jnp.asarray(rng.standard_normal((27, 2, 3)).astype(np.float32)),
        kernel_size=3, stride=2,
    )
    nv0 = int(vox.num_valid[0])
    expected = np.unique(np.asarray(vox.coords[0, :nv0]) // 2, axis=0)
    nv = int(out.num_valid[0])
    np.testing.assert_array_equal(np.asarray(out.coords[0, :nv]), expected)
    assert out.tensor_stride == (2, 2, 2)


def test_custom_vjp_matches_autodiff():
    """Reverse-table dgrad / AtB wgrad must equal plain autodiff through the
    forward gather-matmul (the scatter-based gradient)."""
    rng = np.random.default_rng(2)
    cin, cout = 3, 5
    vox = _make_voxels(rng, b=2, n=64, grid=6, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.3)
    _, _, table, _ = generate_output_coords_and_kernel_map(vox, (3, 3, 3))

    def loss_custom(f, w):
        out = conv_gemm(f, w, table.table, table.rev, None, None,
                        None, None, None, None, "float32")
        return jnp.sum(out * jnp.cos(out))

    def loss_plain(f, w):
        out = _fwd_impl(f, w, table.table, jnp.float32)
        return jnp.sum(out * jnp.cos(out))

    gx1, gw1 = jax.grad(loss_custom, argnums=(0, 1))(vox.features, w)
    gx2, gw2 = jax.grad(loss_plain, argnums=(0, 1))(vox.features, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-5)


def test_transposed_roundtrip():
    """Down-conv then transposed up-conv to the original coords: output
    coordinates equal input coordinates; values match the kernel-map contract."""
    rng = np.random.default_rng(3)
    cin = 2
    vox = _make_voxels(rng, b=2, n=64, grid=8, c=cin)
    w_down = jnp.asarray(rng.standard_normal((8, cin, 4)).astype(np.float32) * 0.3)
    down, _ = spatially_sparse_conv(vox, w_down, kernel_size=2, stride=2)
    w_up = jnp.asarray(rng.standard_normal((8, 4, 3)).astype(np.float32) * 0.3)
    up, _ = spatially_sparse_conv(
        down, w_up, kernel_size=2, stride=2, transposed=True, out_coords=vox
    )
    np.testing.assert_array_equal(np.asarray(up.coords), np.asarray(vox.coords))
    assert up.tensor_stride == (1, 1, 1)

    # Manual check from the contract: up[o] = sum_k down[c] @ w[k]
    # where fine[o] == 2*coarse[c] + off_k.
    from warpconvnet_tpu.ops.kernel_map import kernel_offsets

    offs = kernel_offsets(2)
    for b in range(2):
        nv_f = int(vox.num_valid[b])
        nv_c = int(down.num_valid[b])
        fine = np.asarray(vox.coords[b, :nv_f])
        coarse = np.asarray(down.coords[b, :nv_c])
        cf = np.asarray(down.features[b, :nv_c])
        coarse_ix = {tuple(r): i for i, r in enumerate(coarse.tolist())}
        want = np.zeros((nv_f, 3), np.float32)
        for o in range(nv_f):
            for k in range(len(offs)):
                q = tuple((fine[o] - offs[k]))
                # fine == 2*coarse + off  =>  coarse == (fine - off)/2 when divisible
                if all(x % 2 == 0 for x in q):
                    ci = coarse_ix.get(tuple(x // 2 for x in q))
                    if ci is not None:
                        want[o] += cf[ci] @ np.asarray(w_up[k])
        got = np.asarray(up.features[b, :nv_f])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_1x1_fast_path():
    rng = np.random.default_rng(4)
    vox = _make_voxels(rng, b=2, n=32, grid=4, c=3)
    w = jnp.asarray(rng.standard_normal((1, 3, 7)).astype(np.float32))
    out, table = spatially_sparse_conv(vox, w, kernel_size=1)
    assert table is None
    nv = int(vox.num_valid[0])
    np.testing.assert_allclose(
        np.asarray(out.features[0, :nv]),
        np.asarray(vox.features[0, :nv]) @ np.asarray(w[0]),
        rtol=1e-5, atol=1e-5,
    )


def test_generative_conv_expands_coords():
    c = np.full((1, 8, 3), PAD_COORD, np.int32)
    c[0, 0] = [4, 4, 4]
    f = np.zeros((1, 8, 2), np.float32)
    f[0, 0] = [1.0, 2.0]
    vox = Voxels.create(c, f, np.array([1]))
    w = jnp.asarray(np.ones((27, 2, 2), np.float32))
    out, _ = spatially_sparse_conv(vox, w, kernel_size=3, generative=True, out_capacity=32)
    assert int(out.num_valid[0]) == 27
    got = np.asarray(out.features[0, :27])
    np.testing.assert_allclose(got, np.tile([3.0, 3.0], (27, 1)))


def test_dilated_conv_matches_dense():
    """Dilated kernel offsets (non-consecutive z-deltas) must stay exact
    through the multi-z probe's fallback branch and the igemm path."""
    import numpy as np
    import jax.numpy as jnp
    from warpconvnet_tpu.geometry.voxels import Voxels
    from warpconvnet_tpu.nn.functional.sparse_conv import (
        _fwd_impl,
        generate_output_coords_and_kernel_map,
    )
    from warpconvnet_tpu.kernels.implicit_gemm import implicit_gemm_fwd
    from warpconvnet_tpu.ops.kernel_map import kernel_offsets
    from warpconvnet_tpu.ops.keys import PAD_COORD

    rng = np.random.default_rng(21)
    n = 256
    raw = np.unique(rng.integers(0, 12, (n, 3)).astype(np.int32), axis=0)
    nv = len(raw)
    coords = np.full((1, n, 3), PAD_COORD, np.int32)
    coords[0, :nv] = raw
    feats = np.zeros((1, n, 4), np.float32)
    feats[0, :nv] = rng.standard_normal((nv, 4))
    vox = Voxels.create(coords, feats, [nv]).replace(lex_sorted=True)

    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, dilation=2)
    # Verify the map against the contract directly: in == out + 2*offset.
    offs = kernel_offsets(3, dilation=2)
    table = np.asarray(bpt.table[0])
    cset = {tuple(c): i for i, c in enumerate(raw)}
    for k in range(27):
        for o in range(nv):
            tgt = tuple(raw[o] + offs[k])
            expect = cset.get(tgt, -1)
            assert table[k, o] == expect, (k, o, table[k, o], expect)

    w = jnp.asarray(rng.standard_normal((27, 4, 4)).astype(np.float32) * 0.2)
    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_per_call_algo_override():
    """fwd/dgrad/wgrad per-call pins (reference per-module algo override)
    plumb through and keep numerics identical to the default resolution."""
    import jax
    from warpconvnet_tpu.nn.functional.sparse_conv import spatially_sparse_conv

    rng = np.random.default_rng(3)
    raw = np.unique(rng.integers(0, 12, (300, 3)).astype(np.int32), axis=0)
    nv = len(raw)
    coords = np.full((1, 512, 3), PAD_COORD, np.int32)
    coords[0, :nv] = raw
    feats = np.zeros((1, 512, 4), np.float32)
    feats[0, :nv] = rng.standard_normal((nv, 4))
    vox = Voxels.create(coords, feats, [nv]).lex_sort()
    w = jnp.asarray(rng.standard_normal((27, 4, 6)).astype(np.float32) * 0.2)

    def loss(f, algos):
        out, _ = spatially_sparse_conv(vox.replace(features=f), w, 3, **algos)
        return jnp.sum(out.features ** 2)

    base = loss(vox.features, {})
    pinned, grads = jax.value_and_grad(
        lambda f: loss(f, dict(fwd_algo="explicit", dgrad_algo="explicit",
                               wgrad_algo="explicit"))
    )(vox.features)
    np.testing.assert_allclose(float(base), float(pinned), rtol=1e-5)
    assert np.isfinite(np.asarray(grads)).all()
