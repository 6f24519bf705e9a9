"""Per-tile-config correctness matrix for the Pallas implicit GEMM — the
analog of the reference's ``tests/nn/test_mask_gemm_all_tiles.py`` /
``test_mask_gemm_boundaries.py`` / ``test_kernel_deterministic_per_tile.py``:
every (tile_m, window, zg, dtype) config vs the explicit reference, boundary
cases, and bitwise determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import (
    implicit_gemm_fwd,
    implicit_gemm_wgrad,
)
from warpconvnet_tpu.nn.functional.sparse_conv import (
    _fwd_impl,
    _wgrad_impl,
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.keys import PAD_COORD


def _voxels(rng, b=2, n=384, grid=12, c=8, dtype=np.float32):
    coords = np.full((b, n, 3), PAD_COORD, np.int32)
    feats = np.zeros((b, n, c), dtype)
    nv = np.zeros((b,), np.int32)
    for i in range(b):
        raw = np.unique(rng.integers(0, grid, size=(n, 3)).astype(np.int32), axis=0)
        nv[i] = len(raw)
        coords[i, : len(raw)] = raw
        feats[i, : len(raw)] = rng.standard_normal((len(raw), c)).astype(dtype)
    return Voxels.create(coords, feats, nv).replace(lex_sorted=True)


@pytest.mark.parametrize("tile_m", [128, 256])
@pytest.mark.parametrize("wf", [1, 2])
@pytest.mark.parametrize("zg", [1, 3, 9])
@pytest.mark.parametrize("s", [1, 2])
def test_fwd_config_matrix(tile_m, wf, zg, s):
    rng = np.random.default_rng(tile_m + wf * 7 + zg + 13 * s)
    vox = _voxels(rng)
    w = jnp.asarray(rng.standard_normal((27, 8, 8)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table,
        tile_m=tile_m, window_factor=wf, zg=zg, s=s, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_dtype_matrix(dtype):
    rng = np.random.default_rng(11)
    vox = _voxels(rng)
    vox = vox.replace(features=vox.features.astype(dtype))
    w = jnp.asarray(
        rng.standard_normal((27, 8, 8)).astype(np.float32) * 0.2, dtype
    )
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    ref = _fwd_impl(
        vox.features.astype(jnp.float32), w.astype(jnp.float32),
        bpt.table, jnp.float32,
    )
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2, interpret=True
    )
    tol = 5e-2 if dtype == "bfloat16" else 1e-4
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=tol, atol=tol
    )


def test_boundary_all_pad_scene():
    """A scene with ZERO valid voxels must produce zeros, not garbage."""
    rng = np.random.default_rng(12)
    vox = _voxels(rng, b=2)
    nv = np.asarray(vox.num_valid).copy()
    nv[1] = 0
    coords = np.asarray(vox.coords).copy()
    coords[1] = PAD_COORD
    feats = np.asarray(vox.features).copy()
    feats[1] = 0
    vox = Voxels.create(coords, feats, nv).replace(lex_sorted=True)
    w = jnp.asarray(rng.standard_normal((27, 8, 8)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2, interpret=True
    )
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_array_equal(np.asarray(got[1]), 0)


def test_boundary_nout_not_divisible_by_tile():
    """Capacity not a multiple of tile_m exercises the scene padding path."""
    rng = np.random.default_rng(13)
    vox = _voxels(rng, n=300)  # 300 % 128 != 0
    w = jnp.asarray(rng.standard_normal((27, 8, 8)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_boundary_single_voxel():
    rng = np.random.default_rng(14)
    coords = np.full((1, 128, 3), PAD_COORD, np.int32)
    coords[0, 0] = [3, 4, 5]
    feats = np.zeros((1, 128, 4), np.float32)
    feats[0, 0] = [1, 2, 3, 4]
    vox = Voxels.create(coords, feats, [1]).replace(lex_sorted=True)
    w = jnp.asarray(rng.standard_normal((27, 4, 4)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)
    got = implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_deterministic_across_runs():
    """Bitwise-identical outputs across runs (the reference's per-tile
    determinism suite; TPU kernels have no atomics so this must hold)."""
    rng = np.random.default_rng(15)
    vox = _voxels(rng)
    w = jnp.asarray(rng.standard_normal((27, 8, 8)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    a = np.asarray(implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2, interpret=True))
    b = np.asarray(implicit_gemm_fwd(
        vox.features, w, bpt.table, tile_m=128, window_factor=2, interpret=True))
    np.testing.assert_array_equal(a, b)
    ga = np.asarray(implicit_gemm_wgrad(
        vox.features, vox.features, bpt.table,
        tile_m=128, window_factor=2, interpret=True))
    gb = np.asarray(implicit_gemm_wgrad(
        vox.features, vox.features, bpt.table,
        tile_m=128, window_factor=2, interpret=True))
    np.testing.assert_array_equal(ga, gb)


@pytest.mark.parametrize("algo", ["explicit", "igemm"])
def test_grad_sweep_vs_numerical(algo):
    """Analytic conv_gemm grads vs central finite differences per backend
    (the reference's ``per_algo_grad_sweep.py``)."""
    from warpconvnet_tpu import constants
    from warpconvnet_tpu.nn.functional.sparse_conv import conv_gemm

    rng = np.random.default_rng(16)
    vox = _voxels(rng, b=1, n=96, grid=6, c=3)
    w = jnp.asarray(rng.standard_normal((27, 3, 4)).astype(np.float32) * 0.3)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3)
    spec = (("explicit",),) * 3 if algo == "explicit" else (
        ("igemm", 128, 2, 3),) * 3

    def loss(f, w):
        out = conv_gemm(f, w, bpt.table, bpt.rev, None, None,
                        None, None, None, None, "float32", spec)
        return jnp.sum(jnp.sin(out))

    gf, gw = jax.grad(loss, argnums=(0, 1))(vox.features, w)

    eps = 1e-3
    # Spot-check a handful of weight coordinates numerically.
    for (k, i, o) in [(0, 0, 0), (13, 1, 2), (26, 2, 3), (7, 0, 1)]:
        wp = w.at[k, i, o].add(eps)
        wm = w.at[k, i, o].add(-eps)
        num = (loss(vox.features, wp) - loss(vox.features, wm)) / (2 * eps)
        np.testing.assert_allclose(
            float(gw[k, i, o]), float(num), rtol=2e-2, atol=2e-3
        )
    # And a few feature coordinates.
    f = vox.features
    for (b_, n_, c_) in [(0, 0, 0), (0, 5, 2), (0, 40, 1)]:
        fp = f.at[b_, n_, c_].add(eps)
        fm = f.at[b_, n_, c_].add(-eps)
        num = (loss(fp, w) - loss(fm, w)) / (2 * eps)
        np.testing.assert_allclose(
            float(gf[b_, n_, c_]), float(num), rtol=2e-2, atol=2e-3
        )
