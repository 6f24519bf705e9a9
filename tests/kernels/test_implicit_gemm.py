"""Implicit GEMM kernel vs the explicit reference (the reference's
``test_kernel_correctness`` pattern: every backend vs explicit_gemm)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.kernels.implicit_gemm import implicit_gemm_raw, plan_windows
from warpconvnet_tpu.nn.functional.sparse_conv import (
    _fwd_impl,
    generate_output_coords_and_kernel_map,
)
from warpconvnet_tpu.ops.keys import PAD_COORD

pytestmark = pytest.mark.smoke  # pre-commit smoke tier (tests/README.md)



def _sorted_voxels(rng, n=512, grid=16, c=8):
    raw = np.unique(rng.integers(0, grid, size=(n, 3)).astype(np.int32), axis=0)
    nv = len(raw)  # np.unique returns lex-sorted rows
    cp = np.full((1, n, 3), PAD_COORD, np.int32)
    cp[0, :nv] = raw
    f = np.zeros((1, n, c), np.float32)
    f[0, :nv] = rng.standard_normal((nv, c)).astype(np.float32)
    return Voxels.create(cp, f, [nv])


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("window_factor", [4, 1])
def test_igemm_matches_explicit(stride, window_factor):
    rng = np.random.default_rng(0)
    cin, cout = 8, 16
    vox = _sorted_voxels(rng, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=stride)

    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)[0]
    got = implicit_gemm_raw(
        vox.features[0], w, bpt.table[0],
        tile_m=128, window_factor=window_factor, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_monotonicity_contract():
    """The structural fact the kernel relies on: valid table entries are
    monotone per offset row when coords are lex-sorted."""
    rng = np.random.default_rng(1)
    vox = _sorted_voxels(rng, n=1024, grid=24, c=4)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=2)
    table = np.asarray(bpt.table[0])
    for k in range(table.shape[0]):
        vals = table[k][table[k] >= 0]
        assert np.all(np.diff(vals) > 0), f"offset {k} not strictly monotone"


def test_window_overflow_residual_exactness():
    """Tiny window forces overflow; the residual pass must keep it exact."""
    rng = np.random.default_rng(2)
    cin, cout = 4, 4
    # Strided maps have input spans ~stride^3 x tile; window_factor=1 overflows.
    vox = _sorted_voxels(rng, n=2048, grid=16, c=cin)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    _, _, bpt, _ = generate_output_coords_and_kernel_map(vox, 3, stride=2)
    ref = _fwd_impl(vox.features, w, bpt.table, jnp.float32)[0]
    got = implicit_gemm_raw(
        vox.features[0], w, bpt.table[0],
        tile_m=128, window_factor=1, max_residual=65536, interpret=True,
    )
    # Confirm overflow actually occurred so the residual path is exercised.
    plan = plan_windows(bpt.table[0], 128, 128)
    assert int(jnp.sum(plan.overflow)) > 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
