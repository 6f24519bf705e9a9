"""End-to-end backend dispatch: conv fwd+grads with the Pallas implicit-GEMM
paths (fwd AB, dgrad ABt-with-reverse-table, wgrad AtB) must match the
explicit backend (reference tests/nn/test_kernel_correctness.py pattern)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpconvnet_tpu import constants
from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import spatially_sparse_conv
from warpconvnet_tpu.ops.keys import PAD_COORD


@pytest.fixture
def igemm_modes():
    old = (
        constants.WCT_FWD_ALGO_MODE,
        constants.WCT_DGRAD_ALGO_MODE,
        constants.WCT_WGRAD_ALGO_MODE,
    )
    constants.WCT_FWD_ALGO_MODE = "implicit_pallas"
    constants.WCT_DGRAD_ALGO_MODE = "implicit_pallas"
    constants.WCT_WGRAD_ALGO_MODE = "implicit_pallas"
    yield
    (
        constants.WCT_FWD_ALGO_MODE,
        constants.WCT_DGRAD_ALGO_MODE,
        constants.WCT_WGRAD_ALGO_MODE,
    ) = old


def _sorted_voxels(rng, b=2, n=512, grid=16, c=8):
    coords_list, feats_list, nv = [], [], []
    for _ in range(b):
        raw = rng.integers(0, grid, size=(n, 3)).astype(np.int32)
        uniq = np.unique(raw, axis=0)  # np.unique is lexsorted -> monotone maps
        nv.append(len(uniq))
        cpad = np.full((n, 3), PAD_COORD, np.int32)
        cpad[: len(uniq)] = uniq
        f = np.zeros((n, c), np.float32)
        f[: len(uniq)] = rng.standard_normal((len(uniq), c)).astype(np.float32)
        coords_list.append(cpad)
        feats_list.append(f)
    return Voxels.create(np.stack(coords_list), np.stack(feats_list), np.array(nv))


def test_igemm_dispatch_matches_explicit(igemm_modes):
    rng = np.random.default_rng(0)
    vox = _sorted_voxels(rng)
    w = jnp.asarray(rng.standard_normal((27, 8, 16)), jnp.float32) * 0.1

    def loss(w, feats, use):
        if not use:
            constants.WCT_FWD_ALGO_MODE = "explicit"
            constants.WCT_DGRAD_ALGO_MODE = "explicit"
            constants.WCT_WGRAD_ALGO_MODE = "explicit"
        try:
            out, _ = spatially_sparse_conv(vox.replace(features=feats), w, 3)
        finally:
            constants.WCT_FWD_ALGO_MODE = "implicit_pallas"
            constants.WCT_DGRAD_ALGO_MODE = "implicit_pallas"
            constants.WCT_WGRAD_ALGO_MODE = "implicit_pallas"
        return jnp.sum(out.features ** 2)

    l_i, (dw_i, dx_i) = jax.value_and_grad(
        lambda w, f: loss(w, f, True), argnums=(0, 1)
    )(w, vox.features)
    l_e, (dw_e, dx_e) = jax.value_and_grad(
        lambda w, f: loss(w, f, False), argnums=(0, 1)
    )(w, vox.features)

    np.testing.assert_allclose(float(l_i), float(l_e), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_i), np.asarray(dw_e), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx_i), np.asarray(dx_e), rtol=1e-4, atol=1e-4)


def test_igemm_dispatch_strided(igemm_modes):
    rng = np.random.default_rng(1)
    vox = _sorted_voxels(rng, n=256)
    w = jnp.asarray(rng.standard_normal((8, 8, 8)), jnp.float32) * 0.1
    out, table = spatially_sparse_conv(vox, w, 2, stride=2)
    constants.WCT_FWD_ALGO_MODE = "explicit"
    out_e, _ = spatially_sparse_conv(vox, w, 2, stride=2)
    constants.WCT_FWD_ALGO_MODE = "implicit_pallas"
    np.testing.assert_allclose(
        np.asarray(out.features), np.asarray(out_e.features), rtol=1e-4, atol=1e-5
    )
