"""Large-kernel (5^3 = 125 offsets) sparse conv — the regime where the
reference switches to its hierarchical coarse->fine probe
(kernel_map_from_size_hierarchical, K>=125). The sort-based engine handles
any K through the same bucketed/probe path; verify against dense conv."""

import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.geometry.voxels import Voxels
from warpconvnet_tpu.nn.functional.sparse_conv import spatially_sparse_conv
from warpconvnet_tpu.ops.keys import PAD_COORD


def test_5x5x5_matches_dense():
    rng = np.random.default_rng(0)
    grid, c = 10, 4
    raw = rng.integers(0, grid, size=(300, 3)).astype(np.int32)
    uniq = np.unique(raw, axis=0)
    n = 512
    coords = np.full((1, n, 3), PAD_COORD, np.int32)
    coords[0, : len(uniq)] = uniq
    feats = np.zeros((1, n, c), np.float32)
    feats[0, : len(uniq)] = rng.standard_normal((len(uniq), c))
    vox = Voxels.create(coords, feats, np.array([len(uniq)], np.int32))

    w = rng.standard_normal((125, c, c)).astype(np.float32) * 0.1
    out, table = spatially_sparse_conv(vox, jnp.asarray(w), 5)
    assert table.table.shape[1] == 125

    dense = np.zeros((1, grid, grid, grid, c), np.float32)
    dense[0, uniq[:, 0], uniq[:, 1], uniq[:, 2]] = np.asarray(
        vox.features[0, : len(uniq)]
    )
    w_dense = np.asarray(w).reshape(5, 5, 5, c, c)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w_dense), (1, 1, 1),
        [(2, 2)] * 3, dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )
    got = np.asarray(out.features[0, : len(uniq)])
    want = np.asarray(ref)[0, uniq[:, 0], uniq[:, 1], uniq[:, 2]]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
