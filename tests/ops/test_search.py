

import numpy as np
import pytest


@pytest.mark.slow
def test_radius_cell_list_matches_bruteforce():
    """Cell-list radius search must agree with the brute-force path on the
    same capped-nearest-within-radius contract (reference radius.py
    cell-list vs chunked-cdist CPU fallback)."""
    import jax
    import jax.numpy as jnp
    from warpconvnet_tpu.ops.search import batched_radius_search

    rng = np.random.default_rng(7)
    b, nq, nr = 2, 300, 500
    q = jnp.asarray(rng.uniform(0, 4, (b, nq, 3)), jnp.float32)
    r = jnp.asarray(rng.uniform(0, 4, (b, nr, 3)), jnp.float32)
    qnv = jnp.asarray([250, 300])
    rnv = jnp.asarray([500, 420])
    radius, k = 0.5, 12

    brute = batched_radius_search(q, r, qnv, rnv, radius, k, use_cells=False)
    cells = batched_radius_search(
        q, r, qnv, rnv, radius, k, use_cells=True, cell_cap=64
    )
    # Same neighbor SETS per query (order may differ on distance ties).
    bi = np.asarray(jnp.where(brute.mask, brute.indices, -1))
    ci = np.asarray(jnp.where(cells.mask, cells.indices, -1))
    for bb in range(b):
        for i in range(nq):
            assert set(bi[bb, i]) - {-1} == set(ci[bb, i]) - {-1}, (bb, i)


def test_radius_cell_cap_auto_sized_on_dense_cluster():
    """A dense cluster (one cell holding ~200 points) must not shadow closer
    neighbors: with concrete inputs the cell cap auto-sizes to the true max
    cell occupancy, keeping the cell path exact (ADVICE r2: candidates were
    dropped by sorted-key order, not distance, at the default cap)."""
    import jax.numpy as jnp
    from warpconvnet_tpu.ops.search import batched_radius_search

    rng = np.random.default_rng(11)
    nr = 600
    # 200 points crammed inside one radius-sized cell + background points.
    cluster = 0.5 + 0.08 * rng.standard_normal((200, 3)).clip(-1, 1) * 0.5
    bg = rng.uniform(0, 4, (nr - 200, 3))
    r = jnp.asarray(np.concatenate([cluster, bg]), jnp.float32)[None]
    q = jnp.asarray(rng.uniform(0.3, 0.7, (50, 3)), jnp.float32)[None]
    qnv = jnp.asarray([50])
    rnv = jnp.asarray([nr])
    radius, k = 0.25, 8

    brute = batched_radius_search(q, r, qnv, rnv, radius, k, use_cells=False)
    cells = batched_radius_search(q, r, qnv, rnv, radius, k, use_cells=True)
    bi = np.asarray(jnp.where(brute.mask, brute.indices, -1))
    ci = np.asarray(jnp.where(cells.mask, cells.indices, -1))
    for i in range(50):
        assert set(bi[0, i]) - {-1} == set(ci[0, i]) - {-1}, i
