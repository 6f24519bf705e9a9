import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.ops.keys import PAD_COORD
from warpconvnet_tpu.ops.unique import unique_coords, voxel_downsample
import pytest

pytestmark = pytest.mark.smoke  # pre-commit smoke tier (tests/README.md)



def test_unique_coords_basic():
    rng = np.random.default_rng(0)
    c = rng.integers(0, 8, size=(300, 3)).astype(np.int32)
    valid = np.ones((300,), bool)
    valid[250:] = False
    res = unique_coords(jnp.asarray(c), jnp.asarray(valid), max_out=256)

    expected = np.unique(c[:250], axis=0)
    nu = int(res.num_unique)
    assert nu == len(expected)
    np.testing.assert_array_equal(np.asarray(res.coords)[:nu], expected)
    # Padded unique rows are PAD_COORD.
    assert np.all(np.asarray(res.coords)[nu:] == PAD_COORD)

    # to_unique maps every valid input row to its own coordinates.
    tu = np.asarray(res.to_unique)
    uc = np.asarray(res.coords)
    np.testing.assert_array_equal(uc[tu[:250]], c[:250])
    # Invalid rows map to the overflow segment.
    assert np.all(tu[250:] == 256)

    # Counts sum to number of valid rows.
    assert int(np.asarray(res.counts).sum()) == 250
    # Count per unique row is its true multiplicity.
    for i in range(nu):
        assert res.counts[i] == np.sum((c[:250] == expected[i]).all(axis=1))


def test_unique_coords_jit_stable():
    """Same shapes => single compilation across different data."""
    f = jax.jit(lambda c, v: unique_coords(c, v, max_out=128))
    rng = np.random.default_rng(1)
    for _ in range(3):
        c = rng.integers(0, 5, size=(200, 3)).astype(np.int32)
        v = rng.random(200) < 0.8
        res = f(jnp.asarray(c), jnp.asarray(v))
        expected = np.unique(c[v], axis=0)
        assert int(res.num_unique) == len(expected)


def test_unique_overflow_detectable():
    c = np.arange(300, dtype=np.int32).reshape(-1, 1) * np.ones((1, 3), np.int32)
    res = unique_coords(jnp.asarray(c), jnp.ones((300,), bool), max_out=100)
    assert int(res.num_unique) == 300  # true count reported even past capacity


def test_voxel_downsample():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    valid = np.ones((500,), bool)
    res, int_coords = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 0.25, max_out=128)
    expected = np.unique(np.floor(pts / 0.25).astype(np.int32), axis=0)
    nu = int(res.num_unique)
    assert nu == len(expected)
    np.testing.assert_array_equal(np.asarray(res.coords)[:nu], expected)
