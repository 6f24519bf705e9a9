import numpy as np
import jax.numpy as jnp
import pytest

from warpconvnet_tpu.ops.morton import morton_argsort, morton_code_10bit, morton_keys


def _morton_ref(c, bits):
    """Reference Morton code via python ints."""
    out = []
    for x, y, z in c.tolist():
        code = 0
        for b in range(bits):
            code |= ((x >> b) & 1) << (3 * b + 2)
            code |= ((y >> b) & 1) << (3 * b + 1)
            code |= ((z >> b) & 1) << (3 * b)
        out.append(code)
    return out


def test_morton_10bit_matches_reference():
    rng = np.random.default_rng(0)
    c = rng.integers(0, 1024, size=(200, 3)).astype(np.int32)
    got = np.asarray(morton_code_10bit(jnp.asarray(c)))
    np.testing.assert_array_equal(got, np.array(_morton_ref(c, 10), np.int64).astype(np.int32))


def test_morton_16bit_order():
    rng = np.random.default_rng(1)
    c = rng.integers(0, 65536, size=(300, 3)).astype(np.int32)
    keys = morton_keys(jnp.asarray(c), bits=16)
    ref = np.argsort(np.array(_morton_ref(c, 16), dtype=np.uint64), kind="stable")
    got = np.lexsort(tuple(np.asarray(k) for k in reversed(keys)))
    ref_codes = np.array(_morton_ref(c, 16), dtype=np.uint64)
    np.testing.assert_array_equal(ref_codes[got], ref_codes[ref])


def test_morton_argsort_invalid_last():
    rng = np.random.default_rng(2)
    c = rng.integers(0, 100, size=(50, 3)).astype(np.int32)
    valid = rng.random(50) < 0.7
    perm, inv = morton_argsort(jnp.asarray(c), jnp.asarray(valid))
    perm = np.asarray(perm)
    nv = valid.sum()
    assert set(perm[:nv].tolist()) == set(np.nonzero(valid)[0].tolist())
    np.testing.assert_array_equal(np.asarray(inv)[perm], np.arange(50))


@pytest.mark.parametrize("ordering", ["xyz", "zyx", "yxz"])
def test_orderings_permute_axes(ordering):
    c = np.array([[1, 2, 3]], np.int32)
    code = int(morton_code_10bit(jnp.asarray(c), ordering)[0])
    axes = [("xyz".index(ch)) for ch in ordering]
    permuted = c[:, axes]
    expected = _morton_ref(permuted, 10)[0]
    assert code == expected
