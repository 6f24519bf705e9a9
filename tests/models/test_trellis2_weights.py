"""TRELLIS.2 checkpoint-conversion mechanism (reference
``convert_trellis2_shape_vae_state_dict`` — synthetic weights round-trip,
no downloads)."""

import numpy as np
import jax
import jax.numpy as jnp

from warpconvnet_tpu.models.trellis2.weights import (
    convert_dense_weight,
    convert_sparse_conv_weight,
    convert_trellis2_state_dict,
    load_into_params,
)


def test_sparse_conv_weight_layout():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 3, 3, 3, 8))  # (Cout, Kd, Kh, Kw, Cin)
    out = convert_sparse_conv_weight(w)
    assert out.shape == (27, 8, 16)
    # Spot-check the raveling: offset (kd, kh, kw) -> row kd*9 + kh*3 + kw.
    np.testing.assert_array_equal(out[1 * 9 + 2 * 3 + 0], w[:, 1, 2, 0, :].T)


def test_state_dict_conversion_rules():
    rng = np.random.default_rng(1)
    sd = {
        "enc.conv1.weight": rng.standard_normal((4, 3, 3, 3, 2)),
        "enc.conv1.bias": rng.standard_normal((4,)),
        "enc.proj.weight": rng.standard_normal((8, 4)),  # torch Linear
        "enc.norm.weight": rng.standard_normal((8,)),
        "enc.norm.bias": rng.standard_normal((8,)),
    }
    tree = convert_trellis2_state_dict(sd, key_map={"enc.": "encoder."})
    enc = tree["encoder"]
    assert enc["conv1"]["kernel"].shape == (27, 2, 4)
    assert enc["conv1"]["bias"].shape == (4,)
    assert enc["proj"]["kernel"].shape == (4, 8)  # transposed
    assert enc["norm"]["scale"].shape == (8,)
    np.testing.assert_allclose(
        np.asarray(enc["proj"]["kernel"]), sd["enc.proj.weight"].T
    )


def test_load_into_params_shape_checked():
    params = {
        "layer": {"kernel": jnp.zeros((27, 2, 4)), "bias": jnp.zeros((4,))}
    }
    conv = {"layer": {"kernel": jnp.ones((27, 2, 4))}}
    out = load_into_params(params, conv)
    np.testing.assert_array_equal(np.asarray(out["layer"]["kernel"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["layer"]["bias"]), 0.0)

    bad = {"layer": {"kernel": jnp.ones((27, 4, 2))}}
    try:
        load_into_params(params, bad)
        assert False, "expected shape mismatch"
    except ValueError:
        pass
