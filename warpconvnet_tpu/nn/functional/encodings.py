"""Positional encodings (reference ``nn/functional/encodings.py:12-76``)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def get_freqs(num_freqs: int, data_range: float = 2.0, dtype=jnp.float32) -> jnp.ndarray:
    """Geometric frequency bands covering ``data_range``."""
    exps = jnp.arange(num_freqs, dtype=dtype)
    return (2.0 ** exps) * (2.0 * jnp.pi / data_range)


def sinusoidal_encoding(
    x: jnp.ndarray,
    num_channels: int,
    data_range: float = 2.0,
    concat_input: bool = False,
) -> jnp.ndarray:
    """Sin/cos encoding of each input channel.

    x: [..., D] -> [..., D * num_channels (+ D if concat_input)].
    ``num_channels`` must be even: num_channels//2 frequency bands, sin & cos.
    """
    assert num_channels % 2 == 0, "num_channels must be even"
    num_freqs = num_channels // 2
    freqs = get_freqs(num_freqs, data_range, x.dtype)
    ang = x[..., None] * freqs  # [..., D, F]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [..., D, 2F]
    enc = enc.reshape(*x.shape[:-1], x.shape[-1] * num_channels)
    if concat_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
