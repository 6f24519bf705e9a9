"""Flow-matching Euler sampler (reference ``nn/samplers/flow_euler.py``)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax


def flow_euler_sample(
    velocity_fn: Callable,
    x0: jnp.ndarray,
    num_steps: int = 50,
    t_start: float = 1.0,
    t_end: float = 0.0,
    cfg_scale: Optional[float] = None,
    velocity_fn_uncond: Optional[Callable] = None,
) -> jnp.ndarray:
    """Integrate dx/dt = v(x, t) from t_start (noise) to t_end (data) with
    fixed-step Euler; optional classifier-free guidance."""
    ts = jnp.linspace(t_start, t_end, num_steps + 1)

    def body(i, x):
        t = ts[i]
        dt = ts[i + 1] - ts[i]
        v = velocity_fn(x, t)
        if cfg_scale is not None and velocity_fn_uncond is not None:
            vu = velocity_fn_uncond(x, t)
            v = vu + cfg_scale * (v - vu)
        return x + dt * v

    return lax.fori_loop(0, num_steps, body, x0)
