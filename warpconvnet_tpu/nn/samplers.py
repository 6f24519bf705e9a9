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


def flow_euler_guided_sample(
    velocity_fn: Callable,  # (x, t, cond) -> v
    x0: jnp.ndarray,
    cond,
    neg_cond,
    num_steps: int = 25,
    rescale_t: float = 1.0,
    guidance_strength: float = 3.0,
    guidance_interval: tuple = (0.0, 1.0),
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """Flow Euler with classifier-free guidance, guidance interval, and
    std-rescaled guidance (reference ``FlowEulerGuidanceIntervalSampler``,
    ``nn/samplers/flow_euler.py:132-258``):

    * ``rescale_t``: t_seq = r*t / (1 + (r-1) t) warping of the step grid;
    * CFG: v = s * v_cond + (1 - s) * v_neg, applied only for t inside
      ``guidance_interval`` (plain conditional velocity outside);
    * ``guidance_rescale``: rescale the CFG prediction in x0 space toward
      the conditional prediction's per-sample std (x0 = x_t - t v).
    """
    ts = jnp.linspace(1.0, 0.0, num_steps + 1)
    r = rescale_t
    ts = r * ts / (1 + (r - 1) * ts)
    lo, hi = guidance_interval
    s = guidance_strength

    def guided_v(x, t):
        v_pos = velocity_fn(x, t, cond)

        def cfg(_):
            v_neg = velocity_fn(x, t, neg_cond)
            v = s * v_pos + (1 - s) * v_neg
            if guidance_rescale > 0:
                axes = tuple(range(1, x.ndim))
                x0_pos = x - t * v_pos
                x0_cfg = x - t * v
                ratio = jnp.std(x0_pos, axis=axes, keepdims=True) / (
                    jnp.std(x0_cfg, axis=axes, keepdims=True) + 1e-8
                )
                x0r = x0_cfg * ratio
                x0_mix = (
                    guidance_rescale * x0r + (1 - guidance_rescale) * x0_cfg
                )
                return (x - x0_mix) / jnp.maximum(t, 1e-6)
            return v

        in_interval = (t >= lo) & (t <= hi)
        return lax.cond(in_interval, cfg, lambda _: v_pos, None)

    def body(i, x):
        t = ts[i]
        dt = ts[i + 1] - ts[i]
        return x + dt * guided_v(x, t)

    return lax.fori_loop(0, num_steps, body, x0)
