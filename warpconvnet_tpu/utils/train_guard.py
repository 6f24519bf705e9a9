"""Non-finite loss guard (reference ``warpconvnet/utils/nonfinite_loss_guard.py:9-62``).

Training robustness helper: tolerate up to ``max_consecutive`` NaN/inf losses
(skipping the optimizer update those steps), then raise. Two forms:

* :class:`NonFiniteLossGuard` — host-side, for eager training loops that pull
  the loss to the host anyway (logging).
* :func:`guard_update` — in-graph, for fully jitted loops: zeroes the update
  and increments a counter carried in the train state, so no host sync is
  needed (the TPU-native formulation).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


class NonFiniteLossGuard:
    """Host-side guard: call ``check(loss)`` each step.

    Returns True if the step should be applied; raises after
    ``max_consecutive`` non-finite losses in a row.
    """

    def __init__(self, max_consecutive: int = 5):
        self.max_consecutive = max_consecutive
        self._streak = 0

    def check(self, loss: float) -> bool:
        if math.isfinite(float(loss)):
            self._streak = 0
            return True
        self._streak += 1
        if self._streak > self.max_consecutive:
            raise FloatingPointError(
                f"loss non-finite for {self._streak} consecutive steps"
            )
        return False


def guard_update(
    loss: jnp.ndarray, updates, streak: jnp.ndarray, max_consecutive: int = 5
) -> Tuple[object, jnp.ndarray, jnp.ndarray]:
    """In-graph guard: returns (masked_updates, new_streak, ok).

    ``updates`` is a pytree of parameter updates; when the loss is non-finite
    they are zeroed (step becomes a no-op) and ``streak`` increments. ``ok``
    is False once the streak exceeds the limit — callers surface it on the
    host at logging cadence (no per-step sync).
    """
    import jax

    finite = jnp.isfinite(loss)
    new_streak = jnp.where(finite, 0, streak + 1)
    scale = jnp.where(finite, 1.0, 0.0)
    masked = jax.tree.map(lambda u: u * scale.astype(u.dtype), updates)
    return masked, new_streak, new_streak <= max_consecutive
