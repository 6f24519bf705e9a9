"""Gradient checkpointing (activation rematerialization) configuration.

Reference: ``warpconvnet/nn/modules/gradient_checkpointing.py:222-360`` —
``GradientCheckpointingMixin`` / ``configure_gradient_checkpointing`` give
per-module toggles used by MinkUNet blocks, PTv3, SpaCeFormer and TRELLIS.

On TPU the primitive is :func:`jax.checkpoint` / ``flax.linen.remat``: the
backward pass recomputes the block's activations instead of storing them,
trading FLOPs (cheap on MXU) for HBM (the scarce resource). These helpers
standardize the policies and make the toggle a constructor argument, like the
reference's mixin.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Type

import jax
import flax.linen as nn

# Named remat policies (jax.checkpoint_policies): what intermediate values
# are worth keeping despite rematerialization.
POLICIES = {
    "none": None,  # recompute everything
    "dots": jax.checkpoint_policies.checkpoint_dots,
    "dots_no_batch": jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
    "nothing_saveable": jax.checkpoint_policies.nothing_saveable,
}


def checkpoint_module(
    module_cls: Type[nn.Module],
    policy: str = "none",
    static_argnums: Sequence[int] = (),
    prevent_cse: bool = False,
) -> Type[nn.Module]:
    """Wrap a linen module class with rematerialization (the analog of
    adding ``GradientCheckpointingMixin`` + enabling it).

    Example::

        Block = checkpoint_module(BasicBlock, policy="dots")
        Block(in_ch, out_ch, name="block0")(x)
    """
    pol = POLICIES[policy]
    kwargs = dict(prevent_cse=prevent_cse, static_argnums=tuple(static_argnums))
    if pol is not None:
        kwargs["policy"] = pol
    return nn.remat(module_cls, **kwargs)


def configure_gradient_checkpointing(
    model: nn.Module, enable: bool = True
) -> nn.Module:
    """Flip a model's ``remat`` field (models here expose ``remat: bool``,
    e.g. :class:`~warpconvnet_tpu.models.mink_unet.MinkUNetBase`) — the
    functional analog of the reference's runtime toggle. Returns a new module
    (linen modules are frozen dataclasses)."""
    if not hasattr(model, "remat"):
        raise ValueError(
            f"{type(model).__name__} has no 'remat' field; wrap its blocks "
            "with checkpoint_module instead"
        )
    return model.replace(remat=enable)


def checkpoint_fn(
    fn: Callable, policy: str = "none", static_argnums: Sequence[int] = ()
) -> Callable:
    """Function-level checkpointing for non-module code paths."""
    pol = POLICIES[policy]
    if pol is None:
        return jax.checkpoint(fn, static_argnums=tuple(static_argnums))
    return jax.checkpoint(fn, policy=pol, static_argnums=tuple(static_argnums))
