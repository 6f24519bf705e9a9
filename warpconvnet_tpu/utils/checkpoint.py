"""Checkpoint save/restore via orbax (the TPU-native analog of the
reference examples' ``torch.save`` checkpointing; SURVEY.md section 5
checkpoint/resume).

Also flushes the autotune benchmark cache on save — the reference's other
piece of persistent state (``benchmark_cache.py`` SIGTERM/atexit flush).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, step: Optional[int] = None) -> str:
    """Save a pytree (e.g. TrainState) with orbax. Process 0 writes."""
    import orbax.checkpoint as ocp

    from warpconvnet_tpu.utils.benchmark_cache import get_benchmark_cache

    get_benchmark_cache().save()

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`; ``target`` provides
    structure/shapes (abstract or concrete)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)
