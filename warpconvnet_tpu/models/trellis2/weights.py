"""TRELLIS.2 published-checkpoint conversion (reference
``models/trellis2/shape_vae.py:66-100`` ``convert_trellis2_shape_vae_state_dict``
and the per-model ``load_trellis2_state_dict`` hooks).

Published TRELLIS.2 checkpoints store sparse-conv weights as
``(Cout, Kd, Kh, Kw, Cin)`` torch tensors; this package's ``SparseConv3d``
uses ``(Kd*Kh*Kw, Cin, Cout)`` flax kernels with the z-fastest offset
enumeration (``ops/kernel_map.kernel_offsets``). The converters here map a
flat torch-style state dict onto a flax params pytree by path, rewriting
layouts:

* 5D sparse-conv weights -> [K, Cin, Cout] (axis permute + reshape — the
  meshgrid 'ij' enumeration matches the reference's Kd/Kh/Kw raveling);
* ``weight``/``bias`` of dense layers -> flax ``kernel`` (transposed) /
  ``bias``;
* norm ``weight``/``bias`` -> ``scale``/``bias``.

No network access is needed: the converters operate on any state dict the
user supplies (e.g. loaded with ``torch.load`` from a local checkpoint), and
the round-trip is unit-tested with synthetic weights.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np
import jax.numpy as jnp


def convert_sparse_conv_weight(weight: np.ndarray) -> np.ndarray:
    """(Cout, Kd, Kh, Kw, Cin) -> (Kd*Kh*Kw, Cin, Cout) (reference
    ``_convert_sparse_conv_weight_to_warpconvnet``)."""
    w = np.asarray(weight)
    if w.ndim != 5:
        return w
    cout, kd, kh, kw, cin = w.shape
    return np.transpose(w, (1, 2, 3, 4, 0)).reshape(kd * kh * kw, cin, cout)


def convert_dense_weight(weight: np.ndarray) -> np.ndarray:
    """torch Linear (Cout, Cin) -> flax Dense kernel (Cin, Cout)."""
    return np.asarray(weight).T


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_trellis2_state_dict(
    state_dict: Mapping[str, Any],
    key_map: Mapping[str, str] | None = None,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Convert a flat torch-style TRELLIS.2 state dict into a nested flax
    params tree.

    Args:
      state_dict: ``{"a.b.weight": array, ...}`` (numpy or anything
        np.asarray accepts — call ``.numpy()`` on torch tensors first or let
        ``np.asarray`` handle them).
      key_map: optional source-prefix -> target-prefix renames applied
        before structural conversion.
    Conversion rules (by tensor rank + key suffix):
      * ``*.weight`` 5D -> sparse-conv ``kernel`` [K, Cin, Cout];
      * ``*.weight`` 2D -> dense ``kernel`` (transposed);
      * ``*.weight`` 1D -> norm ``scale``;
      * ``*.bias`` -> ``bias`` unchanged.
    """
    key_map = dict(key_map or {})
    out: Dict[str, Any] = {}
    for key, value in state_dict.items():
        for src, dst in key_map.items():
            if key.startswith(src):
                key = dst + key[len(src):]
                break
        arr = np.asarray(value)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if arr.ndim == 5:
                arr = convert_sparse_conv_weight(arr)
                leaf = "kernel"
            elif arr.ndim == 3:
                leaf = "kernel"  # already [K, Cin, Cout]
            elif arr.ndim == 2:
                arr = convert_dense_weight(arr)
                leaf = "kernel"
            else:
                leaf = "scale"  # norm weight
        path = tuple(parts[:-1]) + (leaf,)
        _set_path(out, path, jnp.asarray(arr, dtype))
    return out


def load_into_params(
    params: Dict[str, Any], converted: Dict[str, Any], strict: bool = False
) -> Dict[str, Any]:
    """Overlay converted weights onto an initialized flax params tree by
    matching paths; shape-checked. With ``strict`` every converted leaf must
    land somewhere."""
    import jax

    flat_params = dict(jax.tree_util.tree_flatten_with_path(params)[0])

    def norm_path(kp) -> Tuple[str, ...]:
        return tuple(
            k.key if hasattr(k, "key") else str(k) for k in kp
        )

    by_path = {norm_path(kp): v for kp, v in flat_params.items()}
    flat_conv = jax.tree_util.tree_flatten_with_path(converted)[0]
    used = 0
    for kp, v in flat_conv:
        path = norm_path(kp)
        if path in by_path:
            tgt = by_path[path]
            if tgt.shape != v.shape:
                raise ValueError(
                    f"shape mismatch at {'.'.join(path)}: "
                    f"checkpoint {v.shape} vs model {tgt.shape}"
                )
            by_path[path] = v.astype(tgt.dtype)
            used += 1
        elif strict:
            raise KeyError(f"checkpoint key {'.'.join(path)} not in model")
    if strict and used != len(flat_conv):
        raise KeyError("unused checkpoint keys")

    # Rebuild the tree.
    out: Dict[str, Any] = {}
    for path, v in by_path.items():
        _set_path(out, path, v)
    return out
