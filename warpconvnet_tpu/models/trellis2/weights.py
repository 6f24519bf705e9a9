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


def convert_dinov3_vit(
    state_dict: Mapping[str, np.ndarray],
) -> Dict[str, Any]:
    """Map a torch DINOv3 ViT state dict (transformers ``DINOv3ViTModel``
    naming, the reference conditioner's backbone — ``image_cond.py:28-41``)
    onto the :class:`~warpconvnet_tpu.models.trellis2.vit_cond.ViTConditioner`
    flax parameter tree.

    Handles both ``embeddings.*``/``layer.N.*`` (transformers) and bare
    ``patch_embed.*``/``blocks.N.*`` (DINO repo) prefixes. Unknown keys are
    ignored (pos-embed variants etc. — this ViT uses RoPE, like DINOv3).
    """
    params: Dict[str, Any] = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def put(path, value):
        _set_path(params, path, jnp.asarray(value))

    for k, v in sd.items():
        kk = (
            k.replace("embeddings.patch_embeddings.", "patch_embed.")
            .replace("embeddings.cls_token", "cls_token")
            .replace("embeddings.register_tokens", "register_tokens")
            .replace("model.layer.", "blocks.")
            .replace("layer.", "blocks.")
            .replace("blocks.", "block")  # block0.norm1...
        )
        parts = kk.split(".")
        if kk.startswith("patch_embed"):
            if parts[-1] == "weight":
                # torch conv (D, 3, p, p) -> flax (p, p, 3, D)
                put(("patch_embed", "kernel"), np.transpose(v, (2, 3, 1, 0)))
            else:
                put(("patch_embed", "bias"), v)
        elif kk.startswith("cls_token"):
            put(("cls_token",), v.reshape(1, 1, -1))
        elif kk.startswith("register_tokens"):
            put(("register_tokens",), v.reshape(1, v.shape[-2], v.shape[-1]))
        elif parts[0].startswith("block"):
            blk = parts[0]
            rest = parts[1:]
            name = ".".join(rest)
            if name in ("norm1.weight", "attention.norm1.weight"):
                put((blk, "norm1", "scale"), v)
            elif name in ("norm1.bias",):
                put((blk, "norm1", "bias"), v)
            elif name in ("norm2.weight",):
                put((blk, "norm2", "scale"), v)
            elif name in ("norm2.bias",):
                put((blk, "norm2", "bias"), v)
            elif name.endswith("qkv.weight"):
                put((blk, "qkv", "kernel"), convert_dense_weight(v))
            elif name.endswith("qkv.bias"):
                put((blk, "qkv", "bias"), v)
            elif name.endswith("proj.weight") or name.endswith("o_proj.weight"):
                put((blk, "proj", "kernel"), convert_dense_weight(v))
            elif name.endswith("proj.bias") or name.endswith("o_proj.bias"):
                put((blk, "proj", "bias"), v)
            elif "mlp.fc1" in name or "up_proj" in name:
                if name.endswith("weight"):
                    put((blk, "fc1", "kernel"), convert_dense_weight(v))
                else:
                    put((blk, "fc1", "bias"), v)
            elif "mlp.fc2" in name or "down_proj" in name:
                if name.endswith("weight"):
                    put((blk, "fc2", "kernel"), convert_dense_weight(v))
                else:
                    put((blk, "fc2", "bias"), v)
            elif "layer_scale1" in name or name == "ls1.gamma":
                put((blk, "ls1"), v.reshape(-1))
            elif "layer_scale2" in name or name == "ls2.gamma":
                put((blk, "ls2"), v.reshape(-1))
        # else: ignored (mask tokens, pos embeds, heads)

    # transformers >=5 DINOv3 splits attention into q/k/v projections —
    # fuse them into this module's single qkv Dense.
    split: Dict[str, Dict[str, Dict[str, np.ndarray]]] = {}
    for k, v in sd.items():
        for pname in ("q_proj", "k_proj", "v_proj"):
            if pname in k:
                blk = "block" + k.split("layer.")[-1].split(".")[0]
                kind = "kernel" if k.endswith("weight") else "bias"
                split.setdefault(blk, {}).setdefault(kind, {})[pname[0]] = v
    for blk, kinds in split.items():
        if "kernel" in kinds and len(kinds["kernel"]) == 3:
            kmat = np.concatenate(
                [convert_dense_weight(kinds["kernel"][c]) for c in "qkv"],
                axis=1,
            )
            _set_path(params, (blk, "qkv", "kernel"), jnp.asarray(kmat))
        if "bias" in kinds and len(kinds["bias"]) == 3:
            bvec = np.concatenate([kinds["bias"][c] for c in "qkv"])
            _set_path(params, (blk, "qkv", "bias"), jnp.asarray(bvec))
    return {"params": params}
