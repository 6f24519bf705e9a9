"""Spatially sparse depthwise convolution.

TPU-native rebuild of the reference depthwise conv stack
(``warpconvnet/nn/functional/sparse_conv_depth.py:657-1005`` — unified
Function with explicit gather-mul-scatter and the fused ``_C.fma.implicit_fma``
CUDA kernel, ``csrc/implicit_fma_kernel.cu``).

Two backends, dispatched per direction like the dense conv:

* ``explicit`` — a scan over kernel offsets of masked row-gathers and fused
  multiply-adds (XLA fuses each offset into one VPU loop). Exact on any
  table; the correctness anchor. But XLA row gathers run at ~80M rows/s on
  v5e regardless of row width, so a 27-offset 262k-row layer pays ~88 ms.
* ``pallas`` — :mod:`warpconvnet_tpu.kernels.depthwise_fma`: the implicit-
  GEMM window machinery (union-window DMAs + zg-batched one-hot MXU gather)
  with the per-channel FMA on the VPU, sharing :class:`ConvPlan` window
  plans with the dense conv. The TPU analog of the reference's fused
  ``implicit_fma`` kernel. For symmetric self-maps (the ConvNeXt-block
  case) dgrad+wgrad fuse into ONE pass over ``[x ‖ g]`` windows.

Directions:

* forward:  ``out[b, o, c] = sum_k x[b, table[b,k,o], c] * w[k, c]``
* dgrad:    atomics-free via the per-offset **reverse table** (injective, so
  the transpose is a gather): ``dx[b, i, c] = sum_k g[b, rev[b,k,i], c] * w[k, c]``
* wgrad:    ``dw[k, c] = sum_{b,o} x[b, table[b,k,o], c] * g[b, o, c]`` — the
  reference's ``implicit_reduction.cu``.

Backend choice: ``constants.WCT_DEPTH_ALGO_MODE`` pins; ``auto`` consults
the ``depth_fma_*`` benchmark-cache namespaces and falls back to the Pallas
path on sorted unit-stride maps (measured ~an order of magnitude over the
gather scan at ConvNeXt scale — scripts/perf_depthwise.py).

Accumulation is fp32 by default with the same bf16 opt-in as the dense conv.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu import constants
from warpconvnet_tpu.geometry.voxels import Voxels, _as3
from warpconvnet_tpu.kernels.implicit_gemm import (
    _identity_ok,
    make_plan,
    x_group_of,
    z_group_of,
)
from warpconvnet_tpu.nn.functional.sparse_conv import (
    BatchedPairTable,
    _accum_dtype,
    _gather_rows,
    _offsets_symmetric,
    _on_tpu,
    _pallas_interpret,
    generate_output_coords_and_kernel_map,
)


def _depth_fwd_impl(features, weight, table, accum_dtype):
    b, _, c = features.shape
    n_out = table.shape[2]
    table_k = jnp.swapaxes(table, 0, 1)  # [K, B, N_out]

    def body(acc, inp):
        t, w = inp
        a = _gather_rows(features, t).astype(accum_dtype)
        return acc + a * w.astype(accum_dtype), None

    init = jnp.zeros((b, n_out, c), accum_dtype)
    acc, _ = lax.scan(body, init, (table_k, weight))
    return acc.astype(features.dtype)


def _depth_dgrad_impl(g, weight, rev, accum_dtype):
    b, _, c = g.shape
    n_in = rev.shape[2]
    rev_k = jnp.swapaxes(rev, 0, 1)

    def body(acc, inp):
        r, w = inp
        gg = _gather_rows(g, r).astype(accum_dtype)
        return acc + gg * w.astype(accum_dtype), None

    init = jnp.zeros((b, n_in, c), accum_dtype)
    acc, _ = lax.scan(body, init, (rev_k, weight))
    return acc.astype(g.dtype)


def _depth_wgrad_impl(features, g, table, accum_dtype):
    table_k = jnp.swapaxes(table, 0, 1)
    ga = g.astype(accum_dtype)

    def body(_, t):
        a = _gather_rows(features, t).astype(accum_dtype)
        return None, jnp.sum(a * ga, axis=(0, 1))

    _, dws = lax.scan(body, None, table_k)
    return dws


# ---------------------------------------------------------------------------
# Dispatch (reference sparse_conv_depth.py:657 unified Function)
# ---------------------------------------------------------------------------


def _depth_spec_kwargs(spec):
    return dict(
        tile_m=spec[1], window_factor=spec[2], zg=spec[3], s=spec[4],
        identity_k=None if spec[5] < 0 else spec[5],
        interpret=_pallas_interpret(),
    )


def _depth_fwd_dispatch(features, weight, table, plan, accum_dtype, spec):
    if spec[0] == "pallas":
        from warpconvnet_tpu.kernels.depthwise_fma import depthwise_fma_fwd

        return depthwise_fma_fwd(
            features, weight, table, plan, **_depth_spec_kwargs(spec)
        ).astype(features.dtype)
    return _depth_fwd_impl(features, weight, table, accum_dtype)


def _depth_dgrad_dispatch(g, weight, rev, rev_plan, accum_dtype, spec):
    # Depthwise dgrad IS the forward on the reverse table: the per-channel
    # weight is its own transpose.
    if spec[0] == "pallas":
        from warpconvnet_tpu.kernels.depthwise_fma import depthwise_fma_fwd

        return depthwise_fma_fwd(
            g, weight, rev, rev_plan, **_depth_spec_kwargs(spec)
        ).astype(g.dtype)
    return _depth_dgrad_impl(g, weight, rev, accum_dtype)


def _depth_wgrad_dispatch(features, g, table, plan, accum_dtype, spec):
    if spec[0] == "pallas":
        from warpconvnet_tpu.kernels.depthwise_fma import depthwise_fma_wgrad

        return depthwise_fma_wgrad(
            features, g, table, plan, **_depth_spec_kwargs(spec)
        )
    return _depth_wgrad_impl(features, g, table, accum_dtype)


def _resolve_depth_spec(
    mode: str,
    namespace: str,
    config,
    sorted_ok: bool,
    default_wf: Optional[float],
    zg: int,
    s: int,
    identity_k: Optional[int],
    prefer_explicit: bool = False,
):
    """Backend resolution for one depthwise direction — same contract as the
    dense ``_resolve_algo_spec``: env pin > cache winner > heuristic."""
    ident = -1 if identity_k is None else int(identity_k)
    if mode == "explicit" or mode == "gather_mm":
        return ("explicit",)
    if mode == "implicit_pallas":
        if default_wf is None or default_wf > 4:
            return ("explicit",)
        return ("pallas", 256, default_wf, zg, s, ident)
    if constants.WCT_AUTOTUNE:
        from warpconvnet_tpu.nn.functional.autotune import get_winner

        rec = get_winner(namespace, config)
        if rec is not None:
            if rec.get("algo") == "pallas":
                return ("pallas", int(rec.get("tile_m", 256)),
                        float(rec.get("window", default_wf or 2)), zg,
                        int(rec.get("s", s)), ident)
            return ("explicit",)
    if (
        sorted_ok
        and not prefer_explicit
        and default_wf is not None
        and default_wf <= 4
        and (_on_tpu() or _pallas_interpret() is False)
    ):
        return ("pallas", 256, default_wf, zg, s, ident)
    return ("explicit",)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def depthwise_conv_fma(
    features, weight, table, rev, fwd_plan, rev_plan,
    accum_dtype_name: str, algos=(("explicit",),) * 3 + (False,),
):
    """Depthwise sparse conv core.

    Args:
      features: [B, N_in, C].
      weight: [K, C].
      table: [B, K, N_out] int32 pair table (input index or -1).
      rev: [B, K, N_in] int32 reverse table.
      fwd_plan / rev_plan: optional shared :class:`ConvPlan` window plans.
      algos: static (fwd_spec, dgrad_spec, wgrad_spec, fused_bwd).
    Returns: [B, N_out, C].
    """
    return _depth_fwd_dispatch(
        features, weight, table, fwd_plan, jnp.dtype(accum_dtype_name),
        algos[0],
    )


def _depth_fwd(features, weight, table, rev, fwd_plan, rev_plan,
               accum_dtype_name, algos):
    out = _depth_fwd_dispatch(
        features, weight, table, fwd_plan, jnp.dtype(accum_dtype_name),
        algos[0],
    )
    return out, (features, weight, table, rev, fwd_plan, rev_plan)


def _depth_bwd(accum_dtype_name, algos, res, g):
    features, weight, table, rev, fwd_plan, rev_plan = res
    acc = jnp.dtype(accum_dtype_name)
    if len(algos) > 3 and algos[3]:
        # Fused one-pass backward (symmetric self-map, matching pallas
        # specs — validated by the dispatcher).
        from warpconvnet_tpu.kernels.depthwise_fma import (
            depthwise_fma_bwd_fused,
        )

        dx, dw = depthwise_fma_bwd_fused(
            features, g, weight, table, fwd_plan,
            **_depth_spec_kwargs(algos[2]),
        )
        return (dx.astype(g.dtype), dw.astype(weight.dtype),
                None, None, None, None)
    dx = _depth_dgrad_dispatch(g, weight, rev, rev_plan, acc, algos[1])
    dw = _depth_wgrad_dispatch(features, g, table, fwd_plan, acc, algos[2])
    return (dx.astype(g.dtype), dw.astype(weight.dtype),
            None, None, None, None)


depthwise_conv_fma.defvjp(_depth_fwd, _depth_bwd)


def spatially_sparse_depthwise_conv(
    voxels: Voxels,
    weight: jnp.ndarray,
    kernel_size: Sequence[int] | int,
    stride: Sequence[int] | int = 1,
    dilation: Sequence[int] | int = 1,
    bias: Optional[jnp.ndarray] = None,
    out_coords: Optional[Voxels] = None,
    pair_table: Optional[BatchedPairTable] = None,
    out_capacity: Optional[int] = None,
) -> Tuple[Voxels, Optional[BatchedPairTable]]:
    """Depthwise sparse conv over :class:`Voxels` (reference
    ``spatially_sparse_depthwise_conv``, ``sparse_conv_depth.py:957``).

    ``weight`` has shape [K, C]. Returns (out_voxels, pair_table).
    """
    ks = _as3(kernel_size)
    features = voxels.features

    if pair_table is not None:
        assert out_coords is not None, "pair_table reuse requires out_coords"
        oc, onv = out_coords.coords, out_coords.num_valid
        out_ts = out_coords.tensor_stride
        table = pair_table
    else:
        oc, onv, table, out_ts = generate_output_coords_and_kernel_map(
            voxels, ks, stride, dilation, False, False, out_coords, out_capacity
        )

    # Output-side lex order mirrors the dense path: strided outputs come
    # from the sorted unique; submanifold outputs share the input coords.
    sorted_in = voxels.lex_sorted or constants.WCT_ASSUME_LEX_SORTED
    if out_coords is not None:
        out_sorted = out_coords.lex_sorted or constants.WCT_ASSUME_LEX_SORTED
    elif any(s != 1 for s in _as3(stride)):
        out_sorted = True
    else:
        out_sorted = sorted_in
    sorted_ok = sorted_in and out_sorted

    from warpconvnet_tpu.utils.benchmark_cache import (
        NS_DEPTH_DGRAD,
        NS_DEPTH_FORWARD,
        NS_DEPTH_WGRAD,
        SparseConvConfig,
    )

    n_in = features.shape[1]
    n_out_cap = table.table.shape[2]
    k_vol = table.table.shape[1]
    c = features.shape[-1]
    cfg = SparseConvConfig.from_shapes(
        n_in, n_out_cap, c, c, k_vol, features.dtype
    )

    # Window factors / offset grouping: identical locality analysis to the
    # dense conv (same maps, same sorted order) — unit-stride gathers fit
    # wf1.5 with dx-major grouping; strided K<=8 maps run the full block.
    sr = int(np.prod(_as3(stride)))
    s_steps = 4
    offs = np.asarray(table.offsets)
    if sr > 1 and k_vol <= 8:
        zg = k_vol
        wf_fwd, wf_dgrad, wf_wgrad = 4.0, 2.0, 4.0
        pref_exp = True
    elif sr == 1:
        zg = x_group_of(offs)
        wf_fwd = wf_dgrad = wf_wgrad = 1.5
        pref_exp = False
    else:
        zg = z_group_of(offs)
        wf_fwd, wf_dgrad, wf_wgrad = 4.0, 2.0, 4.0
        pref_exp = True
    ident = table.identity_index

    fwd_spec = _resolve_depth_spec(
        constants.WCT_DEPTH_ALGO_MODE, NS_DEPTH_FORWARD, cfg, sorted_ok,
        wf_fwd, zg, s_steps, ident, pref_exp,
    )
    dgrad_spec = _resolve_depth_spec(
        constants.WCT_DEPTH_ALGO_MODE, NS_DEPTH_DGRAD, cfg, sorted_ok,
        wf_dgrad, zg, s_steps, ident, pref_exp,
    )
    wgrad_spec = _resolve_depth_spec(
        constants.WCT_DEPTH_ALGO_MODE, NS_DEPTH_WGRAD, cfg, sorted_ok,
        wf_wgrad, zg, s_steps, ident, pref_exp,
    )
    # Unify pallas tile params across plan-sharing directions (see the
    # dense dispatcher): wgrad rides fwd_plan; the self-map dgrad rides
    # its free K-flip.
    if fwd_spec[0] == "pallas":
        if wgrad_spec[0] == "pallas":
            wgrad_spec = ("pallas",) + fwd_spec[1:]
        if (
            dgrad_spec[0] == "pallas"
            and table.self_map is True
            and _offsets_symmetric(table.offsets)
        ):
            dgrad_spec = ("pallas",) + fwd_spec[1:]

    fused_bwd = bool(
        constants.WCT_FUSED_BWD
        and table.self_map is True
        and _offsets_symmetric(table.offsets)
        and dgrad_spec[0] == "pallas"
        and wgrad_spec[0] == "pallas"
        and dgrad_spec[1:] == wgrad_spec[1:]
        and n_in == n_out_cap
    )

    # Build (or reuse) shared window plans for the Pallas directions —
    # the SAME ConvPlan type the dense conv attaches, so a ConvNeXt block's
    # depthwise + dense convs over one map share one plan.
    fwd_plan, rev_plan = table.fwd_plan, table.rev_plan

    def win_of(tm, wf):
        return -(-int(wf * tm) // 16) * 16

    gather_spec = fwd_spec if fwd_spec[0] == "pallas" else wgrad_spec
    if gather_spec[0] == "pallas":
        tm, wf, z, st = (gather_spec[1], gather_spec[2], gather_spec[3],
                         gather_spec[4])
        id_eff = _identity_ok(gather_spec[5], n_in, n_out_cap, tm * st)
        if fwd_plan is None or not fwd_plan.matches(
            tm, win_of(tm, wf), z, 1, st, id_eff, 0
        ):
            fwd_plan = make_plan(
                table.table, n_in, tile_m=tm, window_factor=wf, zg=z,
                s=st, identity_k=None if id_eff < 0 else id_eff,
            )
    if dgrad_spec[0] == "pallas":
        tm, wf, z, st = (dgrad_spec[1], dgrad_spec[2], dgrad_spec[3],
                         dgrad_spec[4])
        id_eff = _identity_ok(dgrad_spec[5], n_out_cap, n_in, tm * st)
        if rev_plan is None or not rev_plan.matches(
            tm, win_of(tm, wf), z, 1, st, id_eff, 0
        ):
            if (
                table.self_map
                and _offsets_symmetric(table.offsets)
                and fwd_plan is not None
                and fwd_plan.matches(
                    tm, win_of(tm, wf), z, 1, st, id_eff, 0
                )
            ):
                rev_plan = fwd_plan.flip_k()
            else:
                rev_plan = make_plan(
                    table.rev, n_out_cap, tile_m=tm, window_factor=wf,
                    zg=z, s=st, identity_k=None if id_eff < 0 else id_eff,
                )
    table = table._replace(fwd_plan=fwd_plan, rev_plan=rev_plan)

    out_feats = depthwise_conv_fma(
        features, weight, table.table, table.rev, fwd_plan, rev_plan,
        _accum_dtype(), (fwd_spec, dgrad_spec, wgrad_spec, fused_bwd),
    )
    if bias is not None:
        out_feats = out_feats + bias
    n_out = oc.shape[1]
    row_valid = (
        lax.broadcasted_iota(jnp.int32, (voxels.batch_size, n_out), 1) < onv[:, None]
    )
    out_feats = jnp.where(row_valid[..., None], out_feats, 0)
    out = Voxels(
        coords=oc,
        features=out_feats,
        num_valid=onv,
        voxel_size=voxels.voxel_size,
        tensor_stride=tuple(out_ts),
        lex_sorted=out_sorted,
    )
    return out, table
