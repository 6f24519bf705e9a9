"""Spatially sparse convolution — functional entry + explicit GEMM backend.

TPU-native rebuild of the reference conv stack
(``warpconvnet/nn/functional/sparse_conv/helper.py:35-567``,
``detail/unified.py``, ``detail/explicit.py``):

* The kernel map is a dense ``PairTable [K, N_out]`` built inside jit by
  sort/searchsorted — no host syncs, no ``@torch.compiler.disable``.
* Forward = scan over K kernel offsets: masked row-gather -> MXU matmul ->
  VMEM-accumulated add (the ``explicit_gemm`` reference algorithm, which on
  TPU already maps to large MXU matmuls; Pallas fused variants register as
  additional backends in :mod:`warpconvnet_tpu.kernels`).
* dgrad uses the per-offset **reverse table** (injective, atomics-free — the
  reference's ``reverse_mask_data`` trick, ``detail/mask_gemm.py``): a gather
  instead of a scatter-add.
* wgrad = per-offset AtB of the masked gathered rows.

All three directions accumulate in fp32 by default
(``preferred_element_type``), with bf16 accumulation opt-in mirroring the
reference's fp16-accum mode (``constants.py set_fp16_accum``).
"""

from __future__ import annotations

import functools
from typing import Literal, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu import constants
from warpconvnet_tpu.geometry.voxels import Voxels, _as3
from warpconvnet_tpu.kernels.implicit_gemm import (
    ConvPlan,
    _identity_ok,
    make_plan,
    pack_for,
    x_group_of,
    z_group_of,
)
from warpconvnet_tpu.ops.kernel_map import (
    PairTable,
    build_pair_table,
    build_pair_tables_batched,
    expand_coords,
    identity_offset_index,
    kernel_offsets,
    parity_down_map,
    parity_pair_tables_from_unique,
    parity_partition_applies,
    parity_strided_unique,
    stride_coords,
)
from warpconvnet_tpu.ops.keys import PAD_COORD


class BatchedPairTable(NamedTuple):
    """Per-scene pair tables stacked on a batch axis.

    table: [B, K, N_out] int32; rev: [B, K, N_in] int32 (or None until built).
    offsets: static [K, 3] numpy.
    fwd_plan / rev_plan: lazily attached :class:`ConvPlan` window plans for
    the Pallas backends — shared by every conv that reuses this map (a UNet
    stage's blocks; fwd + wgrad of one conv; the transposed decoder reusing
    the encoder map), the analog of the reference's lazy ``_mask_data``
    caches on ``IntSearchResult``.
    """

    table: jnp.ndarray
    rev: Optional[jnp.ndarray]
    offsets: np.ndarray
    fwd_plan: Optional[ConvPlan] = None
    rev_plan: Optional[ConvPlan] = None
    self_map: bool = False
    # Parity permutation of the map's FINE side (the denser side of a
    # strided map: the input of a strided conv == the output of the
    # transposed decoder conv). Lazily attached by spatially_sparse_conv;
    # shared across directions and across the encoder/decoder pair.
    fine_perm: Optional[jnp.ndarray] = None
    fine_inv: Optional[jnp.ndarray] = None

    @property
    def num_offsets(self) -> int:
        return self.table.shape[1]

    @property
    def identity_index(self) -> Optional[int]:
        """Offset slot whose table row is iota — only guaranteed for
        self-maps (in == out coordinate set, so ``table[k0] == arange``;
        the reference's ``identity_map_index``). With the canonical
        symmetric enumeration the reverse table's identity slot is the
        same index, so fwd/dgrad/wgrad all share it."""
        if self.self_map is not True:  # guard traced values
            return None
        hits = np.where((np.asarray(self.offsets) == 0).all(axis=1))[0]
        return int(hits[0]) if len(hits) else None

    def with_reverse(self, num_in: int) -> "BatchedPairTable":
        if self.rev is not None:
            return self

        def one(t):
            return PairTable(t, self.offsets, num_in).reverse().table

        return self._replace(rev=jax.vmap(one)(self.table))

    def reversed(self) -> "BatchedPairTable":
        """Swap in/out roles: the transposed-conv map
        (reference ``helper.py:462-512``). Window plans swap with their
        tables, so a decoder stage inherits the encoder's plans for free."""
        assert self.rev is not None, "call with_reverse(num_in) first"
        return BatchedPairTable(
            self.rev, self.table, -self.offsets,
            fwd_plan=self.rev_plan, rev_plan=self.fwd_plan,
            self_map=self.self_map,
            fine_perm=self.fine_perm, fine_inv=self.fine_inv,
        )


def _accum_dtype() -> str:
    return "bfloat16" if constants.get_low_precision_accum() else "float32"


# ---------------------------------------------------------------------------
# Explicit GEMM backend (reference detail/explicit.py — the correctness anchor)
# ---------------------------------------------------------------------------


def _gather_rows(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features [B, N, C], idx [B, M] (-1 = no row) -> masked [B, M, C]."""
    safe = jnp.maximum(idx, 0)
    rows = jnp.take_along_axis(features, safe[..., None], axis=1)
    return jnp.where((idx >= 0)[..., None], rows, 0)


def _fwd_impl(features, weight, table, accum_dtype):
    """out[b, o] = sum_k gather(features, table[b,k])[o] @ weight[k]."""
    b, _, _ = features.shape
    n_out = table.shape[2]
    c_out = weight.shape[-1]
    table_k = jnp.swapaxes(table, 0, 1)  # [K, B, N_out]

    def body(acc, inp):
        t, w = inp
        a = _gather_rows(features, t)
        acc = acc + jnp.einsum(
            "bmc,cd->bmd", a, w, preferred_element_type=accum_dtype
        )
        return acc, None

    init = jnp.zeros((b, n_out, c_out), accum_dtype)
    acc, _ = lax.scan(body, init, (table_k, weight))
    return acc.astype(features.dtype)


def _dgrad_impl(g, weight, rev, accum_dtype):
    """dx[b, i] = sum_k gather(g, rev[b,k])[i] @ weight[k].T  (atomics-free)."""
    b = g.shape[0]
    n_in = rev.shape[2]
    c_in = weight.shape[1]
    rev_k = jnp.swapaxes(rev, 0, 1)

    def body(acc, inp):
        r, w = inp
        gg = _gather_rows(g, r)
        acc = acc + jnp.einsum(
            "bmd,cd->bmc", gg, w, preferred_element_type=accum_dtype
        )
        return acc, None

    init = jnp.zeros((b, n_in, c_in), accum_dtype)
    acc, _ = lax.scan(body, init, (rev_k, weight))
    return acc.astype(g.dtype)


def _wgrad_impl(features, g, table, accum_dtype):
    """dw[k] = gather(features, table[:,k]).T @ g   (AtB per offset)."""
    table_k = jnp.swapaxes(table, 0, 1)

    def body(_, t):
        a = _gather_rows(features, t)
        dw = jnp.einsum("bmc,bmd->cd", a, g, preferred_element_type=accum_dtype)
        return None, dw

    _, dws = lax.scan(body, None, table_k)
    return dws


def _pallas_interpret() -> bool:
    # CPU backends run the Pallas kernels through the interpreter (tests,
    # debugging); TPU compiles them with Mosaic.
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:  # pragma: no cover
        return True


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# Algo specs are static hashable tuples threaded through conv_gemm:
#   ("explicit",)
#   ("igemm", tile_m, window_factor, zg, s, identity_k, parity)
AlgoSpec = Tuple


def _resolve_algo_spec(
    mode: str,
    namespace: str,
    config,
    sorted_ok: bool,
    default_wf: Optional[float],
    zg: int = 1,
    s: int = 1,
    identity_k: Optional[int] = None,
    parity: int = 0,
    prefer_explicit: bool = False,
) -> AlgoSpec:
    """Backend resolution for one GEMM direction (the reference's cache-keyed
    dispatch, ``detail/unified.py:203-213``).

    * explicit env mode pins the scan backend;
    * ``implicit_pallas`` pins the Pallas kernel with default tiles;
    * ``auto`` consults the benchmark cache (winners written by
      :func:`warpconvnet_tpu.nn.functional.autotune.autotune_sparse_conv` /
      ``pre_autotune``); on a miss it falls back to the measured regioning
      heuristic (window sizes from the per-level spread measurements,
      ``scripts/window_stats.py``).

    ``default_wf`` is the direction's measured window factor; ``None`` means
    the direction's gather source is not locality-bounded (ratio-dependent
    fine-side gather of a strided map) — explicit until the parity-partition
    path covers it.

    ``prefer_explicit``: the auto cache-miss heuristic picks explicit even
    though the igemm path is available. Set for strided/transposed convs:
    the full-block zg=K igemm wins some isolated micro-benchmarks but
    regressed the production forward 327 -> 416 ms when routed wholesale
    (``scripts/step_decompose.py``, 2026-08-18) — per-shape choices belong
    to the autotune cache. A cache winner or pinned ``implicit_pallas``
    still routes to igemm.
    """
    ident = -1 if identity_k is None else int(identity_k)
    if mode == "explicit" or mode == "gather_mm":
        return ("explicit",)
    if mode == "implicit_pallas":
        if default_wf is None or default_wf > 4:
            return ("explicit",)
        return ("igemm", 256, default_wf, zg, s, ident, parity)
    # auto
    if constants.WCT_AUTOTUNE:
        from warpconvnet_tpu.nn.functional.autotune import get_winner

        rec = get_winner(namespace, config)
        if rec is not None:
            if rec.get("algo") == "igemm":
                return ("igemm", int(rec.get("tile_m", 256)),
                        float(rec.get("window", default_wf or 2)), zg,
                        int(rec.get("s", 1)), ident, parity)
            return ("explicit",)
    if (
        sorted_ok
        and not prefer_explicit
        and default_wf is not None
        and default_wf <= 4
        and (_on_tpu() or _pallas_interpret() is False)
    ):
        return ("igemm", 256, default_wf, zg, s, ident, parity)
    return ("explicit",)


def _spec_kwargs(spec: AlgoSpec):
    # Tolerate short (tile_m, wf, zg)-only specs from tests / older caches.
    s = spec[4] if len(spec) > 4 else 1
    ident = spec[5] if len(spec) > 5 else -1
    parity = spec[6] if len(spec) > 6 else 0
    return dict(
        tile_m=spec[1], window_factor=spec[2], zg=spec[3], s=s,
        identity_k=None if ident < 0 else ident, parity=parity,
        interpret=_pallas_interpret(),
    )


def _fwd_dispatch(features, weight, table, plan, accum_dtype, spec: AlgoSpec):
    """Forward GEMM dispatch (reference detail/dispatch.py)."""
    if spec[0] == "igemm":
        from warpconvnet_tpu.kernels.implicit_gemm import implicit_gemm_fwd

        return implicit_gemm_fwd(
            features, weight, table, plan, **_spec_kwargs(spec)
        ).astype(features.dtype)
    return _fwd_impl(features, weight, table, accum_dtype)


def _dgrad_dispatch(g, weight, rev, rev_plan, accum_dtype, spec: AlgoSpec):
    """dgrad dispatch: the Pallas kernel serves ABt with the reverse table
    (also monotone per offset) and transposed weights."""
    if spec[0] == "igemm":
        from warpconvnet_tpu.kernels.implicit_gemm import implicit_gemm_fwd

        wt = jnp.swapaxes(weight, 1, 2)  # [K, C_out, C_in]
        return implicit_gemm_fwd(
            g, wt, rev, rev_plan, **_spec_kwargs(spec)
        ).astype(g.dtype)
    return _dgrad_impl(g, weight, rev, accum_dtype)


def _wgrad_dispatch(features, g, table, plan, accum_dtype, spec: AlgoSpec):
    """wgrad dispatch (AtB namespace)."""
    if spec[0] == "igemm":
        from warpconvnet_tpu.kernels.implicit_gemm import implicit_gemm_wgrad

        return implicit_gemm_wgrad(
            features, g, table, plan, **_spec_kwargs(spec)
        )
    return _wgrad_impl(features, g, table, accum_dtype)


def _permute_rows(arr, perm):
    """arr [B, N, C] -> arr[b, perm[b]] (full permutation, no -1 entries)."""
    return jnp.take_along_axis(arr, perm[..., None], axis=1)


def _parity_perm(coords, num_valid, tensor_stride, stride):
    """Stride-parity-class-major row permutation of the fine side.

    For a strided map, an input at coord c is gathered only by the offsets
    whose residue ``(c // ts) mod stride`` matches — each offset's gather
    source lives in exactly one parity class. Grouping rows class-major
    (stable lex order within a class) therefore bounds every offset's
    per-tile gather spread by ~tile_m regardless of the in/out density
    ratio (measured: raw fine-side spreads grow 442 -> 1151 with depth;
    parity-partitioned stay within one tile — scripts/window_stats.py).
    This is the TPU analog of the reference's mask_argsort locality
    reordering (``detail/mask_gemm.py:240-243``): a data permutation
    outside the kernel instead of a warp-coherence sort.

    Exactness does NOT depend on this analysis: any permutation keeps the
    igemm exact (out-of-window pairs go through the residual pass).

    Returns (perm, inv) [B, N] int32; padded rows sort last.

    Coordinates are stored at the DIVIDED scale at every level (strided
    outputs come from ``unique(in // stride)``), so the parity class is
    ``coords % stride`` directly — ``tensor_stride`` is resolution
    metadata, not a coordinate multiplier (dividing by it here broke
    every level below the first).
    """
    del tensor_stride
    st = np.asarray(_as3(stride), np.int32)
    b, n, _ = coords.shape
    c = coords
    cls = (
        (jnp.mod(c[..., 0], st[0]) * st[1] + jnp.mod(c[..., 1], st[1]))
        * st[2]
        + jnp.mod(c[..., 2], st[2])
    ).astype(jnp.int32)
    ncls = int(np.prod(st))
    iota = lax.broadcasted_iota(jnp.int32, (b, n), 1)
    valid = iota < num_valid[:, None]
    key = jnp.where(valid, cls, ncls) * n + iota  # unique -> stable order
    perm = jnp.argsort(key, axis=1).astype(jnp.int32)
    inv = (
        jnp.zeros((b, n), jnp.int32)
        .at[jnp.arange(b)[:, None], perm]
        .set(iota)
    )
    return perm, inv


def _remap_values(table, inv):
    """Remap table VALUES through inv [B, N_src] (-1 entries preserved)."""
    safe = jnp.maximum(table, 0)
    mapped = jnp.take_along_axis(inv[:, None, :], safe, axis=2)
    return jnp.where(table >= 0, mapped, -1)


def _permute_columns(rev, perm):
    """Permute table COLUMNS: out[b, k, j] = rev[b, k, perm[b, j]]."""
    return jnp.take_along_axis(rev, perm[:, None, :], axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def conv_gemm(
    features, weight, table, rev, fwd_plan, rev_plan,
    in_perm, in_inv, out_perm, out_inv,
    accum_dtype_name: str, algos=(("explicit",),) * 3,
):
    """Core sparse-conv GEMM with custom VJP.

    Args:
      features: [B, N_in, C_in].
      weight: [K, C_in, C_out].
      table: [B, K, N_out] int32 pair table (input-row index or -1).
      rev: [B, K, N_in] int32 reverse table (output-row index or -1).
      fwd_plan / rev_plan: optional shared :class:`ConvPlan` window plans
        (built once per kernel map; fwd_plan serves fwd + wgrad, rev_plan
        serves dgrad).
      in_perm / in_inv: optional [B, N_in] parity permutation of the INPUT
        rows (strided conv, fine side = input): ``table``/``rev`` must
        already be remapped to the permuted order; features are permuted
        here and dx is un-permuted in the VJP. The permutation groups rows
        by stride-parity class so every offset's gather spread fits one
        tile (the TPU analog of the reference's mask_argsort locality
        reordering, ``detail/mask_gemm.py:240-243``).
      out_perm / out_inv: optional [B, N_out] parity permutation of the
        OUTPUT rows (transposed conv, fine side = output), applied only to
        the dgrad gather source (g); ``rev`` must be value-remapped.
      accum_dtype_name: 'float32' or 'bfloat16' (static).
      algos: static (fwd_spec, dgrad_spec, wgrad_spec) algo tuples from
        :func:`_resolve_algo_spec`.
    Returns: [B, N_out, C_out] in features.dtype.
    """
    if in_perm is not None:
        features = _permute_rows(features, in_perm)
    return _fwd_dispatch(
        features, weight, table, fwd_plan, jnp.dtype(accum_dtype_name),
        algos[0],
    )


def _conv_gemm_fwd(features, weight, table, rev, fwd_plan, rev_plan,
                   in_perm, in_inv, out_perm, out_inv,
                   accum_dtype_name, algos):
    if in_perm is not None:
        features = _permute_rows(features, in_perm)
    out = _fwd_dispatch(
        features, weight, table, fwd_plan, jnp.dtype(accum_dtype_name),
        algos[0],
    )
    # features stored permuted — wgrad gathers through the same (remapped)
    # table the forward used.
    return out, (features, weight, table, rev, fwd_plan, rev_plan,
                 in_inv, out_perm)


def _conv_gemm_bwd(accum_dtype_name, algos, res, g):
    (features, weight, table, rev, fwd_plan, rev_plan,
     in_inv, out_perm) = res
    acc = jnp.dtype(accum_dtype_name)
    if len(algos) > 3 and algos[3]:
        # Fused one-pass backward (symmetric self-map, matching igemm
        # specs — validated by the dispatcher): one kernel shares window
        # DMAs and one-hot gathers between dgrad and wgrad.
        from warpconvnet_tpu.kernels.implicit_gemm import (
            implicit_gemm_bwd_fused,
        )

        kw = _spec_kwargs(algos[2])
        kw.pop("parity")
        dx, dw = implicit_gemm_bwd_fused(
            features, g, weight, table, fwd_plan, **kw
        )
        return (dx.astype(g.dtype), dw.astype(weight.dtype),
                None, None, None, None, None, None, None, None)
    gd = _permute_rows(g, out_perm) if out_perm is not None else g
    dx = _dgrad_dispatch(gd, weight, rev, rev_plan, acc, algos[1])
    if in_inv is not None:
        dx = _permute_rows(dx, in_inv)
    dw = _wgrad_dispatch(features, g, table, fwd_plan, acc, algos[2]).astype(
        weight.dtype
    )
    return (dx, dw, None, None, None, None, None, None, None, None)


conv_gemm.defvjp(_conv_gemm_fwd, _conv_gemm_bwd)


# ---------------------------------------------------------------------------
# Grouped variant (reference detail/mask_gemm.py groups support; weight
# layout [K, G, C_in/G, C_out/G] as in nn/modules/sparse_conv.py:31)
# ---------------------------------------------------------------------------


def _grouped_fwd_impl(features, weight, table, accum_dtype):
    b, _, cin = features.shape
    k, g, cg, cd = weight.shape
    n_out = table.shape[2]
    table_k = jnp.swapaxes(table, 0, 1)

    def body(acc, inp):
        t, w = inp
        a = _gather_rows(features, t).reshape(b, n_out, g, cg)
        acc = acc + jnp.einsum(
            "bmgc,gcd->bmgd", a, w, preferred_element_type=accum_dtype
        )
        return acc, None

    init = jnp.zeros((b, n_out, g, cd), accum_dtype)
    acc, _ = lax.scan(body, init, (table_k, weight))
    return acc.reshape(b, n_out, g * cd).astype(features.dtype)


def _grouped_dgrad_impl(gout, weight, rev, accum_dtype):
    b = gout.shape[0]
    k, g, cg, cd = weight.shape
    n_in = rev.shape[2]
    rev_k = jnp.swapaxes(rev, 0, 1)

    def body(acc, inp):
        r, w = inp
        gg = _gather_rows(gout, r).reshape(b, n_in, g, cd)
        acc = acc + jnp.einsum(
            "bmgd,gcd->bmgc", gg, w, preferred_element_type=accum_dtype
        )
        return acc, None

    init = jnp.zeros((b, n_in, g, cg), accum_dtype)
    acc, _ = lax.scan(body, init, (rev_k, weight))
    return acc.reshape(b, n_in, g * cg).astype(gout.dtype)


def _grouped_wgrad_impl(features, gout, table, num_groups, accum_dtype):
    b, n_out, cout = gout.shape
    g = num_groups
    table_k = jnp.swapaxes(table, 0, 1)
    gr = gout.reshape(b, n_out, g, cout // g)

    def body(_, t):
        a = _gather_rows(features, t).reshape(b, n_out, g, -1)
        dw = jnp.einsum("bmgc,bmgd->gcd", a, gr, preferred_element_type=accum_dtype)
        return None, dw

    _, dws = lax.scan(body, None, table_k)
    return dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def conv_gemm_grouped(features, weight, table, rev, accum_dtype_name: str):
    """Grouped sparse-conv GEMM: weight [K, G, C_in/G, C_out/G]."""
    return _grouped_fwd_impl(features, weight, table, jnp.dtype(accum_dtype_name))


def _conv_gemm_grouped_fwd(features, weight, table, rev, accum_dtype_name):
    out = _grouped_fwd_impl(features, weight, table, jnp.dtype(accum_dtype_name))
    return out, (features, weight, table, rev)


def _conv_gemm_grouped_bwd(accum_dtype_name, res, g):
    features, weight, table, rev = res
    acc = jnp.dtype(accum_dtype_name)
    dx = _grouped_dgrad_impl(g, weight, rev, acc)
    dw = _grouped_wgrad_impl(features, g, table, weight.shape[1], acc).astype(
        weight.dtype
    )
    return dx, dw, None, None


conv_gemm_grouped.defvjp(_conv_gemm_grouped_fwd, _conv_gemm_grouped_bwd)


# ---------------------------------------------------------------------------
# Kernel-map planning (reference generate_output_coords_and_kernel_map)
# ---------------------------------------------------------------------------


def _offsets_symmetric(offsets: np.ndarray) -> bool:
    """True when offsets[K-1-k] == -offsets[k] for all k (the canonical
    centered odd-kernel enumeration)."""
    return bool(np.array_equal(offsets[::-1], -offsets))


def build_batched_pair_table(
    in_coords: jnp.ndarray,
    in_num_valid: jnp.ndarray,
    out_coords: jnp.ndarray,
    out_num_valid: jnp.ndarray,
    offsets: np.ndarray,
    stride: Sequence[int] | int = 1,
    self_map: bool = False,
    assume_sorted: Optional[bool] = None,
    queries_sorted: Optional[bool] = None,
) -> BatchedPairTable:
    """Batched pair tables with reverse tables — one fused probe call for the
    whole batch (:func:`build_pair_tables_batched` flattens scenes, so there
    is no per-scene Python loop and no vmapped ``lax.cond``).

    ``assume_sorted`` describes the key side (``in_coords``);
    ``queries_sorted`` the query side (``out_coords``) — the probe fast path
    requires both (see :func:`build_pair_tables_batched`).

    ``self_map``: in and out are the *same* coordinate set at stride 1
    (submanifold conv). With the canonical centered offset enumeration
    (``offsets[K-1-k] == -offsets[k]``), the reverse table is then just the
    forward table with the offset axis flipped:
    ``rev[k][i] = o  <=>  in[i] == out[o] + off_k  <=>  out[o] == in[i] - off_k``
    — a free K-flip instead of a 3.5M-element scatter per scene.
    """
    n_in = in_coords.shape[1]
    if queries_sorted is None and self_map:
        queries_sorted = assume_sorted
    table = build_pair_tables_batched(
        in_coords, in_num_valid, out_coords, out_num_valid, offsets,
        stride=stride, assume_sorted=assume_sorted,
        queries_sorted=queries_sorted,
    )
    if self_map and _offsets_symmetric(offsets):
        return BatchedPairTable(
            table, table[:, ::-1, :], offsets, self_map=True
        )
    bpt = BatchedPairTable(table, None, offsets, self_map=bool(self_map))
    return bpt.with_reverse(n_in)


def generate_output_coords_and_kernel_map(
    voxels: Voxels,
    kernel_size: Sequence[int] | int,
    stride: Sequence[int] | int = 1,
    dilation: Sequence[int] | int = 1,
    transposed: bool = False,
    generative: bool = False,
    out_coords: Optional[Voxels] = None,
    out_capacity: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, BatchedPairTable, Tuple[int, int, int]]:
    """Compute output coordinates + kernel map for all conv variants.

    Returns (out_coords [B, M, 3], out_num_valid [B], table, out_tensor_stride).
    Mirrors reference ``helper.py:291-512`` semantics: strided outputs stay at
    the divided coordinate scale; transposed convs reuse the forward-map
    structure with in/out swapped (here: the reverse table, rebuilt directly).
    """
    ks = _as3(kernel_size)
    st = _as3(stride)
    offsets = kernel_offsets(ks, dilation)
    b, n, _ = voxels.coords.shape
    cap = out_capacity or n
    in_ts = voxels.tensor_stride
    sorted_in = voxels.lex_sorted or constants.WCT_ASSUME_LEX_SORTED

    if transposed:
        # Input is coarse (stride r relative to target). Build the
        # downsampling map (fine -> coarse) and reverse it.
        assert out_coords is not None or generative, (
            "transposed conv needs target out_coords or generative=True"
        )
        if out_coords is not None:
            fine_c, fine_nv = out_coords.coords, out_coords.num_valid
            out_ts = out_coords.tensor_stride
        else:
            # Generative upsample: every coarse voxel spawns its stride-scaled
            # neighborhood (reference helper.py generative transposed).
            scaled = voxels.coords * jnp.asarray(st, jnp.int32)

            def one(c, nv):
                v = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
                c = jnp.where(v[:, None], c, PAD_COORD)
                res = expand_coords(c, v, offsets, max_out=cap)
                return res.coords, jnp.minimum(res.num_unique, cap)

            fine_c, fine_nv = jax.vmap(one)(scaled, voxels.num_valid)
            out_ts = tuple(t // s for t, s in zip(in_ts, st))
        fine_sorted = (
            True if out_coords is None
            else (out_coords.lex_sorted or constants.WCT_ASSUME_LEX_SORTED)
        )
        if (
            parity_partition_applies(ks, st, dilation)
            and sorted_in
            and constants.WCT_PARITY_MAPS
        ):
            # Parity partition with a GIVEN coarse set: one single-offset
            # parent lookup per fine row replaces the K-offset probe.
            fv = (
                lax.broadcasted_iota(jnp.int32, fine_c.shape[:2], 1)
                < fine_nv[:, None]
            )
            tab, rev = parity_down_map(
                fine_c, fv, voxels.coords, voxels.num_valid, tuple(ks)
            )
            down = BatchedPairTable(tab, rev, offsets)
            return fine_c, fine_nv, down.reversed(), out_ts
        down = build_batched_pair_table(
            fine_c, fine_nv, voxels.coords, voxels.num_valid, offsets,
            stride=st, assume_sorted=fine_sorted, queries_sorted=sorted_in,
        )
        return fine_c, fine_nv, down.reversed(), out_ts

    if generative:
        def one(c, nv):
            v = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
            c = jnp.where(v[:, None], c, PAD_COORD)
            res = expand_coords(c, v, offsets, max_out=cap)
            return res.coords, jnp.minimum(res.num_unique, cap)

        oc, onv = jax.vmap(one)(voxels.coords, voxels.num_valid)
        table = build_batched_pair_table(
            voxels.coords, voxels.num_valid, oc, onv, offsets, stride=1,
            assume_sorted=sorted_in, queries_sorted=True,
        )
        return oc, onv, table, in_ts

    if all(s == 1 for s in st):
        if out_coords is not None:
            oc, onv = out_coords.coords, out_coords.num_valid
            self_map = False
            q_sorted = out_coords.lex_sorted or constants.WCT_ASSUME_LEX_SORTED
        else:
            oc, onv = voxels.coords, voxels.num_valid
            self_map = True  # submanifold: free K-flip reverse table
            q_sorted = sorted_in
        table = build_batched_pair_table(
            voxels.coords, voxels.num_valid, oc, onv, offsets, stride=1,
            self_map=self_map, assume_sorted=sorted_in, queries_sorted=q_sorted,
        )
        return oc, onv, table, in_ts

    # Strided: downsample output coords (divided scale), map re-multiplies.
    out_ts = tuple(t * s for t, s in zip(in_ts, st))
    if parity_partition_applies(ks, st, dilation) and constants.WCT_PARITY_MAPS:
        # kernel == stride (even): the map is a parity partition — the
        # to_unique mapping of the divided-coords unique IS the kernel map;
        # no probe, no searches.
        iv = (
            lax.broadcasted_iota(jnp.int32, (b, n), 1)
            < voxels.num_valid[:, None]
        )
        if all((s & (s - 1)) == 0 for s in st):
            oc, onv_raw, to_u = parity_strided_unique(
                voxels.coords, voxels.num_valid, tuple(ks), cap
            )
            onv = jnp.minimum(onv_raw, cap)
        else:
            def one_u(c, nv):
                v = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
                res = stride_coords(c, v, st, max_out=cap)
                return (
                    res.coords,
                    jnp.minimum(res.num_unique, cap),
                    res.to_unique,
                )

            oc, onv, to_u = jax.vmap(one_u)(
                voxels.coords, voxels.num_valid
            )
        tab, rev = parity_pair_tables_from_unique(
            voxels.coords, iv, to_u, tuple(ks), cap
        )
        table = BatchedPairTable(tab, rev, offsets)
        return oc, onv, table, out_ts

    def one(c, nv):
        v = lax.broadcasted_iota(jnp.int32, (n,), 0) < nv
        res = stride_coords(c, v, st, max_out=cap)
        return res.coords, jnp.minimum(res.num_unique, cap)

    oc, onv = jax.vmap(one)(voxels.coords, voxels.num_valid)
    table = build_batched_pair_table(
        voxels.coords, voxels.num_valid, oc, onv, offsets, stride=st,
        assume_sorted=sorted_in, queries_sorted=True,
    )
    return oc, onv, table, out_ts


# ---------------------------------------------------------------------------
# Public entry (reference spatially_sparse_conv, helper.py:148)
# ---------------------------------------------------------------------------


def spatially_sparse_conv(
    voxels: Voxels,
    weight: jnp.ndarray,
    kernel_size: Sequence[int] | int,
    stride: Sequence[int] | int = 1,
    dilation: Sequence[int] | int = 1,
    bias: Optional[jnp.ndarray] = None,
    transposed: bool = False,
    generative: bool = False,
    out_coords: Optional[Voxels] = None,
    pair_table: Optional[BatchedPairTable] = None,
    out_capacity: Optional[int] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    groups: int = 1,
    stride_mode: Literal["stride_only", "reduce_and_stride"] = "stride_only",
    stride_reduce: str = "max",
    fwd_algo: Optional[str] = None,
    dgrad_algo: Optional[str] = None,
    wgrad_algo: Optional[str] = None,
) -> Tuple[Voxels, BatchedPairTable]:
    """Sparse convolution over :class:`Voxels`.

    ``fwd_algo``/``dgrad_algo``/``wgrad_algo`` override the global
    ``WCT_*_ALGO_MODE`` env modes per call (reference per-module overrides,
    ``nn/modules/sparse_conv.py:31``): ``auto`` | ``explicit`` |
    ``implicit_pallas``.

    Returns (output voxels, kernel map). The kernel map can be fed back as
    ``pair_table`` (with ``out_coords``) by callers that reuse maps — e.g. a
    UNet decoder reusing the encoder's maps, replacing the reference's
    mutable ``spatial_cache`` with explicit values.

    ``stride_mode='reduce_and_stride'`` (reference ``helper.py:275-287``,
    ``STRIDED_CONV_MODE.REDUCE_AND_STRIDE``): pre-pool the input with
    kernel=stride/stride=stride (``stride_reduce`` reduction), then run the
    conv as stride-1 on the pooled voxels — the kernel map shrinks to the
    coarse scale before the GEMM.
    """
    ks = _as3(kernel_size)
    st0 = _as3(stride)
    if (
        stride_mode == "reduce_and_stride"
        and any(s != 1 for s in st0)
        and not transposed
        and not generative
        and pair_table is None
    ):
        from warpconvnet_tpu.nn.functional.sparse_pool import sparse_reduce

        reduced, _ = sparse_reduce(
            voxels, st0, st0, stride_reduce, out_capacity=out_capacity
        )
        return spatially_sparse_conv(
            reduced, weight, kernel_size, stride=1, dilation=dilation,
            bias=bias, out_coords=out_coords, out_capacity=out_capacity,
            compute_dtype=compute_dtype, groups=groups,
            fwd_algo=fwd_algo, dgrad_algo=dgrad_algo, wgrad_algo=wgrad_algo,
        )
    features = voxels.features
    if compute_dtype is None and constants.get_compute_dtype() is not None:
        compute_dtype = jnp.dtype(constants.get_compute_dtype())
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
        weight = weight.astype(compute_dtype)

    # 1x1x1 stride-1 fast path (reference helper.py:207-213).
    if (
        tuple(ks) == (1, 1, 1)
        and tuple(_as3(stride)) == (1, 1, 1)
        and not transposed
        and not generative
        and groups == 1
    ):
        out = jnp.einsum(
            "bmc,cd->bmd", features, weight[0], preferred_element_type=jnp.dtype(_accum_dtype())
        ).astype(features.dtype)
        if bias is not None:
            out = out + bias
        out = jnp.where(voxels.valid_mask()[..., None], out, 0)
        if constants.WCT_FLOP_AUDIT is not None:
            constants.WCT_FLOP_AUDIT.append(
                (jnp.sum(voxels.num_valid), features.shape[-1],
                 weight.shape[-1], 1)
            )
        return voxels.replace(features=out), None

    if pair_table is not None:
        assert out_coords is not None, "pair_table reuse requires out_coords"
        oc, onv = out_coords.coords, out_coords.num_valid
        out_ts = out_coords.tensor_stride
        table = pair_table
    else:
        oc, onv, table, out_ts = generate_output_coords_and_kernel_map(
            voxels, ks, stride, dilation, transposed, generative, out_coords, out_capacity
        )

    # Output-side lex order: strided / generative outputs come from
    # unique_coords (always sorted); submanifold outputs share the input
    # coords; caller-provided targets carry their own flag.
    sorted_in = voxels.lex_sorted or constants.WCT_ASSUME_LEX_SORTED
    if out_coords is not None:
        out_sorted = out_coords.lex_sorted or constants.WCT_ASSUME_LEX_SORTED
    elif generative or any(s != 1 for s in _as3(stride)):
        out_sorted = True
    else:
        out_sorted = sorted_in
    sorted_ok = sorted_in and out_sorted

    conv_groups = groups
    if groups > 1:
        # weight [K, G, C_in/G, C_out/G] (reference mask_gemm groups support)
        assert weight.ndim == 4 and weight.shape[1] == groups, weight.shape
        # Fast path (the analog of the reference routing groups>1 through
        # its flagship mask_gemm with per-group channel guards,
        # detail/dispatch.py:24-109): embed the grouped weight as a
        # block-diagonal dense [K, C_in, C_out] and ride the full igemm
        # machinery (plans, autotune winners, identity fast path). The
        # embedding is differentiable, so dw comes back as block
        # extraction for free. The explicit grouped scan remains for
        # pinned-explicit mode and unsorted inputs.
        pin_explicit = all(
            m in ("explicit", "gather_mm")
            for m in (fwd_algo or constants.WCT_FWD_ALGO_MODE,
                      dgrad_algo or constants.WCT_DGRAD_ALGO_MODE,
                      wgrad_algo or constants.WCT_WGRAD_ALGO_MODE)
        )
        use_scan = pin_explicit or not sorted_ok
    else:
        use_scan = False
    if groups > 1 and use_scan:
        out_feats = conv_gemm_grouped(
            features, weight, table.table, table.rev, _accum_dtype()
        )
    else:
        if groups > 1:
            k_vol_g, _, cg, cd = weight.shape
            wbd = jnp.zeros(
                (k_vol_g, groups * cg, groups * cd), weight.dtype
            )
            for gi in range(groups):
                wbd = lax.dynamic_update_slice(
                    wbd, weight[:, gi], (0, gi * cg, gi * cd)
                )
            weight = wbd
            groups = 1
        # Per-direction window factors from the measured per-level spreads
        # (scripts/window_stats.py, window_stats_strided8.py): unit-stride
        # gathers fit W=1.25*256=320 at every UNet level; coarse-side
        # gathers of strided/transposed maps (density ratio < 1) fit 1.5x;
        # fine-side gathers of strided maps span exactly the fine rows
        # inside the tile's coarse range — CONTIGUOUS in canonical fine lex
        # order, width ~ (N_in/N_out) * tile (measured p99.9: 682 at L0 up
        # to 1423 at L3) — so the WHOLE K=8 block shares one window at
        # wf 4 with zg = K (one DMA + one batched one-hot per tile; the
        # deep-level overflow tail rides the precompacted residual).
        # Generative dgrad gathers expand K-fold with no such structure —
        # explicit.
        sr = int(np.prod(_as3(stride)))
        s_steps = 4
        if sr > 1 and not transposed:
            # fwd/wgrad gather the fine side (wf4, full-block zg); dgrad
            # gathers the coarse side through the RAW rev (measured <=466
            # = wf2 at every level).
            windows = (4.0, 2.0, 4.0)  # fwd, dgrad, wgrad
            par = (0, 0, 0)
        elif sr > 1 and transposed:
            # Transposed swaps the roles: fwd/wgrad gather the coarse side,
            # dgrad gathers the fine side.
            windows = (2.0, 4.0, 2.0)
            par = (0, 0, 0)
        elif generative:
            windows = (1.5, None, 1.5)
            par = (0, 0, 0)
        else:
            # Unit stride: wf1.5 measures ZERO overflow at every level, so
            # the residual cond never fires. wf1.25 is ~6% faster per L0-size
            # direction in isolation (15.10 vs 16.04 ms, scripts/perf_v3.py)
            # but fires a ~1 ms flat residual pass per direction — a net LOSS
            # for the many small deep-level convs (bench r3d 939.8 vs r3c
            # 904.5 ms/step was exactly this). Per-shape wf choices belong to
            # the autotune cache, not the global heuristic.
            windows = (1.5, 1.5, 1.5)
            par = (0, 0, 0)

        from warpconvnet_tpu.utils.benchmark_cache import SparseConvConfig

        n_in = features.shape[1]
        n_out_cap = table.table.shape[2]
        k_vol = table.table.shape[1]
        cfg = SparseConvConfig.from_shapes(
            n_in, n_out_cap, features.shape[-1], weight.shape[-1], k_vol,
            features.dtype,
        )
        from warpconvnet_tpu.utils.benchmark_cache import (
            NS_DGRAD,
            NS_FORWARD,
            NS_WGRAD,
        )

        # Offset grouping: dx-major ("v5") for unit-stride maps — the 9
        # offsets of one dx-block share a window (measured identical
        # spreads to (dx, dy) z-groups, zero overflow at wf1.25 at every
        # level — scripts/window_stats_zg9.py), so each grid step runs 3x
        # fewer dependent op chains. Strided/transposed K<=8 maps go one
        # further: the FULL block shares one window (zg=K, see the window
        # comment above). Generative gathers keep conservative z-grouping.
        offs = np.asarray(table.offsets)
        if sr > 1 and not generative and k_vol <= 8:
            zg = k_vol
        elif sr == 1 and not transposed and not generative:
            zg = x_group_of(offs)
        else:
            zg = z_group_of(offs)
        ident = table.identity_index
        # Parity-ordered tables CANNOT share a z-group window: the zg
        # offsets of one (dx, dy) group differ in z-parity, so their rows
        # live in different class segments (~N/8 apart) — one window per
        # offset there (zg=1).
        zgs = tuple(1 if p_ else zg for p_ in par)
        # Auto cache-miss heuristic: strided/transposed/generative convs
        # prefer explicit. The full-block zg=K igemm wins in isolated
        # micro-benchmarks at some levels (L2 f+bwd 11.7 vs 13.6 ms), but
        # routing ALL strided convs to it regressed the production forward
        # 327 -> 416 ms (step_decompose, 2026-08-18) — deep-level wf4
        # windows overflow into the residual path on real downsampled
        # distributions. The igemm formulation stays available to the
        # AUTOTUNER (candidate_pool offers wf {2,3,4,6} at K<=8), which
        # times it on the real per-level maps and picks it only where
        # measured faster.
        pref_exp = sr > 1 or transposed or generative
        fwd_spec = _resolve_algo_spec(
            fwd_algo or constants.WCT_FWD_ALGO_MODE, NS_FORWARD, cfg,
            sorted_ok, windows[0], zgs[0], s_steps, ident, par[0], pref_exp,
        )
        dgrad_spec = _resolve_algo_spec(
            dgrad_algo or constants.WCT_DGRAD_ALGO_MODE, NS_DGRAD, cfg,
            sorted_ok, windows[1], zgs[1], s_steps, ident, par[1], pref_exp,
        )
        wgrad_spec = _resolve_algo_spec(
            wgrad_algo or constants.WCT_WGRAD_ALGO_MODE, NS_WGRAD, cfg,
            sorted_ok, windows[2], zgs[2], s_steps, ident, par[2], pref_exp,
        )

        # Unify igemm tile params across directions that share one window
        # plan: wgrad rides fwd_plan, and the self-map dgrad rides its free
        # K-flip. A tuned-winner param mismatch would silently rebuild the
        # plan INSIDE jit every step (implicit_gemm_wgrad's plan.matches
        # miss, ~3 ms per conv per step) — far worse than the small
        # per-direction spread among igemm variants the tuner measured.
        if fwd_spec[0] == "igemm":
            if wgrad_spec[0] == "igemm":
                wgrad_spec = ("igemm",) + fwd_spec[1:]
            if (
                dgrad_spec[0] == "igemm"
                and table.self_map is True
                and _offsets_symmetric(table.offsets)
            ):
                dgrad_spec = ("igemm",) + fwd_spec[1:]

        # Fused one-pass backward (dgrad+wgrad) for symmetric self-maps:
        # valid when rev == table[:, ::-1] (self-map) and both directions
        # run the igemm with the SAME params (no parity perms on self-maps).
        fused_bwd = bool(
            constants.WCT_FUSED_BWD
            and table.self_map is True
            and _offsets_symmetric(table.offsets)
            and dgrad_spec[0] == "igemm"
            and wgrad_spec[0] == "igemm"
            and dgrad_spec[1:] == wgrad_spec[1:]
            and dgrad_spec[6] == 0
            and n_in == n_out_cap
        )

        # Fine-side parity remap (only when some direction runs the Pallas
        # kernel on the permuted ordering). The permuted tables feed both
        # the plans and the kernel; the returned bpt keeps the ORIGINAL
        # tables plus the cached perm, so the decoder's transposed conv
        # (same fine side) recomputes nothing.
        tbl_x, rev_x = table.table, table.rev
        in_perm = in_inv = out_perm = out_inv = None
        specs = (fwd_spec, dgrad_spec, wgrad_spec)
        if any(sp[0] == "igemm" and sp[6] == 1 for sp in specs):
            perm, inv = table.fine_perm, table.fine_inv
            if sr > 1 and not transposed:
                if perm is None:
                    perm, inv = _parity_perm(
                        voxels.coords, voxels.num_valid,
                        voxels.tensor_stride, stride,
                    )
                tbl_x = _remap_values(table.table, inv)
                # rev stays RAW (see window comment above); dx needs no
                # un-permute, so in_inv is not threaded.
                in_perm = perm
            else:  # transposed: fine side is the output
                if perm is None:
                    perm, inv = _parity_perm(oc, onv, out_ts, stride)
                rev_x = _remap_values(table.rev, inv)
                out_perm, out_inv = perm, inv
            table = table._replace(fine_perm=perm, fine_inv=inv)

        # Build (or reuse) the shared window plans for the Pallas directions.
        fwd_plan, rev_plan = table.fwd_plan, table.rev_plan
        def win_of(tm, wf, pk):
            return -(-int(wf * tm) // (16 * pk)) * (16 * pk)

        # pack is always 1 since the batched ("v4") kernel — see pack_for.
        pk_fwd = pack_for(features.shape[-1])
        pk_dgrad = pack_for(weight.shape[-1])

        gather_spec = fwd_spec if fwd_spec[0] == "igemm" else wgrad_spec
        if gather_spec[0] == "igemm":
            tm, wf, z, st = (gather_spec[1], gather_spec[2], gather_spec[3],
                             gather_spec[4])
            id_eff = -1 if pk_fwd > 1 else _identity_ok(
                gather_spec[5], n_in, n_out_cap, tm * st
            )
            if fwd_plan is None or not fwd_plan.matches(
                tm, win_of(tm, wf, pk_fwd), z, pk_fwd, st, id_eff,
                gather_spec[6],
            ):
                fwd_plan = make_plan(
                    tbl_x, n_in, tile_m=tm, window_factor=wf, zg=z,
                    pack=pk_fwd, s=st,
                    identity_k=None if id_eff < 0 else id_eff,
                    parity=gather_spec[6],
                )
        if dgrad_spec[0] == "igemm":
            tm, wf, z, st = (dgrad_spec[1], dgrad_spec[2], dgrad_spec[3],
                             dgrad_spec[4])
            id_eff = -1 if pk_dgrad > 1 else _identity_ok(
                dgrad_spec[5], n_out_cap, n_in, tm * st
            )
            if rev_plan is None or not rev_plan.matches(
                tm, win_of(tm, wf, pk_dgrad), z, pk_dgrad, st, id_eff,
                dgrad_spec[6],
            ):
                if (
                    table.self_map
                    and _offsets_symmetric(table.offsets)
                    and fwd_plan is not None
                    and fwd_plan.matches(
                        tm, win_of(tm, wf, pk_dgrad), z, pk_dgrad, st,
                        id_eff, dgrad_spec[6],
                    )
                ):
                    # Self-map rev table is the K-flip of the fwd table, so
                    # its plan is the K-flip of the fwd plan — pure slicing
                    # instead of a second plan build (reductions + overflow
                    # cumsum over [K, M_flat] per plan, ~10 plans/step).
                    rev_plan = fwd_plan.flip_k()
                else:
                    rev_plan = make_plan(
                        rev_x, n_out_cap, tile_m=tm, window_factor=wf, zg=z,
                        pack=pk_dgrad, s=st,
                        identity_k=None if id_eff < 0 else id_eff,
                        parity=dgrad_spec[6],
                    )
        table = table._replace(fwd_plan=fwd_plan, rev_plan=rev_plan)

        out_feats = conv_gemm(
            features, weight, tbl_x, rev_x, fwd_plan, rev_plan,
            in_perm, in_inv, out_perm, out_inv,
            _accum_dtype(), specs + (fused_bwd,),
        )
    if constants.WCT_FLOP_AUDIT is not None:
        constants.WCT_FLOP_AUDIT.append(
            (jnp.sum(table.table >= 0), features.shape[-1],
             weight.shape[-1], conv_groups)
        )
    if constants.WCT_CONV_SHAPE_AUDIT is not None:
        constants.WCT_CONV_SHAPE_AUDIT.append((
            int(features.shape[1]), int(table.table.shape[2]),
            int(features.shape[-1]), int(weight.shape[-1]),
            int(table.table.shape[1]), int(np.prod(_as3(stride))),
            bool(transposed), bool(generative),
        ))
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
