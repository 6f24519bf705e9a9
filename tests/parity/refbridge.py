"""Bridge that runs the ACTUAL reference (/root/reference, NVlabs/WarpConvNet)
on CPU torch for numerics-parity tests.

The reference's Python layer is pure torch except for ``warpconvnet._C``
(pybind CUDA extension). This module installs a minimal CPU stub of the ``_C``
surface used by the kernel-map + explicit-conv + pooling paths, so parity
tests exercise the reference's *own* coordinate logic (stride semantics,
offset enumeration, transposed map reuse, CSR assembly —
``geometry/coords/search/torch_discrete.py``, ``nn/functional/sparse_conv/
helper.py``, ``detail/explicit.py``) rather than a re-implementation.

The stub replaces only the hash-table *mechanism* (open addressing) with an
equivalent sorted-key table; its contract — search returns the insertion
index of an exactly-matching 4D coordinate, else -1 — is the whole semantics
the Python layer depends on.

Nothing here is imported by the library; test-only.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

_REF_PATH = "/root/reference"
_EMPTY = torch.iinfo(torch.int64).max

# Bit layout mirrors the reference packing intent (batch | x | y | z), but the
# stub only needs *some* injective, order-consistent packing. 18-bit spatial
# range, 8-bit batch keeps the key in non-negative int64 territory.
_COFF = 1 << 17  # spatial offset to unsigned


def _pack4(coords: torch.Tensor) -> torch.Tensor:
    """int32 [N, 4] (batch, x, y, z) -> injective non-negative int64 key."""
    c = coords.to(torch.int64)
    assert c.numel() == 0 or (c[:, 0].min() >= 0 and c[:, 0].max() < 256), (
        "stub supports batch < 256"
    )
    return (
        (c[:, 0] << 54)
        | ((c[:, 1] + _COFF) << 36)
        | ((c[:, 2] + _COFF) << 18)
        | (c[:, 3] + _COFF)
    )


def _table_search(keys: torch.Tensor, values: torch.Tensor, qkeys: torch.Tensor) -> torch.Tensor:
    """Sorted-table lookup: insertion index of each query key, or -1."""
    pos = torch.searchsorted(keys, qkeys)
    safe = pos.clamp(max=keys.shape[0] - 1)
    hit = keys.gather(0, safe) == qkeys
    return torch.where(hit, values.gather(0, safe), torch.full_like(values.gather(0, safe), -1)).to(torch.int32)


def _make_cuhash() -> types.ModuleType:
    m = types.ModuleType("warpconvnet._C.cuhash")

    def packed_prepare(keys, values, capacity):
        keys.fill_(_EMPTY)
        values.fill_(-1)

    def packed_insert(keys, values, coords, num_keys, capacity, use_double_hash, status):
        k = _pack4(coords[:num_keys])
        order = torch.argsort(k)
        n = num_keys
        keys[:n] = k[order]
        keys[n:] = _EMPTY
        values[:n] = order.to(torch.int32)
        values[n:] = -1
        status.fill_(0)

    def packed_search(keys, values, queries, results, num_search, capacity, search_mode):
        results[:num_search] = _table_search(keys, values, _pack4(queries[:num_search]))

    def packed_kernel_map_offset(
        keys, values, query_coords, kernel_offsets, found, num_q, num_k, capacity, tx, ty
    ):
        q = query_coords[:num_q].to(torch.int64)
        for k in range(num_k):
            qk = _pack4((q + kernel_offsets[k].to(torch.int64)).to(torch.int32))
            found[k, :num_q] = _table_search(keys, values, qk)

    def packed_kernel_map_size(
        keys, values, query_coords, kernel_size_tensor, found, num_q, num_k, capacity, tx, ty
    ):
        # Offset decode mirrors csrc/include/cuhash/kernel_map.cuh:35-53
        # (z fastest) with the launcher's centering (cuhash_kernel_map.cu:108:
        # odd -> k/2, even -> 0).
        kx, ky, kz = (int(v) for v in kernel_size_tensor)
        cx = kx // 2 if kx % 2 else 0
        cy = ky // 2 if ky % 2 else 0
        cz = kz // 2 if kz % 2 else 0
        q = query_coords[:num_q].to(torch.int64)
        for idx in range(num_k):
            kk = idx % kz
            jj = (idx // kz) % ky
            ii = idx // (kz * ky)
            off = torch.tensor([0, ii - cx, jj - cy, kk - cz], dtype=torch.int64)
            qk = _pack4((q + off).to(torch.int32))
            found[idx, :num_q] = _table_search(keys, values, qk)

    def postprocess_count(found, counts, num_k, num_q):
        counts[:num_k] = (found[:num_k, :num_q] >= 0).sum(dim=1).to(torch.int32)

    def postprocess_scatter(found, offsets, counters, in_maps, out_maps, num_k, num_q):
        for k in range(num_k):
            hit = found[k, :num_q] >= 0
            o = torch.nonzero(hit, as_tuple=False).flatten()
            s = int(offsets[k])
            in_maps[s : s + o.numel()] = found[k, o].to(torch.int32)
            out_maps[s : s + o.numel()] = o.to(torch.int32)

    def hierarchical_kernel_map(
        keys, values, coords, query_coords, kernel_size, stride, capacity
    ):
        """CPU stand-in for the fused coarse->fine K>=125 path
        (hierarchical_search.py:54, coarse_probe in cuhash_kernel_map.cu).
        The coarse bitmask is a pure pruning optimization; the contract is
        the same kernel map as the plain probe, so probe every offset."""
        kx, ky, kz = (int(v) for v in kernel_size)
        cx, cy, cz = kx // 2, ky // 2, kz // 2  # odd kernels only on this path
        q = query_coords.to(torch.int64)
        num_q = q.shape[0]
        num_k = kx * ky * kz
        in_list, out_list, counts = [], [], []
        pair_table = torch.full((num_k, num_q), -1, dtype=torch.int32)
        for idx in range(num_k):
            kk = idx % kz
            jj = (idx // kz) % ky
            ii = idx // (kz * ky)
            off = torch.tensor([0, ii - cx, jj - cy, kk - cz], dtype=torch.int64)
            found = _table_search(keys, values, _pack4((q + off).to(torch.int32)))
            pair_table[idx] = found
            hit = torch.nonzero(found >= 0, as_tuple=False).flatten()
            in_list.append(found[hit].to(torch.int32))
            out_list.append(hit.to(torch.int32))
            counts.append(hit.numel())
        offsets = torch.tensor([0] + list(np.cumsum(counts)), dtype=torch.int64)
        return torch.cat(in_list), torch.cat(out_list), offsets, pair_table

    def packed_expand_insert(
        keys, values, coord_store, base_coords, offsets, num_base, num_offsets,
        capacity, vector_capacity, num_entries_tensor, status_tensor,
    ):
        n0 = int(num_entries_tensor.item())
        cand = (
            base_coords[:num_base, None, :].to(torch.int64)
            + offsets[None, :num_offsets, :].to(torch.int64)
        ).reshape(-1, 4).to(torch.int32)
        ck = _pack4(cand)
        # Deterministic first-occurrence dedup of candidates not yet present.
        present = _table_search(keys, values, ck) >= 0
        uniq_keys, inv = torch.unique(ck, return_inverse=True)
        first = torch.full(
            (uniq_keys.shape[0],), -1, dtype=torch.int64
        ).scatter_reduce(
            0, inv, torch.arange(ck.shape[0], dtype=torch.int64), reduce="amin",
            include_self=False,
        )
        new_mask = torch.zeros(ck.shape[0], dtype=torch.bool)
        new_mask[first] = True
        new_mask &= ~present
        new_rows = cand[new_mask]
        n_new = new_rows.shape[0]
        if n0 + n_new > vector_capacity:
            status_tensor.fill_(1)
            return
        coord_store[n0 : n0 + n_new] = new_rows
        # Rebuild the sorted table over old + new entries.
        all_coords = coord_store[: n0 + n_new]
        k_all = _pack4(all_coords)
        order = torch.argsort(k_all)
        keys[: n0 + n_new] = k_all[order]
        keys[n0 + n_new :] = _EMPTY
        values[: n0 + n_new] = order.to(torch.int32)
        values[n0 + n_new :] = -1
        num_entries_tensor.fill_(n0 + n_new)
        status_tensor.fill_(0)

    for name, fn in list(locals().items()):
        if callable(fn):
            setattr(m, name, fn)
    return m


def _make_utils() -> types.ModuleType:
    m = types.ModuleType("warpconvnet._C.utils")

    def segmented_sort(keys, seg_offsets, descending=False, return_indices=False):
        """CPU stand-in for cub DeviceSegmentedSort (csrc/cub_sort.cu):
        stable per-segment sort; with return_indices returns
        (global permutation int64, sorted keys) — the reference's
        ``perm, _ = segmented_sort(...)`` unpacking (cub_sort.cu:198)."""
        k = keys.cpu().numpy()
        off = seg_offsets.cpu().numpy().astype(np.int64)
        perm = np.arange(len(k), dtype=np.int64)
        for s, e in zip(off[:-1], off[1:]):
            idx = np.argsort(k[s:e], kind="stable")
            if descending:
                idx = idx[::-1]
            perm[s:e] = s + idx
        sorted_keys = torch.from_numpy(k[perm])
        if return_indices:
            return torch.from_numpy(perm), sorted_keys
        return sorted_keys

    m.segmented_sort = segmented_sort
    return m


def _part1by2_u64(v: np.ndarray) -> np.ndarray:
    """Spread low 21 bits with 2 zero bits between each (uint64), mirroring
    the reference's part1by2_long (csrc/morton_code.cu:14-19)."""
    n = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    n = (n ^ (n << np.uint64(32))) & np.uint64(0xFFFF00000000FFFF)
    n = (n ^ (n << np.uint64(16))) & np.uint64(0x00FF0000FF0000FF)
    n = (n ^ (n << np.uint64(8))) & np.uint64(0xF00F00F00F00F00F)
    n = (n ^ (n << np.uint64(4))) & np.uint64(0x30C30C30C30C30C3)
    n = (n ^ (n << np.uint64(2))) & np.uint64(0x9249249249249249)
    return n


def _morton_cpu_kernel(c: np.ndarray) -> np.ndarray:
    """(z<<2)|(y<<1)|x interleave of [N,3] (csrc/morton_code.cu:33,54); for
    [N,4] batched input the batch id goes into bits 48+ (morton_code.cu:43)."""
    if c.shape[1] == 4:
        code = (
            (_part1by2_u64(c[:, 3]) << np.uint64(2))
            | (_part1by2_u64(c[:, 2]) << np.uint64(1))
            | _part1by2_u64(c[:, 1])
        )
        code = (c[:, 0].astype(np.uint64) << np.uint64(48)) | (
            code & np.uint64((1 << 48) - 1)
        )
    else:
        code = (
            (_part1by2_u64(c[:, 2]) << np.uint64(2))
            | (_part1by2_u64(c[:, 1]) << np.uint64(1))
            | _part1by2_u64(c[:, 0])
        )
    return code.astype(np.int64)


def _install_cpu_morton(wc_serialization) -> None:
    """Replace ``morton_code`` (hard ``.cuda()`` at serialization.py:212)
    with a CPU version reproducing its min-shift + axis-permutation logic
    over the stub bit-interleave kernel."""
    orderings = wc_serialization.POINT_ORDERING_TO_MORTON_PERMUTATIONS

    def morton_code_cpu(coords, threads_per_block=256, order=None):
        order = order if order is not None else wc_serialization.POINT_ORDERING.MORTON_XYZ
        if isinstance(order, str):
            order = wc_serialization.POINT_ORDERING(order)
        assert order in orderings, f"unsupported order {order}"
        if coords.shape[0] == 0:
            return torch.empty(0, dtype=torch.int64)
        min_coord = coords.min(0).values
        c = (coords - min_coord).to(torch.int32)
        perm = orderings[order]
        if perm != [0, 1, 2]:
            if c.shape[1] == 3:
                c = c[:, perm]
            else:
                c = c[:, [0] + [p + 1 for p in perm]]
        return torch.from_numpy(_morton_cpu_kernel(c.numpy()))

    wc_serialization.morton_code = morton_code_cpu


def _install_flash_attn_stub() -> None:
    """Exact CPU softmax-attention stand-in for the flash_attn package
    (imported by nn/modules/attention.py:13-16; PatchAttention asserts its
    presence). Math is fp32 with fp16/bf16 in/out — the same contract as
    real flash attention, minus the tiling."""
    if "flash_attn" in sys.modules:
        return
    fa = types.ModuleType("flash_attn")

    def flash_attn_varlen_qkvpacked_func(
        qkv, cu_seqlens, max_seqlen=None, dropout_p=0.0, softmax_scale=None, **kw
    ):
        assert dropout_p == 0.0, "stub supports eval mode only"
        q = qkv[:, 0].float()
        k = qkv[:, 1].float()
        v = qkv[:, 2].float()
        scale = softmax_scale or q.shape[-1] ** -0.5
        out = torch.empty_like(q)
        cs = cu_seqlens.cpu().tolist()
        for s, e in zip(cs[:-1], cs[1:]):
            if e <= s:
                continue
            att = torch.einsum("lhd,mhd->hlm", q[s:e], k[s:e]) * scale
            out[s:e] = torch.einsum(
                "hlm,mhd->lhd", att.softmax(-1), v[s:e]
            )
        return out.to(qkv.dtype)

    def flash_attn_qkvpacked_func(qkv, dropout_p=0.0, softmax_scale=None, **kw):
        assert dropout_p == 0.0, "stub supports eval mode only"
        q, k, v = (qkv[:, :, i].float() for i in range(3))
        scale = softmax_scale or q.shape[-1] ** -0.5
        att = torch.einsum("blhd,bmhd->bhlm", q, k) * scale
        out = torch.einsum("bhlm,bmhd->blhd", att.softmax(-1), v)
        return out.to(qkv.dtype)

    fa.flash_attn_varlen_qkvpacked_func = flash_attn_varlen_qkvpacked_func
    fa.flash_attn_qkvpacked_func = flash_attn_qkvpacked_func
    sys.modules["flash_attn"] = fa


def _segment_csr(src: torch.Tensor, indptr: torch.Tensor, out=None, reduce: str = "sum"):
    """Pure-torch stand-in for torch_scatter.segment_csr (sum/mean/min/max)."""
    indptr = indptr.to(torch.int64).flatten()
    nseg = indptr.numel() - 1
    counts = indptr[1:] - indptr[:-1]
    seg_ids = torch.repeat_interleave(torch.arange(nseg), counts)
    shape = (nseg,) + tuple(src.shape[1:])
    if reduce in ("sum", "mean", "add"):
        res = torch.zeros(shape, dtype=src.dtype).index_add_(0, seg_ids, src[: seg_ids.numel()])
        if reduce == "mean":
            res = res / counts.clamp(min=1).to(res.dtype).reshape((-1,) + (1,) * (src.ndim - 1))
        return res
    if reduce in ("min", "max"):
        init = torch.finfo(src.dtype).max if reduce == "min" else torch.finfo(src.dtype).min
        res = torch.full(shape, init, dtype=src.dtype)
        res = res.scatter_reduce(
            0,
            seg_ids.reshape((-1,) + (1,) * (src.ndim - 1)).expand_as(src[: seg_ids.numel()]),
            src[: seg_ids.numel()],
            reduce="amin" if reduce == "min" else "amax",
        )
        empty = (counts == 0).reshape((-1,) + (1,) * (src.ndim - 1))
        return torch.where(empty, torch.zeros_like(res), res)
    raise ValueError(reduce)


_ref = None


def load_reference():
    """Import the reference warpconvnet with the CPU ``_C`` stub installed.

    Returns the imported package (cached)."""
    global _ref
    if _ref is not None:
        return _ref

    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)

    # Pin every conv direction to the explicit-GEMM backend BEFORE the
    # reference's constants module reads the env: "auto" would try to
    # benchmark CUDA backends (mask_gemm & co) on this CPU-only host.
    import os

    os.environ.setdefault("WARPCONVNET_FWD_ALGO_MODE", "explicit_gemm")
    os.environ.setdefault("WARPCONVNET_DGRAD_ALGO_MODE", "explicit_gemm")
    os.environ.setdefault("WARPCONVNET_WGRAD_ALGO_MODE", "explicit_gemm")

    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")
        ts.segment_csr = _segment_csr
        sys.modules["torch_scatter"] = ts

    # torchvision is imported (for transforms.Normalize only) by
    # models/trellis2/image_cond.py at package-import time; stub it so the
    # trellis2 model modules are importable without the real package.
    try:  # pragma: no cover - present in some environments
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")

        class _Normalize:
            def __init__(self, mean, std):
                self.mean, self.std = torch.as_tensor(mean), torch.as_tensor(std)

            def __call__(self, x):
                shape = (-1,) + (1,) * (x.dim() - 1 - (x.dim() > 3))
                m = self.mean.reshape(shape).to(x)
                s = self.std.reshape(shape).to(x)
                return (x - m) / s

        tvt.Normalize = _Normalize
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    stub = types.ModuleType("warpconvnet._C")
    stub.cuhash = _make_cuhash()
    stub.utils = _make_utils()
    for sub in ("gemm", "fma", "coords", "sampling", "mask_gemm", "fused_rope"):
        setattr(stub, sub, types.ModuleType(f"warpconvnet._C.{sub}"))
    sys.modules["warpconvnet._C"] = stub
    _install_flash_attn_stub()

    import warpconvnet  # noqa: F401  (picks up the stub from sys.modules)

    from warpconvnet.geometry.coords.ops import serialization as _wc_serialization

    _install_cpu_morton(_wc_serialization)

    # The only CUDA-only guard on the parity path: PackedHashTableBase.insert
    # asserts coords.is_cuda (geometry/coords/search/_packed_base.py:104).
    from warpconvnet.geometry.coords.search import _packed_base

    def _insert_cpu_ok(self, coords):
        coords = self._prepare_insert_coords(coords)
        num_keys = coords.shape[0]
        assert num_keys <= self._capacity // 2
        self._allocate_storage()
        self._run_prepare()
        status = torch.zeros(1, dtype=torch.int32, device=self._device)
        self._run_insert(coords, num_keys, status)
        if int(status.item()) != 0:
            raise RuntimeError("stub hash table insert failed")
        self._num_entries = num_keys
        self._post_insert(coords)

    _packed_base.PackedHashTableBase.insert = _insert_cpu_ok

    # unique_hashmap (utils/unique.py:136) asserts a CUDA device; same body,
    # device-agnostic. Re-bind in the from-import consumers too.
    from warpconvnet.geometry.coords.search.packed_hashmap import PackedHashTable
    from warpconvnet.utils import unique as _uniq_mod

    def _unique_hashmap_cpu(bcoords, **kwargs):
        if bcoords.shape[1] == 3:
            bcoords = torch.nn.functional.pad(bcoords, (0, 1), value=0)
        table = PackedHashTable.from_coords(bcoords, device=bcoords.device)
        return table.unique_index, table

    _uniq_mod.unique_hashmap = _unique_hashmap_cpu
    from warpconvnet.geometry.coords.ops import stride as _stride_mod
    from warpconvnet.geometry.coords.ops import voxel as _voxel_mod

    _stride_mod.unique_hashmap = _unique_hashmap_cpu
    _voxel_mod.unique_hashmap = _unique_hashmap_cpu

    # expand_coords (coords/ops/expand.py:33) hard-raises off-CUDA; same body
    # (hash-table offset expansion) with the device check dropped.
    from warpconvnet.geometry.coords.ops import expand as _expand_mod
    from warpconvnet.geometry.coords import integer as _integer_mod
    from warpconvnet.geometry.coords.ops.batch_index import (
        offsets_from_batch_index as _offsets_from_bi,
    )
    from warpconvnet.geometry.coords.search.torch_discrete import (
        kernel_offsets_from_size as _koffs,
    )

    def _expand_coords_cpu(batch_indexed_coords, kernel_size, kernel_dilation,
                           kernel_batch=None):
        device = batch_indexed_coords.device
        coords = batch_indexed_coords.to(dtype=torch.int32).contiguous()
        num_input = coords.shape[0]
        num_total = int(np.prod(kernel_size))
        kb = kernel_batch or max(1, num_total // kernel_size[0])
        offs = _koffs(kernel_size, kernel_dilation, device=device).to(torch.int32)
        table = PackedHashTable.from_coords(
            coords, device=device, capacity=max(16, num_input * 4)
        )
        for s in range(0, num_total, kb):
            cur = offs[s : s + kb]
            if cur.numel() == 0:
                continue
            potential = table.num_entries + num_input * cur.shape[0]
            if potential > table.capacity // 2:
                table = PackedHashTable.from_coords(
                    table.vector_keys, device=device,
                    capacity=max(potential * 2, table.capacity * 2),
                )
            table.expand_with_offsets(coords, cur)
        uc = table.vector_keys.contiguous()
        out_coords = uc[torch.argsort(uc[:, 0])]
        return out_coords, _offsets_from_bi(out_coords[:, 0])

    _expand_mod.expand_coords = _expand_coords_cpu
    _integer_mod.expand_coords = _expand_coords_cpu

    # The unified conv Function benchmarks its candidate pool with CUDA
    # events and probes CUDA-context health — both impossible here. Route
    # module-level convs straight to the explicit-GEMM autograd Function
    # (the same backend the pinned env above would select).
    from warpconvnet.nn.functional.sparse_conv import helper as _helper_mod
    from warpconvnet.nn.functional.sparse_conv.detail.explicit import (
        SpatiallySparseConvExplicitGEMMFunction as _RefExplicitFn,
    )

    class _ExplicitOnly:
        @staticmethod
        def apply(features, weight, kernel_map, num_out_coords, fwd_algo,
                  dgrad_algo, wgrad_algo, compute_dtype, *args, **kwargs):
            return _RefExplicitFn.apply(
                features, weight, kernel_map, num_out_coords, compute_dtype
            )

    _helper_mod.UnifiedSpatiallySparseConvFunction = _ExplicitOnly

    _ref = warpconvnet
    return warpconvnet
