"""Dense (regular-grid) bilateral filter + Fast Bilateral Solver.

TPU-native rebuild of the reference bilateral grid
(``warpconvnet/nn/functional/bilateral_grid.py``, 457 LoC — Barron & Poole,
"The Fast Bilateral Solver", arXiv:1511.03296):

1. :class:`BilateralGrid` — d-D regular grid with d-linear splat / separable
   3-tap blur / slice. The reference stores sparse cells in a 128-bit GPU
   hash (``Packed128HashTable``); here cells are a **sorted d-key vertex
   list** (one int32 key per axis, lexicographic — the coordinate engine's
   n-key machinery), built once per grid with static capacity. Blur uses
   per-axis neighbor indices precomputed at build (two ``lookup_in_sorted``
   passes per axis), so each blur application is gathers + FMAs.
2. :func:`bilateral_solver` — PCG (fixed iteration count, jit-stable) on the
   grid-space quadratic ``||sqrt(c)(x - t)||^2 + lam * x^T (D - B̄) x`` with
   Jacobi preconditioning and Sinkhorn bistochastization (reference
   ``_bistochastize`` / ``bilateral_solver``).

Everything is pure JAX (gathers/scatters + segment ops) — a bilateral filter
is memory-bound slicing, not MXU work.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from warpconvnet_tpu.ops.keys import Keys, lookup_in_sorted, sort_keys

_IMAX = np.iinfo(np.int32).max


def _corner_offsets(d: int) -> np.ndarray:
    """All 2^d corner offsets of a d-cube, [2^d, d] int32."""
    return np.asarray(list(itertools.product([0, 1], repeat=d)), np.int32)


class BilateralGrid(NamedTuple):
    """Sparse regular bilateral grid over d-D positions.

    vertex_keys: tuple of d [V_cap] int32 (sorted; pad = INT32_MAX).
    num_vertices: [] int32.
    corner_idx: [N, 2^d] int32 — vertex index of each input's corner cells.
    corner_w: [N, 2^d] float32 — d-linear splat/slice weights.
    nbr_idx: [V_cap, d, 2] int32 — per-axis -1/+1 neighbor vertex (or -1).
    """

    vertex_keys: Keys
    num_vertices: jnp.ndarray
    corner_idx: jnp.ndarray
    corner_w: jnp.ndarray
    nbr_idx: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.vertex_keys[0].shape[0]

    @property
    def dim(self) -> int:
        return len(self.vertex_keys)

    # -- core ops ----------------------------------------------------------
    def splat(self, features: jnp.ndarray) -> jnp.ndarray:
        """[N, C] -> [V_cap, C]: scatter-add with d-linear weights."""
        v = self.capacity
        c = features.shape[-1]
        contrib = features[:, None, :] * self.corner_w[..., None]
        idx = jnp.where(self.corner_idx >= 0, self.corner_idx, v)
        lattice = jnp.zeros((v + 1, c), features.dtype)
        lattice = lattice.at[idx.reshape(-1)].add(
            contrib.reshape(-1, c), mode="drop"
        )
        return lattice[:v]

    def slice(self, lattice: jnp.ndarray) -> jnp.ndarray:
        """[V_cap, C] -> [N, C]: gather corner vertices, weight, sum."""
        safe = jnp.maximum(self.corner_idx, 0)
        vals = lattice[safe]  # [N, 2^d, C]
        vals = jnp.where((self.corner_idx >= 0)[..., None], vals, 0)
        return jnp.sum(vals * self.corner_w[..., None], axis=1)

    def blur(self, lattice: jnp.ndarray, n_iters: int = 1) -> jnp.ndarray:
        """Separable (0.5, 1, 0.5) 3-tap blur along each of the d axes
        (reference ``BilateralGrid.blur``)."""

        def one(lat):
            for a in range(self.dim):
                lo = self.nbr_idx[:, a, 0]
                hi = self.nbr_idx[:, a, 1]
                lo_v = jnp.where((lo >= 0)[:, None], lat[jnp.maximum(lo, 0)], 0)
                hi_v = jnp.where((hi >= 0)[:, None], lat[jnp.maximum(hi, 0)], 0)
                lat = lat + 0.5 * (lo_v + hi_v)
            return lat

        for _ in range(n_iters):
            lattice = one(lattice)
        return lattice

    def filter(
        self,
        features: jnp.ndarray,
        normalize: bool = True,
        blur_iters: int = 1,
    ) -> jnp.ndarray:
        """One-shot Gaussian bilateral filter: splat -> blur -> slice, with
        the homogeneous-coordinate normalization trick (reference
        ``BilateralGrid.filter``)."""
        if normalize:
            ones = jnp.ones((features.shape[0], 1), features.dtype)
            f_ext = jnp.concatenate([features, ones], axis=-1)
        else:
            f_ext = features
        out = self.slice(self.blur(self.splat(f_ext), blur_iters))
        if not normalize:
            return out
        return out[:, :-1] / jnp.maximum(out[:, -1:], 1e-20)


def build_bilateral_grid(
    positions: jnp.ndarray,  # [N, d] float (pre-scaled by 1/sigma per axis)
    valid: Optional[jnp.ndarray] = None,  # [N] bool
    capacity: Optional[int] = None,
) -> BilateralGrid:
    """Build the grid: quantize positions, deduplicate the 2^d corner cells
    into a sorted vertex list, precompute corner indices/weights and blur
    neighbors. ``capacity`` bounds the vertex count (static; default
    ``N * 2^d`` — exact, but large; pass a tighter bound for big clouds)."""
    n, d = positions.shape
    corners = _corner_offsets(d)  # [2^d, d]
    ncor = corners.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if capacity is None:
        capacity = n * ncor

    base = jnp.floor(positions).astype(jnp.int32)
    frac = positions - base.astype(positions.dtype)
    # d-linear weights per corner.
    cw = jnp.where(
        corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :]
    ).prod(axis=-1)  # [N, 2^d]
    cc = base[:, None, :] + corners[None, :, :]  # [N, 2^d, d]
    cc = jnp.where(valid[:, None, None], cc, _IMAX)

    flat = cc.reshape(-1, d)
    keys = tuple(flat[:, a] for a in range(d))
    skeys, _ = sort_keys(keys)
    first = jnp.ones_like(skeys[0], dtype=bool)
    neq = jnp.zeros_like(skeys[0][1:], dtype=bool)
    for k in skeys:
        neq = neq | (k[1:] != k[:-1])
    first = first.at[1:].set(neq)
    first = first & (skeys[0] != _IMAX)
    # Compact unique vertices to the front (order-preserving -> stays sorted).
    pos_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_vertices = jnp.minimum(jnp.sum(first.astype(jnp.int32)), capacity)
    vkeys = []
    for k in skeys:
        vk = jnp.full((capacity + 1,), _IMAX, jnp.int32)
        tgt = jnp.where(first & (pos_sorted < capacity), pos_sorted, capacity)
        vk = vk.at[tgt].set(jnp.where(first, k, _IMAX), mode="drop")
        vkeys.append(vk[:capacity])
    vkeys = tuple(vkeys)

    corner_idx = lookup_in_sorted(vkeys, keys).reshape(n, ncor)
    corner_idx = jnp.where(valid[:, None], corner_idx, -1)

    # Blur neighbors: vertex +- e_a per axis.
    nbrs = []
    for a in range(d):
        for sgn in (-1, 1):
            q = tuple(
                (vk + (sgn if ax == a else 0)).astype(jnp.int32)
                for ax, vk in enumerate(vkeys)
            )
            nbrs.append(lookup_in_sorted(vkeys, q))
    nbr_idx = jnp.stack(nbrs, axis=1).reshape(capacity, d, 2)
    # (order above is (a, -1), (a, +1) pairs)
    vvalid = vkeys[0] != _IMAX
    nbr_idx = jnp.where(vvalid[:, None, None], nbr_idx, -1)

    return BilateralGrid(
        vkeys, num_vertices, corner_idx, cw.astype(jnp.float32), nbr_idx
    )


def bilateral_filter_grid(
    positions: jnp.ndarray,  # [N, d] raw positions (e.g. xyz+rgb)
    features: jnp.ndarray,  # [N, C]
    sigmas,  # per-axis bandwidths, broadcastable to [d]
    valid: Optional[jnp.ndarray] = None,
    capacity: Optional[int] = None,
    blur_iters: int = 1,
) -> jnp.ndarray:
    """One-shot Gaussian bilateral via regular grid (reference
    ``bilateral_filter_grid``)."""
    scaled = positions / jnp.asarray(sigmas, positions.dtype)
    grid = build_bilateral_grid(scaled, valid, capacity)
    return grid.filter(features, normalize=True, blur_iters=blur_iters)


def _bistochastize(
    grid: BilateralGrid, n_iters: int = 10
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sinkhorn normalization vectors (m on inputs, n on vertices) so the
    blur operator is bistochastic (reference ``_bistochastize``, Barron
    section 4.2)."""
    n_pts = grid.corner_idx.shape[0]
    m = grid.splat(jnp.ones((n_pts, 1), jnp.float32))[:, 0]  # splat mass
    nv = jnp.ones_like(m)

    def body(_, nv):
        blurred = grid.blur(nv[:, None])[:, 0]
        return jnp.sqrt(jnp.maximum(nv * m / jnp.maximum(blurred, 1e-20), 0))

    nv = lax.fori_loop(0, n_iters, body, nv)
    return m, nv


def bilateral_solver(
    grid: BilateralGrid,
    target: jnp.ndarray,  # [N, C]
    confidence: jnp.ndarray,  # [N]
    lam: float = 4.0,
    n_cg_iters: int = 25,
) -> jnp.ndarray:
    """Fast Bilateral Solver (Barron & Poole 2015): confidence-weighted
    smoothing by PCG on the grid-space quadratic, Jacobi-preconditioned
    (reference ``bilateral_solver``). Fixed CG iteration count (jit-stable).
    """
    m, nv = _bistochastize(grid)
    c = confidence[:, None]
    c_splat = grid.splat(c)[:, 0]  # C-bar on vertices
    ct_splat = grid.splat(c * target)  # [V, C]

    def bn(y):
        return nv[:, None] * grid.blur(nv[:, None] * y)

    # Sinkhorn makes nv * blur(nv) == m, so D_m - B-bar is a proper graph
    # Laplacian (constant null space — no spurious decay); Barron section 3.
    dvec = m

    def matvec(y):
        return lam * (dvec[:, None] * y - bn(y)) + c_splat[:, None] * y

    diag_b = 1.0  # center tap of the (0.5,1,0.5)^d blur
    precond = 1.0 / jnp.maximum(
        lam * (dvec - nv * nv * diag_b) + c_splat, 1e-12
    )

    b = ct_splat
    x = b * precond[:, None]
    r = b - matvec(x)
    z = precond[:, None] * r
    p = z

    def cg_step(_, carry):
        x, r, z, p = carry
        ap = matvec(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * ap), 1e-20)
        x = x + alpha * p
        r2 = r - alpha * ap
        z2 = precond[:, None] * r2
        beta = jnp.sum(r2 * z2) / jnp.maximum(rz, 1e-20)
        return x, r2, z2, z2 + beta * p

    x, _, _, _ = lax.fori_loop(0, n_cg_iters, cg_step, (x, r, z, p))
    return grid.slice(x)


def fast_bilateral_solver(
    positions: jnp.ndarray,
    target: jnp.ndarray,
    confidence: jnp.ndarray,
    sigmas,
    valid: Optional[jnp.ndarray] = None,
    capacity: Optional[int] = None,
    lam: float = 4.0,
    n_cg_iters: int = 25,
) -> jnp.ndarray:
    """Confidence-weighted bilateral smoothing (reference
    ``fast_bilateral_solver``)."""
    scaled = positions / jnp.asarray(sigmas, positions.dtype)
    grid = build_bilateral_grid(scaled, valid, capacity)
    return bilateral_solver(grid, target, confidence, lam, n_cg_iters)
