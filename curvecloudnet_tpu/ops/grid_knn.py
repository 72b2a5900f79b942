"""Grid-hash fixed-radius kNN — the FRNN equivalent, in pure XLA.

The reference's hot neighbor searches are fixed-radius kNN through the CUDA
FRNN grid kernel (reference point_ops.py:431-461).  This implementation
keeps FRNN's algorithm but maps it to static shapes:

  1. voxelize at cell = radius, pack integer cell coords into one int32
     (10 bits/axis, coords clipped to ±512 cells — beyond-range points land
     in boundary cells and are rejected by the distance mask);
  2. sort points by cell id (one XLA sort, O(N log N) on-device);
  3. per query, binary-search (searchsorted) the start/end of each of its
     27 neighboring cells in the sorted id array;
  4. gather up to ``cap`` candidates per cell -> (Q, 27·cap) candidate set,
     compute distances, mask by radius/validity, take top-k.

HBM traffic is O(Q·27·cap) instead of the brute-force O(Q·N): at lidar scale
(N=2^15, cap=16) that's ~80x less.  Exactness caveat (same as FRNN's grid
cap): cells holding more than ``cap`` points are truncated; with cell size
== radius and lidar densities, cap=16..32 keeps recall ≈ 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: module constants must be host (numpy) values — this module is
# imported lazily from inside jit traces, and a module-level jnp.array
# created during tracing would leak a tracer.
_INF = 1e30
# 7 bits per axis -> dense 2^21-cell start/count tables.  A dense table
# lookup is one gather; the earlier searchsorted formulation cost 15
# binary-search gather rounds per neighbor cell (~420 ms/forward on v5e).
_BITS = 7
_OFF = 1 << (_BITS - 1)          # center cells around the origin
_MASK = (1 << _BITS) - 1
_NCELLS = 1 << (3 * _BITS)

_NEIGHBOR_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)], np.int32)  # (27, 3)


def _cell_coords(pos: jax.Array, cell: float) -> jax.Array:
    c = jnp.floor(pos / cell).astype(jnp.int32) + _OFF
    return jnp.clip(c, 0, _MASK)


def _pack(c: jax.Array) -> jax.Array:
    return (c[..., 0] << (2 * _BITS)) | (c[..., 1] << _BITS) | c[..., 2]


def grid_knn_single(query, points, q_valid, p_valid, k: int, radius: float,
                    cap: int = 16):
    """Single-sample grid kNN. query (Q,3), points (N,3) -> (Q,k) idx/dist."""
    n = points.shape[0]
    cell = radius
    pc = _pack(_cell_coords(points, cell))
    pc = jnp.where(p_valid, pc, _NCELLS)  # park invalid in overflow cell
    order = jnp.argsort(pc)
    # dense per-cell start/end tables: one scatter-add + one cumsum replaces
    # the per-neighbor-cell binary searches
    counts = jnp.zeros((_NCELLS + 1,), jnp.int32).at[pc].add(1)
    ends_table = jnp.cumsum(counts)
    starts_table = ends_table - counts

    qc = _cell_coords(query, cell)  # (Q, 3)
    # clip handled inside _cell_coords for points; for query neighbors the
    # ±1 offsets can step past the clip range — clamp the packed coords too
    nbr_coords = jnp.clip(qc[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :],
                          0, _MASK)
    nbr_cells = _pack(nbr_coords)  # (Q, 27)

    start = starts_table[nbr_cells]
    end = ends_table[nbr_cells]
    end = jnp.minimum(end, start + cap)

    slots = jnp.arange(cap, dtype=jnp.int32)
    cand_sorted = start[..., None] + slots  # (Q, 27, cap)
    cand_mask = cand_sorted < end[..., None]
    cand_sorted = jnp.clip(cand_sorted, 0, n - 1)
    cand_idx = order[cand_sorted]  # (Q, 27, cap) original indices

    q_, c_ = query.shape[0], 27 * cap
    cand_idx = cand_idx.reshape(q_, c_)
    cand_mask = cand_mask.reshape(q_, c_)
    cand_pos = points[cand_idx]  # (Q, C, 3)
    d2 = jnp.sum((cand_pos - query[:, None, :]) ** 2, axis=-1)
    good = (cand_mask & q_valid[:, None] & (d2 <= radius * radius)
            & p_valid[cand_idx])
    # duplicate cells (clamped coords can repeat a neighbor cell) would
    # duplicate candidates; knock out repeats of the same point index
    d2 = jnp.where(good, d2, _INF)

    k_eff = min(k, c_)
    neg, sel = jax.lax.top_k(-d2, k_eff)
    top_d2 = -neg
    top_idx = jnp.take_along_axis(cand_idx, sel, axis=-1)
    # dedup: same point picked via two clamped duplicate cells
    dup = jnp.zeros_like(top_idx, dtype=bool)
    same = (top_idx[:, :, None] == top_idx[:, None, :])
    tri = jnp.tril(jnp.ones((k_eff, k_eff), bool), k=-1)
    dup = jnp.any(same & tri[None] & (top_d2[:, None, :] < _INF), axis=-1)
    ok = (top_d2 < _INF) & ~dup
    idx = jnp.where(ok, top_idx, -1)
    dist = jnp.where(ok, jnp.sqrt(jnp.maximum(top_d2, 0.0)), _INF)
    if k_eff < k:
        pad = ((0, 0), (0, k - k_eff))
        idx = jnp.pad(idx, pad, constant_values=-1)
        dist = jnp.pad(dist, pad, constant_values=_INF)
    return idx, dist


@functools.partial(jax.jit, static_argnames=("k", "radius", "cap"))
def grid_knn(query, points, q_valid, p_valid, k: int, radius: float,
             cap: int = 16):
    """Batched grid-hash fixed-radius kNN (ops.neighbors.knn signature)."""
    fn = functools.partial(grid_knn_single, k=k, radius=radius, cap=cap)
    return jax.vmap(fn)(query, points, q_valid, p_valid)
