"""Tile-unique neighbor gather: one-hot MXU expansion over per-tile row sets.

Replaces the HBM row gathers that move kNN candidate features
(reference ``frnn_gather``, dgcnn.py:172 / pointnet2.py grouping) — the
single largest eval cost family at flagship scale (~18 ms/step) and, via
their VJP scatters, the largest train cost family (~31 ms/step).

Why a kernel: HBM gathers/scatters charge per ROW (~7-9 ns on v5e
regardless of width), so Q*K arbitrary row fetches have a hard floor.
But kNN neighbor lists of curve-ordered queries overlap heavily: a tile
of 128 consecutive queries references only ~380-900 *unique* source rows
for its 128*K = 2.7-4.1k fetched rows (measured 7x compression on
realistic synthetic lidar).  So:

  1. prep (XLA, three segmented ``lax.sort`` calls): per query tile,
     the deduplicated row list ``u_list`` (NT, UMAX) and each original
     slot's local position ``local`` (NT, T, K) in that list;
  2. one *unique* HBM gather fetches (NT, UMAX, C) rows;
  3. this kernel expands them to the full k-major (K, Q, C) candidate
     slab with a one-hot (T, UMAX) x (UMAX, C) matmul per (tile,
     k-plane) — the MXU does the row routing at ~0.7 ns/row, and a 0/1
     one-hot dot reproduces the gather EXACTLY (1.0*x products and +0
     sums are exact in bf16/f32).

The backward pass is the same trick transposed: d_u = one_hot^T @ d_out
(MXU), then ONE scatter-add of the NT*UMAX unique rows — ~5x fewer
scattered rows than autodiff's Q*K-row scatter, and within-tile
duplicate accumulation happens on the MXU instead of serially.

Exactness guards:
  * feature rows are sanitized (non-finite -> 0) before the kernel: a
    NaN/inf at a *padded source point* (garbage BN activations can
    overflow bf16) would otherwise poison every query in the tile
    through the 0 * x products.  Consumers mask padded-neighbor slots,
    and kNN never returns invalid points as real neighbors, so the
    sanitized values are never read.
  * positions ride as an exact 3x-bf16 residual split (hi = bf16(x),
    mid = bf16(x - hi), lo = bf16(x - hi - mid); x == hi+mid+lo in f32,
    verified to 24-bit exactness for |x| < 1e38).  Unlike the bit-split
    pairs in interpolate.py these are genuine finite floats, so the
    one-hot products stay exact and finite.
  * a tile's unique count exceeding UMAX (never observed at the shipped
    operating points, ~1.4x headroom) DROPS the beyond-budget rows to
    zeros — a static budget with loud telemetry, exactly the grid
    tables' cell-cap contract.  A runtime ``lax.cond`` fallback was
    measured at ~22 ms/step of pure conditional overhead and rejected.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile geometry: NT*UMAX bounds the unique-fetch and backward-scatter
# row counts, so bigger tiles amortize better — but UMAX must cover the
# per-tile unique count at EVERY row the kernel serves, since escapees
# drop (with telemetry).  128-query tiles measure 518 max uniques at the
# flagship edge rows and 662 at a 3x-sparser synthetic row (the margin
# regression test), ~2x headroom under the 1024 budget; 256-query tiles
# hit 1244 at the sparse row and were reverted despite ~1 ms less
# fetch+scatter.  Env-overridable for A/B sweeps (CCN_TILE_Q /
# CCN_TILE_UMAX); the one-hot expansion cost scales with UMAX, so a
# tighter budget trades MXU time against overflow margin.
import os as _os

TILE_Q = int(_os.environ.get("CCN_TILE_Q", 128))
UMAX = int(_os.environ.get("CCN_TILE_UMAX", 1024))


def _round_up(x, m):
    return -(-x // m) * m


def _pick_pp(k: int) -> int:
    """Planes per grid step: prefer an exact divisor of K near 3-4."""
    for cand in (4, 3, 5, 2):
        if k % cand == 0:
            return cand
    return 3


def tile_prep(idx: jax.Array, tile_q: int = TILE_Q, umax: int = UMAX,
              n_src: Optional[int] = None):
    """Per-tile dedup of neighbor indices.

    idx: (Q, K) int32, non-negative (caller clamps -1 padding to 0; the
    padded slots are where-masked downstream exactly like the plain
    gather's ``safe`` clamp).  Q must be a multiple of tile_q.  n_src
    (exclusive index bound, defaults to Q for the self-row case) enables
    the packed single-operand sorts when ``(tk+1) * n_src < 2^31``.

    Returns (u_list (NT, umax) int32, local (NT, T, K) int32, spill bool).
    ``u_list`` slots past a tile's unique count hold duplicate leftovers
    from the compaction sort — harmless: no ``local`` id points at them
    (forward) and their d_u rows are exactly zero (backward).
    """
    q, k = idx.shape
    nt = q // tile_q
    flat = idx.reshape(nt, tile_q * k)
    tk = tile_q * k
    umax = min(umax, _round_up(tk, 128))
    n_src = q if n_src is None else n_src
    pos = jnp.broadcast_to(jnp.arange(tk, dtype=jnp.int32)[None], flat.shape)
    if (tk + 1) * n_src < 2 ** 31:
        # each (key, payload) pair packed into ONE int32 so every sort
        # moves a single operand (a variadic sort permutes every operand
        # through the full bitonic network — ~2x the data movement).
        # Ranges: sort1 key < n_src, payload < tk; sort2 key <= tk
        # (sentinel rank tk sinks duplicates — payload ties irrelevant:
        # non-sentinel ranks are unique, leftover slots never read),
        # payload < n_src; sort3 key < tk, payload <= tk.  Worst case
        # (tk+1)*n_src (flagship 131072 * 4225 ≈ 5.5e8 < 2^31).
        s1 = jax.lax.sort(flat * jnp.int32(tk) + pos, dimension=1)
        s_idx, s_pos = s1 // tk, s1 % tk
        is_new = jnp.concatenate(
            [jnp.ones((nt, 1), bool), s_idx[:, 1:] != s_idx[:, :-1]], axis=1)
        urank = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1
        key2 = jnp.where(is_new, urank, jnp.int32(tk))
        u_full = jax.lax.sort(
            key2 * jnp.int32(n_src) + s_idx, dimension=1) % n_src
        local = jax.lax.sort(
            s_pos * jnp.int32(tk + 1) + urank, dimension=1) % (tk + 1)
    else:
        s_idx, s_pos = jax.lax.sort((flat, pos), dimension=1, num_keys=1)
        is_new = jnp.concatenate(
            [jnp.ones((nt, 1), bool), s_idx[:, 1:] != s_idx[:, :-1]], axis=1)
        urank = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1
        # compaction: first occurrences sort to the front in rank order
        key2 = jnp.where(is_new, urank, jnp.int32(2 ** 30))
        _, u_full = jax.lax.sort((key2, s_idx), dimension=1, num_keys=1)
        # un-sort: each original slot's unique-rank (its local id)
        _, local = jax.lax.sort((s_pos, urank), dimension=1, num_keys=1)
    u_list = (u_full[:, :umax] if tk >= umax
              else jnp.pad(u_full, ((0, 0), (0, umax - tk))))
    # escapee rows (unique rank >= umax): counted, not fetched — their
    # slots one-hot to zero rows.  A runtime lax.cond fallback was
    # measured at ~22 ms/step of pure conditional overhead (scheduling
    # barrier + operand copies), so like the grid tables' cell cap this
    # is a static budget with loud telemetry (margin test pins the
    # shipped operating points at ~1.4x headroom).
    spilled = jnp.sum(jnp.maximum(urank[:, -1] + 1 - umax, 0))
    return u_list, local.reshape(nt, tile_q, k), spilled


def _expand_kernel(u_ref, loc_ref, out_ref, *, umax: int, pp: int,
                   out_dtype):
    """Grid (NT, ceil(K/pp)): pp k-planes per step — one plane per step
    paid ~1us of Mosaic grid overhead x NT*K steps (~2 ms at flagship
    scale); a fully unrolled K loop kept ~K one-hot temporaries live and
    blew the 16MB scoped-vmem stack at C=384.  pp balances the two.
    u (1, UMAX, C), loc (1, T, K) -> out (pp, T, C) planes."""
    j = pl.program_id(1)
    t = loc_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, umax), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, loc_ref.shape[2]), 1)
    u = u_ref[0]
    for v in range(pp):
        ids = jnp.sum(jnp.where(col == j * pp + v, loc_ref[0], 0),
                      axis=1, keepdims=True)           # (T, 1) dynamic col
        oh = jnp.where(lane == ids, 1.0, 0.0)          # (T, UMAX) f32 0/1
        o = jax.lax.dot_general(
            oh.astype(u.dtype), u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[v] = o.astype(out_dtype)


def _collapse_kernel(d_ref, loc_ref, du_ref, acc_ref, *, umax: int,
                     pp: int):
    """Backward: du[i] = sum_p one_hot(loc[:, :, p])^T @ d_out[p].
    Grid (NT, ceil(K/pp)), f32 scratch accumulates across the K axis.
    d (pp, T, C) planes, loc (1, T, K) -> du (1, UMAX, C) f32."""
    j = pl.program_id(1)
    np_ = pl.num_programs(1)
    t = loc_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, umax), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, loc_ref.shape[2]), 1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    acc = acc_ref[:]
    for v in range(pp):
        ids = jnp.sum(jnp.where(col == j * pp + v, loc_ref[0], 0),
                      axis=1, keepdims=True)
        oh = jnp.where(lane == ids, 1.0, 0.0)          # (T, UMAX)
        acc = acc + jax.lax.dot_general(
            oh, d_ref[v].astype(jnp.float32),
            (((0,), (0,)), ((), ())),                   # oh^T @ d
            preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(j == np_ - 1)
    def _finish():
        du_ref[0] = acc_ref[:]


def _expand(u_rows, local, out_dtype, interpret=False):
    """(NT, UMAX, C), (NT, T, K) -> (K, NT*T, C).

    Blocks span the WHOLE (non-128-multiple) lane dim — Mosaic allows
    whole-axis lane blocks, and padding C to 128 multiples was measured
    to blow the slab up with relayout copies downstream."""
    nt, umax, c = u_rows.shape
    t, k = local.shape[1], local.shape[2]
    pp = _pick_pp(k)
    kp = _round_up(k, pp)
    out = pl.pallas_call(
        functools.partial(_expand_kernel, umax=umax, pp=pp,
                          out_dtype=out_dtype),
        grid=(nt, kp // pp),
        in_specs=[
            pl.BlockSpec((1, umax, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, k), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((pp, t, c), lambda i, j: (j, i, 0)),
        out_shape=jax.ShapeDtypeStruct((kp, nt * t, c), out_dtype),
        interpret=interpret,
    )(u_rows, local)
    return out[:k]


def _collapse(d_out, local, umax, interpret=False):
    """(K, NT*T, C), (NT, T, K) -> d_u (NT, umax, C) f32."""
    k, qt, c = d_out.shape
    nt, t, _ = local.shape
    pp = _pick_pp(k)
    kp = _round_up(k, pp)
    if kp != k:
        # padded planes pair with out-of-range local ids -> zero one-hots
        d_out = jnp.pad(d_out, ((0, kp - k), (0, 0), (0, 0)))
    return pl.pallas_call(
        functools.partial(_collapse_kernel, umax=umax, pp=pp),
        grid=(nt, kp // pp),
        in_specs=[
            pl.BlockSpec((pp, t, c), lambda i, j: (j, i, 0)),
            pl.BlockSpec((1, t, k), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, umax, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, umax, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((umax, c), jnp.float32)],
        interpret=interpret,
    )(d_out, local)


def gather_prep(idx_kq: jax.Array, n_src: int):
    """Prep for :func:`gather_rows`: (u_list, local, spilled, q).

    Split out so call sites that reuse one kNN table across several
    gathers (the two dense layers of an edge conv, the with-pos and
    plain fetches of one grouping) pay the three prep sorts ONCE —
    ops/neighbors memoizes this per (idx array, n_src) for the trace.
    """
    k, q = idx_kq.shape
    qp = _round_up(q, TILE_Q)
    idx_p = jnp.maximum(idx_kq, 0)
    if qp != q:
        idx_p = jnp.pad(idx_p, ((0, 0), (0, qp - q)))
    u_list, local, spilled = tile_prep(idx_p.T, TILE_Q, UMAX, n_src=n_src)
    return u_list, local, spilled


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_core(src, u_list, local, interpret: bool):
    return _gather_fwd(src, u_list, local, interpret)[0]


def _gather_fwd(src, u_list, local, interpret):
    n, c = src.shape
    rows = src[u_list.reshape(-1)].reshape(-1, u_list.shape[1], c)
    rows = jnp.where(jnp.isfinite(rows.astype(jnp.float32)), rows, 0)
    out = _expand(rows, local, src.dtype, interpret=interpret)
    # zero-element token carrying (n, dtype): residuals must be JAX types
    return out, (u_list, local, jnp.zeros((n, 0), src.dtype))


def _gather_bwd(interpret, res, d_out):
    u_list, local, dtok = res
    n, sdt = dtok.shape[0], dtok.dtype
    c = d_out.shape[-1]
    du = _collapse(d_out, local, u_list.shape[1], interpret=interpret)
    d_src = jnp.zeros((n, c), jnp.float32).at[u_list.reshape(-1)].add(
        du.reshape(-1, c), mode="drop")
    return d_src.astype(sdt), None, None


_gather_core.defvjp(_gather_fwd, _gather_bwd)


def gather_rows(src: jax.Array, idx_kq: jax.Array,
                interpret: bool = False, prep=None) -> jax.Array:
    """``src[max(idx, 0)]`` k-major via the tile-unique kernel.

    src (N, C); idx_kq (K, Q) int32, -1 padding allowed -> (K, Q, C).
    Callers mask padded slots themselves (same contract as
    :func:`neighbors.gather_neighbors`).  ``prep`` is an optional
    precomputed :func:`gather_prep` result.
    """
    k, q = idx_kq.shape
    if prep is None:
        prep = gather_prep(idx_kq, src.shape[0])
    u_list, local, spilled = prep
    from . import telemetry

    if telemetry.active():
        telemetry.record(f"tile_gather_spill.q{q}.k{k}", spilled)
    return _gather_core(src, u_list, local, interpret)[:, :q]


def split3(x: jax.Array):
    """Exact 3x-bf16 residual split (concat along the last axis).

    Rounding goes through ``lax.reduce_precision``, NOT ``astype``: under
    ``--xla_allow_excess_precision`` (the TPU default here) XLA elides a
    f32->bf16->f32 round-trip, which silently zeroes the residuals
    (caught by tools/tpu_smoke.py's exactness check).
    """
    x = x.astype(jnp.float32)
    hi = jax.lax.reduce_precision(x, 8, 7)
    r1 = x - hi
    mid = jax.lax.reduce_precision(r1, 8, 7)
    lo = jax.lax.reduce_precision(r1 - mid, 8, 7)
    return jnp.concatenate([hi.astype(jnp.bfloat16),
                            mid.astype(jnp.bfloat16),
                            lo.astype(jnp.bfloat16)], axis=-1)


def merge3(rec: jax.Array) -> jax.Array:
    """Inverse of :func:`split3` for a 3*d-channel record."""
    d = rec.shape[-1] // 3
    return (rec[..., :d].astype(jnp.float32)
            + rec[..., d:2 * d].astype(jnp.float32)
            + rec[..., 2 * d:].astype(jnp.float32))


def gather_rows_with_pos(x: jax.Array, pos: jax.Array, idx_kq: jax.Array,
                         interpret: bool = False, prep=None):
    """Combined (features, exact f32 positions) k-major tile-unique gather.

    x (N, C) bf16/f32, pos (N, 3), idx_kq (K, Q) ->
    (x_nbr (K, Q, C), pos_nbr (K, Q, 3) f32).  Positions ride as exact
    bf16 triplets in the same record row (one unique fetch, no extra
    row-rate cost); padded slots are NOT masked here (caller's job).
    """
    if x.dtype == jnp.float32:
        rec = jnp.concatenate([x, pos.astype(jnp.float32)], axis=-1)
        out = gather_rows(rec, idx_kq, interpret=interpret, prep=prep)
        return out[..., :-3], out[..., -3:]
    rec = jnp.concatenate([x.astype(jnp.bfloat16), split3(pos)], axis=-1)
    out = gather_rows(rec, idx_kq, interpret=interpret, prep=prep)
    return out[..., :-9], merge3(out[..., -9:])


def viable(n: int, q: int, k: int, c: int) -> bool:
    """Is the kernel path likely faster than the plain gather?

    Only SELF-ROW gathers (query row == source row, the edge-conv
    family) qualify: downsampled-query gathers (sa family, q < n) have
    measured per-tile unique counts far beyond any affordable UMAX
    (p99 ~2100 at the flagship sa rows — consecutive *sampled* queries
    barely overlap), so they would runtime-spill to the fallback and
    pay the prep for nothing.  MXU routing costs ~UMAX*C*2/PEAK per
    expanded row vs ~7 ns HBM row rate; also skip tiny calls where the
    three prep sorts dominate.
    """
    if q != n or q * k < 64 * TILE_Q:
        return False
    # deep fps-downsampled rows lose the curve-order locality the unique
    # budget relies on: the flagship 5760 row measured 164 escaped unique
    # rows per step on realistic synthetic (telemetry tile_gather_spill —
    # escapees read zeros, a quality leak), while the 11520/23040 rows
    # hold ~2x margin.  Gate the kernel to rows with proven margin.
    if n < 8192:
        return False
    mxu_ns = UMAX * _round_up(c, 128) * 2 / 197e3   # ns/row at bf16 peak
    return mxu_ns < 4.5
