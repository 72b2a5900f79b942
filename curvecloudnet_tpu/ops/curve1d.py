"""Curve-geodesic (along-polyline) operators on batch-padded curve clouds.

TPU-native redesign of the reference's 1D curve ops
(``src/models/utils/point_ops.py:114-260`` and
``src/models/modules/fast_conv1d.py``): every op is a *static windowed gather*
along the scan axis with same-curve masks, instead of dynamic COO edge lists.

Shared conventions: see ops/segments.py. Offset ordering inside windows is
[0, -1, +1, -2, +2, ...] (near-to-far), matching the reference's offset table
(point_ops.py:119-120) so "first k valid" truncation selects the same
neighbors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import segments
from .sampling import gather_rows

_FAR = jnp.float32(100.0)  # invalid-distance fill, mirrors point_ops.py:231


def interleaved_offsets(window: int):
    """[0, -1, 1, -2, 2, ..., -window, window] — int32, length 2*window+1.

    Host-side numpy on purpose: jnp constants created inside a jit trace are
    staged to tracers (omnistaging), which breaks later host-side indexing.
    """
    import numpy as np

    pairs = np.stack(
        [-np.arange(1, window + 1), np.arange(1, window + 1)], axis=1
    ).flatten()
    return np.concatenate([np.zeros(1, np.int32),
                           pairs.astype(np.int32)])


def shift_fill(x: jax.Array, d: int, fill=0):
    """Shift along axis 1 by d (positive pulls from the right), zero fill."""
    if d == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if d > 0:
        pad[1] = (0, d)
        return jnp.pad(x, pad, constant_values=fill)[:, d:]
    pad[1] = (-d, 0)
    return jnp.pad(x, pad, constant_values=fill)[:, : x.shape[1]]


def same_curve_shift_mask(curve_id: jax.Array, valid: jax.Array,
                          d: int) -> jax.Array:
    """(B, N) bool: point i and point i+d exist and share a curve."""
    cid = segments.padded_curve_id(curve_id, valid)
    cid_shift = shift_fill(cid, d, fill=-1)
    v_shift = shift_fill(valid, d, fill=False)
    return valid & v_shift & (cid == cid_shift)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _window_slice3(x: jax.Array, idx: jax.Array, idx_valid, half_w: int,
                   fill, unique_rows: bool, k_major: bool = False):
    """(B, N, C), (B, M) -> (B, M, 2*half_w+1, C) contiguous windows.

    ``unique_rows=True`` asserts the VALID entries of ``idx`` are unique
    per sample (e.g. downsample center ids): the transpose then runs as a
    tiny int inverse-map scatter + one dense row gather instead of the
    (M, w*C) wide-row scatter-add (16 ms/step at flagship sa-geo scale on
    v5e).  Cotangents at ``idx_valid == False`` slots are dropped on that
    path — exact whenever downstream masks padded queries (it does:
    masked BN/aggregations/losses).  ``idx_valid`` may be None when every
    slot is valid; it is ignored for the scatter path.

    ``k_major=True`` emits (B, 2*half_w+1, M, C) — the gather writes the
    window-position-major layout DIRECTLY (offset dim 0 instead of 1), so
    consumers that want (K, M, C) slabs (ops/pallas_group.py) skip the
    (M, K, C) -> (K, M, C) relayout XLA would otherwise materialize
    (~1.7 ms/step at flagship sa-geo scale).  Fetch pattern and cost are
    identical — only the output write order changes.
    """
    b, n, c = x.shape
    w = 2 * half_w + 1
    xp = jnp.pad(x, ((0, 0), (half_w, half_w), (0, 0)),
                 constant_values=fill)
    # one native gather with wide slice_sizes: each output row is a
    # contiguous (w, c) slice.  (A vmapped dynamic_slice lowers to a
    # query-count while-loop on TPU — measured ~2x slower than even the
    # per-element row gather it was meant to replace.)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(0, 2) if k_major else (1, 2),
        collapsed_slice_dims=(), start_index_map=(0,))

    def one(xrow, irow):
        return jax.lax.gather(
            xrow, irow[:, None], dnums, slice_sizes=(w, c),
            mode=jax.lax.GatherScatterMode.CLIP)

    return jax.vmap(one)(xp, idx)  # idx is already the padded-row start


def _window_slice3_fwd(x, idx, idx_valid, half_w, fill, unique_rows,
                       k_major=False):
    return (_window_slice3(x, idx, idx_valid, half_w, fill, unique_rows,
                           k_major),
            (idx, idx_valid, x.shape))


def _window_slice3_bwd(half_w, fill, unique_rows, k_major, res, g):
    """Custom transpose: XLA's VJP of a slice-gather is a SERIAL per-query
    scatter loop (measured ~140 ms/step at lidar scale).  Instead: one
    wide-row scatter of the window grads to their query rows (or, for
    unique query rows, an inverse row GATHER), then 2w+1 dense shifted
    adds.
    """
    idx, idx_valid, xshape = res
    if k_major:
        g = jnp.moveaxis(g, 1, 2)  # (B, W, M, C) -> (B, M, W, C)
    b, n, c = xshape
    w = 2 * half_w + 1
    m = idx.shape[1]
    gw = g.reshape(b, m, w * c)
    bidx = jnp.arange(b)[:, None]
    if unique_rows:
        safe = idx if idx_valid is None else jnp.where(idx_valid, idx, n)
        arange_m = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m))
        inv = jnp.zeros((b, n), jnp.int32)
        inv = jax.vmap(lambda iv, s, u: iv.at[s].set(u, mode="drop"))(
            inv, safe, arange_m)
        hit = jnp.zeros((b, n), bool)
        hit = jax.vmap(lambda h, s: h.at[s].set(True, mode="drop"))(hit, safe)
        full = jnp.take_along_axis(gw, inv[..., None], axis=1)
        full = jnp.where(hit[..., None], full, 0)
    else:
        full = jnp.zeros((b, n, w * c), g.dtype)
        full = full.at[bidx, idx].add(gw)
    full = full.reshape(b, n, w, c)
    gxp = jnp.zeros((b, n + 2 * half_w, c), g.dtype)
    for s in range(w):  # dense static-slice adds (no scatter)
        gxp = gxp.at[:, s:s + n].add(full[:, :, s])
    return gxp[:, half_w:half_w + n], None, None


_window_slice3.defvjp(_window_slice3_fwd, _window_slice3_bwd)


def window_slice(x: jax.Array, idx: jax.Array, half_w: int,
                 fill=0.0, idx_valid=None,
                 unique_rows: bool = False,
                 k_major: bool = False) -> jax.Array:
    """Contiguous per-query windows x[idx-half_w : idx+half_w+1].

    x: (B, N, C) or (B, N); idx: (B, M).  Returns (B, M, 2*half_w+1[, C])
    (or (B, 2*half_w+1, M[, C]) with ``k_major``, see :func:`_window_slice3`).
    ``unique_rows``/``idx_valid``: see :func:`_window_slice3` — enables the
    inverse-gather transpose when valid idx entries are unique per sample.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    out = _window_slice3(x, idx, idx_valid, half_w, fill, unique_rows,
                         k_major)
    return out[..., 0] if squeeze else out


# interleave permutation: ascending window order -> [0, -1, +1, -2, +2, ...]
def _interleave_perm(half_w: int):
    offs = interleaved_offsets(half_w)
    return offs + half_w  # position of each interleaved offset in ascending


def knn_1d_group_subset(idx: jax.Array, idx_valid: jax.Array,
                        curve_id: jax.Array, valid: jax.Array,
                        k: int, window: int | None = None):
    """Geodesic kNN along the curve for a subset of query points.

    Parallel of reference ``knn_1d_group_subset`` (point_ops.py:114-140).

    Args:
      idx: (B, M) indices of query points into the full row.
      idx_valid: (B, M) query validity.
      curve_id, valid: (B, N) full-row curve structure.
      k: neighbors to keep per query.
      window: candidate half-window (defaults to k as in the reference).

    Returns:
      nbr_idx:  (B, M, 2*window+1) candidate indices into the full row.
      nbr_mask: (B, M, 2*window+1) True for the (up to k) kept neighbors.
    """
    if window is None:
        window = k
    n = curve_id.shape[1]
    offs = interleaved_offsets(window)  # (W,)
    cand = idx[:, :, None] + offs[None, None, :]  # (B, M, W)
    in_range = (cand >= 0) & (cand < n)
    cand_safe = jnp.clip(cand, 0, n - 1)

    # curves are contiguous: same-curve iff within [start, end] of the
    # query's curve — per-query lookups, no per-candidate gathers
    s_q = gather_rows(segments.curve_start_index(curve_id, valid), idx)
    e_q = gather_rows(segments.curve_end_index(curve_id, valid), idx)
    mask = (in_range & (cand >= s_q[:, :, None]) & (cand <= e_q[:, :, None])
            & idx_valid[:, :, None])

    # keep only the first k valid in near-to-far order (point_ops.py:133)
    keep = jnp.cumsum(mask.astype(jnp.int32), axis=-1) <= k
    mask = mask & keep
    return jnp.where(mask, cand_safe, -1), mask


def radius_1d_group_subset(pos: jax.Array, idx: jax.Array,
                           idx_valid: jax.Array, curve_id: jax.Array,
                           valid: jax.Array, radius: float, window: int):
    """Geodesic *radius* grouping along the curve (point_ops.py:143-193).

    The reference estimates each curve's average edge length, converts the
    radius into a per-curve neighbor count, then windows. Here the candidate
    window is a static ``window`` (the reference's dynamic max-K becomes a
    config budget); the per-curve count cap is applied identically.
    """
    n = curve_id.shape[1]
    elens = segments.edge_lengths(pos, curve_id, valid)
    total_len = segments.per_curve_total(elens, curve_id, valid)  # (B, N)
    npts = segments.points_per_curve(curve_id, valid)  # (B, N)
    avg_edge = total_len / jnp.maximum(npts, 1.0)
    per_pt_k = jnp.ceil(radius / jnp.maximum(avg_edge, 1e-12))
    # single-point curves: avg edge 0 -> inf -> 1 (point_ops.py:162)
    per_pt_k = jnp.where(avg_edge <= 1e-12, 1.0, per_pt_k)

    offs = interleaved_offsets(window)
    cand = idx[:, :, None] + offs[None, None, :]
    in_range = (cand >= 0) & (cand < n)
    cand_safe = jnp.clip(cand, 0, n - 1)

    # same-curve membership without per-candidate gathers: curves are
    # contiguous, so candidate j shares the query's curve iff
    # start_of_curve[idx] <= j <= end_of_curve[idx] (per-QUERY lookups only)
    s_q = gather_rows(segments.curve_start_index(curve_id, valid), idx)
    e_q = gather_rows(segments.curve_end_index(curve_id, valid), idx)
    mask = (in_range & (cand >= s_q[:, :, None]) & (cand <= e_q[:, :, None])
            & idx_valid[:, :, None])

    k_q = gather_rows(per_pt_k, idx)  # (B, M) per-query neighbor budget
    keep = jnp.cumsum(mask.astype(jnp.float32), axis=-1) <= k_q[:, :, None]
    kept = mask & keep

    from . import telemetry

    if telemetry.active():
        # a query is truncated when the radius wanted more neighbors than
        # the static window offered AND its curve actually extends past the
        # window (the reference sizes the window per curve instead,
        # point_ops.py:165-167)
        in_window = jnp.sum(mask, axis=-1).astype(jnp.float32)  # (B, M)
        npts_q = gather_rows(npts, idx)
        truncated = (in_window < jnp.minimum(k_q, npts_q)) & idx_valid
        nq = jnp.maximum(jnp.sum(idx_valid), 1)
        telemetry.record("curve_window_truncated_frac",
                         jnp.sum(truncated) / nq)
        wanted = jnp.where(idx_valid, jnp.minimum(k_q, npts_q), 0.0)
        telemetry.record("curve_window_wanted_max", jnp.max(wanted))
        telemetry.record("curve_window_wanted_mean",
                         jnp.sum(wanted) / nq)
    return jnp.where(kept, cand_safe, -1), kept


def gather_window_features(x: jax.Array, idx: jax.Array,
                           half_w: int, idx_valid=None,
                           unique_rows: bool = False,
                           k_major: bool = False) -> jax.Array:
    """Per-query interleaved feature windows (B, M, 2w+1, C) via contiguous
    slices — the companion gather for the windowed groupers above.

    ``k_major=True`` returns (B, 2w+1, M, C) in ASCENDING window order
    (no interleave permutation): consumers on that path aggregate over the
    whole window under a mask, so slot order is free — pair it with
    :func:`ascending_from_interleaved` on the grouper's mask."""
    if k_major:
        return window_slice(x, idx, half_w, idx_valid=idx_valid,
                            unique_rows=unique_rows, k_major=True)
    perm = _interleave_perm(half_w)
    return window_slice(x, idx, half_w, idx_valid=idx_valid,
                        unique_rows=unique_rows)[:, :, perm]


def gather_window_with_pos(x: jax.Array, pos: jax.Array, idx: jax.Array,
                           half_w: int, idx_valid=None,
                           unique_rows: bool = False,
                           k_major: bool = False):
    """One combined window slice of (features, exact f32 positions).

    Window fetches charge per ROW like any gather, so a second 3-wide
    position slice costs as much as the feature slice; positions instead
    ride in the feature record as exact 3x-bf16 residual triplets when
    features are bf16 (ops/interpolate.py POS_PACK_CH note: bit-split
    hi/lo pairs are flushed/canonicalized by in-graph compute ops on TPU).
    Value-identical to two separate :func:`gather_window_features` calls.

    Returns (x_win (B, M, 2w+1, C), pos_win (B, M, 2w+1, 3) float32);
    with ``k_major`` the window axis leads (ascending order, see
    :func:`gather_window_features`).
    """
    from .interpolate import POS_PACK_CH, _pack_pos_bf16, _unpack_pos_bf16

    posf = pos.astype(jnp.float32)
    if x.dtype == jnp.float32:
        rec = jnp.concatenate([x, posf], axis=-1)
        rw = gather_window_features(rec, idx, half_w, idx_valid=idx_valid,
                                    unique_rows=unique_rows, k_major=k_major)
        return rw[..., :-3], rw[..., -3:]
    rec = jnp.concatenate([x.astype(jnp.bfloat16), _pack_pos_bf16(posf)],
                          axis=-1)
    rw = gather_window_features(rec, idx, half_w, idx_valid=idx_valid,
                                unique_rows=unique_rows, k_major=k_major)
    return (rw[..., :-POS_PACK_CH],
            _unpack_pos_bf16(rw[..., -POS_PACK_CH:]))


def pad_for_window_chunks(x: jax.Array, half_w: int) -> jax.Array:
    """Pad the row axis so :func:`window_chunk` slice starts never clip."""
    return jnp.pad(x, ((0, 0), (half_w, half_w + 1), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def window_chunk(xp: jax.Array, idx: jax.Array, lo: int,
                 size: int) -> jax.Array:
    """Ascending-order sub-window ``[idx - half_w + lo, ... + size)``.

    ``xp`` must come from :func:`pad_for_window_chunks`.  Used by the
    streaming sa-geo path to walk the candidate window in chunks without
    materializing the full (B, M, 2w+1, C) tensor.  Custom VJP: XLA's
    transpose of a slice-gather is a SERIAL per-query scatter loop (the
    same pathology _window_slice3 guards against — ~60 ms per call at 16k);
    instead one wide-row scatter plus ``size`` dense shifted adds.
    """
    b, np_, c = xp.shape
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

    def one(xrow, irow):
        return jax.lax.gather(
            xrow, (irow + lo)[:, None], dnums, slice_sizes=(size, c),
            mode=jax.lax.GatherScatterMode.CLIP)

    return jax.vmap(one)(xp, idx)


def _window_chunk_fwd(xp, idx, lo, size):
    return window_chunk(xp, idx, lo, size), (idx, xp.shape)


def _window_chunk_bwd(lo, size, res, g):
    idx, xshape = res
    b, np_, c = xshape
    m = idx.shape[1]
    gw = g.reshape(b, m, size * c)
    full = jnp.zeros((b, np_, size * c), g.dtype)
    bidx = jnp.arange(b)[:, None]
    full = full.at[bidx, idx + lo].add(gw)
    full = full.reshape(b, np_, size, c)
    gxp = jnp.zeros((b, np_ + size, c), g.dtype)
    for s in range(size):  # dense static-slice adds (no scatter)
        gxp = gxp.at[:, s:s + np_].add(full[:, :, s])
    return gxp[:, :np_], None


window_chunk.defvjp(_window_chunk_fwd, _window_chunk_bwd)


def ascending_from_interleaved(mask: jax.Array, half_w: int) -> jax.Array:
    """Permute a (B, M, 2w+1) interleaved-order window tensor to ascending
    offset order [-w..+w] (inverse of the _interleave_perm used above)."""
    import numpy as _np

    perm = _np.asarray(_interleave_perm(half_w))
    inv = _np.argsort(perm)
    return mask[..., inv]


def knn_1d_group_superset(pos: jax.Array, kept_idx: jax.Array,
                          kept_valid: jax.Array, curve_id: jax.Array,
                          valid: jax.Array, k: int):
    """For every full-res point, its k geodesically-nearest *kept* points.

    Parallel of reference ``knn_1d_group_superset`` (point_ops.py:196-260):
    a cumsum assignment maps each point to the sequentially-next kept slot,
    a ±(k+1) window of kept slots is gathered, same-curve filtered, sorted by
    Euclidean distance, and truncated to k.

    Returns:
      nbr: (B, N, k) indices into the *kept* array (slots), -1 padded.
      mask: (B, N, k) validity.
    """
    b, n = curve_id.shape
    m = kept_idx.shape[1]

    # selection mask over the full row, then inclusive-cumsum assignment
    sel = jnp.zeros((b, n), jnp.int32)
    sel = jax.vmap(
        lambda s, i, v: s.at[i].add(v.astype(jnp.int32))
    )(sel, kept_idx, kept_valid)
    assign = jnp.cumsum(sel, axis=-1)  # (B, N): next kept slot (ref :201-204)

    offs = interleaved_offsets(k + 1)  # 2k+3 candidates (ref :207-208)
    w = k + 1
    cand = assign[:, :, None] + offs[None, None, :]  # slots into kept array
    in_range = (cand >= 0) & (cand < m)
    cand_safe = jnp.clip(cand, 0, m - 1)

    # the candidate slots are a CONTIGUOUS window of the kept array, so all
    # per-candidate lookups come from ONE packed contiguous slice per query
    # (wide-row reads; v5e charges ~7ns per gathered ROW regardless of
    # width, so 1 packed slice beats 5 per-field element gathers ~5x)
    cid = segments.padded_curve_id(curve_id, valid)
    kept_cid = gather_rows(cid, kept_idx)  # (B, M)
    kept_pos = gather_rows(pos, kept_idx)  # (B, M, 3)
    rec = jnp.concatenate(
        [kept_pos,
         kept_cid.astype(jnp.float32)[..., None],
         kept_valid.astype(jnp.float32)[..., None]], axis=-1)  # (B, M, 5)
    # assign can equal m (query past the last kept slot); one invalid
    # sentinel row keeps the slice start from clipping (a clipped start
    # would shift the window and misalign it with `cand`)
    rec = jnp.pad(rec, ((0, 0), (0, 1), (0, 0)))
    perm = _interleave_perm(w)  # ascending window order -> interleaved
    # window_slice expects the PADDED-row start index == center index
    recw = window_slice(rec, assign, w)[:, :, perm]  # (B, N, 2w+1, 5)
    cand_pos = recw[..., :3]
    cid_c = recw[..., 3].astype(jnp.int32)
    kept_valid_c = recw[..., 4] > 0.5

    mask = in_range & kept_valid_c & (cid[:, :, None] == cid_c) & valid[:, :, None]

    # Euclidean near-to-far selection of k of the 2k+3 candidates
    # (ref :230-235 sorts; a sort + take_along_axis lowers to a stable
    # (N, 2k+3) sort plus two per-element gathers — ~6 ms at 32k.  k rounds
    # of packed min-extraction are pure fusable VPU work: distances pack
    # (d2_bits & ~(pw-1)) | column so a round is one lane-min plus selects.)
    d2 = jnp.sum((cand_pos - pos[:, :, None, :]) ** 2, axis=-1)
    d2 = jnp.where(mask, d2, _FAR * _FAR)
    wn = cand.shape[-1]
    pw = 1
    while pw < wn:
        pw *= 2
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(jax.lax.bitcast_convert_type(d2, jnp.int32),
                        jnp.int32(~(pw - 1))), col)
    sent = jnp.int32(0x7F800000 | (pw - 1))
    far_bits = jax.lax.bitcast_convert_type(
        jnp.float32(_FAR * _FAR * 0.99), jnp.int32)
    nbrs, masks = [], []
    for _ in range(k):
        m = jnp.min(packed, axis=-1)                      # (B, N)
        sel = col == jnp.bitwise_and(m, pw - 1)[..., None]
        nbr_j = jnp.sum(jnp.where(sel, cand_safe, 0), axis=-1)
        ok_j = m < far_bits
        nbrs.append(jnp.where(ok_j, nbr_j, -1))
        masks.append(ok_j)
        packed = jnp.where(sel, sent, packed)
    return jnp.stack(nbrs, axis=-1), jnp.stack(masks, axis=-1)


def feature_diffs(x: jax.Array, curve_id: jax.Array,
                  valid: jax.Array) -> jax.Array:
    """Per-point |mean of adjacent along-curve feature derivatives|.

    Parallel of reference ``compute_feature_diffs`` (fast_conv1d.py:190-205).
    """
    fwd_ok = same_curve_shift_mask(curve_id, valid, 1)  # edge i -> i+1 exists
    bwd_ok = same_curve_shift_mask(curve_id, valid, -1)
    fwd = (shift_fill(x, 1) - x) * fwd_ok[..., None]
    bwd = (x - shift_fill(x, -1)) * bwd_ok[..., None]
    denom = jnp.clip(
        fwd_ok.astype(x.dtype) + bwd_ok.astype(x.dtype), min=1.0
    )
    return jnp.abs((fwd + bwd) / denom[..., None])


def symmetric_window_concat(x: jax.Array, curve_id: jax.Array,
                            valid: jax.Array, half_k: int) -> jax.Array:
    """Build [x_0, x_{-1}+x_{+1}, ..., x_{-h}+x_{+h}] along the feature axis.

    One (B, N, (h+1)*C) tensor such that a single dense matmul with stacked
    half-kernel weights reproduces the reference's symmetric curve conv
    (SymmetricConv1d with reflected taps, fast_conv1d.py:173-184, over a
    zero-stuffed sequence). Taps crossing curve boundaries contribute zero,
    exactly like the reference's inter-curve zero padding.
    """
    parts = [x * valid[..., None].astype(x.dtype)]
    for d in range(1, half_k + 1):
        m_plus = same_curve_shift_mask(curve_id, valid, d)[..., None]
        m_minus = same_curve_shift_mask(curve_id, valid, -d)[..., None]
        s = shift_fill(x, d) * m_plus.astype(x.dtype) + \
            shift_fill(x, -d) * m_minus.astype(x.dtype)
        parts.append(s)
    return jnp.concatenate(parts, axis=-1)


def window_concat_nomask(x: jax.Array, half_k: int) -> jax.Array:
    """[x_0, x_{-1}+x_{+1}, ..., x_{-h}+x_{+h}] with plain zero-fill shifts.

    For the gap-expanded conv layout (see :func:`gap_expand_indices`) the
    inter-curve zero stuffing already isolates curves, so no same-curve
    masks are needed — each part is two aligned row shifts.
    """
    parts = [x]
    for d in range(1, half_k + 1):
        parts.append(shift_fill(x, d) + shift_fill(x, -d))
    return jnp.concatenate(parts, axis=-1)


def gap_expand_indices(curve_id: jax.Array, valid: jax.Array, pad: int,
                       curve_budget: int):
    """Index map into the reference's zero-stuffed conv sequence.

    Reference SymmetricCurve1DConvV2 (fast_conv1d.py:49-74) inserts
    ``pad = (k//2) * nconvs`` zero slots at every curve boundary INCLUDING
    the row ends and keeps ONE padded vector through all conv layers — gap
    slots develop non-zero values (bias/BN/activation of boundary
    neighborhoods) that feed back into curve-boundary points from the
    second conv on.  This helper lays each padded row out as
    ``[gap, curve_0, gap, curve_1, ..., gap]`` with static size
    ``N + pad * (curve_budget + 1)``.

    Returns (exp_idx (B, N) int32, n_exp, mask_exp (B, N_exp) bool,
    overflow (B,) int32).  Rows with more than ``curve_budget`` curves lose
    the gaps between the excess curves (those boundaries behave like the
    masked-window approximation); ``overflow`` counts the excess for
    telemetry.
    """
    b, n = curve_id.shape
    # +2: room for the final gap even when every curve slot is used
    n_exp = n + pad * (curve_budget + 2)

    # memoized on (curve_id, valid) identity: the flagship's two conv1d
    # steps run on the SAME full-resolution row (same arrays through
    # Cloud.with_features), so the second step's index math is free
    def build():
        starts = segments.curve_starts(curve_id, valid) & valid
        rank = jnp.cumsum(starts.astype(jnp.int32), axis=-1) - 1   # (B, N)
        rank = jnp.clip(rank, 0, curve_budget)
        exp_idx = (jnp.arange(n, dtype=jnp.int32)[None, :]
                   + pad * (rank + 1)).astype(jnp.int32)
        exp_idx = jnp.where(valid, exp_idx, n_exp)  # scatter-drop for pad

        n_curves = jnp.sum(starts, axis=-1).astype(jnp.int32)      # (B,)
        used = (jnp.sum(valid, axis=-1).astype(jnp.int32)
                + pad * (jnp.minimum(n_curves, curve_budget + 1) + 1))
        mask_exp = (jnp.arange(n_exp, dtype=jnp.int32)[None, :]
                    < used[:, None])
        overflow = jnp.maximum(n_curves - 1 - curve_budget, 0)
        return exp_idx, mask_exp, overflow

    exp_idx, mask_exp, overflow = segments._memo(
        f"gap_expand.{pad}.{curve_budget}", build, curve_id, valid)
    return exp_idx, n_exp, mask_exp, overflow


def gap_scatter(x: jax.Array, exp_idx: jax.Array, n_exp: int) -> jax.Array:
    """Scatter (B, N, C) rows into the (B, N_exp, C) gap layout (zeros
    elsewhere); out-of-range rows (padding) drop."""
    b, n, c = x.shape

    def one(xb, ib):
        return jnp.zeros((n_exp, c), x.dtype).at[ib].set(
            xb, mode="drop")

    return jax.vmap(one)(x, exp_idx)


def gap_gather(x_exp: jax.Array, exp_idx: jax.Array,
               valid: jax.Array) -> jax.Array:
    """Gather valid rows back out of the gap layout ((B, N_exp, C) ->
    (B, N, C)); padding rows read zeros."""
    safe = jnp.where(valid, exp_idx, 0)
    out = jax.vmap(lambda xb, ib: xb[ib])(x_exp, safe)
    return out * valid[..., None].astype(out.dtype)
