"""Curve-cloud construction from scanned surface points (simulator stage 3).

Parallel of reference ``CurveClouds`` (scanning_simulator/utils/
curve_cloud.py) + ``curvature_approx.py``, redesigned for padded rows:

  * 3D re-splitting at gaps (CURVE_SPLIT_THRESH = 0.01, curve_cloud.py:40-47)
  * anti-aliasing smoothing filter along curves with mask-renormalized
    endpoints (curve_cloud.py:168-191) — here a same-curve windowed sum
    instead of a padded conv
  * curvature + per-point feature gradients via weighted quadratic
    parametric regression over geodesic neighborhoods with gaussian weights
    (curvature_approx.py:12-148) — batched 3x3 normal-equation solves
  * curve-curve intersection detection via blocked segment-distance tests
    (curve_cloud.py:114-165) — tiled to avoid the reference's O(N^2)
    materialization
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve1d, segments

CURVE_SPLIT_THRESH = 0.01
# Reference kernel (curve_cloud.py:10): 7 taps, cross-correlated, i.e. tap j
# applies at relative offset j-3 (offsets -3..+3).  Deliberately asymmetric
# in the reference; normalization divides by the mask filtered with the SAME
# kernel, so no explicit weight normalization is needed.
ANTI_ALIAS_KERNEL = (1.0, 2.0, 3.0, 3.0, 3.0, 2.0, 2.0)


def split_curves_3d(pos: np.ndarray, curve_id: np.ndarray,
                    thresh: float = CURVE_SPLIT_THRESH) -> np.ndarray:
    """Re-split scan-line curves at 3D gaps (depth discontinuities)."""
    edges = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    splits = edges > thresh
    changes = curve_id[1:] != curve_id[:-1]
    cid = np.concatenate([[0], np.cumsum(splits | changes)])
    return cid.astype(np.int32)


def anti_alias(x: jax.Array, curve_id: jax.Array,
               valid: jax.Array) -> jax.Array:
    """[1,2,3,3,3,2,2] smoothing along curves, renormalized at endpoints.

    x: (B, N, C) padded rows.  Exact parallel of the reference's
    ``F.conv1d(curves, filter, padding='same') / F.conv1d(mask, filter)``
    over curve-padded rows (curve_cloud.py:174-191): tap j of the 7-tap
    kernel applies at relative offset j-3 (cross-correlation); taps that
    cross a curve boundary contribute zero to value AND normalizer, which
    reproduces the reference's per-curve padded layout.
    """
    half = len(ANTI_ALIAS_KERNEL) // 2
    num = jnp.zeros_like(x)
    den = jnp.zeros(x.shape[:2] + (1,), x.dtype)
    for j, w in enumerate(ANTI_ALIAS_KERNEL):
        d = j - half
        if d == 0:
            num = num + w * x
            den = den + w * valid[..., None]
            continue
        m = curve1d.same_curve_shift_mask(curve_id, valid, d)[..., None]
        num = num + w * curve1d.shift_fill(x, d) * m
        den = den + w * m
    return jnp.where(valid[..., None], num / jnp.maximum(den, 1e-12), 0.0)


def estimate_curvature_and_grads(pos: jax.Array, feat: Optional[jax.Array],
                                 curve_id: jax.Array, valid: jax.Array,
                                 k: int = 10, kernel_width: float = 2.5,
                                 hinge_reg: float = 1e-4):
    """Weighted quadratic regression along each curve.

    Fits x(t) ~ c0 + c1 t + c2 t^2 over the +-k/2 geodesic window of each
    point (t = geodesic offset), gaussian-weighted by |t| with bandwidth
    ``kernel_width * mean_edge_len``.  Returns (curvature_vec (B,N,3),
    gradients (B,N,F,3) or None).
    """
    half = max(1, k // 2)
    offs = curve1d.interleaved_offsets(half)
    n = pos.shape[1]
    iota = jnp.arange(n, dtype=jnp.int32)
    cand = iota[None, :, None] + offs[None, None, :]
    in_range = (cand >= 0) & (cand < n)
    cand = jnp.clip(cand, 0, n - 1)
    cid = segments.padded_curve_id(curve_id, valid)
    cid_c = jax.vmap(lambda c, i: c[i])(cid, cand)
    mask = in_range & (cid[:, :, None] == cid_c) & valid[:, :, None]

    geo = segments.geodesic_arclength(pos, curve_id, valid)
    t = jax.vmap(lambda g, i: g[i])(geo, cand) - geo[:, :, None]  # (B,N,K)
    p = jax.vmap(lambda pp, i: pp[i])(pos, cand) - pos[:, :, None, :]

    elens = segments.edge_lengths(pos, curve_id, valid)
    mean_edge = (jnp.sum(elens, axis=(0, 1)) /
                 jnp.maximum(jnp.sum(elens > 0, axis=(0, 1)), 1))
    # Normalize the curve parameter by the mean edge length so the normal
    # equations are O(1)-conditioned and the ridge term stays negligible.
    # (The reference fits in raw arclength units, where sum(w t^4) ~ 1e-5
    # is dwarfed by the 1e-4 ridge — the source of its mysterious "need to
    # rescale curvature" hack, curvature_approx.py:103.)  Curvature is
    # invariant to this linear reparametrization; gradients get 1/h.
    h = jnp.maximum(mean_edge, 1e-12)
    t = t / h
    w = jnp.exp(-(t ** 2) / (kernel_width ** 2))
    w = jnp.where(mask, w, 0.0)
    w = w / jnp.clip(w.sum(-1, keepdims=True), min=1e-5)

    def wls(y):
        """Solve (A^T W A + aI) c = A^T W y for A = [1, t, t^2]."""
        A = jnp.stack([jnp.ones_like(t), t, t * t], axis=-1)  # (B,N,K,3)
        Aw = A * w[..., None]
        ata = jnp.einsum("bnki,bnkj->bnij", Aw, A)
        ata = ata + hinge_reg * jnp.eye(3)
        aty = jnp.einsum("bnki,bnkc->bnic", Aw, y)
        return jnp.linalg.solve(ata, aty)  # (B,N,3,C)

    coef = wls(p)
    vel = coef[:, :, 1, :]
    acc = 2.0 * coef[:, :, 2, :]
    vn = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    tang = vel / jnp.clip(vn, min=1e-12)
    acc_n = acc - tang * jnp.sum(acc * tang, axis=-1, keepdims=True)
    nn_ = jnp.linalg.norm(acc_n, axis=-1, keepdims=True)
    normal = acc_n / jnp.clip(nn_, min=1e-12)
    kappa = (jnp.linalg.norm(jnp.cross(vel, acc), axis=-1, keepdims=True)
             / jnp.clip(vn ** 3, min=1e-12))
    curvature = jnp.where(valid[..., None], normal * kappa, 0.0)

    gradients = None
    if feat is not None:
        fq = jax.vmap(lambda ff, i: ff[i])(feat, cand) - feat[:, :, None, :]
        fcoef = wls(fq)
        g1d = fcoef[:, :, 1, :] / h  # df/ds = df/dt' · dt'/ds  (B, N, F)
        gradients = g1d[..., None] * tang[:, :, None, :]  # (B, N, F, 3)
        gradients = jnp.where(valid[..., None, None], gradients, 0.0)
    return curvature, gradients


def find_intersections(pos: np.ndarray, curve_id: np.ndarray,
                       thresh: float = 0.005,
                       block: int = 2048) -> np.ndarray:
    """Pairs of points from different curves closer than ``thresh``.

    Blocked pairwise distances over segment midpoints — equivalent signal
    to the reference's segment-distance matrix (curve_cloud.py:114-165)
    without materializing the full N^2 matrix.
    Returns (2, n_pairs) int array.
    """
    n = len(pos)
    out = []
    for i0 in range(0, n, block):
        a = pos[i0:i0 + block]
        ca = curve_id[i0:i0 + block]
        for j0 in range(i0, n, block):
            b = pos[j0:j0 + block]
            cb = curve_id[j0:j0 + block]
            d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
            diff_curve = ca[:, None] != cb[None, :]
            ii, jj = np.nonzero((d < thresh) & diff_curve)
            if len(ii):
                out.append(np.stack([ii + i0, jj + j0]))
    if not out:
        return np.zeros((2, 0), np.int64)
    pairs = np.concatenate(out, axis=1)
    return pairs[:, pairs[0] < pairs[1]]
