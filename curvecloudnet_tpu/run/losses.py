"""Segmentation / classification losses (reference ``src/run/*_seg.py`` +
``src/models/utils/lovasz_losses.py``), redesigned for static shapes.

The reference's Lovász-Softmax loops over present classes in Python and
sorts each class's errors separately (lovasz_losses.py:174-203).  Here the
sort is batched over the class axis in one ``argsort`` — ~C× fewer kernel
launches and no data-dependent Python control flow, so the loss jits.
Invalid (padded / ignored) points sort to the tail with zero error and are
masked out of the intersection/union cumsums.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def nll_loss(log_probs: jax.Array, labels: jax.Array, valid: jax.Array,
             ignore_index: Optional[int] = None,
             class_weights: Optional[jax.Array] = None,
             mean_over_all: bool = False) -> jax.Array:
    """Masked NLL.

    ``mean_over_all=False`` → torch ``nll_loss(reduction='mean',
    ignore_index=...)`` semantics: sum of (weighted) losses / sum of weights
    of counted targets (nuscenes_seg.py:231).  ``mean_over_all=True`` →
    the KITTI variant: per-point losses (zero-weighted ignores) averaged over
    *every* point (kitti_seg.py:186-192).
    """
    labels = labels.astype(jnp.int32)
    counted = valid
    if ignore_index is not None:
        counted = counted & (labels != ignore_index)
    safe = jnp.clip(labels, 0, log_probs.shape[-1] - 1)
    picked = jnp.take_along_axis(log_probs, safe[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights[safe]
    else:
        w = jnp.ones_like(picked)
    w = jnp.where(counted, w, 0.0)
    # where(), not zero-weighting: a non-finite log-prob at a masked slot
    # (garbage padded features can overflow, especially bf16) would turn
    # NaN * 0.0 into NaN and poison the whole batch loss
    num = -jnp.sum(jnp.where(counted, picked * w, 0.0))
    if mean_over_all:
        den = jnp.maximum(valid.sum(), 1)
    else:
        den = jnp.maximum(w.sum(), 1e-12)
    return num / den


def lovasz_softmax(probs: jax.Array, labels: jax.Array,
                   valid: jax.Array) -> jax.Array:
    """Vectorized multi-class Lovász-Softmax over 'present' classes.

    probs: (N, C) softmax probabilities; labels: (N,); valid: (N,) — points
    that are padded or ignore-labeled must already be masked out of ``valid``
    (the reference filters ``gt != ignore`` before calling,
    nuscenes_seg.py:236-238).
    """
    n, c = probs.shape
    labels = labels.astype(jnp.int32)
    fg = (labels[:, None] == jnp.arange(c)[None, :]) & valid[:, None]
    fgf = fg.astype(jnp.float32)
    errors = jnp.abs(fgf - probs)
    # invalid rows sort last: real errors are in [0, 1]
    errors = jnp.where(valid[:, None], errors, -1.0)

    # ONE variadic sort carries (key, fg, valid, row index) together — an
    # argsort plus three take_along_axis calls costs 3 extra (N*C)-row
    # gathers forward and their scatters backward (~12 ms/step at 32k x 17).
    # The carried 0/1 operands ride as bf16 (exactly representable) to
    # halve the sort's payload bandwidth.  ``errors`` itself is detached:
    # its gradient path runs through the *unsorted* dot below, so autodiff
    # never differentiates through the sort (the sort transpose lowers to a
    # serial (N*C) scatter, ~4 ms/step at 36k x 17).
    rows = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, c))
    neg_sorted, fg_sorted, rows_sorted = jax.lax.sort(
        (jax.lax.stop_gradient(-errors), fgf.astype(jnp.bfloat16), rows),
        dimension=0, num_keys=1)
    # validity rides in the key itself: valid errors are in [0, 1] so the
    # negated key is <= 0, while invalid rows were filled with -1 -> +1.
    # Recomputing it here drops a whole bf16 operand from the sort payload.
    valid_sorted = (neg_sorted <= 0.0).astype(jnp.float32)
    errors_sorted = -neg_sorted
    fg_sorted = fg_sorted.astype(jnp.float32)

    gts = fgf.sum(axis=0)  # (C,)
    intersection = gts[None, :] - jnp.cumsum(fg_sorted, axis=0)
    union = gts[None, :] + jnp.cumsum((1.0 - fg_sorted) * valid_sorted, axis=0)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    grad = jnp.concatenate(
        [jaccard[:1], jaccard[1:] - jaccard[:-1]], axis=0)
    # the Jaccard coefficient depends only on labels and the (piecewise-
    # constant) sort order, so its derivative w.r.t. probs is zero a.e. —
    # stopping its gradient reproduces the reference's autograd exactly
    # (lovasz grad is data there too, lovasz_losses.py:198-203) while
    # keeping the backward pass to one sort-transpose
    grad = jax.lax.stop_gradient(grad * valid_sorted)
    # Unsort the (data-only) Jaccard gradient with a second sort keyed on
    # the carried row index, then take the dot against the UNSORTED errors:
    # the loss value is identical (sum reordering) and the backward pass is
    # a pure elementwise multiply instead of a sort-transpose scatter.
    # Invalid slots carry grad == 0 (valid_sorted factor), so the -1 fills
    # in ``errors`` contribute nothing.
    _, grad_unsorted = jax.lax.sort(
        (rows_sorted, grad), dimension=0, num_keys=1)
    losses = jnp.sum(errors * jax.lax.stop_gradient(grad_unsorted), axis=0)

    present = gts > 0
    return jnp.sum(jnp.where(present, losses, 0.0)) / jnp.maximum(
        present.sum(), 1)


def seg_loss(logits: jax.Array, labels: jax.Array, valid: jax.Array,
             ignore_index: Optional[int] = 0, use_lovasz: bool = False,
             lovasz_weight: float = 1.0,
             class_weights: Optional[jax.Array] = None,
             mean_over_all: bool = False) -> jax.Array:
    """Full segmentation loss: NLL (+ weighted Lovász), flattened over batch.

    Mirrors ``seg_loss`` (nuscenes_seg.py:229-242, lovasz_weight=1) and
    ``seg_loss_kitti`` (kitti_seg.py:184-202, lovasz_weight=2,
    mean_over_all=True with class weights).
    """
    c = logits.shape[-1]
    flat_logits = logits.reshape(-1, c)
    flat_labels = labels.reshape(-1)
    flat_valid = valid.reshape(-1)
    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    loss = nll_loss(logp, flat_labels, flat_valid, ignore_index,
                    class_weights, mean_over_all)
    if use_lovasz:
        probs = jax.nn.softmax(flat_logits, axis=-1)
        lov_valid = flat_valid
        if ignore_index is not None:
            lov_valid = lov_valid & (flat_labels != ignore_index)
        loss = loss + lovasz_weight * lovasz_softmax(probs, flat_labels,
                                                     lov_valid)
    return loss


def classification_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Plain cross-entropy for shape classification
    (shapenet_classification.py trains on NLL over per-sample logits)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                 axis=-1)
    return -jnp.mean(picked)
