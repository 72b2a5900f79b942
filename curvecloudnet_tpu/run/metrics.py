"""Evaluation metrics: confusion histograms, IoU, classification stats.

Parallels reference ``src/utils/utils.py`` (fast_hist / per_class_iu), the
``fast_hist_crop`` helpers in each seg run module, and the confusion-matrix
accuracy/precision/recall math in ``src/run/shapenet_classification.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_hist(pred, label, n: int):
    """n×n confusion-count histogram (rows = label, cols = pred)."""
    pred = jnp.asarray(pred).reshape(-1).astype(jnp.int32)
    label = jnp.asarray(label).reshape(-1).astype(jnp.int32)
    k = (label >= 0) & (label < n) & (pred >= 0) & (pred < n)
    idx = jnp.where(k, n * label + pred, n * n)  # park invalid
    counts = jnp.bincount(idx, length=n * n + 1)[: n * n]
    return counts.reshape(n, n)


def masked_hist(pred, label, valid, n: int):
    """fast_hist over valid entries only (padding parked out of range)."""
    pred = jnp.where(valid, pred, -1)
    return fast_hist(pred, jnp.where(valid, label, -1), n)


def fast_hist_crop(pred, label, valid, num_classes: int):
    """Histogram over classes 1..num_classes-1 (class 0 = ignore), matching
    reference ``fast_hist_crop`` (nuscenes_seg.py:245-249)."""
    hist = masked_hist(pred, label, valid, num_classes)
    return hist[1:, 1:]


def per_class_iu(hist) -> np.ndarray:
    """Per-class IoU from a confusion histogram; NaN for absent classes."""
    hist = np.asarray(hist, dtype=np.float64)
    denom = hist.sum(1) + hist.sum(0) - np.diag(hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / denom


def miou(hist) -> float:
    return float(np.nanmean(per_class_iu(hist)))


def confmat2acc(confmat) -> tuple[float, float]:
    """(accuracy, balanced accuracy) from a confusion matrix."""
    confmat = np.asarray(confmat, dtype=np.float64)
    acc = np.diag(confmat).sum() / max(confmat.sum(), 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        per_class = np.diag(confmat) / confmat.sum(1)
    bal = float(np.nanmean(per_class))
    return float(acc), bal


def confmat2precrec(confmat):
    """Per-class precision / recall / F1."""
    confmat = np.asarray(confmat, dtype=np.float64)
    tp = np.diag(confmat)
    with np.errstate(divide="ignore", invalid="ignore"):
        prec = tp / confmat.sum(0)
        rec = tp / confmat.sum(1)
        f1 = 2 * prec * rec / (prec + rec)
    return prec, rec, f1


def part_iou_shapenet(pred, label, valid, parts: np.ndarray) -> float:
    """Instance part-IoU for one object, masked to its category's part set
    (reference shapenet_seg.py:91-99): for each part in ``parts``, IoU of
    pred vs label; parts absent from both count as IoU 1."""
    pred = np.asarray(pred)[np.asarray(valid)]
    label = np.asarray(label)[np.asarray(valid)]
    ious = []
    for p in parts:
        pr = pred == p
        gt = label == p
        union = np.logical_or(pr, gt).sum()
        if union == 0:
            ious.append(1.0)
        else:
            ious.append(np.logical_and(pr, gt).sum() / union)
    return float(np.mean(ious))
