"""Loss/metric tests against independent NumPy/torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.run import losses, metrics


def np_lovasz_oracle(probs, labels, valid):
    """Per-class Python-loop Lovász-Softmax (Berman 2018, Alg. 1)."""
    probs = probs[valid]
    labels = labels[valid]
    if probs.size == 0:
        return 0.0
    C = probs.shape[1]
    out = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        perm = np.argsort(-errors, kind="stable")
        errors_sorted = errors[perm]
        fg_sorted = fg[perm]
        gts = fg_sorted.sum()
        inter = gts - np.cumsum(fg_sorted)
        union = gts + np.cumsum(1.0 - fg_sorted)
        jaccard = 1.0 - inter / union
        if len(jaccard) > 1:
            jaccard[1:] = jaccard[1:] - jaccard[:-1]
        out.append(np.dot(errors_sorted, jaccard))
    return float(np.mean(out)) if out else 0.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lovasz_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n, c = 200, 6
    logits = rng.normal(size=(n, c))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.integers(0, c, size=n)
    valid = rng.random(n) > 0.3
    got = float(losses.lovasz_softmax(
        jnp.array(probs, jnp.float32), jnp.array(labels), jnp.array(valid)))
    want = np_lovasz_oracle(probs, labels, valid)
    assert abs(got - want) < 1e-4, (got, want)


def test_lovasz_all_invalid_is_zero():
    probs = jnp.ones((10, 4)) / 4
    labels = jnp.zeros(10, jnp.int32)
    valid = jnp.zeros(10, bool)
    assert float(losses.lovasz_softmax(probs, labels, valid)) == 0.0


def test_nll_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    n, c = 128, 9
    logits = rng.normal(size=(n, c)).astype(np.float32)
    labels = rng.integers(0, c, size=n)
    logp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    weights = rng.random(c).astype(np.float32) + 0.1

    t_logp = torch.tensor(logp)
    t_y = torch.tensor(labels)

    # mean-over-counted semantics (nuScenes)
    want = F.nll_loss(t_logp, t_y, ignore_index=0).item()
    got = float(losses.nll_loss(jnp.array(logp), jnp.array(labels),
                                jnp.ones(n, bool), ignore_index=0))
    assert abs(got - want) < 1e-5

    # weighted mean-over-counted
    want_w = F.nll_loss(t_logp, t_y, weight=torch.tensor(weights),
                        ignore_index=0).item()
    got_w = float(losses.nll_loss(jnp.array(logp), jnp.array(labels),
                                  jnp.ones(n, bool), ignore_index=0,
                                  class_weights=jnp.array(weights)))
    assert abs(got_w - want_w) < 1e-5

    # KITTI semantics: zero-weight ignore class, mean over all points
    w_kitti = weights.copy()
    w_kitti[0] = 0.0
    perpnt = F.nll_loss(t_logp, t_y, weight=torch.tensor(w_kitti),
                        reduction="none")
    want_k = perpnt.mean().item()
    got_k = float(losses.nll_loss(jnp.array(logp), jnp.array(labels),
                                  jnp.ones(n, bool), ignore_index=0,
                                  class_weights=jnp.array(w_kitti),
                                  mean_over_all=True))
    assert abs(got_k - want_k) < 1e-5


def test_seg_loss_jits_and_ignores_padding():
    rng = np.random.default_rng(1)
    b, n, c = 2, 64, 5
    logits = jnp.array(rng.normal(size=(b, n, c)), jnp.float32)
    labels = jnp.array(rng.integers(0, c, size=(b, n)))
    valid = jnp.array(rng.random((b, n)) > 0.2)

    f = jax.jit(lambda lg, y, v: losses.seg_loss(lg, y, v, ignore_index=0,
                                                 use_lovasz=True))
    base = float(f(logits, labels, valid))
    trashed = jnp.where(valid[..., None], logits, 55.0)
    assert abs(float(f(trashed, labels, valid)) - base) < 1e-5


def test_fast_hist_and_iou():
    pred = np.array([0, 1, 1, 2, 2, 2])
    label = np.array([0, 1, 2, 2, 2, 0])
    hist = np.asarray(metrics.fast_hist(pred, label, 3))
    assert hist.sum() == 6
    assert hist[2, 2] == 2  # two correct class-2 predictions
    iou = metrics.per_class_iu(hist)
    assert iou[2] == pytest.approx(2 / 4)
    # class 0: tp=1, fp=0(pred0 where label!=0 -> none), fn=1 -> 1/2
    assert iou[0] == pytest.approx(1 / 2)


def test_confmat_metrics():
    cm = np.array([[5, 1], [2, 8]])
    acc, bal = metrics.confmat2acc(cm)
    assert acc == pytest.approx(13 / 16)
    assert bal == pytest.approx(0.5 * (5 / 6 + 8 / 10))
    prec, rec, f1 = metrics.confmat2precrec(cm)
    assert prec[0] == pytest.approx(5 / 7)
    assert rec[0] == pytest.approx(5 / 6)


def test_part_iou_shapenet():
    pred = np.array([0, 0, 1, 1])
    label = np.array([0, 1, 1, 1])
    valid = np.ones(4, bool)
    got = metrics.part_iou_shapenet(pred, label, valid, np.array([0, 1]))
    # part0: inter 1 union 2 -> .5 ; part1: inter 2 union 3 -> 2/3
    assert got == pytest.approx(0.5 * (0.5 + 2 / 3))
