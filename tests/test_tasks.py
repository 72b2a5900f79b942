"""Eval-loop tests: TTA protocol, part-IoU eval, submission dumps."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from curvecloudnet_tpu.run import tasks as T


def test_task_registry_matches_reference_dispatch():
    assert T.task_for("nuscenes", "segmentation").n_out == 17
    assert T.task_for("kitti", "segmentation").loss_cfg.lovasz_weight == 2.0
    assert T.task_for("audi", "segmentation").metric_ignore == 12
    assert T.task_for("shapenet-seg", "classification").n_out == 16
    assert T.task_for("shapenet-seg", "segmentation").n_out == 50
    assert T.task_for("kortx", "segmentation").part_iou


def test_tta_views_are_twelve():
    views = [(f, s) for f in T.TTA_FLIPS for s in T.TTA_SCALES]
    assert len(views) == 12
    flips = {tuple(f) for f, _ in views}
    assert flips == {(1, 1), (-1, 1), (1, -1), (-1, -1)}
    np.testing.assert_allclose(sorted(T.TTA_SCALES.tolist()),
                               [0.95, 1.0, 1.05])


def test_submission_dump_formats(tmp_path):
    from curvecloudnet_tpu.data import lidar

    n, c = 40, 17
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, n, c)).astype(np.float32))
    valid = np.ones((2, n), bool)
    valid[1, 30:] = False
    reorder = rng.permutation(n)
    metas = [
        {"format": "nuscenes", "fname": "tok_lidarseg.bin",
         "reorder": reorder},
        {"format": "kitti",
         "fpath": os.path.join("seqs", "11", "velodyne", "000042.bin")},
    ]
    T.dump_submission(logits, jnp.asarray(valid), metas, str(tmp_path))

    nus = np.fromfile(
        tmp_path / "results" / "lidarseg" / "test" / "tok_lidarseg.bin",
        np.uint8)
    assert len(nus) == n
    assert nus.min() >= 1  # class 0 is never predicted
    want = (np.argmax(np.asarray(logits[0])[:, 1:], -1) + 1)[reorder]
    np.testing.assert_array_equal(nus, want.astype(np.uint8))

    kit = np.fromfile(
        tmp_path / "method_predictions" / "sequences" / "11" /
        "predictions" / "000042.label", np.uint32)
    assert len(kit) == 30  # only valid points dumped
    inv_vals = set(lidar.KITTI_LEARNING_MAP_INV.values())
    assert set(kit.tolist()) <= inv_vals


def test_evaluate_classification_counts(tmp_path):
    """Eval loop agreement with direct confusion computation."""
    from curvecloudnet_tpu.data import datasets as D
    from curvecloudnet_tpu.models import CurveCloudNet, parse_model_config
    from tests.test_model import class_cfg, build_cloud

    spec = parse_model_config(class_cfg(), in_dim=3, n_out=7)
    model = CurveCloudNet(spec, n_points=48)
    ds = D.SyntheticObjects(n_samples=8, n_pad=48, task="classification")
    key = jax.random.PRNGKey(0)
    s0 = ds.get(0)
    from curvecloudnet_tpu.data.datasets import pad_sample, to_device_batch
    import numpy as _np
    nb = {k: _np.stack([v]) for k, v in pad_sample(s0, 48).items()}
    batch = to_device_batch(nb, "classification")
    variables = model.init({"params": key, "dropout": key}, batch.cloud,
                           batch.categories, train=False, key=key)
    info = T.task_for("synthetic-objects", "classification")
    info = type(info)(**{**info.__dict__, "n_out": 7})
    res = T.evaluate_classification(model, variables, ds, info, batch_size=4)
    cm = np.asarray(res["confmat"])
    assert cm.sum() == 8
    assert 0.0 <= res["accuracy"] <= 1.0


def test_part_seg_eval_threads_categories():
    """The category-conditioned ShapeNet-seg head changes input width when
    categories are present; the eval path must thread them through the TTA
    wrapper (regression: r2 TPU run crashed with a ScopeParamShapeError
    because make_tta_eval dropped them)."""
    from curvecloudnet_tpu.data import datasets as D
    from curvecloudnet_tpu.models import (
        CurveCloudNet, cloud_from_arrays, parse_model_config,
    )

    mc = dict(
        use_bias=False, version=2.0,
        steps=[dict(step_name="mlp", feat_dims=[16, 16], with_xyz=True)],
        out_mlp=dict(dims=[16], dropout=0.0, with_seg_category=True),
    )
    spec = parse_model_config(mc, in_dim=3, n_out=50)
    assert spec.with_seg_category
    model = CurveCloudNet(spec, n_points=64)
    ds = D.SyntheticObjects(n_samples=6, n_pad=64, task="segmentation")
    batch = next(D.batch_iterator(ds, 2))
    b = D.to_device_batch(batch, "segmentation")
    key = jax.random.PRNGKey(0)
    vs = model.init({"params": key, "dropout": key}, b.cloud,
                    categories=b.categories, train=False, key=key)
    info = T.task_for("shapenet-seg", "segmentation")
    out = T.evaluate_part_segmentation(model, vs, ds, info, batch_size=2,
                                       max_batches=2, log=lambda *a: None)
    assert np.isfinite(out["instance_miou"])
