"""Driver end-to-end over the object tasks (classification / part-seg)."""

import numpy as np
import pytest

from curvecloudnet_tpu import main as driver

TINY_OBJ_MODEL = dict(
    use_bias=True,
    version=1.0,
    skip_connect_state_store=["mlp"],
    steps=[
        dict(step_name="sa-geo", curve_fps_arclen=0.1, use_curve_fps=True,
             with_xyz=True, aggr_type="attend", normalize_radius=True,
             radius=0.2, curve_window=8, feat_dims=[8, 16],
             budget_ratio=0.6),
        dict(step_name="mlp", plain_last=False, with_xyz=True,
             feat_dims=[16, 8]),
        dict(step_name="sgcnn", with_xyz=True, knn=4,
             use_sparse_feat_agg=True, feat_dims=[8, 8]),
        dict(step_name="skip-connect", num_skips=1, feat_dims=[16, 16]),
        dict(step_name="sa-global", feat_dims=[16, 16]),
    ],
    out_mlp=dict(dims=[16], dropout=0.0),
)


def test_driver_classification(tmp_path):
    cfg = dict(
        dataset_source="synthetic-objects", task="classification",
        outdir=str(tmp_path / "cls"), batch_size=4, n_pad=48,
        n_train=8, n_val=8, lr=1e-3, epochs=1, val_every=1, save_every=5,
        eval_batch_size=4, model=TINY_OBJ_MODEL,
    )
    score = driver.main(cfg)
    assert np.isfinite(score) and 0.0 <= score <= 1.0
    # only_val path reuses the checkpoint
    cfg["only_val"] = True
    score2 = driver.main(cfg)
    assert np.isfinite(score2)


def test_driver_part_segmentation(tmp_path):
    # segmentation heads need full-resolution output: no downsampling steps
    model = dict(TINY_OBJ_MODEL)
    model["steps"] = [
        dict(step_name="conv1d-fast-v2", with_diff=True, with_xyz=True,
             kernel_size=3, feat_dims=[8, 8]),
        dict(step_name="mlp", plain_last=False, with_xyz=True,
             feat_dims=[16, 8]),
        dict(step_name="sgcnn", with_xyz=True, knn=4,
             use_sparse_feat_agg=True, feat_dims=[8, 8]),
        dict(step_name="skip-connect", num_skips=1, feat_dims=[16, 16]),
    ]
    cfg = dict(
        dataset_source="synthetic-objects", task="segmentation",
        outdir=str(tmp_path / "seg"), batch_size=4, n_pad=48,
        n_train=8, n_val=8, lr=1e-3, epochs=1, val_every=1, save_every=5,
        eval_batch_size=4, model=model,
    )
    score = driver.main(cfg)
    assert np.isfinite(score) and 0.0 <= score <= 1.0
