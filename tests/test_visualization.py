"""Visualization layer: renderer fallback, edge graphs, media logging.

The environment has neither Mitsuba nor plotly, so these exercise the
always-available numpy/matplotlib paths; the optional backends share the
same entry points (reference mitsuba_render.py:143-262,
visualize_plotly.py:284-306, visualize_mitsuba.py:10-87).
"""

import json
import os

import numpy as np

from curvecloudnet_tpu import visualization as V
from curvecloudnet_tpu.logging_utils import MetricLogger


def _ball(n=400, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3)).astype(np.float32)
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    return p * 0.5 + np.array([0, 0, 0.5], np.float32)


def test_render_points_numpy_backend():
    pos = _ball()
    colors = np.tile(np.array([[0.8, 0.2, 0.2]], np.float32), (len(pos), 1))
    img = V.render_points(pos, colors, preset="shapenet", backend="numpy",
                          point_radius=0.02)
    assert img.shape[2] == 3 and img.min() >= 0 and img.max() <= 1
    # the sphere must actually cover pixels (not all background)
    nonbg = (img < 0.98).any(-1).mean()
    assert 0.005 < nonbg < 0.9, nonbg
    # red channel dominates where the object is
    obj = (img < 0.98).any(-1)
    assert img[obj, 0].mean() > img[obj, 2].mean()


def test_render_segmentation_panels_and_presets():
    pos = _ball(200)
    pred = np.zeros(len(pos), np.int32)
    gt = np.ones(len(pos), np.int32)
    cm = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    img = V.render_segmentation_panels(pos * 30, pred, gt, cm, preset="kitti",
                                       backend="numpy", point_radius=0.01)
    h, w, _ = img.shape
    left, right = img[:, : w // 2], img[:, w // 2:]
    lobj = (left < 0.98).any(-1)
    robj = (right < 0.98).any(-1)
    assert lobj.any() and robj.any()
    assert left[lobj, 0].mean() > left[lobj, 1].mean()    # pred = red
    assert right[robj, 1].mean() > right[robj, 0].mean()  # gt = green


def test_grouping_edges_matplotlib_fallback(tmp_path):
    pos = _ball(100)
    nbr = np.stack([np.roll(np.arange(100), 1),
                    np.roll(np.arange(100), -1),
                    np.full(100, -1)], axis=-1)
    out = V.grouping_edges_figure(pos, nbr,
                                  path=str(tmp_path / "edges.png"))
    if isinstance(out, str):  # matplotlib fallback (no plotly here)
        assert os.path.exists(out)
    else:
        assert hasattr(out, "to_plotly_json")


def test_log_media_without_wandb(tmp_path):
    lg = MetricLogger(outdir=str(tmp_path))
    img = np.zeros((8, 8, 3), np.float32)
    lg.log_media("seg_panel", img, step=3)
    lg.close()
    files = os.listdir(tmp_path / "media")
    assert any(f.startswith("seg_panel_3") for f in files)
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert any("media/seg_panel" in r for r in recs)


def test_vector_cones_fallback(tmp_path):
    pos = _ball(200)
    vecs = np.roll(pos, -1, axis=0) - pos
    out = V.vector_cones_figure(pos, vecs,
                                path=str(tmp_path / "cones.png"))
    if isinstance(out, str):
        assert os.path.exists(out)
    else:
        assert hasattr(out, "to_plotly_json")


def test_nocs_figure_fallback(tmp_path):
    rng = np.random.default_rng(0)
    pos = _ball(150)
    gt = rng.uniform(-0.5, 0.5, (150, 3)).astype(np.float32)
    pred = gt + rng.normal(scale=0.02, size=(150, 3)).astype(np.float32)
    out = V.nocs_figure(pos, pred, gt, path=str(tmp_path / "nocs.png"))
    if isinstance(out, str):
        assert os.path.exists(out)
    else:
        assert hasattr(out, "to_plotly_json")
