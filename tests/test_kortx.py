"""Kortx preprocessing: curve-index repair, cutting, windowed npz round-trip."""

import json
import os

import numpy as np

from curvecloudnet_tpu.data import kortx


def test_fix_curve_idxs_collapses_singletons():
    # curve ids with a degenerate single-point curve between 0s
    cid = np.array([0, 0, 1, 2, 2, 3])
    fixed = kortx.fix_curve_idxs(cid)
    assert np.all(np.diff(fixed) >= 0)
    # adjacent starts (1 then 2) collapse: point '1' merges into a neighbor
    assert fixed.max() < cid.max() + 1


def test_cut_curves_splits_at_gaps():
    pos = np.zeros((6, 3))
    pos[3:, 0] = 5.0  # big jump between index 2 and 3
    cid = np.zeros(6, np.int64)
    out = kortx.cut_curves(cid, pos, thresh=1.0)
    assert out[2] != out[3]
    assert out[0] == out[2] and out[3] == out[5]


def test_preprocess_kortx_roundtrip(tmp_path, rng):
    # synthesize one capture with two CSV views
    inst = tmp_path / "raw" / "obj0"
    os.makedirs(inst)
    with open(inst / "info.json", "w") as f:
        json.dump({"object-class": "widget", "capture-setting": "table"}, f)
    n = 600
    t = np.linspace(0, 20, n)
    pts = np.stack([np.cos(t), np.sin(t), t * 0.05], -1)
    rows = np.concatenate([
        pts, np.arange(n)[:, None],                      # time
        (np.arange(n) // 50)[:, None],                   # curve id
        rng.integers(0, 4, (n, 1)),                      # label
    ], axis=1)
    np.savetxt(inst / "view0.csv", rows, delimiter=",")

    out = kortx.preprocess_kortx(str(tmp_path / "raw"), str(tmp_path / "out"),
                                 n_points=128, samples_per_scan=3)
    ds = kortx.KortxNpzDataset(out, task="segmentation", n_classes=4)
    assert len(ds) == 3
    s = ds.get(0)
    assert len(s.pos) == 128
    assert np.all(np.abs(s.pos) <= 0.5 + 1e-6)  # scale-normalized
    assert np.all(np.diff(s.curve_id) >= 0)
    # classification view
    dc = kortx.KortxNpzDataset(out, task="classification", n_classes=2)
    assert int(np.ndim(dc.get(1).labels)) == 0
