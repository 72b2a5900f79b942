"""ObjectPthDataset: reading reference-format .pth object dumps."""

import types

import numpy as np
import pytest

from curvecloudnet_tpu.data.datasets import ObjectPthDataset


@pytest.fixture
def fake_pth(tmp_path, rng):
    import torch

    n_obj, n_pts = 3, 100
    pos, batch, curves, y = [], [], [], []
    for i in range(n_obj):
        pos.append(rng.normal(size=(n_pts, 3)).astype(np.float32) * (i + 1))
        batch.append(np.full(n_pts, i))
        curves.append(np.repeat(np.arange(5), n_pts // 5))
        y.append(rng.integers(0, 4, n_pts))
    blob = types.SimpleNamespace(
        pos=torch.tensor(np.concatenate(pos)),
        batch=torch.tensor(np.concatenate(batch)),
        curve_idxs=torch.tensor(np.concatenate(curves)),
        y=torch.tensor(np.concatenate(y)),
        labels=torch.tensor([2, 0, 1]),
        curvature=torch.tensor(
            rng.normal(size=(n_obj * n_pts, 3)).astype(np.float32)),
    )
    path = tmp_path / "data_100_test.pth"
    torch.save(blob, path)
    return str(path)


def test_pth_dataset_segmentation(fake_pth):
    ds = ObjectPthDataset(fake_pth, n_pad=128, task="segmentation",
                          n_classes=4)
    assert len(ds) == 3
    s = ds.get(1)
    assert s.pos.shape == (100, 3)
    # unit-sphere normalized (object_datasets.py:61-66)
    assert abs(np.linalg.norm(s.pos, axis=1).max() - 1.0) < 1e-5
    assert abs(s.pos.mean()) < 0.5
    assert s.category == 0
    assert np.all(np.diff(s.curve_id) >= 0)


def test_pth_dataset_classification_and_curvature(fake_pth):
    ds = ObjectPthDataset(fake_pth, n_pad=128, task="classification",
                          n_classes=16, use_curvature=True)
    assert ds.in_dim == 6
    s = ds.get(0)
    assert np.ndim(s.labels) == 0 and int(s.labels) == 2
    assert s.feat.shape == (100, 3)
