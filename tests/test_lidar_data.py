"""Curve-extraction + PolarMix tests (host-side data layer, NumPy only)."""

import numpy as np
import pytest

from curvecloudnet_tpu.data import lidar


def make_ring(n, r, z=0.0, phase=0.0):
    az = phase + np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([r * np.cos(az), r * np.sin(az), np.full(n, z)], -1)


def test_sequential_split_breaks_at_gaps():
    # two dense arcs separated by a big jump (spacing 2*pi*5/1000 ~ 0.03,
    # split threshold 0.08*sqrt(5) ~ 0.18)
    a = make_ring(1000, 5.0)[:500]
    b = make_ring(1000, 5.0, z=3.0)[500:]
    pts = np.concatenate([a, b]).astype(np.float32)
    cid = lidar.extract_curves_sequential(pts, thresh=0.08)
    assert cid[0] == 0
    assert cid[499] == cid[0]         # first arc one curve
    assert cid[500] > cid[499]        # split at the jump
    assert cid[-1] == cid[500]        # second arc one curve
    assert np.all(np.diff(cid) >= 0)


def test_sequential_split_range_adaptive():
    # same absolute gap is a split near the sensor but not far away
    near = np.array([[1, 0, 0], [1.5, 0, 0]], np.float32)      # r=1, gap .5
    far = np.array([[60, 0, 0], [60.5, 0, 0]], np.float32)     # r=60, gap .5
    cid_near = lidar.extract_curves_sequential(near, thresh=0.08)
    cid_far = lidar.extract_curves_sequential(far, thresh=0.08)
    assert cid_near[1] == 1   # 0.5 > 0.08*sqrt(1.5)
    assert cid_far[1] == 0    # 0.5 < 0.08*sqrt(60.5)


def test_beam_split_reorder_roundtrip():
    rng = np.random.default_rng(0)
    n = 300
    beams = rng.integers(0, 4, n)
    pts = np.zeros((n, 3), np.float32)
    for b in range(4):
        m = beams == b
        pts[m] = make_ring(int(m.sum()), 5.0 + b)
    reorder, inv, cid = lidar.extract_curves_beams(pts, beams, thresh=0.3)
    # reorder then inverse = identity
    np.testing.assert_array_equal(pts[reorder][inv], pts)
    # beams stay contiguous and sorted
    b_sorted = beams[reorder]
    assert np.all(np.diff(b_sorted) >= 0)
    # curve never spans two beams
    for c in np.unique(cid):
        assert len(np.unique(b_sorted[cid == c])) == 1
    assert np.all(np.diff(cid) >= 0)


def test_knn_components_two_clusters():
    rng = np.random.default_rng(1)
    a = make_ring(80, 3.0) + rng.normal(0, 0.01, (80, 3))
    b = make_ring(80, 3.0, z=5.0) + rng.normal(0, 0.01, (80, 3))
    pts = np.concatenate([a, b]).astype(np.float32)
    ts = np.concatenate([np.arange(80), np.arange(80)])
    perm = rng.permutation(len(pts))
    reorder, cid = lidar.extract_curves_knn(pts[perm], ts[perm], k=4,
                                            thresh=0.2)
    assert np.all(np.diff(cid) >= 0)
    p_sorted = pts[perm][reorder]
    # points of one curve must share a z-cluster
    for c in np.unique(cid):
        zs = p_sorted[cid == c][:, 2]
        assert zs.max() - zs.min() < 1.0


def test_partition_at_discontinuities_respects_skip_edge():
    # single outlier point: 1-step edge huge but 2-step edge small -> NO split
    pts = make_ring(500, 5.0).astype(np.float32)
    pts_outlier = pts.copy()
    pts_outlier[250] += [0, 0, 2.0]
    cid = np.zeros(500, np.int64)
    out = lidar.partition_at_discontinuities(pts_outlier, cid, thresh=0.1)
    # the outlier starts one new curve; the 2-step (skip) edge prevents a
    # second split right after it, so the rest of the ring stays one curve
    assert out.max() == 1
    assert out[250] == 1 and out[249] == 0 and np.all(out[251:] == 1)
    # without the outlier: a single curve
    clean = lidar.partition_at_discontinuities(pts, cid, thresh=0.1)
    assert clean.max() == 0


def test_polarmix_keeps_curve_invariants():
    rng = np.random.default_rng(2)
    def scan(seed):
        g = np.random.default_rng(seed)
        pts = np.concatenate([make_ring(60, r) for r in (3, 5, 8)])
        cid = np.repeat(np.arange(3), 60)
        refl = g.random((180, 1))
        y = g.integers(0, 10, 180)
        return np.concatenate([pts, refl, cid[:, None]], 1), y

    p1, y1 = scan(1)
    p2, y2 = scan(2)
    p2 = p2.copy()
    p2[:, 4] += p1[:, 4].max() + 1
    for trial in range(5):
        out_p, out_y = lidar.polarmix(rng, p1, y1, p2, y2,
                                      instance_classes=[1, 2, 3])
        cid = out_p[:, 4]
        assert np.all(np.diff(cid) >= 0), "curve ids nondecreasing"
        assert len(out_p) == len(out_y)
        # ids are densified 0..K-1
        u = np.unique(cid)
        np.testing.assert_array_equal(u, np.arange(len(u)))


def test_label_maps_cover_raw_ids():
    assert max(lidar.KITTI_LEARNING_MAP.values()) == 19
    assert max(lidar.NUSCENES_LEARNING_MAP.values()) == 16
    y = lidar._map_labels(np.array([0, 10, 252, 99]),
                          lidar.KITTI_LEARNING_MAP)
    np.testing.assert_array_equal(y, [0, 1, 1, 0])


def test_nuscenes_pkl_index_tokens_and_test_split(tmp_path):
    """The info-pkl index carries the sample_data token through to the
    submission filename, and a TEST pkl (legitimately seg-less) is used
    as-is instead of falling through to the unsplit glob fallback."""
    import pickle

    from curvecloudnet_tpu.data.lidar import SemNuScenes

    root = tmp_path / "nusc"
    lid_dir = root / "samples" / "LIDAR_TOP"
    lid_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    infos = []
    for i in range(3):
        fn = f"n008-sweep__LIDAR_TOP__{1000+i}.pcd.bin"
        pts = rng.normal(size=(64, 5)).astype(np.float32)
        pts[:, 4] = np.repeat(np.arange(8), 8)  # beam ids
        pts.tofile(str(lid_dir / fn))
        infos.append({"lidar_path": f"samples/LIDAR_TOP/{fn}",
                      "lidar_token": f"tok{i:04d}"})
    with open(root / "nuscenes_infos_test.pkl", "wb") as f:
        pickle.dump(infos, f)
    ds = SemNuScenes(str(root), split="test")
    assert len(ds) == 3
    s = ds.get(1)
    assert s.meta["fname"] == "tok0001_lidarseg.bin"
    assert (s.labels == 0).all()


def test_nuscenes_glob_split_disjoint(tmp_path):
    """Without any index metadata the glob fallback must at least keep
    train and val frame sets disjoint (previously both served ALL)."""
    from curvecloudnet_tpu.data.lidar import SemNuScenes

    root = tmp_path / "nusc"
    lid_dir = root / "samples" / "LIDAR_TOP"
    lid_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(20):
        pts = rng.normal(size=(32, 5)).astype(np.float32)
        pts[:, 4] = np.repeat(np.arange(4), 8)
        pts.tofile(str(lid_dir / f"sweep_{i:03d}.pcd.bin"))
    tr = SemNuScenes(str(root), split="train")
    va = SemNuScenes(str(root), split="val")
    tr_files = {p for p, _, _ in tr.pairs}
    va_files = {p for p, _, _ in va.pairs}
    assert tr_files and va_files
    assert not (tr_files & va_files)
    assert len(tr_files) + len(va_files) == 20
