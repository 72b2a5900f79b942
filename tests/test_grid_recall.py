"""Grid-kNN recall vs exact search at the rows the dispatch actually
routes to the grid.

The grid path only serves candidate counts above ``neighbors.BRUTE_MAX_N``
(real-scale KITTI pads its first search rows to 65536/32768; everything
smaller runs the exact Pallas kernel).  Crucially those rows are
POST-DOWNSAMPLING point sets — curve-fps(arclen 0.007) at the 65536 row and
voxel(0.03) at the 32768 row — which bounds per-cell occupancy, so the
recall floor must be measured on matching distributions (raw full-density
sweeps overstate truncation).  Oracle = exact blocked search on a query
subsample.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.data.synthetic import synthetic_lidar_sweep
from curvecloudnet_tpu.ops import neighbors, sampling
from curvecloudnet_tpu.ops.grid_knn import grid_knn


def _row_points(n_row, stage, seed=0):
    """Synthesize a lidar sweep and downsample it the way the model row is
    actually produced (KITTI flagship: 131072 -> curve-fps 65536 -> voxel
    0.03 -> 32768)."""
    rng = np.random.default_rng(seed)
    raw, _, curve_id, _ = synthetic_lidar_sweep(rng, 2 * n_row, n_beams=64)
    pos = jnp.asarray(raw)[None]
    valid = jnp.ones((1, pos.shape[1]), bool)
    cid = jnp.asarray(curve_id)[None]
    if stage == "curve-fps":
        idx, iv = sampling.curve_fps(pos, cid, valid, 0.007, n_row)
    else:
        idx, iv = sampling.voxel_downsample(pos, valid, 0.03, n_row)
    pos = jnp.take_along_axis(pos, idx[..., None], axis=1)
    return pos, iv


def _recall(n_row, stage, radius, k, seed=0, n_oracle=768):
    pos, valid = _row_points(n_row, stage, seed)
    cap = neighbors.grid_cap(k)
    rng = np.random.default_rng(seed + 1)
    nv = int(np.asarray(valid).sum())
    qsel = np.sort(rng.choice(nv, n_oracle, replace=False))
    q = pos[:, qsel]
    qv = jnp.ones((1, n_oracle), bool)
    # per-cell truncation is a per-query property, so searching only the
    # oracle subsample measures the same recall floor as the full row at a
    # fraction of the cost (keeps the 65536 cases in default CI)
    gi, _ = grid_knn(q, pos, qv, valid, k, radius, cap=cap)
    bi, _ = neighbors.knn(q, pos, qv, valid, k, radius=radius)
    g = np.asarray(gi)[0]
    b = np.asarray(bi)[0]
    recalls = []
    for i in range(n_oracle):
        exact = set(b[i][b[i] >= 0].tolist())
        if not exact:
            continue
        got = set(g[i][g[i] >= 0].tolist())
        recalls.append(len(exact & got) / len(exact))
    return float(np.mean(recalls))


import os

_SLOW = os.environ.get("CCN_SLOW_TESTS", "0") == "1"

# The searches the KITTI flagship routes to the grid at real-scale padding:
# 65536 row (post curve-fps): sgcnn r=0.04 k=20, sa r=0.04 k=32
# 32768 row (post voxel 0.03): sgcnn r=0.08 k=20, sa r=0.1 k=32
# Last full run (CCN_SLOW_TESTS=1, 2026-08-16): all four points > 0.95 with
# cap=grid_cap(k)=192 + approx_min_k(recall_target=0.99).
@pytest.mark.parametrize("n_row,stage,radius,k", [
    (65536, "curve-fps", 0.04, 20),
    (65536, "curve-fps", 0.04, 32),
    (32768, "voxel", 0.08, 20),
    (32768, "voxel", 0.10, 32),
])
def test_grid_recall_at_operating_points(n_row, stage, radius, k):
    r = _recall(n_row, stage, radius, k)
    assert r > 0.95, f"recall {r:.4f} at {stage} row {n_row} r={radius} k={k}"


def test_proven_grid_recall_is_exact_at_flagship_row():
    """The proven-cap grid route (nuScenes 11520 row: voxel 0.03, grid
    bound 0.1, cap 64 from the exact occupancy sweep) must be EXACT, not
    merely >0.95 — the spec-level proof says no cell can truncate."""
    pos, valid = _row_points(11520, "voxel", seed=2)
    rng = np.random.default_rng(5)
    nv = int(np.asarray(valid).sum())
    qsel = np.sort(rng.choice(nv, 768, replace=False))
    q = pos[:, qsel]
    qv = jnp.ones((1, 768), bool)
    gi, _ = grid_knn(q, pos, qv, valid, 32, 0.1, cap=64, overflow_planes=2)
    bi, bd = neighbors.knn(q, pos, qv, valid, 32, radius=0.1)
    g, b = np.asarray(gi)[0], np.asarray(bi)[0]
    bdn = np.asarray(bd)[0]
    p = np.asarray(pos)[0]
    qn = np.asarray(q)[0]
    for i in range(g.shape[0]):
        exact = set(b[i][b[i] >= 0].tolist())
        got = set(g[i][g[i] >= 0].tolist())
        missing = exact - got
        # the ONLY allowed divergence is a tie at the k-th boundary
        # reordered by the extraction's distance quantization (~2^-10
        # relative on d2): any missing neighbor must sit within that
        # quantum of the k-th kept distance — a capacity truncation
        # (the thing the occupancy proof forbids) would sit far inside
        kth = bdn[i][b[i] >= 0].max() if exact else 0.0
        for m in missing:
            d = np.linalg.norm(p[m] - qn[i])
            assert d >= kth * (1 - 4e-3), \
                f"query {i}: idx {m} at {d:.6f} < kth {kth:.6f} dropped"


def test_dispatch_routes_small_rows_to_exact(monkeypatch):
    """Mid-size rows route to measured-lossless backends only: small radii
    to the 8-stencil grid (cap 192 >= measured max 2r-cell occupancy),
    everything else to the exact kernel (round 1's recall regression
    surface)."""
    monkeypatch.setattr(neighbors.jax, "default_backend", lambda: "tpu")
    assert neighbors._pick_backend(
        3, 0.04, neighbors.BRUTE_MAX_N) == "grid8"
    assert neighbors._pick_backend(3, 0.04,
                                   neighbors.BRUTE_MAX_N + 1) == "grid"
    assert neighbors.BRUTE_MAX_N >= 18432  # nuScenes real-pad first row
    # unbounded searches (fp interpolation) have no radius to grid on
    assert neighbors._pick_backend(3, None, 23040) == "pallas"
    # radii above GRID8_MAX_R overflow the 2r-cell cap: exact kernel
    assert neighbors._pick_backend(3, 0.1, 23040) == "pallas"
    # tiny rows: grid build overhead isn't worth it
    assert neighbors._pick_backend(3, 0.04, 4096) == "pallas"
    # large radii on mid-size rows overflow any per-cell cap (decoder
    # sgcnn r=0.3 on the KITTI real-pad voxel row): must stay exact
    assert neighbors._pick_backend(3, 0.3, 32768) == "pallas"
    assert neighbors._pick_backend(3, 0.04, 65536) == "grid"
    # env kill-switch
    monkeypatch.setenv("CCN_GRID8", "0")
    assert neighbors._pick_backend(
        3, 0.04, neighbors.BRUTE_MAX_N) == "pallas"


def test_grid8_recall_at_nuscenes_table_row():
    """The flagship 23040-row r=0.04 shared table now rides the 8-stencil
    grid (cap 192 + 2 shared overflow planes).  Seed 3 is the measured
    worst case — one 2r-cell holds 364 points, 239 spill past the cap —
    and the overflow planes (capacity 384) must absorb every spill, so
    recall is lossless, not merely >0.95."""
    rng = np.random.default_rng(3)
    raw, _, curve_id, _ = synthetic_lidar_sweep(rng, 36864, n_beams=32)
    pos = jnp.asarray(raw)[None]
    cid = jnp.asarray(curve_id)[None]
    valid = jnp.ones((1, pos.shape[1]), bool)
    idx, iv = sampling.curve_fps(pos, cid, valid, 0.007, 23040)
    pos = jnp.take_along_axis(pos, idx[..., None], axis=1)
    n_oracle = 768
    qsel = np.sort(rng.choice(int(np.asarray(iv).sum()), n_oracle,
                              replace=False))
    q = pos[:, qsel]
    qv = jnp.ones((1, n_oracle), bool)
    for k in (20, 32):
        gi, _ = grid_knn(q, pos, qv, iv, k, 0.04,
                         cap=neighbors.GRID8_CAP, stencil=8,
                         overflow_planes=2)
        bi, _ = neighbors.knn(q, pos, qv, iv, k, radius=0.04)
        g, b = np.asarray(gi)[0], np.asarray(bi)[0]
        match = total = 0
        for i in range(n_oracle):
            exact = set(b[i][b[i] >= 0].tolist())
            total += len(exact)
            match += len(exact & set(g[i][g[i] >= 0].tolist()))
        recall = match / max(total, 1)
        assert recall > 0.9995, f"grid8 recall {recall:.5f} at k={k}"
