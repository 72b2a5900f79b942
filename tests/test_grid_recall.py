"""Grid-kNN recall vs exact search on realistic lidar density.

Quantifies the cap-truncation approximation (docs/DEVIATIONS.md #4) at the
flagship's operating points: recall of the exact in-radius k-nearest set.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.data.synthetic import synthetic_lidar_sweep
from curvecloudnet_tpu.ops import neighbors
from curvecloudnet_tpu.ops.grid_knn import grid_knn


@pytest.mark.parametrize("radius,k,floor", [(0.04, 20, 0.97),
                                            (0.08, 20, 0.93)])
def test_grid_recall_on_lidar(radius, k, floor):
    rng = np.random.default_rng(0)
    pos, _, _, _ = synthetic_lidar_sweep(rng, 8192, n_beams=32)
    pos = jnp.asarray(pos)[None]
    v = jnp.ones((1, pos.shape[1]), bool)

    cap = max(16, int(1.6 * k))  # the dispatch default (neighbors.knn)
    gi, gd = grid_knn(pos, pos, v, v, k, radius, cap=cap)
    bi, bd = neighbors.knn(pos, pos, v, v, k, radius=radius)

    g = np.asarray(gi)[0]
    b = np.asarray(bi)[0]
    # per-query recall of the exact neighbor set
    recalls = []
    for q in range(0, g.shape[0], 7):
        exact = set(b[q][b[q] >= 0].tolist())
        if not exact:
            continue
        got = set(g[q][g[q] >= 0].tolist())
        recalls.append(len(exact & got) / len(exact))
    mean_recall = float(np.mean(recalls))
    assert mean_recall > floor, mean_recall
