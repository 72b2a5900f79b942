"""Grid-hash kNN vs brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.ops import neighbors
from curvecloudnet_tpu.ops.grid_knn import grid_knn


@pytest.mark.parametrize("radius,k", [(0.3, 8), (0.15, 4)])
def test_grid_knn_matches_bruteforce(rng, radius, k):
    b, q_n, n = 2, 128, 400
    # spread points so per-cell occupancy stays under the cap
    points = rng.uniform(-2, 2, size=(b, n, 3)).astype(np.float32)
    query = points[:, :q_n] + rng.normal(0, 0.02, (b, q_n, 3)).astype(
        np.float32)
    qv = rng.random((b, q_n)) > 0.1
    pv = rng.random((b, n)) > 0.1

    idx_g, dist_g = grid_knn(jnp.array(query), jnp.array(points),
                             jnp.array(qv), jnp.array(pv), k, radius, cap=32)
    idx_b, dist_b = neighbors.knn(jnp.array(query), jnp.array(points),
                                  jnp.array(qv), jnp.array(pv), k,
                                  radius=radius)
    d_g, d_b = np.asarray(dist_g), np.asarray(dist_b)
    finite_b = d_b < 1e20
    finite_g = d_g < 1e20
    np.testing.assert_array_equal(finite_g, finite_b)
    # brute force computes |a|^2+|b|^2-2ab (catastrophic cancellation at
    # small distances); grid computes (a-b)^2 directly -> ~1e-4 abs skew
    np.testing.assert_allclose(d_g[finite_g], d_b[finite_b], rtol=5e-2,
                               atol=3e-4)
    # neighbor sets coincide as sets of distances; indices match where the
    # distances are unique
    assert (np.asarray(idx_g)[finite_g] >= 0).all()


def test_grid_knn_radius_strict(rng):
    b, n = 1, 300
    points = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    v = np.ones((b, n), bool)
    idx, dist = grid_knn(jnp.array(points), jnp.array(points),
                         jnp.array(v), jnp.array(v), 8, 0.25, cap=32)
    d = np.asarray(dist)
    i = np.asarray(idx)
    assert (d[i >= 0] <= 0.25 + 1e-6).all()
    # self is always the nearest in-radius neighbor
    np.testing.assert_array_equal(i[0, :, 0], np.arange(n))


def test_grid_knn_no_invalid_neighbors(rng):
    b, n = 1, 200
    points = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    pv = np.zeros((b, n), bool)
    pv[:, :50] = True
    qv = np.ones((b, n), bool)
    idx, _ = grid_knn(jnp.array(points), jnp.array(points),
                      jnp.array(qv), jnp.array(pv), 6, 0.5, cap=32)
    i = np.asarray(idx)
    assert (i < 50).all()  # -1 or a valid index < 50


@pytest.mark.parametrize("idx_bound", [0, 10001])
def test_grid_topk_records_kernel_matches_xla_tail(rng, idx_bound):
    """The fused Pallas grid tail (distances+mask+extraction off raw record
    rows, ops/pallas_topk.grid_topk_records) == the XLA tail it replaces,
    in interpreter mode on synthetic bucket rows.  Covers both payload
    schemes: col+ival pass (idx_bound=0) and one-pass index payload."""
    from curvecloudnet_tpu.ops import pallas_topk

    q_n, cap, ncells, k, radius = 96, 16, 27, 8, 0.3
    w = ncells * cap
    # synthetic record rows: mixture of valid points near the query and
    # INF/-1 fills, in the table's channel-major [x*cap,y*cap,z*cap,i*cap]
    query = rng.uniform(-1, 1, (q_n, 3)).astype(np.float32)
    q_valid = rng.random(q_n) > 0.1
    rows = np.empty((q_n, ncells, 4 * cap), np.float32)
    # biased index encoding (grid_knn._decode_idx): 0x40000000 | (idx+1);
    # empty slot = the biased zero (2.0f)
    enc = lambda pid: np.frombuffer(  # noqa: E731
        np.int32(0x40000000 | (pid + 1)).tobytes(), np.float32)[0]
    for i in range(q_n):
        for c in range(ncells):
            for j in range(cap):
                if rng.random() < 0.5:
                    p = query[i] + rng.normal(0, 0.25, 3)
                    pid = rng.integers(0, 10000)
                    rows[i, c, j::cap] = [*p.astype(np.float32), enc(pid)]
                else:
                    rows[i, c, j::cap] = [1e30, 1e30, 1e30, 2.0]
    # one synthetic bucket row per (query, cell) so the table gather is
    # the identity mapping
    table = jnp.asarray(rows.reshape(q_n * ncells, 4 * cap))
    nbr_buckets = jnp.arange(q_n * ncells, dtype=jnp.int32).reshape(
        q_n, ncells)
    got_d, got_i = pallas_topk.grid_topk_records(
        table, nbr_buckets, jnp.asarray(query), jnp.asarray(q_valid), k,
        cap, radius, idx_bound=idx_bound, interpret=True)

    # XLA reference tail (mirrors ops/grid_knn.py's unfused branch)
    c4 = rows.reshape(q_n, ncells, 4, cap)
    d2 = ((c4[:, :, 0] - query[:, None, 0:1]) ** 2
          + (c4[:, :, 1] - query[:, None, 1:2]) ** 2
          + (c4[:, :, 2] - query[:, None, 2:3]) ** 2)
    cidx = (c4[:, :, 3].view(np.int32) & 0x7FFFFF) - 1
    good = (cidx >= 0) & q_valid[:, None, None] & (d2 <= radius * radius)
    d2 = np.where(good, d2, 1e30).reshape(q_n, w)
    cidx = cidx.reshape(q_n, w)
    order = np.argsort(d2, axis=-1, kind="stable")[:, :k]
    want_d = np.take_along_axis(d2, order, axis=-1)
    want_i = np.where(want_d < 1e29,
                      np.take_along_axis(cidx, order, axis=-1), -1)

    gd, gi = np.asarray(got_d), np.asarray(got_i)
    np.testing.assert_array_equal(gi >= 0, want_i >= 0)
    finite = want_i >= 0
    # packed extraction quantizes the low bits of d2
    np.testing.assert_allclose(gd[finite], want_d[finite], rtol=2e-2,
                               atol=1e-5)
    match = (gi[finite] == want_i[finite]).mean()
    assert match > 0.95, f"index agreement {match}"


def test_colliding_stencil_rows_do_not_duplicate_candidates():
    """Force heavy stencil-bucket hash collisions (tiny hash table) with a
    cap large enough that no row truncates: the grid must still return
    exactly the brute neighbor sets.  Without the per-query row dedup, a
    collision fetches the same table row twice and its points occupy two
    top-k slots, evicting genuine neighbors."""
    import numpy as np
    from curvecloudnet_tpu.ops import neighbors
    from curvecloudnet_tpu.ops.grid_knn import grid_knn

    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(-1, 1, (1, 512, 3)).astype(np.float32))
    valid = jnp.ones((1, 512), bool)
    # hash_bits=4 -> 16 buckets for 27 stencil cells: collisions certain
    gi, _ = grid_knn(pos, pos, valid, valid, 8, 0.4, cap=512,
                     hash_bits=4, overflow_planes=0)
    bi, bd = neighbors.knn(pos, pos, valid, valid, 8, radius=0.4)
    g, b = np.asarray(gi)[0], np.asarray(bi)[0]
    p = np.asarray(pos)[0]
    bdn = np.asarray(bd)[0]
    for i in range(g.shape[0]):
        exact = set(b[i][b[i] >= 0].tolist())
        got = set(g[i][g[i] >= 0].tolist())
        # only near-ties at the k-th boundary may differ (the two methods
        # compute d2 via different FP paths: q2+p2-2qp vs direct diffs);
        # a duplicate-eviction would drop a neighbor strictly inside
        kth = bdn[i][b[i] >= 0].max() if exact else 0.0
        for m in exact - got:
            d = np.linalg.norm(p[m] - p[i])
            assert d >= kth * (1 - 1e-4), \
                f"query {i}: idx {m} at {d:.6f} < kth {kth:.6f} evicted"
