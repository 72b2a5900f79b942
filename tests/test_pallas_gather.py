"""Tile-unique one-hot gather: fwd/bwd parity vs plain take (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.ops import pallas_gather as pg


def _mk(n=1000, q=300, k=7, c=20, seed=0, local=True, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    if local:
        # curve-like locality: neighbors near the query index
        base = np.arange(q)[:, None] * (n // q)
        idx = base + rng.integers(-40, 40, size=(q, k))
        idx = np.clip(idx, 0, n - 1).astype(np.int32)
    else:
        idx = rng.integers(0, n, size=(q, k)).astype(np.int32)
    # sprinkle -1 padding
    idx[rng.random((q, k)) < 0.05] = -1
    src = rng.normal(size=(n, c)).astype(np.float32)
    return jnp.asarray(src).astype(dtype), jnp.asarray(idx.T)  # (K, Q)


@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gather_rows_matches_take(local, dtype):
    src, idx_kq = _mk(local=local, dtype=dtype)
    got = pg.gather_rows(src, idx_kq, interpret=True)
    want = src[jnp.maximum(idx_kq, 0)]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_rows_grad_matches_take():
    src, idx_kq = _mk(dtype=jnp.float32)
    cot = jnp.asarray(
        np.random.default_rng(1).normal(size=idx_kq.shape + (20,))
        .astype(np.float32))

    def f_new(s):
        return jnp.sum(pg.gather_rows(s, idx_kq, interpret=True) * cot)

    def f_ref(s):
        return jnp.sum(s[jnp.maximum(idx_kq, 0)] * cot)

    g_new = jax.grad(f_new)(src)
    g_ref = jax.grad(f_ref)(src)
    # f32 sums accumulate in different orders (MXU collapse vs scatter)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_spill_drops_escapees_and_counts_them():
    # q*k unique values per tile >> UMAX: beyond-budget rows drop to
    # zeros (grid-cap contract) and telemetry counts every one
    from curvecloudnet_tpu.ops import telemetry

    n = pg.UMAX * 40
    rng = np.random.default_rng(2)
    q, k, c = pg.TILE_Q * 2, 24, 8
    idx = rng.choice(n, size=(q, k), replace=False).astype(np.int32)
    src = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    idx_kq = jnp.asarray(idx.T)
    with telemetry.capture() as cap:
        got = np.asarray(pg.gather_rows(src, idx_kq, interpret=True))
        stats = cap.current()
    want = np.asarray(src[idx_kq])
    # every slot is either exact or a dropped zero row, never garbage
    exact = (got == want).all(axis=-1)
    zeroed = (got == 0).all(axis=-1)
    assert (exact | zeroed).all()
    (spill_key,) = [k_ for k_ in stats if k_.startswith("tile_gather_spill")]
    n_dropped_rows = int(stats[spill_key])
    assert n_dropped_rows > 0
    # per tile, exactly the uniques beyond UMAX are dropped
    nt = q // pg.TILE_Q
    expect = sum(
        max(len(np.unique(idx[t * pg.TILE_Q:(t + 1) * pg.TILE_Q])) - pg.UMAX,
            0) for t in range(nt))
    assert n_dropped_rows == expect


def test_split3_exact_roundtrip():
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.uniform(-120, 120, 20000),
                        rng.normal(0, 1e-3, 2000),
                        [0.0, -0.0, 57.25, -101.5]]).astype(np.float32)
    rec = pg.split3(jnp.asarray(x)[:, None])
    back = pg.merge3(rec)
    np.testing.assert_array_equal(np.asarray(back)[:, 0], x)


def test_gather_rows_with_pos_bf16():
    rng = np.random.default_rng(4)
    n, q, k, c = 800, 256, 5, 16
    src = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    pos = jnp.asarray(rng.uniform(-100, 100, size=(n, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(k, q)).astype(np.int32))
    x_nbr, p_nbr = pg.gather_rows_with_pos(src, pos, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(x_nbr), np.asarray(src[idx]))
    # positions reconstruct EXACTLY despite riding as bf16 triplets
    np.testing.assert_array_equal(np.asarray(p_nbr), np.asarray(pos[idx]))


def test_nonfinite_source_rows_do_not_poison_tiles():
    # a garbage row (padded source point) reached through the -1 -> 0
    # clamp: a single non-finite row in a tile's unique set would poison
    # EVERY query in the tile via 0 * inf without the sanitize
    rng = np.random.default_rng(5)
    n, q, k, c = 600, 128, 4, 8
    src = rng.normal(size=(n, c)).astype(np.float32)
    src[0] = np.inf
    idx = rng.integers(1, n, size=(q, k)).astype(np.int32)
    idx[rng.random((q, k)) < 0.1] = -1          # padded slots clamp to 0
    got = np.asarray(pg.gather_rows(jnp.asarray(src), jnp.asarray(idx.T),
                                    interpret=True))
    assert np.isfinite(got).all()
    valid = (idx.T >= 0)
    np.testing.assert_array_equal(got[valid], src[idx.T[valid]])


def test_edge_row_unique_margin():
    """The shipped UMAX budget holds with margin at flagship-like edge
    rows (self-row kNN over curve-ordered realistic synthetic lidar) —
    the contract behind dropping the runtime spill fallback."""
    from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
    from curvecloudnet_tpu.ops import sampling

    rng = np.random.default_rng(0)
    pos, _, cid, valid, _ = synthetic_lidar_batch(rng, 1, 12288)
    sel, sval = sampling.curve_fps(
        jnp.asarray(pos), jnp.asarray(cid), jnp.asarray(valid),
        arclen_spacing=0.007, budget=7680)
    p = np.asarray(jnp.take_along_axis(jnp.asarray(pos), sel[..., None],
                                       axis=1))[0]
    ok = np.asarray(sval)[0]
    p = p[ok]
    n, k = len(p), 21
    idx = np.zeros((n, k), np.int32)
    for s in range(0, n, 2048):
        d = ((p[s:s + 2048, None, :] - p[None, :, :]) ** 2).sum(-1)
        idx[s:s + 2048] = np.argpartition(d, k, axis=1)[:, :k]
    t = pg.TILE_Q
    worst = max(len(np.unique(idx[i:i + t].ravel()))
                for i in range(0, n - t + 1, t))
    # >=25% headroom below the budget at the densest tile
    assert worst <= pg.UMAX * 0.75, worst
    assert pg.TILE_Q <= 128  # larger tiles measured over-budget here
