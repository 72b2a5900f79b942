"""Parity tests for the grouped message-MLP + aggregation megakernel.

The kernel (ops/pallas_group.py) must match the unfused composition the
modules use today: layer-0 BN affine -> act -> Dense stack (BN folded) ->
masked max / attention-softmax aggregation (ops/aggregate.py).
Runs in interpreter mode on CPU; tools/tpu_smoke.py covers compiled form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvecloudnet_tpu.ops import aggregate, pallas_group


def _ref_apply(h1, mask, aff, loc, att, aggr, act_name="leaky_relu"):
    """Unfused reference of exactly what the kernel computes."""
    cdt = h1.dtype
    act = {"relu": lambda v: jnp.maximum(v, 0.0),
           "leaky_relu": lambda v: jnp.where(v > 0, v, 0.01 * v)}[act_name]

    def run_denses(h, denses):
        n = len(denses)
        for li, (w, b) in enumerate(denses):
            h = jnp.einsum("mkc,cd->mkd", h.astype(cdt), w.astype(cdt),
                           preferred_element_type=jnp.float32)
            h = (h + b).astype(cdt)
            if li < n - 1:
                h = act(h)
        return h

    s, t = aff
    h = (h1.astype(jnp.float32) * s + t).astype(cdt)
    h = act(h)
    msg = run_denses(h, loc)
    if aggr == "max":
        return jnp.max(jnp.where(mask[..., None], msg.astype(jnp.float32),
                                 aggregate.MAX_FILL), axis=1)
    logits = run_denses(msg, att)
    logits = jnp.where(mask[..., None], logits,
                       aggregate.ATTEND_FILL).astype(jnp.float32)
    mx = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - mx)
    return jnp.sum(e * msg.astype(jnp.float32), axis=1) / jnp.sum(e, axis=1)


def _make(m=200, k=10, c1=8, dims=(16, 24), att_dims=(12,), seed=0,
          dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    h1 = jnp.asarray(rng.randn(1, m, k, c1), dtype)
    mask = jnp.asarray(rng.rand(1, m, k) > 0.3)
    aff = (jnp.asarray(rng.rand(c1) + 0.5, jnp.float32),
           jnp.asarray(rng.randn(c1) * 0.1, jnp.float32))
    loc, prev = [], c1
    for d in dims:
        loc.append((jnp.asarray(rng.randn(prev, d) / np.sqrt(prev), dtype),
                    jnp.asarray(rng.randn(d) * 0.1, jnp.float32)))
        prev = d
    att = []
    for d in tuple(att_dims) + (dims[-1],):
        att.append((jnp.asarray(rng.randn(prev, d) / np.sqrt(prev), dtype),
                    jnp.asarray(rng.randn(d) * 0.1, jnp.float32)))
        prev = d
    return h1, mask, aff, tuple(loc), tuple(att)


@pytest.mark.parametrize("aggr", ["max", "attend"])
@pytest.mark.parametrize("k", [10, 15])          # 10 -> k_planes 5, 15 -> 5
def test_group_reduce_matches_reference(aggr, k):
    h1, mask, aff, loc, att = _make(k=k)
    got = pallas_group.fused_group_reduce(
        h1, mask, aff, loc, att if aggr == "attend" else None,
        aggr=aggr, interpret=True)
    want = _ref_apply(h1[0], mask[0], aff, loc, att, aggr)[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("aggr", ["max", "attend"])
def test_group_reduce_k_major_matches_query_major(aggr):
    """Position-major inputs (h1 (B,K,M,C), mask (B,K,M)) == query-major:
    the kernel compute is identical, only the caller-side transpose moves."""
    h1, mask, aff, loc, att = _make(k=10)
    want = pallas_group.fused_group_reduce(
        h1, mask, aff, loc, att if aggr == "attend" else None,
        aggr=aggr, interpret=True)
    got = pallas_group.fused_group_reduce(
        jnp.moveaxis(h1, 2, 1), mask, aff, loc,
        att if aggr == "attend" else None,
        aggr=aggr, interpret=True, k_major=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_window_slice_k_major_matches_transpose():
    """curve1d k-major window gather == moveaxis of the query-major one."""
    from curvecloudnet_tpu.ops import curve1d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 5), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 64, (2, 17)), jnp.int32)
    qm = curve1d.window_slice(x, idx, 3)
    km = curve1d.window_slice(x, idx, 3, k_major=True)
    np.testing.assert_array_equal(np.asarray(km),
                                  np.asarray(jnp.moveaxis(qm, 2, 1)))
    # ascending k-major gather == inverse-interleave of the interleaved one
    gi = curve1d.gather_window_features(x, idx, 3)
    ga = curve1d.gather_window_features(x, idx, 3, k_major=True)
    np.testing.assert_array_equal(
        np.asarray(jnp.moveaxis(ga, 1, 2)),
        np.asarray(curve1d.ascending_from_interleaved(
            jnp.moveaxis(gi, -1, -2), 3)).swapaxes(-1, -2))


def test_group_reduce_unaligned_k_and_m():
    # K=7 forces zero-padded planes; M=137 forces query padding
    h1, mask, aff, loc, att = _make(m=137, k=7)
    got = pallas_group.fused_group_reduce(h1, mask, aff, loc, att,
                                          aggr="attend", interpret=True)
    want = _ref_apply(h1[0], mask[0], aff, loc, att, "attend")[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_group_reduce_all_masked_row_finite():
    h1, mask, aff, loc, att = _make(m=64, k=10)
    mask = mask.at[0, 3].set(False)
    got = pallas_group.fused_group_reduce(h1, mask, aff, loc, att,
                                          aggr="attend", interpret=True)
    assert bool(jnp.all(jnp.isfinite(got)))
    want = _ref_apply(h1[0], mask[0], aff, loc, att, "attend")[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_group_reduce_bf16():
    h1, mask, aff, loc, att = _make(dtype=jnp.bfloat16)
    got = pallas_group.fused_group_reduce(h1, mask, aff, loc, att,
                                          aggr="attend", interpret=True)
    want = _ref_apply(h1[0], mask[0], aff, loc, att, "attend")[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


def _lidar_cloud(n=384, b=2, seed=0):
    from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
    from curvecloudnet_tpu.models import cloud_from_arrays

    rng = np.random.default_rng(seed)
    pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, b, n)
    return cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                             jnp.asarray(valid), jnp.asarray(feat))


@pytest.mark.parametrize("aggr", ["max", "attend"])
def test_edgeconv_fused_matches_unfused(aggr):
    """EdgeConvStep eval megakernel (interp) == split-matmul XLA path."""
    import os

    from curvecloudnet_tpu.models.modules import EdgeConvStep
    from curvecloudnet_tpu.models.spec import ModelSpec, StepSpec

    cloud = _lidar_cloud()
    step = StepSpec(name="sgcnn", feat_dims=(16, 24, 24), knn=6, radius=0.3,
                    with_xyz=True, aggr_type=aggr)
    spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     skip_connect_state_store=())
    mod = EdgeConvStep(spec, step, (14, 16, 24, 24))
    vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, train=False)
    try:
        os.environ["CCN_SPLIT_EDGE"] = "force"
        os.environ["CCN_FUSED_GROUP"] = "0"
        ref = mod.apply(vs, cloud, train=False)
        os.environ["CCN_FUSED_GROUP"] = "interp"
        out = mod.apply(vs, cloud, train=False)
    finally:
        os.environ["CCN_SPLIT_EDGE"] = "auto"
        os.environ["CCN_FUSED_GROUP"] = "1"
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("version", [1.0, 2.0])
def test_sastep_fused_matches_unfused(version):
    """SAStep (PointNetConv2 attend, both attend-MLP widths) megakernel ==
    unfused; exercises the k=knn subset grouping path."""
    import os

    from curvecloudnet_tpu.models.modules import SAStep
    from curvecloudnet_tpu.models.spec import ModelSpec, StepSpec

    cloud = _lidar_cloud()
    step = StepSpec(name="sa", feat_dims=(16, 24), knn=8, radius=0.3,
                    ratio=0.5, downsample_type="random", aggr_type="attend",
                    normalize_radius=True, use_fast_knn=True)
    spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     version=version, skip_connect_state_store=())
    mod = SAStep(spec, step, (7, 16, 24), budget=192)
    kw = dict(train=False, key=jax.random.PRNGKey(3))
    vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, **kw)
    try:
        os.environ["CCN_FUSED_GROUP"] = "0"
        ref = mod.apply(vs, cloud, **kw)
        os.environ["CCN_FUSED_GROUP"] = "interp"
        out = mod.apply(vs, cloud, **kw)
    finally:
        os.environ["CCN_FUSED_GROUP"] = "1"
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-4)


def test_fold_mlp_eval_matches_module():
    """Folded affine/dense params reproduce the eval-mode MLP forward."""
    from curvecloudnet_tpu.models.layers import MLP

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 50, 12, 8), jnp.float32)
    mask = jnp.asarray(rng.rand(1, 50, 12) > 0.2)
    mlp = MLP((8, 16, 24, 20), act="leaky_relu", use_bias=False)
    params = mlp.init(jax.random.PRNGKey(0), x, mask=mask, train=False)
    # perturb batch stats away from init so the fold is non-trivial
    params = jax.tree.map(
        lambda a: a + 0.3 * jnp.asarray(
            np.random.RandomState(5).rand(*a.shape), a.dtype), params)
    want = mlp.apply(params, x, mask=mask, train=False)
    h1 = mlp.apply(params, x, mask=mask, train=False, upto=0)

    aff, denses = pallas_group.fold_mlp_eval(
        params["params"], params["batch_stats"], n_layers=3)
    act = lambda v: jnp.where(v > 0, v, 0.01 * v)
    h = act(h1 * aff[0] + aff[1])
    for li, (w, b) in enumerate(denses):
        h = h @ w + b
        if li < len(denses) - 1:
            h = act(h)
    np.testing.assert_allclose(np.asarray(h), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    full = pallas_group.fold_full_mlp_eval(
        params["params"], params["batch_stats"], n_layers=3)
    h = x
    for li, (w, b) in enumerate(full):
        h = h @ w + b
        if li < len(full) - 1:
            h = act(h)
    np.testing.assert_allclose(np.asarray(h), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
