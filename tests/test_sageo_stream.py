"""Streaming sa-geo (chunked window + online softmax) == materialized path.

The eval fast path walks the geodesic candidate window in chunks with
online-softmax aggregation instead of materializing (B, M, 2w+1, C)
messages; this pins numerical equivalence (same mask fills, softmax merely
reassociated).  Reference semantics: pointnet2.py:158-181 + point_conv.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.models import cloud_from_arrays
from curvecloudnet_tpu.models.modules import CurveSAStep
from curvecloudnet_tpu.models.spec import ModelSpec, StepSpec


def _setup(aggr):
    rng = np.random.default_rng(0)
    pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, 2, 512)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.asarray(valid), jnp.asarray(feat))
    step = StepSpec(name="sa-geo", feat_dims=(16, 32), radius=0.02,
                    curve_fps_arclen=0.007, use_curve_fps=True,
                    aggr_type=aggr, normalize_radius=True, with_xyz=True,
                    curve_window=12)
    spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     skip_connect_state_store=())
    mod = CurveSAStep(spec, step, (7, 16, 32), budget=256)
    vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, train=False,
                  key=jax.random.PRNGKey(1))
    return mod, vs, cloud


@pytest.mark.parametrize("aggr", ["attend", "max"])
def test_stream_matches_materialized(aggr):
    mod, vs, cloud = _setup(aggr)
    kw = dict(train=False, key=jax.random.PRNGKey(1))
    try:
        os.environ["CCN_STREAM_SAGEO"] = "0"
        ref = mod.apply(vs, cloud, **kw)
        os.environ["CCN_STREAM_SAGEO"] = "force"
        out = mod.apply(vs, cloud, **kw)
    finally:
        os.environ["CCN_STREAM_SAGEO"] = "auto"
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.valid),
                                  np.asarray(ref.valid))


@pytest.mark.parametrize("aggr", ["attend", "max"])
def test_fused_group_matches_materialized(aggr):
    """Eval megakernel path (ops/pallas_group.py, interpreter mode) ==
    materialized path.  BN folding reassociates the affine, so tolerance is
    looser than the stream test but still tight in f32."""
    mod, vs, cloud = _setup(aggr)
    kw = dict(train=False, key=jax.random.PRNGKey(1))
    try:
        os.environ["CCN_FUSED_GROUP"] = "0"
        ref = mod.apply(vs, cloud, **kw)
        os.environ["CCN_FUSED_GROUP"] = "interp"
        out = mod.apply(vs, cloud, **kw)
    finally:
        os.environ["CCN_FUSED_GROUP"] = "1"
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.valid),
                                  np.asarray(ref.valid))


@pytest.mark.parametrize("aggr", ["attend", "max"])
def test_train_stream_matches_materialized(aggr):
    """Train mode: outputs, updated running stats, AND parameter gradients
    must match (the chunked two-pass BN statistics are differentiable, so
    the gradient path is mathematically identical)."""
    mod, vs, cloud = _setup(aggr)
    key = jax.random.PRNGKey(1)

    def run(mode):
        os.environ["CCN_STREAM_SAGEO"] = mode

        def loss(params):
            out, updates = mod.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                cloud, train=True, key=key, bn_momentum=0.2,
                mutable=["batch_stats"])
            return jnp.sum(jnp.where(out.valid[..., None],
                                     out.x.astype(jnp.float32), 0.0) ** 2), \
                updates

        (val, updates), grads = jax.value_and_grad(loss, has_aux=True)(
            vs["params"])
        os.environ["CCN_STREAM_SAGEO"] = "auto"
        return val, updates, grads

    try:
        val_r, upd_r, g_r = run("0")
        val_s, upd_s, g_s = run("force")
    finally:
        os.environ["CCN_STREAM_SAGEO"] = "auto"
    np.testing.assert_allclose(float(val_s), float(val_r), rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        upd_s["batch_stats"], upd_r["batch_stats"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4),
        g_s, g_r)
