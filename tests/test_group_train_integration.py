"""Train megakernel module integration == materialized XLA train path.

CCN_FUSED_GROUP_TRAIN=interp routes CurveSAStep / SAStep / EdgeConvStep
training through ops/pallas_group_train.py (interpret mode on CPU); the
outputs, parameter gradients, AND updated running statistics must match
the default materialized path (reference pointnet2.py:146-181,
point_conv.py:60-93, dgcnn.py:158-207 train semantics).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.models import cloud_from_arrays
from curvecloudnet_tpu.models.modules import (CurveSAStep, EdgeConvStep,
                                              SAStep)
from curvecloudnet_tpu.models.spec import ModelSpec, StepSpec


def _cloud(n=512):
    rng = np.random.default_rng(0)
    pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, 2, n)
    return cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                             jnp.asarray(valid), jnp.asarray(feat))


def _setup(kind, aggr):
    cloud = _cloud()
    if kind == "sageo":
        step = StepSpec(name="sa-geo", feat_dims=(16, 24, 32), radius=0.02,
                        curve_fps_arclen=0.007, use_curve_fps=True,
                        aggr_type=aggr, normalize_radius=True, with_xyz=True,
                        curve_window=12)
        spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                         skip_connect_state_store=())
        mod = CurveSAStep(spec, step, (7, 16, 24, 32), budget=256)
    elif kind == "sa":
        step = StepSpec(name="sa", feat_dims=(16, 32), knn=8, radius=0.25,
                        aggr_type=aggr, normalize_radius=True,
                        downsample_type="fps", ratio=0.5, use_fast_knn=True)
        spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                         version=2.0, skip_connect_state_store=())
        mod = SAStep(spec, step, (7, 16, 32), budget=256)
    else:  # edge
        step = StepSpec(name="sgcnn", feat_dims=(16, 24), knn=6, radius=0.3,
                        with_xyz=True, aggr_type=aggr)
        spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                         skip_connect_state_store=())
        mod = EdgeConvStep(spec, step, (14, 16, 24))
    vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, train=False,
                  key=jax.random.PRNGKey(1))
    return mod, vs, cloud


@pytest.mark.parametrize("kind,aggr", [
    ("sageo", "attend"), ("sageo", "max"),
    ("sa", "attend"), ("sa", "max"),
    ("edge", "max"),
])
def test_fused_train_matches_materialized(kind, aggr):
    mod, vs, cloud = _setup(kind, aggr)
    key = jax.random.PRNGKey(1)

    def run(mode):
        os.environ["CCN_FUSED_GROUP_TRAIN"] = mode
        if kind == "edge":
            # the train kernel branch nests inside the split-edge path
            os.environ["CCN_SPLIT_EDGE"] = "force"

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
        os.environ["CCN_FUSED_GROUP_TRAIN"] = "sageo,sa,edge"
        os.environ["CCN_SPLIT_EDGE"] = "auto"
        return val, updates, grads

    try:
        val_r, upd_r, g_r = run("0")
        val_k, upd_k, g_k = run("interp")
    finally:
        os.environ["CCN_FUSED_GROUP_TRAIN"] = "sageo,sa,edge"
        os.environ["CCN_SPLIT_EDGE"] = "auto"
    np.testing.assert_allclose(float(val_k), float(val_r), rtol=1e-4)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(upd_r["batch_stats"])[0],
            jax.tree_util.tree_flatten_with_path(upd_k["batch_stats"])[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"batch_stats at {kp}")
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_r)[0],
            jax.tree_util.tree_flatten_with_path(g_k)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-4,
                                   err_msg=f"grad at {kp}")
