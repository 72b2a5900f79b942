"""Matmul-before-gather edge path == materialized concat path.

The first sgcnn/dgcnn layer re-associates [x_j, x_i-x_j] @ W into
gather(x @ (Wt-Wb)) + (x @ Wb + b) via three calls to the same lin_0 Dense
(reference dgcnn.py:158-207 materializes the concat).  Pins numerical
equivalence on both message orders and bias settings.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.models import cloud_from_arrays
from curvecloudnet_tpu.models.modules import EdgeConvStep
from curvecloudnet_tpu.models.spec import ModelSpec, StepSpec


@pytest.mark.parametrize("sparse_agg,use_bias,aggr",
                         [(False, False, "max"), (True, True, "max"),
                          (False, True, "attend")])
def test_split_edge_matches_concat(sparse_agg, use_bias, aggr):
    rng = np.random.default_rng(0)
    pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, 2, 384)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.asarray(valid), jnp.asarray(feat))
    step = StepSpec(name="sgcnn", feat_dims=(16, 24), knn=6, radius=0.3,
                    with_xyz=True, aggr_type=aggr,
                    use_sparse_feat_agg=sparse_agg)
    spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     use_bias=use_bias, skip_connect_state_store=())
    mod = EdgeConvStep(spec, step, (14, 16, 24))
    vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, train=False)
    try:
        os.environ["CCN_SPLIT_EDGE"] = "0"
        ref = mod.apply(vs, cloud, train=False)
        os.environ["CCN_SPLIT_EDGE"] = "force"
        out = mod.apply(vs, cloud, train=False)
    finally:
        os.environ["CCN_SPLIT_EDGE"] = "auto"
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=2e-5, atol=2e-5)


def test_split_edge_param_tree_unchanged():
    """The split path must create the identical parameter tree (the torch
    checkpoint name map depends on nn/lin_0/kernel)."""
    rng = np.random.default_rng(1)
    pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, 1, 128)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.asarray(valid), jnp.asarray(feat))
    step = StepSpec(name="sgcnn", feat_dims=(16,), knn=4, radius=0.3,
                    with_xyz=True)
    spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     skip_connect_state_store=())
    mod = EdgeConvStep(spec, step, (14, 16))
    trees = {}
    for mode in ("0", "force"):
        os.environ["CCN_SPLIT_EDGE"] = mode
        vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, train=False)
        trees[mode] = jax.tree_util.tree_structure(vs["params"])
        os.environ["CCN_SPLIT_EDGE"] = "auto"
    assert trees["0"] == trees["force"]
