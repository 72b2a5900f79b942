"""Flat (B, M*K, C) edge-MLP form == rank-4 (B, M, K, C) form.

The flat form reshapes the gathered first-layer output to 2-minor rows so
every subsequent Dense lowers to a plain matmul instead of an MXU-starved
b0f 1x1 conv (reference dgcnn.py:158-207 materializes the rank-4 concat).
The math is the identical contraction + the identical BN element set, so
outputs and BN batch stats must match bitwise-closely in f32.
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


def _cloud(seed=0, n=384, b=2):
    rng = np.random.default_rng(seed)
    pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, b, n)
    return cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                             jnp.asarray(valid), jnp.asarray(feat))


@pytest.mark.parametrize("train,aggr", [(False, "max"), (True, "max"),
                                        (False, "attend")])
def test_flat_edge_matches_rank4(train, aggr):
    cloud = _cloud()
    step = StepSpec(name="sgcnn", feat_dims=(16, 24), knn=6, radius=0.3,
                    with_xyz=True, aggr_type=aggr)
    spec = ModelSpec(in_dim=4, n_out=4, steps=(step,), out_mlp_dims=(8,),
                     use_bias=True, skip_connect_state_store=())
    mod = EdgeConvStep(spec, step, (14, 16, 24))
    vs = mod.init({"params": jax.random.PRNGKey(0)}, cloud, train=False)
    kw = dict(train=train, bn_momentum=0.1)
    if train:
        kw["mutable"] = ["batch_stats"]
    try:
        # the flat path nests inside the split-edge branch; force both on
        os.environ["CCN_SPLIT_EDGE"] = "force"
        os.environ["CCN_EDGE_FLAT"] = "0"
        ref = mod.apply(vs, cloud, **kw)
        os.environ["CCN_EDGE_FLAT"] = "force"
        out = mod.apply(vs, cloud, **kw)
    finally:
        os.environ["CCN_SPLIT_EDGE"] = "auto"
        os.environ["CCN_EDGE_FLAT"] = "auto"
    if train:
        (ref, ref_bs), (out, out_bs) = ref, out
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(ref_bs)[0],
                jax.tree_util.tree_flatten_with_path(out_bs)[0]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=str(kp))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=2e-5, atol=2e-5)
