"""DP-sharded eval step matches single-device logits on the 8-dev mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from curvecloudnet_tpu.models import CurveCloudNet, parse_model_config
from curvecloudnet_tpu.parallel import make_mesh, shard_batch
from curvecloudnet_tpu.parallel.mesh import sharded_eval_step
from curvecloudnet_tpu.train import (
    Batch, LossConfig, create_train_state, make_schedule,
)
from curvecloudnet_tpu.train.trainer import make_eval_step
from tests.test_train_e2e import TINY_MODEL, make_setup


def test_sharded_eval_matches_single():
    model, ds, batch = make_setup(batch=8)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, batch, key,
                               make_schedule(None, 1e-3, 10))
    cfg = LossConfig(task="segmentation", ignore_index=0)

    single = make_eval_step(model, cfg)
    logits_a, valid_a, loss_a = single(state, batch)

    mesh = make_mesh(8)
    from curvecloudnet_tpu.train.trainer import make_eval_step as _mk

    def raw_eval(state, batch):
        logits, ov = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.cloud, batch.categories, train=False,
            key=jax.random.PRNGKey(0))
        from curvecloudnet_tpu.train.trainer import _compute_loss
        return logits, ov, _compute_loss(logits, ov, batch, cfg, None)

    sharded = sharded_eval_step(raw_eval, mesh)
    logits_b, valid_b, loss_b = sharded(state, shard_batch(batch, mesh))

    np.testing.assert_array_equal(np.asarray(valid_a), np.asarray(valid_b))
    va = np.asarray(valid_a)
    np.testing.assert_allclose(np.asarray(logits_a)[va],
                               np.asarray(logits_b)[va], rtol=2e-4,
                               atol=2e-4)
    assert abs(float(loss_a) - float(loss_b)) < 1e-4
