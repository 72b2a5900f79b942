"""Stage budgets must hold on flagship configs (round-2 verdict weak #7).

The TPU redesign replaces data-dependent downsample sizes with static
budgets + masks; a budget smaller than what the sampler actually keeps
silently truncates points.  This asserts ZERO overflow for every stage of
the shipped nuScenes flagship on realistic synthetic sweeps (keep
fractions are spacing-distribution properties, so a smaller row measures
the same rates as the 36864 pad — see tools/budget_audit.py for the
full-scale run).
"""

import numpy as np
import jax
import jax.numpy as jnp

from curvecloudnet_tpu.config import load_config
from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.models import (CurveCloudNet, cloud_from_arrays,
                                      parse_model_config)
from curvecloudnet_tpu.ops import telemetry


def test_flagship_budgets_zero_overflow():
    cfg = load_config("configs/nuscenes.yaml")
    # keep POINTS PER BEAM at the flagship operating point (36864/32=1152)
    # — along-curve spacing scales with it, and spacing drives the
    # curve-fps keep fraction the budget must cover
    n_pad, n_beams = 4608, 4
    spec = parse_model_config(cfg["model"], in_dim=4, n_out=17)
    model = CurveCloudNet(spec, n_points=n_pad)
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(0)

    worst = {}
    for s in range(2):
        pos, feat, cid, valid, _ = synthetic_lidar_batch(
            rng, 1, n_pad, n_beams=n_beams)
        cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                                  jnp.asarray(valid), jnp.asarray(feat))
        if s == 0:
            variables = model.init({"params": key, "dropout": key}, cloud,
                                   train=False, key=key)
        with telemetry.capture() as cap:
            model.apply(variables, cloud, train=False,
                        key=jax.random.PRNGKey(0))
            stats = {k: float(np.asarray(v)) for k, v in cap.current().items()}
        for k, v in stats.items():
            worst[k] = max(worst.get(k, 0.0), v)

    overflows = {k: v for k, v in worst.items()
                 if "overflow" in k and v > 0}
    assert not overflows, f"stage budget overflow: {overflows}"
