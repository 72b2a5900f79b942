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
                 if ("overflow" in k or "truncated" in k) and v > 0}
    assert not overflows, f"stage budget overflow: {overflows}"
    # the shipped curve_window must hold the measured per-query neighbor
    # demand with margin (the sa-geo kernels pay per window slot, so the
    # window is calibrated tight — see configs/nuscenes.yaml)
    w = next(s for s in cfg["model"]["steps"]
             if s["step_name"] == "sa-geo").get("curve_window", 32)
    assert worst.get("curve_window_wanted_max", 0.0) <= w, worst


def test_curve_window_equivalence():
    """A calibrated (small) candidate window keeps EXACTLY the same
    neighbor set as an oversized one at the flagship sa-geo operating
    point: the interleaved near-to-far slot order of a 2w+1 window is a
    prefix of any larger window's, so the kept sets can only differ when
    the small window truncates — which the telemetry counter flags."""
    from curvecloudnet_tpu.ops import curve1d, sampling

    rng = np.random.default_rng(7)
    n = 6144
    pos, _, cid, valid, _ = synthetic_lidar_batch(rng, 1, n, n_beams=4)
    pos, cid, valid = (jnp.asarray(pos), jnp.asarray(cid),
                       jnp.asarray(valid))
    sel, sval = sampling.curve_fps(pos, cid, valid, arclen_spacing=0.007,
                                   budget=int(n * 0.625))
    kept = {}
    for w in (12, 32):
        nbr_idx, nbr_mask = curve1d.radius_1d_group_subset(
            pos, sel, sval, cid, valid, 0.02, w)
        sets = np.asarray(jnp.where(nbr_mask, nbr_idx, -1))
        kept[w] = [np.unique(row[row >= 0]) for row in sets[0]]
    for a, b in zip(kept[12], kept[32]):
        np.testing.assert_array_equal(a, b)
