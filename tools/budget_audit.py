"""Audit every static-budget stage on the flagship config: run eval
forwards over synthetic sweeps with telemetry capture and print each
stage's overflow counters plus the sa-geo keep fraction.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/budget_audit.py
"""

import os

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ccn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from curvecloudnet_tpu.config import load_config
from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.models import (CurveCloudNet, cloud_from_arrays,
                                      parse_model_config)
from curvecloudnet_tpu.ops import telemetry


def main():
    cfg = load_config(os.environ.get("AUDIT_CONFIG", "configs/nuscenes.yaml"))
    cfg["model"]["compute_dtype"] = "bfloat16"
    n_pad = int(os.environ.get("AUDIT_POINTS", cfg.get("n_pad", 36864)))
    spec = parse_model_config(cfg["model"], in_dim=4, n_out=17)
    model = CurveCloudNet(spec, n_points=n_pad)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def fwd_with_stats(variables, cloud):
        with telemetry.capture() as cap:
            out, valid = model.apply(variables, cloud, train=False,
                                     key=jax.random.PRNGKey(0))
            stats = cap.current()
        return out, stats

    totals = {}
    variables = None
    jfwd = jax.jit(fwd_with_stats)
    for s in range(int(os.environ.get("AUDIT_SCANS", 4))):
        pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, 1, n_pad)
        cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                                  jnp.asarray(valid), jnp.asarray(feat))
        if variables is None:
            variables = jax.jit(lambda c: model.init(
                {"params": key, "dropout": key}, c, train=False,
                key=key))(cloud)
        _, stats = jfwd(variables, cloud)
        stats = {k: float(np.asarray(v)) for k, v in stats.items()}
        for k, v in stats.items():
            totals.setdefault(k, []).append(v)
    print(f"== telemetry over {len(next(iter(totals.values())))} scans "
          f"(n_pad={n_pad}) ==")
    for k in sorted(totals):
        vals = totals[k]
        flag = ("  <-- OVERFLOW" if "overflow" in k and max(vals) > 0
                else "")
        print(f"{k:60s} max={max(vals):10.4f} mean={np.mean(vals):10.4f}"
              f"{flag}")


if __name__ == "__main__":
    main()
