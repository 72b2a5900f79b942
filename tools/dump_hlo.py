#!/usr/bin/env python3
"""Dump the OPTIMIZED HLO text of the flagship eval/train step.

Usage: PROF_MODE=train python tools/dump_hlo.py /tmp/train_opt.hlo
Works through the axon remote-compile path via compiled.as_text().
"""
import os
import sys

import numpy as np
import jax


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt.hlo"
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/ccn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from curvecloudnet_tpu.config import load_config
    from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
    from curvecloudnet_tpu.models import (
        CurveCloudNet, cloud_from_arrays, parse_model_config,
    )
    from curvecloudnet_tpu.run import tasks as _T

    cfg = load_config(os.environ.get("PROF_CONFIG", "configs/nuscenes.yaml"))
    n_points = int(os.environ.get("PROF_POINTS", cfg.get("n_pad", 32768)))
    cfg["model"]["compute_dtype"] = os.environ.get("PROF_DTYPE", "bfloat16")
    n_out = _T.task_for(cfg.get("dataset_source", "nuscenes"),
                        cfg.get("task", "segmentation")).n_out
    spec = parse_model_config(cfg["model"], in_dim=4, n_out=n_out)
    model = CurveCloudNet(spec, n_points=n_points)
    rng = np.random.default_rng(0)
    pos, feat, cid, valid, _ = synthetic_lidar_batch(rng, 1, n_points)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(cid),
                              jnp.asarray(valid), jnp.asarray(feat))
    key = jax.random.PRNGKey(0)
    mode = os.environ.get("PROF_MODE", "eval")
    if mode == "train":
        from curvecloudnet_tpu.train import (
            Batch, LossConfig, build_train_step, create_train_state,
            make_schedule,
        )

        labels = jnp.asarray(
            np.random.default_rng(1).integers(0, n_out, (1, n_points)))
        b = Batch(cloud=cloud, labels=labels)
        state = create_train_state(model, b, key,
                                   make_schedule(None, 5e-4, 100))
        step = jax.jit(build_train_step(
            model, LossConfig(task="segmentation", ignore_index=0,
                              use_lovasz=True)))
        compiled = step.lower(state, b, key, jnp.float32(0.1)).compile()
    else:
        variables = jax.jit(lambda c: model.init(
            {"params": key, "dropout": key}, c, train=False, key=key))(cloud)
        fwd = jax.jit(lambda v, c: model.apply(
            v, c, train=False, key=jax.random.PRNGKey(0))[0])
        compiled = fwd.lower(variables, cloud).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print("wrote", out_path, len(txt), "bytes")


if __name__ == "__main__":
    main()
