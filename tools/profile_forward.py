#!/usr/bin/env python3
"""Capture a device trace of the flagship forward and print top ops by time.

Parses the xplane protobuf directly (no TensorBoard UI needed).
"""

import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np


def summarize_xplane(trace_dir: str, top: int = 40):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        op_time = defaultdict(float)
        op_count = defaultdict(int)
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla op" not in line.name.lower():
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                op_time[name] += ev.duration_ps / 1e9  # ms
                op_count[name] += 1
        if not op_time:
            # fall back to any line with events
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    op_time[f"{line.name}:{name}"] += ev.duration_ps / 1e9
                    op_count[f"{line.name}:{name}"] += 1
        total = sum(op_time.values())
        print(f"\n=== plane {plane.name}: total {total:.1f} ms over "
              f"{sum(op_count.values())} events ===")
        for name, t in sorted(op_time.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{t:9.2f} ms  x{op_count[name]:5d}  {name[:110]}")

        # category roll-up: the per-op table hides a long tail of small
        # ops; grouping by HLO kind shows where the tail actually lives
        import re

        cat_time = defaultdict(float)
        cat_count = defaultdict(int)
        for name, t in op_time.items():
            m = re.search(r"%([a-zA-Z][\w-]*?)[.\s]", name)
            kind = m.group(1) if m else name.split(":")[0][:24]
            cat_time[kind] += t
            cat_count[kind] += op_count[name]
        print("\n--- by category ---")
        for kind, t in sorted(cat_time.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{t:9.2f} ms  x{cat_count[kind]:6d}  {kind}")
        return


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        summarize_xplane(sys.argv[2])
        return

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/ccn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from curvecloudnet_tpu.config import load_config
    from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
    from curvecloudnet_tpu.models import (
        CurveCloudNet, cloud_from_arrays, parse_model_config,
    )

    trace_dir = os.environ.get("PROF_DIR", "/tmp/ccn_trace")
    cfg = load_config(os.environ.get("PROF_CONFIG", "configs/nuscenes.yaml"))
    n_points = int(os.environ.get("PROF_POINTS", cfg.get("n_pad", 32768)))
    # match bench.py's default compute dtype so the profile reflects the bench
    cfg["model"]["compute_dtype"] = os.environ.get("PROF_DTYPE", "bfloat16")
    from curvecloudnet_tpu.run import tasks as _T

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
        state = create_train_state(model, b, key, make_schedule(None, 5e-4, 100))
        step = jax.jit(build_train_step(
            model, LossConfig(task="segmentation", ignore_index=0,
                              use_lovasz=True)))

        def run():
            nonlocal state
            state, m = step(state, b, key, jnp.float32(0.1))
            jax.block_until_ready(m["loss"])
    else:
        variables = jax.jit(lambda c: model.init(
            {"params": key, "dropout": key}, c, train=False, key=key))(cloud)
        fwd = jax.jit(lambda v, c: model.apply(v, c, train=False,
                                               key=jax.random.PRNGKey(0))[0])

        def run():
            fwd(variables, cloud).block_until_ready()

    run()
    t0 = time.time()
    run()
    print(f"steady-state {mode} step: {(time.time()-t0)*1e3:.1f} ms")

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            run()
    print("trace written to", trace_dir)
    summarize_xplane(trace_dir)


if __name__ == "__main__":
    main()
