#!/usr/bin/env python3
"""Benchmark harness: nuScenes-scale lidarseg eval throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The operational target (BASELINE.md) is >=1M points/sec/chip on the flagship
nuScenes model at full-sweep scale; ``vs_baseline`` is value / 1e6.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    batch = int(os.environ.get("BENCH_BATCH", 1))
    iters = int(os.environ.get("BENCH_ITERS", 10))

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

    cfg = load_config(os.environ.get("BENCH_CONFIG", "configs/nuscenes.yaml"))
    # honest headline: bench at the row size the shipped config actually
    # pads to (nuscenes.yaml n_pad=36864), not a rounder power of two
    n_points = int(os.environ.get("BENCH_POINTS", cfg.get("n_pad", 36864)))
    from curvecloudnet_tpu.run import tasks as _T

    info = _T.task_for(cfg.get("dataset_source", "nuscenes"),
                       cfg.get("task", "segmentation"))
    n_out = info.n_out
    # bfloat16 matmul compute (f32 params/statistics) is standard TPU
    # practice; BENCH_DTYPE=float32 reproduces the strict-f32 number.
    cfg["model"]["compute_dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    spec = parse_model_config(cfg["model"], in_dim=4, n_out=n_out)
    model = CurveCloudNet(spec, n_points=n_points)

    rng = np.random.default_rng(0)
    pos, feat, curve_id, valid, _ = synthetic_lidar_batch(rng, batch, n_points)
    cloud = cloud_from_arrays(jnp.asarray(pos), jnp.asarray(curve_id),
                              jnp.asarray(valid), jnp.asarray(feat))

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    variables = jax.jit(
        lambda c: model.init({"params": key, "dropout": key}, c,
                             train=False, key=key)
    )(cloud)
    jax.block_until_ready(variables)
    init_s = time.time() - t0

    mode = os.environ.get("BENCH_MODE", "eval")
    if mode == "train":
        from curvecloudnet_tpu.train import (
            Batch, LossConfig, build_train_step, create_train_state,
            make_schedule,
        )

        labels = jnp.asarray(
            np.random.default_rng(1).integers(0, n_out, (batch, n_points)))
        b = Batch(cloud=cloud, labels=labels)
        state = create_train_state(
            model, b, key, make_schedule(None, 5e-4, 100))
        step = jax.jit(build_train_step(
            model, LossConfig(task="segmentation", ignore_index=0,
                              use_lovasz=True)), donate_argnums=(0,))
        def once():
            nonlocal state
            state, m = step(state, b, key, jnp.float32(0.1))
            jax.block_until_ready(m["loss"])
    else:
        fwd = jax.jit(lambda v, c: model.apply(v, c, train=False,
                                               key=jax.random.PRNGKey(0))[0])

        def once():
            out = fwd(variables, cloud)
            out.block_until_ready()

    t0 = time.time()
    once()
    compile_s = time.time() - t0

    n_valid = int(np.asarray(valid).sum())

    # Sustained loops are repeated REPEATS times; the headline is the
    # MEDIAN loop mean (round-3 verdict weak #4: single runs ride +-15%
    # tunnel variance — 403.7k and 469.7k were measured on identical code).
    # Every per-loop mean lands in detail.runs_ms so round-over-round
    # deltas stay attributable; best is reported alongside.
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    runs = []
    if mode == "train":
        # sustained throughput: dispatch steps back-to-back without syncing
        # on the loss (real loops only pull metrics every N steps); device
        # work is still serialized by the state dependency, so this measures
        # true step time with the host/tunnel dispatch gap hidden
        for _ in range(repeats):
            t0 = time.time()
            m = None
            for _ in range(iters):
                state, m = step(state, b, key, jnp.float32(0.1))
            jax.block_until_ready(m["loss"])
            runs.append((time.time() - t0) / iters)
    else:
        # sustained throughput: keep 2 scans in flight (hides per-dispatch
        # host/tunnel gaps; steady-state eval streams many scans)
        for _ in range(repeats):
            t0 = time.time()
            pending = []
            for i in range(iters):
                pending.append(fwd(variables, cloud))
                if len(pending) > 1:
                    pending.pop(0).block_until_ready()
            for p in pending:
                p.block_until_ready()
            runs.append((time.time() - t0) / iters)
    mean_t = float(np.median(runs))
    pts_per_sec = n_valid / mean_t

    trace_span_ms = None
    if os.environ.get("BENCH_TRACE", "0") == "1":
        trace_span_ms = _trace_span(once, iters=3)

    result = {
        "metric": f"points/sec/chip "
                  f"({cfg.get('dataset_source', 'nuscenes')} lidarseg {mode})",
        "value": round(pts_per_sec, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pts_per_sec / 1e6, 4),
        "detail": {
            "n_points": n_points,
            "batch": batch,
            "mode": mode,
            "median_step_s": round(mean_t, 5),  # pipelined (depth 2), eval
            "runs_ms": [round(r * 1e3, 2) for r in runs],
            "best_ms": round(min(runs) * 1e3, 2),
            "trace_span_ms": trace_span_ms,
            "compile_s": round(compile_s, 1),
            "init_s": round(init_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def _trace_span(once, iters: int = 3):
    """Device sync span per step (ms) from an xplane capture.

    Sums plain (non-async) XLA-op self-times and divides by steps — the
    tunnel-noise-free number worknotes should quote (CLAUDE.md "Honest
    sync-only attribution").  Requires the tensorflow profiler protos.
    """
    import glob
    import tempfile

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa
    except Exception:
        return None
    import jax

    d = tempfile.mkdtemp(prefix="bench_trace_")
    with jax.profiler.trace(d):
        for _ in range(iters):
            once()
    paths = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    async_pre = ("copy-start", "slice-start", "copy-done", "slice-done")
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        total = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "").lstrip("%")
                base = name.split(" ")[0].rsplit(".", 1)[0]
                if any(base.startswith(p) or base.endswith(p)
                       for p in async_pre):
                    continue
                total += ev.duration_ps / 1e9
        if total:
            return round(total / iters, 2)
    return None


if __name__ == "__main__":
    main()
