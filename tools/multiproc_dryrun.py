#!/usr/bin/env python3
"""Multi-PROCESS (multi-host-shaped) dry run of the sharded train path.

Round-4 verdict #8: ``initialize_distributed`` / ``process_shard_range`` /
the lockstep loader sharding were only exercised single-process.  This tool
spawns N local processes (jax.distributed over a localhost coordinator,
CPU devices) that jointly run ONE data-parallel flagship train step at tiny
shapes — the multi-host analogue of ``__graft_entry__.dryrun_multichip``.

Checks:
  * jax.distributed initializes and every process sees the global device
    count (procs x local_devices);
  * ``shard_batch`` assembles the global batch from per-process shards
    (jax.make_array_from_process_local_data path);
  * the psum'd loss is bitwise IDENTICAL on every process (a skewed shard
    or collective-placement regression breaks this);
  * ``process_shard_range`` hands every process the same number of items
    with full coverage (unequal shards would deadlock the first epoch-
    boundary collective).

Usage: python tools/multiproc_dryrun.py [n_procs] [local_devices]
(exercised by tests/test_multiprocess.py with 2x2)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(pid: int, nprocs: int, port: int, local_devices: int):
    import jax

    from curvecloudnet_tpu.parallel import initialize_distributed

    initialize_distributed(f"127.0.0.1:{port}", nprocs, pid)
    assert jax.process_index() == pid
    n_global = nprocs * local_devices
    assert jax.device_count() == n_global, (
        jax.device_count(), n_global)

    import numpy as np
    import jax.numpy as jnp

    import __graft_entry__ as g
    from curvecloudnet_tpu.config import load_config
    from curvecloudnet_tpu.models import CurveCloudNet, parse_model_config
    from curvecloudnet_tpu.parallel import (
        make_mesh, process_shard_range, shard_batch, sharded_train_step,
    )
    from curvecloudnet_tpu.train import (
        Batch, LossConfig, build_train_step, create_train_state,
        make_schedule,
    )

    n_points = 512
    per_host = 2 * local_devices
    cfg = load_config("configs/nuscenes.yaml")
    spec = parse_model_config(g._shrink_feat_dims(cfg["model"], 16),
                              in_dim=4, n_out=17)
    model = CurveCloudNet(spec, n_points=n_points)

    # per-host batches differ (seed=pid) — the global batch is their
    # concatenation, exactly like the sharded loader feeds real training
    cloud, labels = g._example_cloud(per_host, n_points, seed=pid)
    batch = Batch(cloud=cloud, labels=labels)
    key = jax.random.PRNGKey(0)   # same init on every process
    state = create_train_state(
        model, batch, key, make_schedule(None, 5e-4, 100))

    mesh = make_mesh()            # all global devices
    step = sharded_train_step(build_train_step(
        model, LossConfig(task="segmentation", ignore_index=0,
                          use_lovasz=True)), mesh)
    sharded = shard_batch(batch, mesh)
    state, metrics = step(state, sharded, key, jnp.float32(0.1))
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss)

    shard = process_shard_range(10)  # 10 items over nprocs processes
    print(f"MPCHILD pid={pid} loss={loss!r} shard={sorted(shard)}",
          flush=True)


def main(nprocs: int = 2, local_devices: int = 2, timeout: int = 900):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    for k in list(env):
        if k.startswith("PALLAS_AXON") or k.startswith("AXON_"):
            del env[k]
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", str(pid),
         str(nprocs), str(port), str(local_devices)],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(nprocs)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("multi-process dryrun deadlocked (timeout)")
        outs.append(out)
        if p.returncode != 0:
            raise RuntimeError(
                f"child failed rc={p.returncode}:\n{out[-3000:]}")

    import re

    infos = {}
    for out in outs:
        for line in out.splitlines():
            m = re.match(r"MPCHILD pid=(\d+) loss=(\S+) shard=(\[.*\])",
                         line)
            if m:
                infos[int(m.group(1))] = {"loss": m.group(2),
                                          "shard": m.group(3)}
    assert len(infos) == nprocs, f"missing child reports: {outs}"
    losses = {v["loss"] for v in infos.values()}
    assert len(losses) == 1, f"per-process losses differ: {losses}"
    shards = [eval(v["shard"]) for v in infos.values()]  # noqa: S307
    assert len({len(s) for s in shards}) == 1, f"unequal shards: {shards}"
    covered = set().union(*[set(s) for s in shards])
    assert covered == set(range(10)), f"coverage gap: {shards}"
    print(f"multiproc_dryrun ok: procs={nprocs} devices="
          f"{nprocs * local_devices} loss={losses.pop()} shards={shards}")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
              int(sys.argv[5]))
    else:
        nprocs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
        ldev = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        main(nprocs, ldev)
