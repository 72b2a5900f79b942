"""Device-mesh utilities: data-parallel sharding of train/eval steps.

Design (per the scaling-book recipe): pick a mesh, annotate shardings on the
step's inputs/outputs, and let XLA insert the collectives.  For this model
family (tens of M params, huge point batches) pure DP is the right envelope —
the per-chip batch is independent, gradients all-reduce over ICI.  The same
helpers accept an extra mesh axis for future model sharding; nothing here
hard-codes single-axis meshes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host runtime init (jax.distributed) — no-op for single host.

    Returns this host's process index.  Call before any jax computation on
    multi-host pods; single-host (or already-initialized) runs fall through.
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index()


def process_shard_range(n_items: int) -> list:
    """This process's lockstep shard of a dataset (multi-host loading).

    Every process MUST run the same number of steps per epoch (unequal
    shards deadlock the first collective at the epoch boundary), so the
    index order wrap-pads: each process gets exactly ceil(n/nproc)
    indices, with early items repeated when n is not divisible (the same
    semantics as PrefetchLoader._batch_indices, which is the path the
    training loop actually uses)."""
    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_items // np_)
    idx = list(range(n_items))
    reps = -(-per * np_ // max(n_items, 1))
    idx = (idx * (reps + 1))[:per * np_]
    return idx[p * per:(p + 1) * per]


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim of every leaf over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a host batch with its leading dim sharded over the mesh.

    Multi-host: each process holds a DIFFERENT per-host batch (the loader
    shards the epoch), and the global array must be assembled from those
    process-local shards — ``jax.device_put`` of a host-local array
    against a mesh containing non-addressable devices is wrong (it would
    treat one host's data as the whole global value).  The global batch
    dim is ``per_host_batch * process_count``."""
    sh = batch_sharding(mesh, axis)
    multihost = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        if multihost:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def sharded_train_step(train_step, mesh: Mesh, axis: str = "dp"):
    """Wrap a jitted train step with explicit DP shardings.

    state is replicated; the batch's leading dim is sharded over ``axis``;
    XLA inserts the gradient all-reduce (psum over ICI).  ``train_step`` must
    be the *unjitted* function (state, batch, key, bn_momentum) -> (state,
    metrics).
    """
    repl = replicate(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def sharded_eval_step(eval_step, mesh: Mesh, axis: str = "dp"):
    repl = replicate(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(
        eval_step,
        in_shardings=(repl, data),
        out_shardings=(data, data, repl),
    )
