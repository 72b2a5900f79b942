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


def process_shard_range(n_items: int) -> range:
    """This process's contiguous shard of a dataset (multi-host data
    loading: each host reads only its slice)."""
    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_items // np_)
    return range(p * per, min((p + 1) * per, n_items))


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
    """Place a host batch with its leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)

    def put(x):
        if x is None:
            return None
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
