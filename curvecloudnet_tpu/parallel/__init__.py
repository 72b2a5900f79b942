"""Scale-out layer: device meshes + sharded train/eval steps.

The reference is single-GPU with an empty DataParallel hook (SURVEY.md §2.11);
here scale-out is first-class and TPU-idiomatic: a ``jax.sharding.Mesh`` over
the data axis (ICI within a slice, DCN across slices), batch sharded on
``dp``, parameters replicated, XLA inserting the gradient ``psum``.
"""

from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    process_shard_range,
    replicate,
    shard_batch,
    sharded_eval_step,
    sharded_train_step,
)

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "process_shard_range",
    "replicate",
    "shard_batch",
    "sharded_eval_step",
    "sharded_train_step",
]
