"""The batch-padded curve-cloud state threaded through model steps.

TPU-native equivalent of the reference's ``(x, pos, batch, point2curveidx)``
tuple (reference ``src/models/base.py:137,159-175``): the flattened COO batch
becomes fixed-shape rows with a validity mask, so the whole forward pass is a
single static-shape XLA program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


class Cloud(struct.PyTreeNode):
    """One resolution level of a batch of curve clouds.

    Attributes:
      x:        (B, N, F) features or None (pre-feature input).
      pos:      (B, N, 3) positions, scan-order within each curve.
      valid:    (B, N) bool validity (real points are a prefix of each row).
      curve_id: (B, N) int32 nondecreasing curve index over the valid prefix.
      parent_idx:   (B, N) int32 index of each point in the *parent* (pre-
                    downsampling) row, or None at full resolution.  Set by
                    downsampling steps; consumed by fp-geo upsampling (the
                    reference's ``downsample-idxs`` state, base.py:188-192).
    """

    pos: jax.Array
    valid: jax.Array
    curve_id: jax.Array
    x: Optional[jax.Array] = None
    parent_idx: Optional[jax.Array] = None

    @property
    def n(self) -> int:
        return self.pos.shape[1]

    @property
    def batch_size(self) -> int:
        return self.pos.shape[0]

    def with_features(self, x: jax.Array) -> "Cloud":
        return self.replace(x=x)

    def xyz_concat(self, with_xyz: bool) -> Optional[jax.Array]:
        """[x, pos] concat used by most steps (reference e.g. dgcnn.py:108).

        The xyz channels are cast to the FEATURE dtype before the concat:
        with bf16 features, concatenating f32 positions silently promotes
        the whole row to f32 (doubling every downstream neighbor-gather's
        bytes), while every consumer is a compute-dtype matmul that casts
        its input anyway — so pre-casting is bit-identical at the dots.
        (Geometric uses of positions — rel vectors, distances — read
        ``self.pos`` directly and stay exact f32.)
        """
        if not with_xyz:
            return self.x
        if self.x is None:
            return self.pos
        return jnp.concatenate([self.x, self.pos.astype(self.x.dtype)],
                               axis=-1)

    def gather(self, idx: jax.Array, idx_valid: jax.Array) -> "Cloud":
        """Downsample to the given row indices (ascending per sample).

        Uses :func:`ops.segments.take_rows` so the train-mode transpose is an
        inverse row gather instead of XLA's fused (C_total, N) scatter-add
        (~16 ms/step at flagship scale on v5e).
        """
        from ..ops.segments import take_rows

        take = lambda a: take_rows(a, idx, idx_valid)  # noqa: E731
        return Cloud(
            pos=take(self.pos),
            valid=idx_valid & take(self.valid),
            curve_id=take(self.curve_id),
            x=None if self.x is None else take(self.x),
            parent_idx=idx,
        )


def cloud_from_arrays(pos, curve_id=None, valid=None, x=None) -> Cloud:
    """Build a full-resolution Cloud, defaulting to all-valid single curves."""
    b, n = pos.shape[:2]
    if valid is None:
        valid = jnp.ones((b, n), bool)
    if curve_id is None:
        curve_id = jnp.zeros((b, n), jnp.int32)
    return Cloud(pos=pos, valid=valid, curve_id=curve_id.astype(jnp.int32), x=x)
