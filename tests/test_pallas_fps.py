"""Pallas FPS kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from curvecloudnet_tpu.ops import sampling
from curvecloudnet_tpu.ops.pallas_fps import fps_pallas


def test_pallas_fps_matches_xla(rng):
    b, n = 2, 300
    pos = rng.normal(size=(b, n, 3)).astype(np.float32)
    valid = np.ones((b, n), bool)
    valid[1, 250:] = False

    idx_p, v_p = fps_pallas(jnp.array(pos), jnp.array(valid), 0.25,
                            interpret=True)
    idx_x, v_x = sampling.fps(jnp.array(pos), jnp.array(valid), 0.25)
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_pallas_fps_separation(rng):
    """FPS picks are far apart: min pairwise distance of the selection is
    much larger than random sampling's."""
    b, n, k = 1, 400, 40
    pos = rng.uniform(0, 1, (b, n, 3)).astype(np.float32)
    valid = np.ones((b, n), bool)
    idx, v = fps_pallas(jnp.array(pos), jnp.array(valid), k / n,
                        interpret=True)
    sel = pos[0][np.asarray(idx)[0][np.asarray(v)[0]]]
    d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    rng2 = np.random.default_rng(1)
    rand_sel = pos[0][rng2.choice(n, k, replace=False)]
    dr = np.linalg.norm(rand_sel[:, None] - rand_sel[None], axis=-1)
    np.fill_diagonal(dr, np.inf)
    assert d.min() > 1.5 * dr.min()
