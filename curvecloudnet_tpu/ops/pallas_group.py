"""Pallas TPU megakernel: grouped message-MLP + masked aggregation.

Every grouping module in the network — sa-geo curve windows
(reference pointnet2.py:146-181), sgcnn edge convolution
(reference dgcnn.py:158-207), and PointNetConv2 SA neighborhoods
(reference point_conv.py:60-93) — shares one compute shape at eval time:

    h1[i, k]  (first-layer pre-norm message, built in XLA via
               matmul-before-gather / window slices)
    -> BN-affine -> act -> Dense -> ... -> Dense          (local MLP)
    -> optional attention MLP -> per-channel softmax      (aggr=attend)
    -> masked reduction over the K neighbor axis          (max / attend)

XLA materializes every per-pair (M, K, C) intermediate in HBM (~200 MB a
layer at flagship scale).  This kernel streams the K axis instead: the
input is laid out position-major (K, M, C) so each grid step (t, j) loads
one contiguous (tile_m, C) slab, runs the remaining MLP layers as full
width 2D matmuls on the MXU, and folds the result into online f32
accumulators (flash-attention style for ``attend``, running max for
``max``).  Per-pair tensors never touch HBM.

Eval-only: BatchNorm running statistics are folded into per-layer affine
parameters (see :func:`fold_mlp_eval`); training keeps the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .aggregate import ATTEND_FILL, MAX_FILL


def _act(h, kind: str):
    if kind == "relu":
        return jnp.maximum(h, 0.0)
    if kind == "leaky_relu":
        return jnp.where(h > 0, h, 0.01 * h)
    if kind == "identity":
        return h
    raise ValueError(kind)


def _apply_denses(h, denses, act: str, cdt):
    """[Dense -> (folded BN) -> act]* -> Dense (plain last).

    Values stay f32 between layers (Mosaic cannot compare bf16 vectors, so
    activations must run in f32); the cast to the compute dtype happens at
    each matmul input, which is where the XLA path rounds too.
    """
    n = len(denses)
    for li, (w, b) in enumerate(denses):
        h = jax.lax.dot_general(h.astype(cdt), w[:].astype(cdt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = h + b[:]
        if li < n - 1:
            h = _act(h, act)
    return h


def _group_kernel(h1_ref, *refs,
                  n_local: int, n_attend: int, aggr: str, act: str,
                  attend_act: str, k_planes: int, compute_dtype,
                  c1: int, mask_sep: bool = False):
    """Grid (M/tile_m, K/k_planes); scratch persists across axis 1.

    The neighbor-validity mask rides as channel ``c1`` of the h1 slab —
    a separate (K, M, 1) mask plane lane-pads 128x in HBM (a 767MB f32
    buffer at flagship scale, ~1ms/step of pure fill traffic), while the
    slab's lane dim is padded to 128 anyway so the extra channel is free.

    ``mask_sep`` (the k-major path): the mask instead arrives as a 2D
    query-major (tile_m, KP) f32 operand holding ALL k columns (Mosaic
    requires lane-dim blocks to be 128-divisible or whole, so the block
    spans the full K axis; its index_map ignores j, so consecutive
    j-steps reuse the fetched block).  The caller then skips the
    mask-channel concat that rewrote the whole slab in XLA (~1.7 ms/step
    at flagship sa-geo scale).  Plane p's column is read by masked
    reduction over the lane iota (dynamic lane index: j*k_planes+p).
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    cdt = compute_dtype

    # unpack: [mask plane when mask_sep], local affine0 (s, t), local
    # denses, attend denses, then out_ref and scratch refs
    it = iter(refs)
    m_ref = next(it) if mask_sep else None
    s0, t0 = next(it), next(it)
    loc = [(next(it), next(it)) for _ in range(n_local)]
    att = [(next(it), next(it)) for _ in range(n_attend)]
    out_ref = next(it)
    if aggr == "attend":
        run_max, denom, acc = next(it), next(it), next(it)
    else:
        run_max = next(it)

    @pl.when(j == 0)
    def _init():
        run_max[:] = jnp.full(run_max.shape, -1e30, jnp.float32)
        if aggr == "attend":
            denom[:] = jnp.zeros(denom.shape, jnp.float32)
            acc[:] = jnp.zeros(acc.shape, jnp.float32)

    for p in range(k_planes):
        rec = h1_ref[p]                             # (tile_m, C1 [+ 1])
        h = rec[:, :c1]
        # f32 before the compare: Mosaic rejects bf16 vector comparisons
        if mask_sep:
            lane = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 1)
            col = j * k_planes + p
            mask = jnp.sum(jnp.where(lane == col, m_ref[:], 0.0),
                           axis=1, keepdims=True) > 0      # (tile_m, 1)
        else:
            mask = rec[:, c1:c1 + 1].astype(jnp.float32) > 0
        h = h.astype(jnp.float32) * s0[:] + t0[:]
        h = _act(h, act)
        msg = _apply_denses(h, loc, act, cdt)       # (tile_m, C_out) f32
        if aggr == "max":
            hit = jnp.where(mask, msg, MAX_FILL)
            run_max[:] = jnp.maximum(run_max[:], hit)
        else:
            logits = _apply_denses(msg, att, attend_act, cdt)
            logits = jnp.where(mask, logits, ATTEND_FILL)
            new_max = jnp.maximum(run_max[:], logits)
            scale = jnp.exp(run_max[:] - new_max)
            e = jnp.exp(logits - new_max)
            denom[:] = denom[:] * scale + e
            acc[:] = acc[:] * scale + e * msg.astype(jnp.float32)
            run_max[:] = new_max

    @pl.when(j == nj - 1)
    def _finish():
        if aggr == "max":
            out_ref[:] = run_max[:]
        else:
            out_ref[:] = acc[:] / denom[:]


def _round_up(x, m):
    return -(-x // m) * m


def _pick_k_planes(k: int) -> int:
    """Small per-program plane count that divides K when possible."""
    for cand in (5, 4, 3):
        if k % cand == 0:
            return cand
    return 4


def _pick_tile_m(m: int, cap: int = 2048) -> int:
    """Largest tile that avoids padding the (K, M, C) slab.

    Padding M to a tile multiple forces XLA to rewrite the whole slab
    (204 MB at flagship sa-geo scale, ~2.5 ms/step on v5e), so prefer a
    tile that divides round_up(m, 128) exactly; fall back to the tile
    with the least padding when no >=1024 divisor exists.
    """
    mp = _round_up(m, 128)
    if mp <= cap:
        return mp
    for t in range(cap, 1024 - 1, -128):
        if mp % t == 0:
            return t
    return min(cap, max(
        range(1024, cap + 1, 128),
        key=lambda t: -(_round_up(m, t) - m)))


@functools.partial(
    jax.jit,
    static_argnames=("aggr", "act", "attend_act", "tile_m", "k_planes",
                     "interpret", "k_major"))
def fused_group_reduce_single(
        h1, mask, local_affine0, local_denses, attend_denses,
        aggr: str = "attend", act: str = "leaky_relu",
        attend_act: str = "leaky_relu", tile_m: Optional[int] = None,
        k_planes: Optional[int] = None, interpret: bool = False,
        k_major: bool = False):
    """One sample.

    h1   (M, K, C1) — first-layer pre-norm messages (query-major; the
         position-major transpose happens here so callers stay simple).
         With ``k_major=True``: h1 (K, M, C1) arrives ALREADY
         position-major (the window gather can emit that layout natively,
         see curve1d._window_slice3) — no transpose here, the mask rides
         as a separate 2D operand instead of a slab channel (no concat),
         and when k_planes | K and tile_m | M the pad is a no-op: the
         slab is consumed exactly as the producer wrote it.
    mask (M, K) bool — query-major in BOTH layouts; with ``k_major`` its
         column order must match h1's plane order (ascending window
         order when produced by curve1d's k-major gather)
    local_affine0: (s, t) each (C1,) f32 — layer-0 BN folded to an affine
    local_denses: sequence of (W (Ci, Cj), b (Cj,)); hidden layers carry
         their BN fold in W/b (see fold_mlp_eval); last layer plain
    attend_denses: same structure for the attention MLP, layer 0 included
         (fold_full_mlp_eval); required when aggr='attend'
    Returns (M, C_out) f32.
    """
    if k_major:
        k, m, c1 = h1.shape
    else:
        m, k, c1 = h1.shape
    cdt = h1.dtype
    out_c = local_denses[-1][0].shape[1] if local_denses else c1
    if k_planes is None:
        k_planes = _pick_k_planes(k)
    if tile_m is None:
        tile_m = _pick_tile_m(m)
    kp = _round_up(k, k_planes)
    mp = _round_up(m, tile_m)
    if k_major:
        h1_t = jnp.pad(h1, ((0, kp - k), (0, mp - m), (0, 0)))
        mask2 = jnp.pad(mask.astype(jnp.float32),
                        ((0, mp - m), (0, kp - k)))     # 0 = invalid
    else:
        # mask rides as channel c1 of the slab (0/1 is exact in any float
        # dtype); padded slots are zero = invalid, as required
        h1 = jnp.concatenate([h1, mask.astype(cdt)[..., None]], axis=-1)
        h1_t = jnp.moveaxis(h1, 1, 0)                   # (K, M, C1+1)
        h1_t = jnp.pad(h1_t, ((0, kp - k), (0, mp - m), (0, 0)))

    params, specs = [], []

    def add_const(a, dt):
        a = jnp.asarray(a).astype(dt)
        if a.ndim == 1:
            a = a.reshape(1, -1)
        params.append(a)
        specs.append(pl.BlockSpec(a.shape, lambda t, j: (0, 0),
                                  memory_space=pltpu.VMEM))

    add_const(local_affine0[0], jnp.float32)
    add_const(local_affine0[1], jnp.float32)
    n_local = len(local_denses)
    for w, b in local_denses:
        add_const(w, cdt)
        add_const(b, jnp.float32)
    n_attend = 0
    if aggr == "attend":
        n_attend = len(attend_denses)
        for w, b in attend_denses:
            add_const(w, cdt)
            add_const(b, jnp.float32)

    n_scratch = 3 if aggr == "attend" else 1
    in_specs = [
        pl.BlockSpec((k_planes, tile_m, c1 + (0 if k_major else 1)),
                     lambda t, j: (j, t, 0), memory_space=pltpu.VMEM),
    ]
    operands = [h1_t]
    if k_major:
        in_specs.append(pl.BlockSpec((tile_m, kp),
                                     lambda t, j: (t, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask2)
    out = pl.pallas_call(
        functools.partial(
            _group_kernel, n_local=n_local, n_attend=n_attend, aggr=aggr,
            act=act, attend_act=attend_act, k_planes=k_planes,
            compute_dtype=cdt, c1=c1, mask_sep=k_major),
        grid=(mp // tile_m, kp // k_planes),
        in_specs=in_specs + specs,
        out_specs=pl.BlockSpec((tile_m, out_c), lambda t, j: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, out_c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_m, out_c), jnp.float32)
                        for _ in range(n_scratch)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands, *params)
    return out[:m]


def fused_group_reduce(h1, mask, local_affine0, local_denses,
                       attend_denses=None,
                       aggr: str = "attend", act: str = "leaky_relu",
                       attend_act: str = "leaky_relu",
                       tile_m: Optional[int] = None,
                       interpret: bool = False, k_major: bool = False):
    """Batched (B, M, K, C1) -> (B, M, C_out) f32.

    ``k_major``: h1 (B, K, M, C1) arrives position-major; mask stays
    query-major (B, M, K), its column order matching h1's plane order
    (see fused_group_reduce_single)."""
    aff = (jnp.asarray(local_affine0[0]), jnp.asarray(local_affine0[1]))
    loc = tuple((jnp.asarray(w), jnp.asarray(b)) for w, b in local_denses)
    att = (tuple((jnp.asarray(w), jnp.asarray(b)) for w, b in attend_denses)
           if attend_denses is not None else None)
    fn = functools.partial(
        fused_group_reduce_single, aggr=aggr, act=act, attend_act=attend_act,
        tile_m=tile_m, interpret=interpret, k_major=k_major)
    return jax.vmap(lambda a, mk: fn(a, mk, aff, loc, att))(h1, mask)


def fold_mlp_eval(params, batch_stats, n_layers: int,
                  eps: float = 1e-5) -> Tuple[Tuple[jax.Array, jax.Array],
                                              Sequence[Tuple]]:
    """Fold an eval-mode MLP (Dense -> BN -> act, plain last; layers.py:94)
    into (layer-0 BN affine, [(W, b) for layers 1..L-1]).

    Layer 0's Dense runs OUTSIDE the kernel (matmul-before-gather), so its
    BN stays a standalone affine; every later hidden layer's BN folds into
    its weight matrix (pallas_edge.fold_batchnorm).  A single-layer MLP
    (plain lin_0, no norm_0) folds to the identity — pair it with
    act='identity' in the kernel call.
    """

    def bn_affine(li):
        nrm, st = params[f"norm_{li}"], batch_stats[f"norm_{li}"]
        inv = nrm["scale"] / jnp.sqrt(st["var"] + eps)
        return inv, nrm["bias"] - st["mean"] * inv

    if n_layers == 1:
        c = params["lin_0"]["kernel"].shape[1]
        return (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32)), ()

    s0, t0 = bn_affine(0)
    denses = []
    for li in range(1, n_layers):
        lp = params[f"lin_{li}"]
        w = lp["kernel"]
        b = lp.get("bias", jnp.zeros((w.shape[1],), jnp.float32))
        if li < n_layers - 1:
            inv, shift = bn_affine(li)
            w = w * inv[None, :]
            b = b * inv + shift
        denses.append((w, b))
    return (s0, t0), tuple(denses)


def fold_full_mlp_eval(params, batch_stats, n_layers: int,
                       eps: float = 1e-5) -> Sequence[Tuple]:
    """Fold a whole eval MLP (layer 0 INCLUDED, e.g. the attention MLP whose
    first Dense runs inside the kernel) into [(W, b), ...]; hidden layers
    absorb their BN, last layer plain."""
    denses = []
    for li in range(n_layers):
        lp = params[f"lin_{li}"]
        w = lp["kernel"]
        b = lp.get("bias", jnp.zeros((w.shape[1],), jnp.float32))
        if li < n_layers - 1:
            nrm, st = params[f"norm_{li}"], batch_stats[f"norm_{li}"]
            inv = nrm["scale"] / jnp.sqrt(st["var"] + eps)
            w = w * inv[None, :]
            b = b * inv + nrm["bias"] - st["mean"] * inv
        denses.append((w, b))
    return tuple(denses)
