"""NN step modules — the operator zoo (SURVEY.md §2.4), TPU-native.

Every module maps a batch-padded :class:`~curvecloudnet_tpu.models.cloud.Cloud`
to a new Cloud.  Redesigns vs. the reference (``src/models/modules/``):

  * Grouping convs consume dense ``(B, Q, K)`` neighbor tables from the
    blocked-matmul kNN (ops/neighbors.py) instead of CUDA FRNN + COO scatter;
    aggregation is a masked reduction over the static K axis (ops/aggregate.py)
    with the reference's exact mask-fill constants.
  * Downsampling emits fixed-budget rows + validity instead of shrinking
    tensors (see models/spec.py).
  * The symmetric curve 1D convolution (reference fast_conv1d.py) becomes a
    windowed same-curve gather + one dense matmul per layer — no zero-stuffed
    sequence materialization, and the matmul rides the MXU.
  * BatchNorm is validity-masked (padding never pollutes moments).  For the
    reference's V2 conv this is a deliberate (tiny) deviation: it normalizes
    over its inter-curve zero padding too (fast_conv1d.py:71-74).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (aggregate, curve1d, interpolate, neighbors, sampling,
                   segments, telemetry)
from .cloud import Cloud
from .layers import MLP, MaskedBatchNorm, leaky_relu
from .spec import ModelSpec, StepSpec


def _dt(spec: ModelSpec):
    """Matmul compute dtype from the spec (params remain float32)."""
    return jnp.bfloat16 if spec.compute_dtype == "bfloat16" else None


def _attend_dims(spec: ModelSpec, step: StepSpec, d: int) -> Tuple[int, ...]:
    """Attention-MLP widths (reference base.py:89-92,106-108,113-115)."""
    if step.name == "sa" and spec.version == 2.0:
        return (d, d // 2, d)
    return (d, d, d)


def _maybe_attend_mlp(spec: ModelSpec, step: StepSpec, d: int,
                      name: str = "attend_nn") -> Optional[MLP]:
    if step.aggr_type in ("attend", "weighted-sum"):
        return MLP(_attend_dims(spec, step, d), act="leaky_relu",
                   use_bias=spec.use_bias, dtype=_dt(spec), name=name)
    return None


def _fused_group_eval(module: nn.Module, spec: ModelSpec, step: StepSpec,
                      dims: Tuple[int, ...], h1_fn, nbr_mask,
                      act: str, family: str = "",
                      k_major: bool = False) -> Optional[jax.Array]:
    """Shared eval-megakernel dispatch for every grouped conv family.

    ``h1_fn()`` must return the layer-0 pre-norm messages (B, M, K, C1);
    the kernel (ops/pallas_group.py) runs the remaining BN-folded MLP +
    attention/max aggregation VMEM-resident.  Returns None (caller keeps
    the unfused path) when training-mode stats are needed, params aren't
    bound yet, or the backend is CPU (unless CCN_FUSED_GROUP=interp).
    """
    import os

    # Default: all three families fused.  Edge was -2.6% when its h1 came
    # from the XLA gather (each custom-call is a scheduling barrier that
    # exposed async-copy latency), but with the tile-unique gather
    # (CCN_TILE_GATHER=1) feeding the k-major slab directly the combo is
    # a measured win on v5e: nuScenes 576.8k -> 615.0k, KITTI 504.6k ->
    # 538.9k pts/s (super-additive — each knob alone ~+1.5%).
    env = os.environ.get("CCN_FUSED_GROUP", "sageo,sa,edge")
    interp = env == "interp"
    enabled = env in ("1", "interp") or family in env.split(",")
    if (not enabled or step.aggr_type not in ("attend", "max")
            or module.is_initializing()
            or (jax.default_backend() in ("cpu",) and not interp)):
        return None
    try:
        p = module.variables["params"]["nn"]
        bs = module.variables["batch_stats"]["nn"]
        pa = ba = None
        if step.aggr_type == "attend":
            pa = module.variables["params"]["attend_nn"]
            ba = module.variables["batch_stats"]["attend_nn"]
    except (KeyError, AttributeError):
        return None
    from ..ops import pallas_group

    h1 = h1_fn()
    aff, loc = pallas_group.fold_mlp_eval(p, bs, len(dims) - 1)
    if len(dims) - 1 == 1:
        act = "identity"    # single plain layer: h1 already final
    att = None
    if step.aggr_type == "attend":
        att = pallas_group.fold_full_mlp_eval(
            pa, ba, len(_attend_dims(spec, step, dims[-1])) - 1)
    out = pallas_group.fused_group_reduce(
        h1, nbr_mask, aff, loc, att, aggr=step.aggr_type,
        act=act, attend_act="leaky_relu", interpret=interp,
        k_major=k_major)
    return out.astype(_dt(spec) or jnp.float32)


def _fused_group_train(module: nn.Module, spec: ModelSpec, step: StepSpec,
                       dims: Tuple[int, ...], h1_fn, nbr_mask,
                       act: str, local_nn: MLP, attend_nn: Optional[MLP],
                       bn_momentum, family: str = "") -> Optional[jax.Array]:
    """Shared TRAIN-megakernel dispatch (ops/pallas_group_train.py).

    ``h1_fn()`` must return the layer-0 pre-norm messages in the
    position-major (B, K, M, C1) slab layout; ``nbr_mask`` is query-major
    (B, M, K) with columns matching the slab's plane order.  The kernel
    computes the exact masked batch statistics and exact gradients
    (including the paths through the batch mean/variance); the running
    stats are then written through one tiny MLP call with the kernel's
    stats as overrides (the _stream pattern).  Returns None (caller keeps
    the XLA materialized path) when disabled, params aren't bound yet, or
    on CPU (unless CCN_FUSED_GROUP_TRAIN=interp for tests).
    """
    import os

    # train default includes edge (measured -7.1 ms/step at 36864, unlike
    # eval where the per-level custom-call barriers made edge negative —
    # the train graph is big enough to hide them)
    env = os.environ.get("CCN_FUSED_GROUP_TRAIN", "sageo,sa,edge")
    interp = env == "interp"
    enabled = env in ("1", "interp") or family in env.split(",")
    n_layers = len(dims) - 1
    if (not enabled or step.aggr_type not in ("attend", "max")
            or n_layers < 2 or module.is_initializing()
            or (jax.default_backend() in ("cpu",) and not interp)):
        return None
    try:
        p = module.variables["params"]["nn"]
        pa = None
        n_att = 0
        if step.aggr_type == "attend":
            pa = module.variables["params"]["attend_nn"]
            n_att = len(_attend_dims(spec, step, dims[-1])) - 1
    except (KeyError, AttributeError):
        return None
    from ..ops import pallas_group_train as pgt

    h1 = h1_fn()
    out, loc_stats, att_stats = pgt.grouped_train_reduce(
        h1, nbr_mask, p, n_layers, pa, n_att, aggr=step.aggr_type,
        act=act, attend_act="leaky_relu", interpret=interp)
    # running-stat write: one tiny call per MLP with the kernel's batch
    # stats as overrides (exactly CurveSAStep._stream's update pattern)
    bsz, _, _, c1 = h1.shape
    tiny_h1 = jax.lax.stop_gradient(h1[:, 0, :1, :].reshape(bsz, 1, c1))
    stats_list = list(loc_stats) + [None]
    out_t = local_nn(None, mask=None, train=True, bn_momentum=bn_momentum,
                     bn_stats=stats_list, update_running=True,
                     first_map=lambda dense: tiny_h1)
    if attend_nn is not None:
        attend_nn(out_t, mask=None, train=True, bn_momentum=bn_momentum,
                  bn_stats=list(att_stats) + [None], update_running=True)
    return out.astype(_dt(spec) or jnp.float32)


def _group_conv(local_nn: MLP, attend_nn: Optional[MLP], step: StepSpec,
                x_src: Optional[jax.Array], pos_src: jax.Array,
                pos_dst: jax.Array, nbr_idx: jax.Array, nbr_mask: jax.Array,
                train: bool, bn_momentum, fused_ctx=None) -> jax.Array:
    """PointNetConv2 message+aggregate (reference point_conv.py:60-93).

    msg = [x_j, (pos_j - pos_i)/r?] -> local_nn -> masked aggregation.
    ``fused_ctx=(module, spec, dims)`` enables the eval megakernel path.
    """
    def build_msg(k_major: bool):
        # k_major: the neighbor gather follows the index shape, so a
        # transposed (B, K, M) index array makes the gather write the
        # group kernel's position-major slab DIRECTLY (same row fetches;
        # the int index transpose is ~K*M*4 bytes, vs relayouting the
        # (M, K, C) feature slab after the fact)
        idx = jnp.swapaxes(nbr_idx, 1, 2) if k_major else nbr_idx
        dst = (pos_dst[:, None, :, :] if k_major
               else pos_dst[:, :, None, :])
        if x_src is not None:
            # one packed row gather for (x_j, pos_j): value-identical to
            # the two separate gathers (positions ride as exact 3x-bf16
            # residual triplets, ops/interpolate.py POS_PACK_CH; k-major
            # additionally dispatches to the tile-unique MXU gather)
            # eval: skip the invalid-slot zero select — every consumer of
            # the message slab masks (fused kernels: maskf; unfused:
            # masked BN + aggregate fills), so -1 slots may carry finite
            # row-0 garbage (gather_neighbors fill=False contract)
            xj, pj = neighbors.gather_neighbors_with_pos(
                x_src, pos_src, idx, layout="kq" if k_major else None,
                train=train, fill=train)
            rel = pj - dst.astype(jnp.float32)
            if step.normalize_radius and step.radius:
                rel = rel / step.radius
            return jnp.concatenate([xj, rel.astype(xj.dtype)], axis=-1)
        rel = neighbors.gather_neighbors(
            pos_src, idx, layout="kq" if k_major else None,
            train=train, fill=train) - dst
        if step.normalize_radius and step.radius:
            rel = rel / step.radius
        return rel

    if fused_ctx is not None:
        module, spec, dims = fused_ctx

        def h1_km():
            msg = build_msg(k_major=True)
            b, k_, m_, c_ = msg.shape
            # flatten at the gather output (free: contiguous) so layer 0
            # runs as one plain matmul — see the sa-geo path
            h1 = local_nn(msg.reshape(b, k_ * m_, c_), mask=None,
                          train=False, upto=0)
            return h1.reshape(b, k_, m_, -1)

        if not train:
            fused = _fused_group_eval(
                module, spec, step, dims, h1_km,
                nbr_mask, act=local_nn.act, family="sa", k_major=True)
        else:
            fused = _fused_group_train(
                module, spec, step, dims, h1_km, nbr_mask,
                act=local_nn.act, local_nn=local_nn, attend_nn=attend_nn,
                bn_momentum=bn_momentum, family="sa")
        if fused is not None:
            return fused
    msg = build_msg(k_major=False)
    msg = local_nn(msg, mask=nbr_mask, train=train, bn_momentum=bn_momentum)
    logits = None
    if attend_nn is not None:
        logits = attend_nn(msg, mask=nbr_mask, train=train,
                           bn_momentum=bn_momentum)
    return aggregate.aggregate(msg, nbr_mask, step.aggr_type, logits)


def _downsample(step: StepSpec, cloud: Cloud, budget: int, key):
    """Dispatch on downsample_type (reference pointnet2.py:47-61)."""
    if step.name == "sa-geo":
        use_curve = step.use_curve_fps
    else:
        use_curve = step.downsample_type == "curve-fps"
    if use_curve or (step.name == "sa" and step.downsample_type == "curve-fps"):
        return sampling.curve_fps(cloud.pos, cloud.curve_id, cloud.valid,
                                  step.curve_fps_arclen, budget, key=key)
    if step.name == "sa" and step.downsample_type == "voxel":
        return sampling.voxel_downsample(cloud.pos, cloud.valid,
                                         step.voxel_size, budget, key=key)
    if step.name == "sa" and step.downsample_type == "random":
        if key is None:
            key = jax.random.PRNGKey(0)
        return sampling.random_downsample(key, cloud.valid, step.ratio,
                                          budget=budget)
    return sampling.fps(cloud.pos, cloud.valid, step.ratio, key=key,
                        budget=budget)


class SAStep(nn.Module):
    """PointNet++ set abstraction (reference pointnet2.py:33-78)."""

    spec: ModelSpec
    step: StepSpec
    dims: Tuple[int, ...]
    budget: int
    table_bound: Optional[float] = None
    table_grid_bound: Optional[float] = None
    table_grid_cap: Optional[int] = None

    @nn.compact
    def __call__(self, cloud: Cloud, *, train=False, bn_momentum=0.1,
                 key=None) -> Cloud:
        step = self.step
        idx, idx_valid = _downsample(step, cloud, self.budget, key)
        down = cloud.gather(idx, idx_valid)
        if step.use_fast_knn:
            radius = step.radius if step.radius is not None else 0.25
            nbr_idx, _ = neighbors.subset_knn(cloud.pos, cloud.valid, idx,
                                              down.valid, step.knn,
                                              radius=radius,
                                              table_bound=self.table_bound,
                                              grid_bound=self.table_grid_bound,
                                              grid_cap=self.table_grid_cap)
        elif step.knn is not None:
            nbr_idx, _ = neighbors.subset_knn(cloud.pos, cloud.valid, idx,
                                              down.valid, step.knn,
                                              table_bound=self.table_bound)
        else:  # pure ball grouping, reference caps K at 128
            nbr_idx, _ = neighbors.ball_query(down.pos, cloud.pos, down.valid,
                                              cloud.valid, step.radius, 128)
        nbr_mask = nbr_idx >= 0
        local_nn = MLP(self.dims, use_bias=self.spec.use_bias,
                       dtype=_dt(self.spec), name="nn")
        attend_nn = _maybe_attend_mlp(self.spec, step, self.dims[-1])
        x = _group_conv(local_nn, attend_nn, step, cloud.x, cloud.pos,
                        down.pos, nbr_idx, nbr_mask, train, bn_momentum,
                        fused_ctx=(self, self.spec, self.dims))
        return down.with_features(x)


class CurveSAStep(nn.Module):
    """Curve set abstraction: arclength FPS + geodesic radius grouping
    (reference pointnet2.py:146-181)."""

    spec: ModelSpec
    step: StepSpec
    dims: Tuple[int, ...]
    budget: int

    @property
    def window(self) -> int:
        # static candidate half-window for the geodesic group (config knob)
        return self.step.curve_window

    def _h1_km_fn(self, cloud: Cloud, down: Cloud, idx, local_nn):
        """Position-major layer-0 builder shared by the eval and train
        megakernel paths: k-major window gather + one flat lin_0 matmul."""
        step = self.step

        def h1_fn():
            # first layer exactly as the materialized path below; rel is
            # pre-cast to the feature dtype — the Dense would cast the
            # concat anyway, so this halves HBM traffic without changing
            # a single rounding.  The window gather emits the kernel's
            # position-major (B, K, M, C) slab layout DIRECTLY (ascending
            # window order; aggregation is slot-order-free under the
            # mask), deleting the (M, K, C)->(K, M, C) relayout.
            if cloud.x is not None:
                # one packed window slice for (x, pos) — bit-identical to
                # the two separate slices at half the row-fetch count
                xw, pw = curve1d.gather_window_with_pos(
                    cloud.x, cloud.pos, idx, self.window,
                    idx_valid=down.valid, unique_rows=True, k_major=True)
                rel = pw - down.pos[:, None, :, :].astype(jnp.float32)
                if step.normalize_radius and step.radius:
                    rel = rel / step.radius
                msg = jnp.concatenate([xw, rel.astype(xw.dtype)], axis=-1)
            else:
                pw = curve1d.gather_window_features(
                    cloud.pos, idx, self.window,
                    idx_valid=down.valid, unique_rows=True, k_major=True)
                rel = pw - down.pos[:, None, :, :]
                if step.normalize_radius and step.radius:
                    rel = rel / step.radius
                msg = rel
            # flatten AT the gather output (contiguous in the k-major
            # layout, so the reshape is free): the layer-0 Dense then
            # lowers to one plain (W*M, C)x(C, C1) matmul instead of a
            # batched 1x1 conv that relayouts the slab (the downstream-
            # flatten variant of this was a measured NEGATIVE — see
            # CLAUDE.md round-3 (d) — the gather output is the one place
            # the flat layout comes for free)
            b, w_, m_, c_ = msg.shape
            h1 = local_nn(msg.reshape(b, w_ * m_, c_), mask=None,
                          train=False, upto=0)
            return h1.reshape(b, w_, m_, -1)

        return h1_fn

    def _fused_eval(self, cloud: Cloud, down: Cloud, idx, nbr_mask,
                    local_nn, attend_nn):
        """Eval megakernel: window gather + lin_0 in XLA, then the whole
        BN-affine -> MLP -> attention-softmax/max pipeline VMEM-resident
        (ops/pallas_group.py).  Replaces the chunked streaming walk on TPU;
        returns None (caller falls through) when not applicable."""
        h1_fn = self._h1_km_fn(cloud, down, idx, local_nn)
        mask_asc = curve1d.ascending_from_interleaved(nbr_mask, self.window)
        return _fused_group_eval(self, self.spec, self.step, self.dims,
                                 h1_fn, mask_asc, act="leaky_relu",
                                 family="sageo", k_major=True)

    def _fused_train(self, cloud: Cloud, down: Cloud, idx, nbr_mask,
                     local_nn, attend_nn, bn_momentum):
        """Train megakernel: exact batch stats + exact gradients VMEM-
        resident (ops/pallas_group_train.py); running stats written via
        the _stream tiny-call pattern.  None -> materialized fallback."""
        h1_fn = self._h1_km_fn(cloud, down, idx, local_nn)
        mask_asc = curve1d.ascending_from_interleaved(nbr_mask, self.window)
        return _fused_group_train(self, self.spec, self.step, self.dims,
                                  h1_fn, mask_asc, act="leaky_relu",
                                  local_nn=local_nn, attend_nn=attend_nn,
                                  bn_momentum=bn_momentum, family="sageo")

    def _stream(self, cloud: Cloud, down: Cloud, idx, nbr_mask, local_nn,
                attend_nn, train, bn_momentum):
        """Chunked window walk with online-softmax / online-max aggregation.

        Numerically equivalent to the materialized path (same mask fills,
        softmax reassociated) but never holds a (B, M, 2w+1, C) tensor:
        the flagship's (16k, 65, 256) intermediates disappear from HBM.

        Train mode first accumulates each BatchNorm layer's masked batch
        statistics with per-layer chunk walks (stats stay differentiable
        functions of the parameters, so gradients equal the materialized
        path's), writes the running stats once, then streams the forward
        with the precomputed stats.
        """
        step = self.step
        w = self.window
        mask_asc = curve1d.ascending_from_interleaved(nbr_mask, w)
        pos_p = curve1d.pad_for_window_chunks(cloud.pos, w)
        x_p = (curve1d.pad_for_window_chunks(cloud.x, w)
               if cloud.x is not None else None)
        total = 2 * w + 1
        chunk = 16
        b, m = idx.shape
        out_c = self.dims[-1]
        f32 = jnp.float32

        def chunk_inputs(lo):
            sz = min(chunk, total - lo)
            mask_c = mask_asc[:, :, lo:lo + sz]
            rel = (curve1d.window_chunk(pos_p, idx, lo, sz)
                   - down.pos[:, :, None, :])
            if step.normalize_radius and step.radius:
                rel = rel / step.radius
            if x_p is not None:
                msg = jnp.concatenate(
                    [curve1d.window_chunk(x_p, idx, lo, sz), rel], axis=-1)
            else:
                msg = rel
            return msg, mask_c

        def accumulate_stats(layer_fn, width):
            s = jnp.zeros((width,), f32)
            ss = jnp.zeros((width,), f32)
            cnt = jnp.float32(0.0)
            for lo in range(0, total, chunk):
                msg, mask_c = chunk_inputs(lo)
                h = layer_fn(msg, mask_c).astype(f32)
                mf = mask_c[..., None].astype(f32)
                s = s + jnp.sum(h * mf, axis=(0, 1, 2))
                ss = ss + jnp.sum(h * h * mf, axis=(0, 1, 2))
                cnt = cnt + jnp.sum(mf)
            cnt = jnp.clip(cnt, min=1.0)
            mean = s / cnt
            var = jnp.maximum(ss / cnt - mean * mean, 0.0)
            return mean, var, cnt

        stats_local = stats_att = None
        if train:
            n_layers = len(self.dims) - 1
            stats_local = [None] * n_layers
            for li in range(n_layers - 1):   # hidden layers carry BN
                stats_local[li] = accumulate_stats(
                    lambda msg, mc, li=li: local_nn(
                        msg, mask=mc, train=True, bn_momentum=bn_momentum,
                        bn_stats=stats_local, upto=li,
                        update_running=False),
                    self.dims[li + 1])
            if attend_nn is not None:
                stats_att = [None, None]
                stats_att[0] = accumulate_stats(
                    lambda msg, mc: attend_nn(
                        local_nn(msg, mask=mc, train=True,
                                 bn_momentum=bn_momentum,
                                 bn_stats=stats_local,
                                 update_running=False),
                        mask=mc, train=True, bn_momentum=bn_momentum,
                        upto=0, update_running=False),
                    self.dims[-1])
            # one tiny call per MLP writes the running stats from the
            # accumulated batch statistics
            msg0, mc0 = chunk_inputs(0)
            tiny, mtiny = msg0[:, :1], mc0[:, :1]
            out_t = local_nn(tiny, mask=mtiny, train=True,
                             bn_momentum=bn_momentum, bn_stats=stats_local,
                             update_running=True)
            if attend_nn is not None:
                attend_nn(out_t, mask=mtiny, train=True,
                          bn_momentum=bn_momentum, bn_stats=stats_att,
                          update_running=True)

        run_max = jnp.full((b, m, out_c), -1e30, f32)
        denom = jnp.zeros((b, m, out_c), f32)
        acc = jnp.zeros((b, m, out_c), f32)

        for lo in range(0, total, chunk):
            msg, mask_c = chunk_inputs(lo)
            msg = local_nn(msg, mask=mask_c, train=train,
                           bn_momentum=bn_momentum, bn_stats=stats_local,
                           update_running=False)
            if step.aggr_type == "max":
                hit = jnp.where(mask_c[..., None], msg.astype(f32),
                                aggregate.MAX_FILL)
                run_max = jnp.maximum(run_max, jnp.max(hit, axis=2))
                continue
            logits = attend_nn(msg, mask=mask_c, train=train,
                               bn_momentum=bn_momentum, bn_stats=stats_att,
                               update_running=False)
            logits = jnp.where(mask_c[..., None], logits.astype(f32),
                               aggregate.ATTEND_FILL)
            new_max = jnp.maximum(run_max, jnp.max(logits, axis=2))
            scale = jnp.exp(run_max - new_max)
            e = jnp.exp(logits - new_max[:, :, None, :])
            denom = denom * scale + jnp.sum(e, axis=2)
            acc = acc * scale + jnp.sum(e * msg.astype(f32), axis=2)
            run_max = new_max

        dt = _dt(self.spec) or jnp.float32
        if step.aggr_type == "max":
            return run_max.astype(dt)
        return (acc / denom).astype(dt)

    @nn.compact
    def __call__(self, cloud: Cloud, *, train=False, bn_momentum=0.1,
                 key=None) -> Cloud:
        import os

        step = self.step
        x = cloud.xyz_concat(step.with_xyz)
        cloud = cloud.with_features(x)
        idx, idx_valid = _downsample(step, cloud, self.budget, key)
        down = cloud.gather(idx, idx_valid)
        _, nbr_mask = curve1d.radius_1d_group_subset(
            cloud.pos, idx, down.valid, cloud.curve_id, cloud.valid,
            step.radius, self.window)
        local_nn = MLP(self.dims, act="leaky_relu", use_bias=self.spec.use_bias,
                       dtype=_dt(self.spec), name="nn")
        attend_nn = _maybe_attend_mlp(self.spec, step, self.dims[-1])

        # Streaming walk of the candidate window.  Eval applies BN running
        # stats per chunk (exact); train-mode streaming (chunked two-pass
        # BN statistics, exact gradients) exists and is equivalence-tested,
        # but measured SLOWER than the materialized path on v5e at B=1
        # (236 vs 176 ms/step: the per-layer stats walks recompute more
        # than the big tensors cost on a memory-rich chip), so the default
        # streams only in eval; CCN_STREAM_SAGEO=force enables it for
        # memory-constrained training.  On CPU the default stays
        # materialized to keep golden activations bit-stable.
        if not train:
            fused = self._fused_eval(cloud, down, idx, nbr_mask, local_nn,
                                     attend_nn)
            if fused is not None:
                return down.with_features(fused)
        else:
            fused = self._fused_train(cloud, down, idx, nbr_mask, local_nn,
                                      attend_nn, bn_momentum)
            if fused is not None:
                return down.with_features(fused)
        stream_env = os.environ.get("CCN_STREAM_SAGEO", "auto")
        use_stream = (step.aggr_type in ("attend", "max")
                      and stream_env != "0"
                      and (stream_env == "force"
                           or (not train
                               and jax.default_backend() not in ("cpu",))))
        if use_stream:
            xo = self._stream(cloud, down, idx, nbr_mask, local_nn,
                              attend_nn, train, bn_momentum)
            return down.with_features(xo)

        # candidates are contiguous along-curve windows: fetch features and
        # positions as ONE packed window slice (wide reads, single
        # row-fetch pass) instead of row gathers
        if cloud.x is not None:
            xw, pw = curve1d.gather_window_with_pos(
                cloud.x, cloud.pos, idx, self.window,
                idx_valid=down.valid, unique_rows=True)
            rel = pw - down.pos[:, :, None, :].astype(jnp.float32)
            if step.normalize_radius and step.radius:
                rel = rel / step.radius
            msg = jnp.concatenate([xw, rel.astype(xw.dtype)], axis=-1)
        else:
            pw = curve1d.gather_window_features(
                cloud.pos, idx, self.window,
                idx_valid=down.valid, unique_rows=True)
            rel = pw - down.pos[:, :, None, :]
            if step.normalize_radius and step.radius:
                rel = rel / step.radius
            msg = rel
        msg = local_nn(msg, mask=nbr_mask, train=train,
                       bn_momentum=bn_momentum)
        logits = None
        if attend_nn is not None:
            logits = attend_nn(msg, mask=nbr_mask, train=train,
                               bn_momentum=bn_momentum)
        xo = aggregate.aggregate(msg, nbr_mask, step.aggr_type, logits)
        return down.with_features(xo)


class GlobalSAStep(nn.Module):
    """Per-sample global pooling (reference pointnet2.py:81-116)."""

    spec: ModelSpec
    step: StepSpec
    dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, cloud: Cloud, *, train=False, bn_momentum=0.1,
                 key=None) -> Cloud:
        xin = jnp.concatenate([cloud.x, cloud.pos], axis=-1)
        x = MLP(self.dims, use_bias=self.spec.use_bias,
                dtype=_dt(self.spec), name="nn")(
            xin, mask=cloud.valid, train=train, bn_momentum=bn_momentum)
        mask = cloud.valid[..., None]
        if self.step.pooling == "mean":
            pooled = jnp.sum(jnp.where(mask, x, 0.0), axis=1) / jnp.clip(
                jnp.sum(mask, axis=1), min=1)
        else:
            pooled = jnp.max(jnp.where(mask, x, -1e30), axis=1)
        pooled = pooled[:, None, :]  # (B, 1, C)
        return Cloud(
            pos=cloud.pos[:, :1],
            valid=jnp.any(cloud.valid, axis=1, keepdims=True),
            curve_id=cloud.curve_id[:, :1],
            x=pooled,
            parent_idx=jnp.zeros((cloud.batch_size, 1), jnp.int32),
        )


class FPStep(nn.Module):
    """Feature propagation upsample (reference pointnet2.py:119-143).

    The subset path sizes its dropped-query budget statically from the
    candidate-row pad length (``ops/interpolate.SPLIT_KEEP_FRAC``): on a
    NEW dataset/config, run ``tools/calibrate.py`` first — if real
    occupancy drops more queries than the budget, the overflowed queries
    silently receive zero fp features (surfaced only by the
    ``fp_split_overflow`` telemetry; see the DEVIATIONS static-budget
    runbook).
    """

    spec: ModelSpec
    step: StepSpec
    dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, cloud: Cloud, skip: Cloud, *, train=False,
                 bn_momentum=0.1, key=None) -> Cloud:
        k = self.step.knn if self.step.knn else 3
        if cloud.parent_idx is not None:
            # the 3-NN candidates are a subset of the skip row
            # (parent_idx): the kept/dropped split sweeps only the
            # dropped queries (ops/interpolate.py).  Precondition —
            # ``skip`` IS the row parent_idx indexes: guaranteed by the
            # interpreter's down_skips LIFO (base.py pairs each fp step
            # with the level whose downsample produced parent_idx); not
            # shape-checkable, so asserted structurally there, not here.
            x = interpolate.knn_interpolate_subset(
                cloud.x, cloud.parent_idx, cloud.valid, skip.pos,
                skip.valid, k=k, cand_pos=cloud.pos)
        else:
            x = interpolate.knn_interpolate(cloud.x, cloud.pos, cloud.valid,
                                            skip.pos, skip.valid, k=k)
        # the interpreter substitutes pos for a None skip-x (base.py:196-197)
        x_skip = skip.x if skip.x is not None else skip.pos
        parts = [x, x_skip]
        if self.step.with_xyz:
            parts.append(skip.pos)
        x = jnp.concatenate(parts, axis=-1)
        x = MLP(self.dims, use_bias=self.spec.use_bias,
                dtype=_dt(self.spec), name="nn")(
            x, mask=skip.valid, train=train, bn_momentum=bn_momentum)
        return skip.with_features(x)


class CurveFPStep(nn.Module):
    """Geodesic upsample along curves (reference pointnet2.py:184-205)."""

    spec: ModelSpec
    step: StepSpec
    dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, cloud: Cloud, skip: Cloud, *, train=False,
                 bn_momentum=0.1, key=None) -> Cloud:
        k = self.step.knn if self.step.knn else 3
        # cloud.parent_idx holds this level's indices into the skip row —
        # the reference's `downsample-idxs` state (base.py:166-168).
        x = interpolate.knn_interpolate_1d(
            cloud.x, cloud.parent_idx, cloud.valid, skip.pos, skip.curve_id,
            skip.valid, k=k)
        x_skip = skip.x if skip.x is not None else skip.pos
        parts = [x, x_skip]
        if self.step.with_xyz:
            parts.append(skip.pos)
        x = jnp.concatenate(parts, axis=-1)
        x = MLP(self.dims, act="leaky_relu", use_bias=self.spec.use_bias,
                dtype=_dt(self.spec), name="nn")(
            x, mask=skip.valid, train=train, bn_momentum=bn_momentum)
        return skip.with_features(x)


class EdgeConvStep(nn.Module):
    """DGCNN (feature-space kNN) / SGCNN (xyz kNN) edge convolution
    (reference dgcnn.py:98-266).

    ``self.step.name`` selects the graph space; ``use_sparse_feat_agg``
    selects the reference's slow-path message ordering ``[x_i, x_j - x_i]``
    (dgcnn.py:227) vs. the fast path's ``[x_j, x_i - x_j]`` (dgcnn.py:173).
    """

    spec: ModelSpec
    step: StepSpec
    dims: Tuple[int, ...]
    table_bound: Optional[float] = None
    table_grid_bound: Optional[float] = None
    table_grid_cap: Optional[int] = None

    def _try_fused(self, x, xj, nbr_mask, train):
        """Eval-only fused message-MLP+max kernel (ops/pallas_edge.py).

        Applies when aggregation is max and BN statistics are frozen; the
        whole Dense->BN->ReLU->...->Dense->masked-max pipeline runs in VMEM
        instead of round-tripping (B, N, K, H) intermediates through HBM.
        """
        import os

        step = self.step
        # Off by default: measured 154 vs 149 ms on v5e at N=32k — the
        # per-neighbor fori_loop of small matmuls loses to XLA's single
        # batched matmul despite saving the HBM round-trips.  Kept as
        # groundwork for a gather-in-kernel version.
        if (train or self.is_initializing() or step.aggr_type != "max"
                or jax.default_backend() in ("cpu",)
                or os.environ.get("CCN_FUSED_EDGE", "0") != "1"):
            return None
        # wide layers cannot hold weights + double-buffered blocks in VMEM
        if x.shape[-1] > 300 or max(self.dims) > 512:
            return None
        try:
            p = self.variables["params"]["nn"]
            bs = self.variables["batch_stats"]["nn"]
        except (KeyError, AttributeError):
            return None
        from ..ops import pallas_edge

        n_layers = len(self.dims) - 1
        weights, biases = [], []
        for li in range(n_layers):
            lp = p[f"lin_{li}"]
            w = lp["kernel"]
            b = lp.get("bias", jnp.zeros((w.shape[1],), w.dtype))
            if li < n_layers - 1:
                nrm, st = p[f"norm_{li}"], bs[f"norm_{li}"]
                w, b = pallas_edge.fold_batchnorm(
                    w, b, nrm["scale"], nrm["bias"], st["mean"], st["var"])
            if li == 0 and (step.name != "sgcnn"
                            or step.use_sparse_feat_agg):
                # fold the slow-path message order [x_i, x_j - x_i]
                t = pallas_edge.slow_order_transform(x.shape[-1])
                w = jnp.asarray(t) @ w
            weights.append(w)
            biases.append(b)
        return pallas_edge.fused_edge_mlp_max(xj, x, nbr_mask, weights,
                                              biases)

    @nn.compact
    def __call__(self, cloud: Cloud, *, train=False, bn_momentum=0.1,
                 key=None) -> Cloud:
        step = self.step
        x = cloud.xyz_concat(step.with_xyz)
        if step.name in ("dgcnn", "dgcnn-rad"):
            # the dynamic-graph SEARCH runs in feature space where the xyz
            # channels are coordinates, not matmul inputs — keep them f32
            # there (xyz_concat pre-casts to the compute dtype for the
            # matmul consumers; bf16 coordinates would misorder near-tie
            # neighbors and flip radius-boundary membership)
            xs = (x if not step.with_xyz or cloud.x is None
                  else jnp.concatenate(
                      [cloud.x.astype(jnp.float32), cloud.pos], axis=-1))
        if step.name == "dgcnn":
            nbr_idx, _ = neighbors.knn(xs, xs, cloud.valid, cloud.valid,
                                       step.knn)
        elif step.name == "dgcnn-rad":
            # radius query in FEATURE space (DynamicEdgeConv use_knn=False,
            # reference dgcnn.py:81-84,113-126)
            nbr_idx, _ = neighbors.ball_query(xs, xs, cloud.valid,
                                              cloud.valid, step.radius, 128)
        else:  # sgcnn
            if step.use_sparse_feat_agg:
                # slow path: exact kNN, no radius cap (dgcnn.py:209-225)
                nbr_idx, _ = neighbors.same_set_knn(
                    cloud.pos, cloud.valid, step.knn,
                    table_bound=self.table_bound)
            else:
                r = step.radius if step.radius is not None else 1.0
                nbr_idx, _ = neighbors.same_set_knn(
                    cloud.pos, cloud.valid, step.knn, radius=r,
                    table_bound=self.table_bound,
                    grid_bound=self.table_grid_bound,
                    grid_cap=self.table_grid_cap)
                nbr_idx = neighbors.add_self_loops(nbr_idx, cloud.valid)
        nbr_mask = nbr_idx >= 0
        local_nn = MLP(self.dims, use_bias=self.spec.use_bias,
                       dtype=_dt(self.spec), name="nn")
        fast_order = step.name == "sgcnn" and not step.use_sparse_feat_agg

        # Matmul-before-gather: the first edge layer re-associates as
        #   fast  [x_j, x_i-x_j] @ W = gather(x@(Wt-Wb)) + (x@Wb + b)_i
        #   slow  [x_i, x_j-x_i] @ W = gather(x@Wb) + (x@(Wt-Wb) + b)_i
        # computed via three calls to the SAME lin_0 Dense on N-row inputs
        # (dense(cat[x,-x]) = x@(Wt-Wb)+b, dense(cat[0,x]) = x@Wb+b), so the
        # (B, N, K, 2C) message concat never materializes and the per-row
        # gather moves the (usually narrower, bf16) first-layer output.
        # Gated off CPU to keep golden activations bit-stable
        # (reassociation changes rounding).
        import os

        split_env = os.environ.get("CCN_SPLIT_EDGE", "auto")
        use_split = (split_env != "0"
                     and (split_env == "force"
                          or jax.default_backend() not in ("cpu",)))
        if use_split:
            def _split_uv(dense):
                zeros = jnp.zeros_like(x)
                b_only = dense(jnp.zeros((1, 1, 2 * x.shape[-1]), x.dtype))
                d_pm = dense(jnp.concatenate([x, -x], axis=-1))
                d_0x = dense(jnp.concatenate([zeros, x], axis=-1))
                if fast_order:
                    return d_pm - b_only, d_0x
                return d_0x - b_only, d_pm

            def first_map(dense):
                u, v = _split_uv(dense)
                return (neighbors.gather_neighbors(u, nbr_idx)
                        + v[:, :, None, :])

            if not train:
                def first_map_km(dense):
                    # k-major slab for the group megakernel: the gather
                    # follows the transposed index shape (see _group_conv).
                    # fill=False: the fused kernel masks every slot by
                    # nbr_mask (aggregation fill / attend logits), so the
                    # invalid-slot zero select is a redundant full
                    # elementwise pass over the slab
                    u, v = _split_uv(dense)
                    return (neighbors.gather_neighbors(
                        u, jnp.swapaxes(nbr_idx, 1, 2), layout="kq",
                        train=False, fill=False)
                        + v[:, None, :, :])

                fused = _fused_group_eval(
                    self, self.spec, step, self.dims,
                    lambda: local_nn(None, mask=nbr_mask, train=False,
                                     first_map=first_map_km, upto=0),
                    nbr_mask, act=local_nn.act, family="edge",
                    k_major=True)
                if fused is not None:
                    return cloud.with_features(
                        fused * cloud.valid[..., None])
            elif step.aggr_type == "max":

                def first_map_km_t(dense):
                    u, v = _split_uv(dense)
                    return (neighbors.gather_neighbors(
                        u, jnp.swapaxes(nbr_idx, 1, 2), layout="kq",
                        train=True)
                        + v[:, None, :, :])

                fused = _fused_group_train(
                    self, self.spec, step, self.dims,
                    lambda: local_nn(None, mask=nbr_mask, train=False,
                                     first_map=first_map_km_t, upto=0),
                    nbr_mask, act=local_nn.act, local_nn=local_nn,
                    attend_nn=None, bn_momentum=bn_momentum, family="edge")
                if fused is not None:
                    return cloud.with_features(
                        fused * cloud.valid[..., None])

            # Flat MLP form (NEGATIVE, off-path; A/B via CCN_EDGE_FLAT=force):
            # run every layer past the gather on the (B, M*K, C) view so the
            # rank-3 dense lowers to a plain matmul instead of a b0f conv.
            # Measured on v5e at 36864: eval 60.4 -> 63.2 ms/step sync span,
            # train 188.0 -> 210.8 — the XLA gather fusion ALREADY emits flat
            # (M*K, C) rows in the rank-4 graph (both traces show identical
            # bf16[483840,64] gather fusions), so flattening buys nothing and
            # the extra reshapes force relayout copies of the big message
            # tensors.  Math is identical (same contraction, same BN element
            # set) — equivalence pinned by tests/test_flat_edge.py.
            flat_env = os.environ.get("CCN_EDGE_FLAT", "0")
            use_flat = flat_env == "force"
            if use_flat:
                bsz, m, kk = nbr_idx.shape

                def first_map_flat(dense):
                    u, v = _split_uv(dense)
                    g = neighbors.gather_neighbors(u, nbr_idx)
                    g = g + v[:, :, None, :]
                    return g.reshape(bsz, m * kk, g.shape[-1])

                msg = local_nn(None, mask=nbr_mask.reshape(bsz, m * kk),
                               train=train, bn_momentum=bn_momentum,
                               first_map=first_map_flat)
                msg = msg.reshape(bsz, m, kk, msg.shape[-1])
            else:
                msg = local_nn(None, mask=nbr_mask, train=train,
                               bn_momentum=bn_momentum, first_map=first_map)
        else:
            xj = neighbors.gather_neighbors(x, nbr_idx)
            fused = self._try_fused(x, xj, nbr_mask, train)
            if fused is not None:
                return cloud.with_features(fused * cloud.valid[..., None])
            xi = x[:, :, None, :]
            if fast_order:
                msg = jnp.concatenate([xj, xi - xj], axis=-1)
            else:
                msg = jnp.concatenate(
                    [jnp.broadcast_to(xi, xj.shape), xj - xi], axis=-1)
            msg = local_nn(msg, mask=nbr_mask, train=train,
                           bn_momentum=bn_momentum)
        logits = None
        if step.aggr_type in ("attend", "weighted-sum"):
            attend_nn = _maybe_attend_mlp(self.spec, step, self.dims[-1])
            logits = attend_nn(msg, mask=nbr_mask, train=train,
                               bn_momentum=bn_momentum)
        out = aggregate.aggregate(msg, nbr_mask, step.aggr_type, logits)
        out = out * cloud.valid[..., None]
        return cloud.with_features(out)


class SymmetricCurveConvStep(nn.Module):
    """Symmetric 1D convolution along curves (reference fast_conv1d.py).

    Learned taps w_0..w_h are mirrored (w_{-d} = w_{+d}); the conv over the
    zero-stuffed point sequence is expressed as a same-curve windowed sum
    followed by one dense matmul per layer (curve1d.symmetric_window_concat).
    ``v1`` recomputes the feature-derivative channel before every layer
    (fast_conv1d.py:129-143); ``v2`` computes it once (fast_conv1d.py:66-68).
    """

    spec: ModelSpec
    step: StepSpec
    dims: Tuple[int, ...]
    v1: bool = False

    @nn.compact
    def __call__(self, cloud: Cloud, *, train=False, bn_momentum=0.1,
                 key=None) -> Cloud:
        step = self.step
        x = cloud.xyz_concat(step.with_xyz)
        half_k = (step.kernel_size or 5) // 2
        cid, valid = cloud.curve_id, cloud.valid
        if self.v1 or half_k == 0:
            # V1 re-stuffs zeros between curves before EVERY conv
            # (fast_conv1d.py:136-141), so each curve convolves
            # independently — same-curve masked windows are exact.
            for i in range(1, len(self.dims)):
                if step.with_diff and (self.v1 or i == 1):
                    diff = curve1d.feature_diffs(x, cid, valid)
                    x = jnp.concatenate([x, diff], axis=-1)
                xw = curve1d.symmetric_window_concat(x, cid, valid, half_k)
                x = nn.Dense(self.dims[i], use_bias=True,
                             dtype=_dt(self.spec), name=f"conv_{i-1}")(xw)
                x = MaskedBatchNorm(name=f"norm_{i-1}")(
                    x, mask=valid, use_running_average=not train,
                    momentum=bn_momentum)
                x = leaky_relu(x)
            x = x * valid[..., None]
            return cloud.with_features(x)

        # V2 keeps ONE zero-stuffed sequence through all layers
        # (fast_conv1d.py:49-74): gap slots develop non-zero values (bias/
        # BN/activation of boundary neighborhoods) that feed curve-boundary
        # points from the second conv on, and BN statistics include the gap
        # slots.  Reproduced exactly via the gap-expanded layout; eval on
        # 2-conv stacks takes the cheaper halo-corrected path (identical
        # values, no expanded-row convs).
        import os

        nconvs = len(self.dims) - 1
        pad = half_k * nconvs
        if step.with_diff:
            diff = curve1d.feature_diffs(x, cid, valid)
            x = jnp.concatenate([x, diff], axis=-1)
        x = x * valid[..., None].astype(x.dtype)
        exp_idx, n_exp, mask_exp, overflow = curve1d.gap_expand_indices(
            cid, valid, pad, self.spec.curve_budget)
        telemetry.record(f"{self.name}/curve_budget_overflow",
                         jnp.sum(overflow))

        layers = [
            (nn.Dense(self.dims[i], use_bias=True, dtype=_dt(self.spec),
                      name=f"conv_{i-1}"),
             MaskedBatchNorm(name=f"norm_{i-1}"))
            for i in range(1, len(self.dims))
        ]

        # Train megakernel: the (2L+1)-pass exact-BN chain with custom VJP
        # (ops/pallas_conv1d.conv1d_chain_train); running stats written
        # through tiny stats_override BN calls (the _fused_group_train
        # pattern).  DEFAULT OFF: measured NEGATIVE on v5e (train bench
        # 295.8k -> 273.9k, span 118.2 -> 128.0 ms) — the 9 small
        # custom-calls per step act as scheduling barriers that cost more
        # than the ~4 ms of XLA conv work they replace (the same
        # barrier economics as CCN_FUSED_GROUP's edge-off finding in
        # round 3).  Kept behind CCN_CONV_KERNEL_TRAIN=1 with full
        # gradient-parity tests for hardware where the calculus differs.
        kt = os.environ.get("CCN_CONV_KERNEL_TRAIN", "0")
        use_ktrain = (train and not self.is_initializing()
                      and kt not in ("0",)
                      and (jax.default_backend() != "cpu"
                           or kt == "interp"))
        if use_ktrain:
            try:
                p = self.variables["params"]
            except (KeyError, AttributeError):
                p = None
            if p is not None and "conv_0" in p:
                from ..ops import pallas_conv1d

                raw = tuple(
                    (p[f"conv_{i}"]["kernel"],
                     p[f"conv_{i}"].get("bias", jnp.zeros(
                         (p[f"conv_{i}"]["kernel"].shape[1],),
                         jnp.float32)),
                     p[f"norm_{i}"]["scale"], p[f"norm_{i}"]["bias"])
                    for i in range(nconvs))
                xe = curve1d.gap_scatter(x, exp_idx, n_exp)
                used = jnp.sum(mask_exp, axis=-1).astype(jnp.int32)
                out, stats = pallas_conv1d.conv1d_chain_train(
                    xe, raw, used, half_k, 1024, kt == "interp")
                for i, (_, norm_i) in enumerate(layers):
                    # running-stat write with the kernel's exact batch
                    # stats; the tiny output is discarded
                    norm_i(jnp.zeros((1, 1, raw[i][0].shape[1]),
                                     jnp.float32),
                           use_running_average=False,
                           momentum=bn_momentum,
                           stats_override=jax.lax.stop_gradient(stats[i]))
                xf = curve1d.gap_gather(out.astype(x.dtype), exp_idx,
                                        valid)
                return cloud.with_features(xf)

        # Eval megakernel: the whole chain over the gap-expanded row in
        # ONE Pallas pass (ops/pallas_conv1d.py) — replaces both the
        # expanded-row XLA convs and the halo-correction machinery.
        interp = os.environ.get("CCN_CONV_KERNEL", "1") == "interp"
        use_kernel = (not train and not self.is_initializing()
                      and os.environ.get("CCN_CONV_KERNEL", "1")
                      not in ("0",)
                      and (jax.default_backend() != "cpu" or interp))
        if use_kernel:
            try:
                p = self.variables["params"]
                bs = self.variables["batch_stats"]
            except (KeyError, AttributeError):
                p = bs = None
            if p is not None and "conv_0" in p:
                from ..ops import pallas_conv1d

                weights = pallas_conv1d.fold_conv_bn_eval(p, bs, nconvs)
                xe = curve1d.gap_scatter(x, exp_idx, n_exp)
                used = jnp.sum(mask_exp, axis=-1).astype(jnp.int32)
                out = jnp.stack([
                    pallas_conv1d.conv1d_chain_eval(
                        xe[bi], weights, used[bi], half_k=half_k,
                        interpret=interp)
                    for bi in range(xe.shape[0])])
                xf = curve1d.gap_gather(out, exp_idx, valid)
                return cloud.with_features(xf)

        use_halo = (not train and not self.is_initializing()
                    and os.environ.get("CCN_CONV_HALO", "1") != "0")
        if use_halo:
            return cloud.with_features(self._v2_halo(
                x, cid, valid, half_k, pad, exp_idx, n_exp, layers))

        xe = curve1d.gap_scatter(x, exp_idx, n_exp)
        for dense_i, norm_i in layers:
            xw = curve1d.window_concat_nomask(xe, half_k)
            xe = dense_i(xw)
            xe = norm_i(xe, mask=mask_exp, use_running_average=not train,
                        momentum=bn_momentum)
            xe = leaky_relu(xe) * mask_exp[..., None].astype(xe.dtype)
        x = curve1d.gap_gather(xe, exp_idx, valid)
        return cloud.with_features(x)

    def _v2_halo(self, x, cid, valid, h, pad, exp_idx, n_exp, layers):
        """Halo-corrected eval path for V2 stacks of any depth.

        Layer i's gap INPUTS come from layer i-1 (zero for i=1), so valid
        rows can run the cheap masked-window conv provided (a) boundary
        rows get scatter-add corrections from the previous layer's gap
        values and (b) each layer's gap values are recomputed on small
        per-boundary windows [gap - h, gap + pad + h) assembled from the
        corrected valid values plus all previous gap values.  The expanded
        -row convs/BN of the exact path disappear; equality with that path
        is pinned by tests (and the torch V2 oracle).  Rows whose curve
        count exceeds ``curve_budget`` lose gaps between the excess curves
        in BOTH paths' telemetry sense, but the overflow semantics differ
        slightly (halo reads zeros where the expansion lets excess curves
        abut) — telemetry flags those rows.
        """
        b, n = cid.shape
        cb = self.spec.curve_budget
        win_w = pad + 2 * h

        # ---- boundary geometry (before/after gap per curve; interior
        # gaps appear twice, which keeps indexing uniform)
        starts_mask = segments.curve_starts(cid, valid) & valid
        starts_idx, slot_ok = sampling.mask_to_indices(starts_mask, cb)
        n_curves = jnp.sum(starts_mask, axis=-1).astype(jnp.int32)
        n_valid = jnp.sum(valid, axis=-1).astype(jnp.int32)
        slot_i = jnp.arange(cb, dtype=jnp.int32)[None, :]
        next_start = jnp.concatenate(
            [starts_idx[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
        is_last = slot_i == (n_curves - 1)[:, None]
        ends_idx = jnp.where(is_last, n_valid[:, None] - 1, next_start - 1)
        e_before = starts_idx + pad * slot_i          # gap start (expanded)
        e_after = ends_idx + pad * (slot_i + 1) + 1
        # the before-gap of curve c+1 IS the after-gap of curve c; for the
        # gap-row scatter below, one copy suffices: all before-gaps plus
        # the last curve's after-gap
        e_after_last = jnp.where(is_last & slot_ok, e_after, n_exp)

        def gap_windows(y_exp_padded, e_start, c):
            base = (e_start[:, :, None]
                    + jnp.arange(win_w, dtype=jnp.int32)[None, None, :])
            idx = jnp.clip(base, 0, n_exp + 2 * h - 1)
            rows = jax.vmap(lambda xb, ib: xb[ib])(
                y_exp_padded, idx.reshape(b, -1))
            return rows.reshape(b * cb, win_w, c)

        def layer_gaps(dense_i, norm_i, y_exp_padded, e_start, c):
            win = gap_windows(y_exp_padded, e_start, c)
            ww = curve1d.window_concat_nomask(win, h)
            g = dense_i(ww)
            g = norm_i(g, mask=jnp.ones(ww.shape[:2], bool),
                       use_running_average=True)
            g = leaky_relu(g)
            g = g.reshape(b, cb, win_w, -1)[:, :, h:h + pad]
            return g * slot_ok[:, :, None, None].astype(g.dtype)

        y = x
        g_before = g_after = None
        nconvs = len(layers)
        for li, (dense_i, norm_i) in enumerate(layers):
            xw = curve1d.symmetric_window_concat(y, cid, valid, h)
            c_in = y.shape[-1]
            if g_before is not None:
                # boundary corrections: tap d >= delta crosses into the gap
                rows_list, upd_list = [], []
                for delta in range(1, h + 1):
                    blocks_s = [jnp.zeros((b, cb, c_in), y.dtype)]
                    blocks_e = [jnp.zeros((b, cb, c_in), y.dtype)]
                    for d in range(1, h + 1):
                        if d >= delta:
                            blocks_s.append(
                                g_before[:, :, pad + delta - 1 - d])
                            blocks_e.append(g_after[:, :, d - delta])
                        else:
                            blocks_s.append(
                                jnp.zeros((b, cb, c_in), y.dtype))
                            blocks_e.append(
                                jnp.zeros((b, cb, c_in), y.dtype))
                    r_s = starts_idx + (delta - 1)
                    r_e = ends_idx - (delta - 1)
                    ok_s = slot_ok & (r_s <= ends_idx)
                    ok_e = slot_ok & (r_e >= starts_idx)
                    rows_list += [jnp.where(ok_s, r_s, n),
                                  jnp.where(ok_e, r_e, n)]
                    upd_list += [
                        jnp.concatenate(blocks_s, axis=-1)
                        * ok_s[:, :, None].astype(y.dtype),
                        jnp.concatenate(blocks_e, axis=-1)
                        * ok_e[:, :, None].astype(y.dtype),
                    ]
                rows = jnp.concatenate(rows_list, axis=1)
                upds = jnp.concatenate(upd_list, axis=1)
                xw = jax.vmap(lambda w, r, u: w.at[r].add(u, mode="drop"))(
                    xw, rows, upds)
            y_new = dense_i(xw)
            y_new = norm_i(y_new, mask=valid, use_running_average=True)
            y_new = leaky_relu(y_new) * valid[..., None].astype(y_new.dtype)

            if li + 1 < nconvs:
                # assemble the expanded sequence of THIS layer's inputs:
                # corrected valid values + all previous gap values — the
                # next layer's gap windows read from it
                y_exp = curve1d.gap_scatter(y, exp_idx, n_exp)
                if g_before is not None:
                    gcols = jnp.arange(pad, dtype=jnp.int32)
                    gap_rows = jnp.concatenate(
                        [(jnp.where(slot_ok, e_before, n_exp)[:, :, None]
                          + gcols[None, None, :]).reshape(b, -1),
                         (e_after_last[:, :, None]
                          + gcols[None, None, :]).reshape(b, -1)], axis=1)
                    gap_vals = jnp.concatenate(
                        [g_before.reshape(b, -1, c_in),
                         g_after.reshape(b, -1, c_in)], axis=1)
                    y_exp = jax.vmap(
                        lambda xb, rb, vb: xb.at[rb].set(vb, mode="drop")
                    )(y_exp, gap_rows, gap_vals)
                y_exp_p = jnp.pad(y_exp, ((0, 0), (h, h), (0, 0)))
                g_before = layer_gaps(dense_i, norm_i, y_exp_p, e_before,
                                      c_in)
                g_after = layer_gaps(dense_i, norm_i, y_exp_p, e_after,
                                     c_in)
            y = y_new
        return y

class SkipConnectStep(nn.Module):
    """Concat skip features + MLP (reference skip_connect.py:6-15)."""

    spec: ModelSpec
    step: StepSpec
    dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, cloud: Cloud, skips: Sequence[jax.Array], *,
                 train=False, bn_momentum=0.1, key=None) -> Cloud:
        x = jnp.concatenate([cloud.x] + list(skips), axis=-1)
        x = MLP(self.dims, act="leaky_relu", use_bias=self.spec.use_bias,
                dtype=_dt(self.spec), name="nn")(
            x, mask=cloud.valid, train=train, bn_momentum=bn_momentum)
        return cloud.with_features(x)


class SharedMLPStep(nn.Module):
    """Pointwise MLP with optional xyz concat (reference mlp.py:5-22)."""

    spec: ModelSpec
    step: StepSpec
    dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, cloud: Cloud, *, train=False, bn_momentum=0.1,
                 key=None) -> Cloud:
        x = cloud.xyz_concat(self.step.with_xyz)
        act = self.step.act or "leaky_relu"
        x = MLP(self.dims, act=act, use_bias=self.spec.use_bias,
                plain_last=self.step.plain_last, dtype=_dt(self.spec),
                name="mlp")(
            x, mask=cloud.valid, train=train, bn_momentum=bn_momentum)
        return cloud.with_features(x)
