"""Model assembly: the step-DSL interpreter (reference ``src/models/base.py``).

``CurveCloudNet`` interprets a :class:`ModelSpec` — a config-declared sequence
of steps — threading a batch-padded Cloud through each step and maintaining
the same two skip-connection stacks as the reference:

  * *downsampled* skips: every ``sa``/``sa-geo``/``sa-global`` step pushes its
    **input** cloud; ``fp``/``fp-geo`` pop and upsample back to it
    (reference base.py:199-203 — note ``state['x'][step_idx]`` is the input
    to step ``step_idx`` because histories are offset by the initial entry).
  * *proportional* skips: every step whose name is in
    ``skip_connect_state_store`` pushes its input features; ``skip-connect``
    pops ``num_skips`` of them (base.py:205-209).

All control flow is Python at trace time — the interpreted program is one
static XLA computation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .cloud import Cloud
from .layers import MLP
from .modules import (
    CurveFPStep,
    CurveSAStep,
    EdgeConvStep,
    FPStep,
    GlobalSAStep,
    SAStep,
    SharedMLPStep,
    SkipConnectStep,
    SymmetricCurveConvStep,
)
from .spec import ModelSpec


def _voxel_cell_occupancy(cell: float, v: float) -> int:
    """Exact max count of v-voxels intersecting any grid cell of edge
    ``cell`` (cubed), both grids floor(p/size)-anchored at the origin
    (ops/grid_knn._cell_coords and ops/sampling.voxel_downsample).

    The naive (floor(cell/v)+1)^3 is WRONG for general ratios: at
    cell/v = 3.9 the alignment drift reaches floor+2 per axis.  Integer
    rationalization (1e-6 quantum) makes the per-cell sweep exact, and
    the pattern repeats with period v/gcd so the sweep is tiny.  Points
    sitting within float-eps of a voxel boundary can drift one index;
    the grid's 2 shared overflow planes absorb such stray spills
    losslessly (ops/grid_knn.grid_knn_single).
    """
    import math

    ci, vi = round(cell * 1e6), round(v * 1e6)
    g = math.gcd(ci, vi)
    per_axis = 0
    for i in range(vi // g):
        per_axis = max(per_axis,
                       ((i + 1) * ci - 1) // vi - (i * ci) // vi + 1)
    return per_axis ** 3


def _row_radius_bounds(spec: ModelSpec):
    """Per-row table bounds: (max consumer radius, shareable grid bound).

    Simulates the interpreter's row flow (downsampling creates a row,
    fp/fp-geo returns to the popped skip row) and collects every 3D
    same-row table consumer's radius.  A row whose consumers all carry a
    radius gets ``bound = max(radii)``: its shared neighbor table can then
    be built radius-bounded, which lets the Pallas kernel seed its pruning
    threshold at bound^2 instead of discovering it block by block.

    The second list carries a per-row GRID bound for rows above the brute
    limit: the max radius over grid-eligible consumers (r <= 0.15), so one
    grid table at cell = grid_bound serves every such consumer by prefix
    filtering instead of one grid search per distinct radius.  Sharing is
    only declared for VOXEL-produced rows where the voxel spacing PROVES
    per-cell occupancy within the cap — a cell of edge ``c`` over a
    voxel(v)-downsampled set holds at most (floor(c/v)+1)^3 points — so
    the widened cell cannot truncate (curve-fps rows have unbounded local
    density: the KITTI 73728 row measures 1158 points in one 0.08-cell).

    Returns per-step lists (bounds, grid_bounds) for the row step i
    searches.
    """
    from ..ops.neighbors import TABLE_K, grid_cap

    row, next_row = 0, 1
    down_stack = []
    searches = []   # (row_id, radius or None-for-unbounded)
    step_row = []
    row_voxel = {0: None}   # row id -> producing voxel size (None: unproven)
    for step in spec.steps:
        step_row.append(row)
        if step.name == "sgcnn":
            if step.use_sparse_feat_agg:
                if step.knn is not None and step.knn <= TABLE_K:
                    searches.append((row, None))
            else:
                r = step.radius if step.radius is not None else 1.0
                if step.knn is not None and step.knn <= TABLE_K:
                    searches.append((row, r))
        elif step.name == "sa":
            if step.use_fast_knn and step.knn and step.knn <= TABLE_K:
                searches.append(
                    (row, step.radius if step.radius is not None else 0.25))
            elif step.knn and step.knn <= TABLE_K:
                searches.append((row, None))
            # pure ball grouping (k=128) bypasses the table entirely
        if step.name in ("sa", "sa-geo", "sa-global"):
            down_stack.append(row)
            row, next_row = next_row, next_row + 1
            row_voxel[row] = (step.voxel_size
                              if step.name == "sa"
                              and step.downsample_type == "voxel" else None)
        elif step.name in ("fp", "fp-geo"):
            row = down_stack.pop()
    bounds = {}
    radii = {}
    for rid, r in searches:
        radii.setdefault(rid, []).append(r)
        if rid in bounds:
            bounds[rid] = (None if (bounds[rid] is None or r is None)
                           else max(bounds[rid], r))
        else:
            bounds[rid] = r
    grid_bounds = {}
    grid_caps = {}
    for rid, rs in radii.items():
        v = row_voxel.get(rid)
        eligible = [r for r in rs if r is not None
                    and _voxel_cell_occupancy(r, v) <= grid_cap(TABLE_K)] \
            if v else []
        if v and eligible:
            gb = max(eligible)
            proven = _voxel_cell_occupancy(gb, v)
            if proven <= grid_cap(TABLE_K):
                grid_bounds[rid] = gb
                # the voxel proof also bounds the cap itself: no cell can
                # hold more than ``proven`` points, so the table rows (and
                # with them the plane gathers + extraction width) shrink
                # below the generic grid_cap default
                grid_caps[rid] = max(TABLE_K, -(-proven // 32) * 32)
    return ([bounds.get(r) for r in step_row],
            [grid_bounds.get(r) for r in step_row],
            [grid_caps.get(r) for r in step_row])


class CurveCloudNet(nn.Module):
    """The full network: steps + final MLP head (+ category embedding)."""

    spec: ModelSpec
    n_points: int  # padded full-resolution row size (static)

    @nn.compact
    def __call__(self, cloud: Cloud, categories: Optional[jax.Array] = None,
                 *, train: bool = False, bn_momentum: float = 0.1,
                 key: Optional[jax.Array] = None) -> jax.Array:
        spec = self.spec
        n_now = self.n_points      # current static row size

        # one exact neighbor table per resolution row, shared by every 3D
        # search at that row (ops/neighbors.py shared_knn_scope).  The spec
        # tells us every consumer's radius per row, so each table build can
        # be radius-bounded (the Pallas kernel seeds its pruning threshold
        # with bound^2 and skips candidate blocks with nothing inside it).
        row_bounds = _row_radius_bounds(spec)
        cloud, n_now = self._apply_steps(
            spec, cloud, row_bounds, n_now, train=train,
            bn_momentum=bn_momentum, key=key)

        x = cloud.x

        from .modules import _dt

        # ShapeNet-seg per-point category embedding (reference base.py:149-153)
        if spec.with_seg_category and categories is not None:
            cats = jax.nn.one_hot(categories, spec.n_categories)  # (B, 16)
            # reference base.py:60 builds this MLP with torch_geometric's
            # default bias=True regardless of the model-wide use_bias flag
            cats = MLP((spec.n_categories, 64, 64), use_bias=True,
                       dtype=_dt(spec), name="lin_categorical")(
                cats[:, None, :], train=train, bn_momentum=bn_momentum)
            cats = jnp.broadcast_to(cats, (x.shape[0], x.shape[1], 64))
            x = jnp.concatenate([x, cats], axis=-1)

        if not spec.identity_head:
            head_in = spec.steps[-1].feat_dims[-1] + (
                64 if spec.with_seg_category else 0)
            head_dims = (head_in,) + spec.out_mlp_dims + (spec.n_out,)
            x = MLP(head_dims, dropout=spec.out_mlp_dropout,
                    use_bias=spec.use_bias, dtype=_dt(spec), name="mlp")(
                x, mask=cloud.valid, train=train, bn_momentum=bn_momentum)
        return x, cloud.valid

    def _apply_steps(self, spec, cloud, row_bounds, n_now, *, train,
                     bn_momentum, key):
        """Run the step sequence under a shared-kNN-table scope.

        The ``with`` guarantees the module-global table cache is restored
        even when a step raises during trace (a leaked cache would hold
        stale tracers into the next trace of this process).
        """
        from ..ops import neighbors as _nbrs
        from ..ops import segments as _segs

        with _nbrs.shared_knn_scope(), _segs.memo_scope():
            return self._run_steps(spec, cloud, row_bounds, n_now,
                                   train=train, bn_momentum=bn_momentum,
                                   key=key)

    def _run_steps(self, spec, cloud, row_bounds, n_now, *, train,
                   bn_momentum, key):
        input_clouds = []
        down_skips = []
        prop_skips = []
        for i, step in enumerate(spec.steps):
            dims = spec.input_dim(i)
            input_clouds.append(cloud)
            step_key = None
            if key is not None:
                step_key = jax.random.fold_in(key, i)
            kw = dict(train=train, bn_momentum=bn_momentum, key=step_key)
            name = f"step_{i}_{step.name}"

            if step.name == "sa":
                budget = step.out_budget(n_now)
                cloud = SAStep(spec, step, dims, budget,
                               table_bound=row_bounds[0][i],
                               table_grid_bound=row_bounds[1][i],
                               table_grid_cap=row_bounds[2][i],
                               name=name)(cloud, **kw)
                n_now = budget
            elif step.name == "sa-geo":
                budget = step.out_budget(n_now)
                cloud = CurveSAStep(spec, step, dims, budget, name=name)(
                    cloud, **kw)
                n_now = budget
            elif step.name == "sa-global":
                cloud = GlobalSAStep(spec, step, dims, name=name)(cloud, **kw)
                n_now = 1
            elif step.name in ("fp", "fp-geo"):
                skip_idx = down_skips.pop()
                skip = input_clouds[skip_idx]
                cls = FPStep if step.name == "fp" else CurveFPStep
                cloud = cls(spec, step, dims, name=name)(cloud, skip, **kw)
                n_now = skip.n
            elif step.name == "skip-connect":
                k = step.num_skips or 1
                take, prop_skips = prop_skips[-k:], prop_skips[:-k]
                skips = [
                    input_clouds[j].x if input_clouds[j].x is not None
                    else input_clouds[j].pos
                    for j in take
                ]
                cloud = SkipConnectStep(spec, step, dims, name=name)(
                    cloud, skips, **kw)
            elif step.name in ("dgcnn", "dgcnn-rad", "sgcnn"):
                cloud = EdgeConvStep(spec, step, dims,
                                     table_bound=row_bounds[0][i],
                                     table_grid_bound=row_bounds[1][i],
                                     table_grid_cap=row_bounds[2][i],
                                     name=name)(cloud, **kw)
            elif step.name in ("conv1d-fast-v1", "conv1d-fast-v2"):
                cloud = SymmetricCurveConvStep(
                    spec, step, dims, v1=step.name.endswith("v1"), name=name)(
                    cloud, **kw)
            elif step.name == "mlp":
                cloud = SharedMLPStep(spec, step, dims, name=name)(cloud, **kw)
            else:
                raise NotImplementedError(step.name)

            if step.name in ("sa", "sa-geo", "sa-global"):
                down_skips.append(i)
            if step.name in spec.skip_connect_state_store:
                prop_skips.append(i)
        return cloud, n_now

    @staticmethod
    def final_valid(cloud: Cloud) -> jax.Array:
        return cloud.valid
