"""Pure-torch implementations of the reference's CUDA-only dependencies.

Enough of pytorch3d / frnn / torch_geometric / torch_scatter / torch_cluster
/ torch_sparse to execute the reference's FULL ``ModelBase`` forward on CPU
(tests/test_reference_exec.py full-flagship parity).  Semantics follow the
upstream libraries' documented behavior for exactly the call patterns the
reference uses (see each docstring); they are *test fixtures*, not product
code.

Caveat (documented per the round-4 verdict discussion): these stubs are
re-derivations of the upstream ops, so bugs mirrored in both the stub and
our JAX op would not be caught here — the value of the full-model test is
compositional: step wiring, skip stacks, dim inference, converter coverage,
and the sampling/grouping *choices* agreeing end to end.
"""

from __future__ import annotations

import types

import torch
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------

def scatter_add(src, index, dim=0, out=None, dim_size=None):
    n = int(dim_size) if dim_size is not None else int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = n
    res = torch.zeros(shape, dtype=src.dtype)
    return res.index_add(dim, index.long(), src)


def scatter_mean(src, index, dim=0, out=None, dim_size=None):
    s = scatter_add(src, index, dim=dim, dim_size=dim_size)
    ones = torch.ones(src.shape[dim], dtype=src.dtype)
    cnt = scatter_add(ones, index, dim=0, dim_size=s.shape[dim])
    cnt = torch.clamp(cnt, min=1)
    shape = [1] * src.dim()
    shape[dim] = -1
    return s / cnt.view(shape)


def _scatter_extreme(src, index, dim, dim_size, is_max):
    assert dim == 0, "reference call sites only use dim=0"
    n = int(dim_size) if dim_size is not None else int(index.max()) + 1
    e = src.shape[0]
    shape = list(src.shape)
    shape[0] = n
    fill = -torch.inf if is_max else torch.inf
    res = torch.full(shape, fill, dtype=src.dtype)
    res.index_reduce_(0, index, src, "amax" if is_max else "amin",
                      include_self=True)
    # argmin/argmax: smallest source index achieving the extreme
    # (first-wins on ties, like torch_scatter)
    hit = src == res.index_select(0, index)
    iota = torch.arange(e)
    if src.dim() > 1:
        iota = iota.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
    cand = torch.where(hit, iota, torch.full_like(iota, e))
    arg = torch.full(shape, e, dtype=torch.long)
    arg.index_reduce_(0, index, cand, "amin", include_self=True)
    # empty groups: torch_scatter leaves 0 in res, e as the arg marker
    res = torch.where(arg == e, torch.zeros_like(res), res)
    return res, arg


def scatter_max(src, index, dim=0, out=None, dim_size=None):
    return _scatter_extreme(src, index.long(), dim, dim_size, True)


def scatter_min(src, index, dim=0, out=None, dim_size=None):
    return _scatter_extreme(src, index.long(), dim, dim_size, False)


# ---------------------------------------------------------------------------
# torch_geometric pieces
# ---------------------------------------------------------------------------

class MLP(torch.nn.Module):
    """torch_geometric.nn.MLP: Linear -> BatchNorm -> act -> dropout per
    hidden layer, plain last unless plain_last=False.  State-dict naming
    (lins.N / norms.N) matches upstream so the checkpoint converter maps it
    (curvecloudnet_tpu/checkpoint.py:101)."""

    def __init__(self, channel_list, dropout=0.0, norm="batch_norm",
                 plain_last=True, act="relu", bias=True, **kwargs):
        super().__init__()
        self.channel_list = list(channel_list)
        self.plain_last = plain_last
        self.act_name = act or "relu"
        self.dropout = dropout
        self.lins = torch.nn.ModuleList()
        self.norms = torch.nn.ModuleList()
        n = len(self.channel_list) - 1
        for i in range(n):
            self.lins.append(torch.nn.Linear(
                self.channel_list[i], self.channel_list[i + 1], bias=bias))
            is_plain = plain_last and i == n - 1
            if not is_plain and norm in ("batch_norm", "BatchNorm"):
                self.norms.append(torch.nn.BatchNorm1d(
                    self.channel_list[i + 1]))
            elif not is_plain:
                self.norms.append(torch.nn.Identity())

    def _act(self, x):
        if self.act_name == "relu":
            return F.relu(x)
        if self.act_name == "leaky_relu":
            return F.leaky_relu(x, negative_slope=0.01)
        raise NotImplementedError(self.act_name)

    def forward(self, x):
        n = len(self.lins)
        for i, lin in enumerate(self.lins):
            x = lin(x)
            if self.plain_last and i == n - 1:
                break
            x = self.norms[i](x)
            x = self._act(x)
            if self.dropout:
                x = F.dropout(x, p=self.dropout, training=self.training)
        return x


def tg_softmax(src, index, ptr=None, num_nodes=None, dim=0):
    """torch_geometric.utils.softmax: segment softmax over ``index``."""
    n = int(index.max()) + 1 if num_nodes is None else num_nodes
    mx, _ = scatter_max(src, index, dim=dim, dim_size=n)
    out = (src - mx.index_select(dim, index.long())).exp()
    den = scatter_add(out, index, dim=dim, dim_size=n)
    return out / (den.index_select(dim, index.long()) + 1e-16)


class MessagePassing(torch.nn.Module):
    """Minimal propagate() for the conv patterns the reference uses
    (flow=source_to_target, node_dim=0, message(x_j, pos_i, pos_j) then
    aggregate(msg, index=target))."""

    def __init__(self, aggr="max", flow="source_to_target", **kwargs):
        super().__init__()
        self.aggr = aggr
        self.node_dim = 0

    def propagate(self, edge_index, x=None, pos=None, size=None):
        import inspect

        j, i = edge_index[0].long(), edge_index[1].long()
        cand = {}
        dim_size = None
        if x is not None:
            x_src = x[0] if isinstance(x, tuple) else x
            x_dst = x[1] if isinstance(x, tuple) else x
            cand["x_j"] = None if x_src is None else x_src[j]
            cand["x_i"] = None if x_dst is None else x_dst[i]
            if x_dst is not None:
                dim_size = x_dst.size(0)
        if pos is not None:
            pos_src, pos_dst = pos if isinstance(pos, tuple) else (pos, pos)
            cand["pos_i"] = pos_dst[i]
            cand["pos_j"] = pos_src[j]
            dim_size = pos_dst.size(0)
        accepted = inspect.signature(self.message).parameters
        msg = self.message(**{k: v for k, v in cand.items()
                              if k in accepted})
        return self.aggregate(msg, i, dim_size=dim_size)

    def message(self, x_j=None, pos_i=None, pos_j=None):  # default
        return x_j

    def aggregate(self, inputs, index, ptr=None, dim_size=None):
        if self.aggr == "max":
            return scatter_max(inputs, index, dim=0, dim_size=dim_size)[0]
        return scatter_add(inputs, index, dim=0, dim_size=dim_size)

    def reset_parameters(self):
        pass


class PointNetConv(MessagePassing):
    """torch_geometric.nn.conv.point_conv.PointNetConv signature shim —
    PointNetConv2 overrides forward/message/aggregate, so only __init__
    plumbing is needed."""

    def __init__(self, local_nn=None, global_nn=None, add_self_loops=True,
                 **kwargs):
        kwargs.setdefault("aggr", "max")
        super().__init__(**kwargs)
        self.local_nn = local_nn
        self.global_nn = global_nn
        self.add_self_loops = add_self_loops


def tg_fps(pos, batch, ratio):
    """torch_geometric.nn.fps (only SAModuleSlow uses it)."""
    out = []
    for b in batch.unique().tolist():
        sel = torch.where(batch == b)[0]
        k = max(1, int(round(len(sel) * ratio)))
        _, loc = _fps_single(pos[sel], k)
        out.append(sel[loc])
    return torch.cat(out)


def _fps_single(p, k, start=0):
    n = p.size(0)
    k = min(k, n)
    sel = torch.zeros(k, dtype=torch.long)
    sel[0] = start
    d = ((p - p[start]) ** 2).sum(-1)
    for i in range(1, k):
        nxt = int(torch.argmax(d))
        sel[i] = nxt
        d = torch.minimum(d, ((p - p[nxt]) ** 2).sum(-1))
    return p[sel], sel


def tg_radius(x, y, r, batch_x=None, batch_y=None, max_num_neighbors=32):
    rows, cols = [], []
    for i in range(y.size(0)):
        ok = ((x - y[i]) ** 2).sum(-1) <= r * r
        if batch_x is not None:
            ok &= batch_x == batch_y[i]
        idx = torch.where(ok)[0][:max_num_neighbors]
        rows.append(torch.full_like(idx, i))
        cols.append(idx)
    return torch.cat(rows), torch.cat(cols)


def tg_knn(x, y, k, batch_x=None, batch_y=None, num_workers=1):
    rows, cols = [], []
    for i in range(y.size(0)):
        d = ((x - y[i]) ** 2).sum(-1)
        if batch_x is not None:
            d = torch.where(batch_x == batch_y[i], d, torch.inf)
        nn = torch.argsort(d)[:k]
        rows.append(torch.full_like(nn, i))
        cols.append(nn)
    return torch.stack([torch.cat(rows), torch.cat(cols)])


def global_add_pool(x, batch, size=None):
    return scatter_add(x, batch, dim=0, dim_size=size)


def add_self_loops(edge_index, num_nodes=None):
    n = num_nodes or int(edge_index.max()) + 1
    loops = torch.arange(n, dtype=edge_index.dtype)
    return torch.cat(
        [edge_index, torch.stack([loops, loops])], dim=1), None


def remove_self_loops(edge_index):
    keep = edge_index[0] != edge_index[1]
    return edge_index[:, keep], None


# ---------------------------------------------------------------------------
# pytorch3d.ops (padded-batch semantics)
# ---------------------------------------------------------------------------

def knn_points(p1, p2, lengths1=None, lengths2=None, K=1, return_nn=False,
               return_sorted=True, norm=2):
    """K nearest of p2 per p1 point, ascending d²; slots k >= lengths2
    get dist=0/idx=0 (pytorch3d semantics — upstream pads with zeros, not
    -1; the reference only hits that when K > points in a sample)."""
    B, P1, _ = p1.shape
    P2 = p2.shape[1]
    if lengths1 is None:
        lengths1 = torch.full((B,), P1, dtype=torch.long)
    if lengths2 is None:
        lengths2 = torch.full((B,), P2, dtype=torch.long)
    d = ((p1[:, :, None, :] - p2[:, None, :, :]) ** 2).sum(-1)  # (B,P1,P2)
    arange2 = torch.arange(P2)
    for b in range(B):
        d[b, :, arange2 >= lengths2[b]] = torch.inf
    k_eff = min(K, P2)
    dists, idx = torch.topk(d, k_eff, dim=-1, largest=False, sorted=True)
    if k_eff < K:
        pad = K - k_eff
        dists = torch.cat([dists, torch.zeros(B, P1, pad)], dim=-1)
        idx = torch.cat([idx, torch.zeros(B, P1, pad, dtype=idx.dtype)],
                        dim=-1)
    invalid = torch.isinf(dists)
    dists = torch.where(invalid, torch.zeros_like(dists), dists)
    idx = torch.where(invalid, torch.zeros_like(idx), idx)
    nn = None
    if return_nn:
        nn = torch.gather(
            p2[:, None].expand(B, P1, P2, 3), 2,
            idx[..., None].expand(B, P1, K, 3))
    return dists, idx, nn


def ball_query(p1, p2, lengths1=None, lengths2=None, K=128, radius=0.2,
               return_nn=False):
    """First K points (in index order) within radius; -1 padded."""
    B, P1, _ = p1.shape
    P2 = p2.shape[1]
    if lengths1 is None:
        lengths1 = torch.full((B,), P1, dtype=torch.long)
    if lengths2 is None:
        lengths2 = torch.full((B,), P2, dtype=torch.long)
    idx = torch.full((B, P1, K), -1, dtype=torch.long)
    dists = torch.zeros(B, P1, K)
    for b in range(B):
        d = ((p1[b, :, None, :] - p2[b, None, :, :]) ** 2).sum(-1)
        d[:, torch.arange(P2) >= lengths2[b]] = torch.inf
        within = d <= radius * radius
        for q in range(int(lengths1[b])):
            hits = torch.where(within[q])[0][:K]
            idx[b, q, :len(hits)] = hits
            dists[b, q, :len(hits)] = d[q, hits]
    return dists, idx, None


def sample_farthest_points(points, lengths=None, K=1,
                           random_start_point=False):
    """Deterministic start-at-0 FPS (the parity test pins the reference's
    random start to 0, matching our sampler's key=None path)."""
    B, P, _ = points.shape
    if lengths is None:
        lengths = torch.full((B,), P, dtype=torch.long)
    if torch.is_tensor(K):
        ks = [int(k) for k in K.tolist()]
    else:
        ks = [int(K)] * B
    kmax = max(ks)
    all_idx = torch.full((B, kmax), -1, dtype=torch.long)
    for b in range(B):
        n = int(lengths[b])
        k = min(ks[b], n)
        _, sel = _fps_single(points[b, :n], k, start=0)
        all_idx[b, :k] = sel
    pts = torch.stack([
        points[b][torch.clamp(all_idx[b], min=0)] for b in range(B)])
    return pts, all_idx


# ---------------------------------------------------------------------------
# frnn
# ---------------------------------------------------------------------------

def frnn_gather(x, idxs, lengths=None):
    """frnn.frnn_gather: gather rows by (B, N, K) idx; -1 reads row 0
    (callers mask)."""
    B, N, K = idxs.shape
    safe = torch.clamp(idxs, min=0)
    out = torch.gather(
        x[:, None].expand(B, N, x.shape[1], x.shape[-1]), 2,
        safe[..., None].expand(B, N, K, x.shape[-1]).long())
    return out


def pure_fast_knn(points1, points2, lengths1, lengths2, K, r,
                  return_nn=False):
    """CPU replacement for point_ops.fast_knn (frnn grid search): exact K
    nearest within radius r, ascending, -1 padded — the same contract the
    CUDA path returns."""
    if not torch.is_tensor(r):
        r = torch.full((points1.shape[0],), float(r))
    d, idx, _ = knn_points(points1, points2, lengths1, lengths2, K=K)
    # knn_points zero-pads slots k >= lengths2; recompute validity
    B, P1, K_ = idx.shape
    q_arange = torch.arange(P1)
    out = torch.full_like(idx, -1)
    for b in range(B):
        rr = float(r[b]) ** 2
        valid = (d[b] <= rr) & (
            torch.arange(K_)[None, :] < int(lengths2[b]))
        valid &= q_arange[:, None] < int(lengths1[b])
        # zero-padded duplicate slots: only keep the first occurrence of
        # each index per row when it repeats due to the k>length pad
        out[b] = torch.where(valid, idx[b], torch.full_like(idx[b], -1))
    return out


# ---------------------------------------------------------------------------
# module assembly
# ---------------------------------------------------------------------------

def build_stub_modules():
    mods = {}

    ts = types.ModuleType("torch_scatter")
    ts.scatter_add = scatter_add
    ts.scatter_mean = scatter_mean
    ts.scatter_max = scatter_max
    ts.scatter_min = scatter_min
    mods["torch_scatter"] = ts

    tsp = types.ModuleType("torch_sparse")

    class SparseTensor:  # placeholder type for isinstance checks
        pass

    tsp.SparseTensor = SparseTensor
    tsp.set_diag = lambda x: x
    mods["torch_sparse"] = tsp

    tc = types.ModuleType("torch_cluster")
    tc.knn = tg_knn
    mods["torch_cluster"] = tc

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.MLP = MLP
    tg_nn.fps = tg_fps
    tg_nn.radius = tg_radius
    tg_nn.knn = tg_knn
    tg_glob = types.ModuleType("torch_geometric.nn.glob")
    tg_glob.global_add_pool = global_add_pool
    tg_nn.glob = tg_glob
    tg_conv = types.ModuleType("torch_geometric.nn.conv")
    tg_conv.MessagePassing = MessagePassing
    tg_pc = types.ModuleType("torch_geometric.nn.conv.point_conv")
    tg_pc.PointNetConv = PointNetConv
    tg_conv.point_conv = tg_pc
    tg_nn.conv = tg_conv
    tg_inits = types.ModuleType("torch_geometric.nn.inits")
    tg_inits.reset = lambda m: None
    tg_nn.inits = tg_inits
    tg_typing = types.ModuleType("torch_geometric.typing")
    tg_typing.Adj = object
    tg_typing.OptTensor = object
    tg_typing.PairOptTensor = object
    tg_typing.PairTensor = object
    tg_utils = types.ModuleType("torch_geometric.utils")
    tg_utils.softmax = tg_softmax
    tg_utils.add_self_loops = add_self_loops
    tg_utils.remove_self_loops = remove_self_loops
    tg_data = types.ModuleType("torch_geometric.data")
    tg_batch = types.ModuleType("torch_geometric.data.batch")

    class Batch:
        @staticmethod
        def from_data_list(lst):
            raise NotImplementedError

    tg_batch.Batch = Batch
    tg_data.batch = tg_batch
    tg.nn = tg_nn
    tg.utils = tg_utils
    tg.typing = tg_typing
    tg.data = tg_data
    mods.update({
        "torch_geometric": tg,
        "torch_geometric.nn": tg_nn,
        "torch_geometric.nn.glob": tg_glob,
        "torch_geometric.nn.conv": tg_conv,
        "torch_geometric.nn.conv.point_conv": tg_pc,
        "torch_geometric.nn.inits": tg_inits,
        "torch_geometric.typing": tg_typing,
        "torch_geometric.utils": tg_utils,
        "torch_geometric.data": tg_data,
        "torch_geometric.data.batch": tg_batch,
    })

    p3d = types.ModuleType("pytorch3d")
    p3d_ops = types.ModuleType("pytorch3d.ops")
    p3d_ops.sample_farthest_points = sample_farthest_points
    p3d_ops.ball_query = ball_query
    p3d_ops.knn_points = knn_points
    p3d.ops = p3d_ops
    mods["pytorch3d"] = p3d
    mods["pytorch3d.ops"] = p3d_ops

    frnn = types.ModuleType("frnn")
    frnn.frnn_gather = frnn_gather

    def frnn_grid_points(*a, **k):
        raise RuntimeError("CUDA frnn invoked; patch point_ops.fast_knn")

    frnn.frnn_grid_points = frnn_grid_points
    mods["frnn"] = frnn
    return mods
