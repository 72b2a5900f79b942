"""Pallas TPU megakernel family: grouped message-MLP + aggregation, TRAIN.

Training-mode counterpart of :mod:`pallas_group` (reference
pointnet2.py:146-181, point_conv.py:60-93, dgcnn.py:158-207): the local
MLP past layer 0, the attention MLP, and the masked aggregation run
VMEM-resident over position-major (K, M, C) slabs, with EXACT BatchNorm
batch statistics and EXACT reference gradients (including the gradient
paths through the batch mean/variance, matching torch BatchNorm1d /
autograd — stats are *not* stop-gradiented).

Why a custom VJP: XLA lowers each (M, K, Cin)->(M, K, Cout) train dense
to an MXU-starved batched 1x1 conv (~17% MXU measured on v5e at flagship
sa-geo scale; ~38 ms/step of dots alone) and materializes every per-pair
intermediate in HBM.  Here every pass streams the K axis and recomputes
the forward chain from the layer-0 pre-norm messages ``h1`` (flash-
attention style), so per-pair tensors touch HBM only as the h1 input,
the backward's chained cotangent slabs, and nothing else.

Structure (local MLP with L kernel-side denses; layer-0 Dense runs in
XLA as one flat matmul at the gather output):

    v_0 = h1
    u_i = act(BN_i(v_i));  v_{i+1} = u_i @ W_i + b_i     (i = 0..L-1)
    msg = v_L                                            (plain last)
    attend:  g = msg @ Wa_0 + ba_0;  ag = act(BNa(g))
             logits = ag @ Wa_1 + ba_1
    out = masked softmax-attend(msg, logits)  |  masked max(msg)

Pass plan (each pass is one ``pallas_call`` over grid (B, M-tiles,
K-plane groups); global reductions finalize in tiny XLA glue between
passes — a Mosaic grid is sequential, so a reduction finished after the
last tile can never feed an earlier one):

    forward:  S_0..S_{L-1} (batch-stat raw sums per BN), S_a (attend
              BN), P_out (full chain + online aggregation)
    backward: B_att (T_a cotangent slab + dWa_1 + BNa reductions),
              B_msg (T_{L-1} slab + dW_{L-1} + dWa_0 + BN_{L-1}
              reductions), B_mid(i) for i = L-1..1 (T_{i-1} slab +
              dW_{i-1} + BN_{i-1} reductions), then an XLA elementwise
              epilogue turns T_0 into d_h1.

BatchNorm backward (masked batch stats, normalization applied to every
element, statistics over the masked set S of size n — matches
models/layers.py:65-91 exactly):

    d_v = gamma*inv * (T - 1[in S] * (sum(T)/n + xhat * sum(T*xhat)/n))
    d_gamma = sum(T * xhat),  d_beta = sum(T)        (sums over ALL
    elements; cotangents at invalid slots are exactly zero — the
    attention weight of a masked slot underflows to 0 in f32 and the
    masked-max `where` blocks the fill branch — so masking the T slabs
    only scrubs the fake K/M padding, it never drops a real gradient).

Gradient contract: the returned batch statistics are auxiliary outputs
whose cotangents are ignored (torch updates running stats under
no_grad); fully-invalid query rows produce junk values AND junk
gradients, exactly like the XLA paths — every consumer masks by row
validity, so their cotangents are zero in any real loss.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .aggregate import ATTEND_FILL, MAX_FILL
from .pallas_group import _act, _pick_k_planes, _pick_tile_m, _round_up


def _dact(y, kind: str):
    """act'(y) evaluated at the activation INPUT y (the BN output)."""
    if kind == "relu":
        return jnp.where(y > 0, 1.0, 0.0)
    if kind == "leaky_relu":
        return jnp.where(y > 0, 1.0, 0.01)
    if kind == "identity":
        return jnp.ones_like(y)
    raise ValueError(kind)


@dataclasses.dataclass(frozen=True)
class _Cfg:
    dims: Tuple[int, ...]        # (C0, C1, ..., C_L): h1 width + dense outs
    att_dims: Tuple[int, ...]    # () or (C_L, A, C_L): attend dense widths
    aggr: str                    # 'attend' | 'max'
    act: str
    attend_act: str
    eps: float
    tile_m: int
    k_planes: int
    interpret: bool
    cdt: str = "float32"         # matmul compute dtype ('bfloat16' on TPU)

    @property
    def n_loc(self) -> int:
        return len(self.dims) - 1

    @property
    def n_att(self) -> int:
        return max(len(self.att_dims) - 1, 0)

    @property
    def out_c(self) -> int:
        return self.dims[-1]


# ---------------------------------------------------------------------------
# shared kernel helpers
# ---------------------------------------------------------------------------


def _read_mask_col(m_ref, j, p, k_planes):
    """(tile_m, 1) f32 0/1 — plane (j*k_planes+p)'s mask column.

    The mask block spans the full (padded) K axis (Mosaic lane blocks
    must be 128-divisible or whole); the dynamic column is extracted by
    masked reduction over a lane iota, as in pallas_group._group_kernel.
    """
    mrow = m_ref[0]                                   # (tile_m, KP)
    lane = jax.lax.broadcasted_iota(jnp.int32, mrow.shape, 1)
    col = j * k_planes + p
    return jnp.sum(jnp.where(lane == col, mrow, 0.0),
                   axis=1, keepdims=True)


def _bn_act(v, mu, inv, gamma, beta, act):
    xhat = (v - mu) * inv
    y = xhat * gamma + beta
    return _act(y, act), xhat, y


def _dot(a, w, cdt):
    return jax.lax.dot_general(a.astype(cdt), w.astype(cdt),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(a, w, cdt):
    """a @ w.T with f32 accumulation."""
    return jax.lax.dot_general(a.astype(cdt), w.astype(cdt),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_wgrad(a, d, cdt):
    """a^T @ d -> (Cin, Cout) f32."""
    return jax.lax.dot_general(a.astype(cdt), d.astype(cdt),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _chain(h1_plane, depth_loc, depth_att, stats, bns, denses,
           att_stats, att_bns, att_denses, cfg, keep=()):
    """Recompute the forward chain for one (tile_m, C0) plane.

    ``stats[i]`` = (mu, inv) each (1, C_i) f32; ``bns[i]`` = (gamma,
    beta).  Returns a dict holding the values named in ``keep`` plus the
    final value under 'v' (the pre-BN value at the requested depth).
    """
    cdt = cfg_cdt(cfg)
    kept = {}
    v = h1_plane.astype(jnp.float32)
    for i in range(depth_loc):
        u, xhat, y = _bn_act(v, stats[i][0][:], stats[i][1][:],
                             bns[i][0][:], bns[i][1][:], cfg.act)
        if f"xhat{i}" in keep:
            kept[f"xhat{i}"] = xhat
        if f"y{i}" in keep:
            kept[f"y{i}"] = y
        if f"u{i}" in keep:
            kept[f"u{i}"] = u
        v = _dot(u, denses[i][0][:], cdt) + denses[i][1][:]
        if f"v{i + 1}" in keep:
            kept[f"v{i + 1}"] = v
    for j in range(depth_att):
        if j > 0:
            u, xhat, y = _bn_act(v, att_stats[j - 1][0][:],
                                 att_stats[j - 1][1][:],
                                 att_bns[j - 1][0][:],
                                 att_bns[j - 1][1][:], cfg.attend_act)
            if f"a_xhat{j - 1}" in keep:
                kept[f"a_xhat{j - 1}"] = xhat
            if f"a_y{j - 1}" in keep:
                kept[f"a_y{j - 1}"] = y
            if f"a_u{j - 1}" in keep:
                kept[f"a_u{j - 1}"] = u
            v = u
        v = _dot(v, att_denses[j][0][:], cdt) + att_denses[j][1][:]
        if f"a_v{j + 1}" in keep:
            kept[f"a_v{j + 1}"] = v
    kept["v"] = v
    return kept


def cfg_cdt(cfg):
    return jnp.dtype(cfg.cdt)


def _unpack_consts(it, cfg, depth_loc, depth_att, with_bwd_coefs=False):
    """Pull the per-pass constant operands off the ref iterator in the
    canonical order produced by :func:`_const_operands`."""
    stats = [(next(it), next(it)) for _ in range(depth_loc)]
    bns = [(next(it), next(it)) for _ in range(depth_loc)]
    denses = [(next(it), next(it)) for _ in range(depth_loc)]
    att_stats = [(next(it), next(it)) for _ in range(max(depth_att - 1, 0))]
    att_bns = [(next(it), next(it)) for _ in range(max(depth_att - 1, 0))]
    att_denses = [(next(it), next(it)) for _ in range(depth_att)]
    return stats, bns, denses, att_stats, att_bns, att_denses


# ---------------------------------------------------------------------------
# pass kernels
# ---------------------------------------------------------------------------


def _is_first(b, t, j):
    return jnp.logical_and(jnp.logical_and(b == 0, t == 0), j == 0)


def _is_last(b, t, j, nb, nt, nj):
    return jnp.logical_and(jnp.logical_and(b == nb - 1, t == nt - 1),
                           j == nj - 1)


def _grid_ids():
    b, t, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nb, nt, nj = pl.num_programs(0), pl.num_programs(1), pl.num_programs(2)
    return b, t, j, nb, nt, nj


def _stats_kernel(h1_ref, m_ref, *refs, cfg: _Cfg, depth_loc: int,
                  depth_att: int):
    """Raw masked sums (s, ss) of the pre-BN value at the given depth."""
    b, t, j, nb, nt, nj = _grid_ids()
    it = iter(refs)
    consts = _unpack_consts(it, cfg, depth_loc, depth_att)
    s_out, ss_out = next(it), next(it)
    s_acc, ss_acc = next(it), next(it)

    @pl.when(_is_first(b, t, j))
    def _init():
        s_acc[:] = jnp.zeros(s_acc.shape, jnp.float32)
        ss_acc[:] = jnp.zeros(ss_acc.shape, jnp.float32)

    for p in range(cfg.k_planes):
        mask = _read_mask_col(m_ref, j, p, cfg.k_planes)
        v = _chain(h1_ref[0, p], depth_loc, depth_att, *consts, cfg)["v"]
        vm = v * mask
        s_acc[:] = s_acc[:] + jnp.sum(vm, axis=0, keepdims=True)
        ss_acc[:] = ss_acc[:] + jnp.sum(vm * v, axis=0, keepdims=True)

    @pl.when(_is_last(b, t, j, nb, nt, nj))
    def _fin():
        s_out[:] = s_acc[:]
        ss_out[:] = ss_acc[:]


def _out_kernel(h1_ref, m_ref, *refs, cfg: _Cfg):
    """Full chain + online masked aggregation.

    attend: out, mx (running logit max), denom; max: out, cnt (ties)."""
    b, t, j, nb, nt, nj = _grid_ids()
    it = iter(refs)
    consts = _unpack_consts(it, cfg, cfg.n_loc, cfg.n_att)
    if cfg.aggr == "attend":
        out_ref, mx_ref, den_ref = next(it), next(it), next(it)
        mx_s, den_s, acc_s = next(it), next(it), next(it)
    else:
        out_ref, cnt_ref = next(it), next(it)
        mx_s, cnt_s = next(it), next(it)

    @pl.when(j == 0)
    def _init():
        mx_s[:] = jnp.full(mx_s.shape, -1e30, jnp.float32)
        if cfg.aggr == "attend":
            den_s[:] = jnp.zeros(den_s.shape, jnp.float32)
            acc_s[:] = jnp.zeros(acc_s.shape, jnp.float32)
        else:
            cnt_s[:] = jnp.zeros(cnt_s.shape, jnp.float32)

    for p in range(cfg.k_planes):
        mask = _read_mask_col(m_ref, j, p, cfg.k_planes)
        if cfg.aggr == "attend":
            kept = _chain(h1_ref[0, p], cfg.n_loc, cfg.n_att, *consts, cfg,
                          keep=(f"v{cfg.n_loc}",))
            msg = kept[f"v{cfg.n_loc}"]
            logits = jnp.where(mask > 0, kept["v"], ATTEND_FILL)
            new_max = jnp.maximum(mx_s[:], logits)
            scale = jnp.exp(mx_s[:] - new_max)
            e = jnp.exp(logits - new_max)
            den_s[:] = den_s[:] * scale + e
            acc_s[:] = acc_s[:] * scale + e * msg
            mx_s[:] = new_max
        else:
            hit = jnp.where(mask > 0, _chain(h1_ref[0, p], cfg.n_loc, 0,
                                             *consts, cfg)["v"], MAX_FILL)
            is_new = hit > mx_s[:]
            eq = (hit == mx_s[:]).astype(jnp.float32)
            cnt_s[:] = jnp.where(is_new, 1.0, cnt_s[:] + eq)
            mx_s[:] = jnp.maximum(mx_s[:], hit)

    @pl.when(j == nj - 1)
    def _fin():
        if cfg.aggr == "attend":
            out_ref[0] = acc_s[:] / den_s[:]
            mx_ref[0] = mx_s[:]
            den_ref[0] = den_s[:]
        else:
            out_ref[0] = mx_s[:]
            cnt_ref[0] = cnt_s[:]


def _softmax_w(logits_plane, mask, mx, den):
    logits = jnp.where(mask > 0, logits_plane, ATTEND_FILL)
    return jnp.exp(logits - mx) / den


def _b_att_kernel(h1_ref, m_ref, dout_ref, out_ref, mx_ref, den_ref, *refs,
                  cfg: _Cfg):
    """Attend-head backward: dWa_1/dba_1 + BNa raw reductions.

    Pure-reduction pass: the T_a cotangent slab is NOT written — B_msg
    recomputes it in-register (one extra (tile_m, co) x (co, A) dot per
    plane), which beats the (B, K, M, A) slab round-trip at flagship
    sa-geo scale (~1.9 ms of HBM traffic vs ~1 ms of MXU recompute).
    """
    b, t, j, nb, nt, nj = _grid_ids()
    it = iter(refs)
    consts = _unpack_consts(it, cfg, cfg.n_loc, cfg.n_att)
    dwa1_ref, dba1_ref = next(it), next(it)
    rs_ref, rp_ref = next(it), next(it)
    dwa1_s, dba1_s, rs_s, rp_s = next(it), next(it), next(it), next(it)
    att_stats, att_bns, att_denses = consts[3], consts[4], consts[5]

    @pl.when(_is_first(b, t, j))
    def _init():
        dwa1_s[:] = jnp.zeros(dwa1_s.shape, jnp.float32)
        dba1_s[:] = jnp.zeros(dba1_s.shape, jnp.float32)
        rs_s[:] = jnp.zeros(rs_s.shape, jnp.float32)
        rp_s[:] = jnp.zeros(rp_s.shape, jnp.float32)

    cdt = cfg_cdt(cfg)
    dout = dout_ref[0].astype(jnp.float32)
    for p in range(cfg.k_planes):
        mask = _read_mask_col(m_ref, j, p, cfg.k_planes)
        kept = _chain(h1_ref[0, p], cfg.n_loc, cfg.n_att, *consts, cfg,
                      keep=(f"v{cfg.n_loc}", "a_u0", "a_xhat0", "a_y0"))
        msg = kept[f"v{cfg.n_loc}"]
        w = _softmax_w(kept["v"], mask, mx_ref[0], den_ref[0])
        dlogit = w * (msg - out_ref[0]) * dout * mask
        dwa1_s[:] = dwa1_s[:] + _dot_wgrad(kept["a_u0"], dlogit, cdt)
        dba1_s[:] = dba1_s[:] + jnp.sum(dlogit, axis=0, keepdims=True)
        dag = _dot_t(dlogit, att_denses[1][0][:], cdt)
        ta = dag * _dact(kept["a_y0"], cfg.attend_act) * mask
        rs_s[:] = rs_s[:] + jnp.sum(ta, axis=0, keepdims=True)
        rp_s[:] = rp_s[:] + jnp.sum(ta * kept["a_xhat0"], axis=0,
                                    keepdims=True)

    @pl.when(_is_last(b, t, j, nb, nt, nj))
    def _fin():
        dwa1_ref[:] = dwa1_s[:]
        dba1_ref[:] = dba1_s[:]
        rs_ref[:] = rs_s[:]
        rp_ref[:] = rp_s[:]


def _bn_bwd_plane(tslab, xhat, ginv, cg, cp, mask):
    """d_v for one plane from the BN-output cotangent T."""
    return ginv * (tslab - mask * (cg + xhat * cp))


def _b_msg_kernel(h1_ref, m_ref, dout_ref, *refs, cfg: _Cfg):
    """Backward through the aggregation + last local dense.

    Emits T_{L-1}, dW_{L-1}/db_{L-1}, (attend: dWa_0/dba_0 using the
    finalized BNa backward coefficients), and BN_{L-1} raw reductions.
    The attend T_a cotangent is recomputed in-register from the chain
    values (see _b_att_kernel) instead of arriving as a slab.
    """
    b, t, j, nb, nt, nj = _grid_ids()
    it = iter(refs)
    attend = cfg.aggr == "attend"
    if attend:
        out_ref, mx_ref, den_ref = next(it), next(it), next(it)
        ginva_ref, cga_ref, cpa_ref = next(it), next(it), next(it)
    else:
        mx_ref, cnt_ref = next(it), next(it)
    consts = _unpack_consts(it, cfg, cfg.n_loc, cfg.n_att if attend else 0)
    tprev_ref = next(it)
    dw_ref, db_ref = next(it), next(it)
    if attend:
        dwa0_ref, dba0_ref = next(it), next(it)
    rs_ref, rp_ref = next(it), next(it)
    dw_s, db_s = next(it), next(it)
    if attend:
        dwa0_s, dba0_s = next(it), next(it)
    rs_s, rp_s = next(it), next(it)
    denses = consts[2]
    att_stats, att_bns, att_denses = consts[3], consts[4], consts[5]
    li = cfg.n_loc - 1

    @pl.when(_is_first(b, t, j))
    def _init():
        dw_s[:] = jnp.zeros(dw_s.shape, jnp.float32)
        db_s[:] = jnp.zeros(db_s.shape, jnp.float32)
        if attend:
            dwa0_s[:] = jnp.zeros(dwa0_s.shape, jnp.float32)
            dba0_s[:] = jnp.zeros(dba0_s.shape, jnp.float32)
        rs_s[:] = jnp.zeros(rs_s.shape, jnp.float32)
        rp_s[:] = jnp.zeros(rp_s.shape, jnp.float32)

    cdt = cfg_cdt(cfg)
    dout = dout_ref[0].astype(jnp.float32)
    keep = (f"v{cfg.n_loc}", f"u{li}", f"xhat{li}", f"y{li}", "a_xhat0",
            "a_y0")
    for p in range(cfg.k_planes):
        mask = _read_mask_col(m_ref, j, p, cfg.k_planes)
        if attend:
            kept = _chain(h1_ref[0, p], cfg.n_loc, cfg.n_att, *consts, cfg,
                          keep=keep)
            msg = kept[f"v{cfg.n_loc}"]
            w = _softmax_w(kept["v"], mask, mx_ref[0], den_ref[0])
            dmsg = w * dout
            dlogit = w * (msg - out_ref[0]) * dout * mask
            dag = _dot_t(dlogit, att_denses[1][0][:], cdt)
            ta = dag * _dact(kept["a_y0"], cfg.attend_act) * mask
            dg1 = ginva_ref[:] * (ta - mask * (cga_ref[:]
                                               + kept["a_xhat0"] * cpa_ref[:]))
            dwa0_s[:] = dwa0_s[:] + _dot_wgrad(msg, dg1, cdt)
            dba0_s[:] = dba0_s[:] + jnp.sum(dg1, axis=0, keepdims=True)
            dmsg = dmsg + _dot_t(dg1, att_denses[0][0][:], cdt)
        else:
            kept = _chain(h1_ref[0, p], cfg.n_loc, 0, *consts, cfg,
                          keep=keep)
            msg = kept["v"]
            hit = jnp.where(mask > 0, msg, MAX_FILL)
            eq = (hit == mx_ref[0]).astype(jnp.float32)
            dmsg = dout * eq * mask / jnp.maximum(cnt_ref[0], 1.0)
        dw_s[:] = dw_s[:] + _dot_wgrad(kept[f"u{li}"], dmsg, cdt)
        db_s[:] = db_s[:] + jnp.sum(dmsg, axis=0, keepdims=True)
        du = _dot_t(dmsg, denses[li][0][:], cdt)
        tprev = du * _dact(kept[f"y{li}"], cfg.act) * mask
        tprev_ref[0, p] = tprev.astype(tprev_ref.dtype)
        rs_s[:] = rs_s[:] + jnp.sum(tprev, axis=0, keepdims=True)
        rp_s[:] = rp_s[:] + jnp.sum(tprev * kept[f"xhat{li}"], axis=0,
                                    keepdims=True)

    @pl.when(_is_last(b, t, j, nb, nt, nj))
    def _fin():
        dw_ref[:] = dw_s[:]
        db_ref[:] = db_s[:]
        if attend:
            dwa0_ref[:] = dwa0_s[:]
            dba0_ref[:] = dba0_s[:]
        rs_ref[:] = rs_s[:]
        rp_ref[:] = rp_s[:]


def _b_mid_kernel(h1_ref, m_ref, tin_ref, mu_ref, inv_ref, ginv_ref,
                  cg_ref, cp_ref, *refs, cfg: _Cfg, level: int):
    """Backward one local level: T_level slab in -> T_{level-1} slab out.

    ``level`` is the BN index whose output-cotangent slab arrives as
    input (mu/inv/ginv/cg/cp are ITS backward coefficients); emits
    dW_{level-1}, db_{level-1}, and BN_{level-1} raw sums.
    """
    b, t, j, nb, nt, nj = _grid_ids()
    it = iter(refs)
    consts = _unpack_consts(it, cfg, level, 0)
    tprev_ref = next(it)
    dw_ref, db_ref = next(it), next(it)
    rs_ref, rp_ref = next(it), next(it)
    dw_s, db_s, rs_s, rp_s = next(it), next(it), next(it), next(it)
    denses = consts[2]
    li = level - 1

    @pl.when(_is_first(b, t, j))
    def _init():
        dw_s[:] = jnp.zeros(dw_s.shape, jnp.float32)
        db_s[:] = jnp.zeros(db_s.shape, jnp.float32)
        rs_s[:] = jnp.zeros(rs_s.shape, jnp.float32)
        rp_s[:] = jnp.zeros(rp_s.shape, jnp.float32)

    cdt = cfg_cdt(cfg)
    keep = (f"u{li}", f"xhat{li}", f"y{li}")
    for p in range(cfg.k_planes):
        mask = _read_mask_col(m_ref, j, p, cfg.k_planes)
        kept = _chain(h1_ref[0, p], level, 0, *consts, cfg, keep=keep)
        # the chain at depth==level stops before BN_level; its xhat
        # comes from the chain's final pre-BN value directly
        xhat_l = (kept["v"] - mu_ref[:]) * inv_ref[:]
        tin = tin_ref[0, p].astype(jnp.float32)
        dv = _bn_bwd_plane(tin, xhat_l, ginv_ref[:],
                           cg_ref[:], cp_ref[:], mask)
        dw_s[:] = dw_s[:] + _dot_wgrad(kept[f"u{li}"], dv, cdt)
        db_s[:] = db_s[:] + jnp.sum(dv, axis=0, keepdims=True)
        du = _dot_t(dv, denses[li][0][:], cdt)
        tprev = du * _dact(kept[f"y{li}"], cfg.act) * mask
        tprev_ref[0, p] = tprev.astype(tprev_ref.dtype)
        rs_s[:] = rs_s[:] + jnp.sum(tprev, axis=0, keepdims=True)
        rp_s[:] = rp_s[:] + jnp.sum(tprev * kept[f"xhat{li}"], axis=0,
                                    keepdims=True)

    @pl.when(_is_last(b, t, j, nb, nt, nj))
    def _fin():
        dw_ref[:] = dw_s[:]
        db_ref[:] = db_s[:]
        rs_ref[:] = rs_s[:]
        rp_ref[:] = rp_s[:]

# ---------------------------------------------------------------------------
# host-side plumbing
# ---------------------------------------------------------------------------


def _pad_inputs(cfg: _Cfg, h1, maskf):
    """k-major h1 (B, K, M, C0) + query-major mask (B, M, K) -> padded."""
    bsz, k, m, c0 = h1.shape
    kp = _round_up(k, cfg.k_planes)
    mp = _round_up(m, cfg.tile_m)
    h1_t = jnp.pad(h1, ((0, 0), (0, kp - k), (0, mp - m), (0, 0)))
    mask2 = jnp.pad(maskf, ((0, 0), (0, mp - m), (0, kp - k)))
    return h1_t, mask2, kp, mp


def _vspec(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _slab_spec(cfg, c):
    return _vspec((1, cfg.k_planes, cfg.tile_m, c),
                  lambda b, t, j: (b, j, t, 0))


def _row_spec(cfg, c):
    return _vspec((1, cfg.tile_m, c), lambda b, t, j: (b, t, 0))


def _mask_spec(cfg, kp):
    return _vspec((1, cfg.tile_m, kp), lambda b, t, j: (b, t, 0))


def _small_spec(shape):
    return _vspec(shape, lambda b, t, j: (0, 0))


def _const_operands(cfg, fin, depth_loc, depth_att):
    """Operands+specs in the canonical _unpack_consts order."""
    ops, specs = [], []

    def add(a, dt):
        a = jnp.asarray(a).astype(dt)
        if a.ndim == 1:
            a = a.reshape(1, -1)
        ops.append(a)
        specs.append(_small_spec(a.shape))

    cdt = cfg_cdt(cfg)
    for i in range(depth_loc):
        add(fin["stats"][i][0], jnp.float32)
        add(fin["stats"][i][1], jnp.float32)
    for i in range(depth_loc):
        add(fin["bns"][i][0], jnp.float32)
        add(fin["bns"][i][1], jnp.float32)
    for i in range(depth_loc):
        add(fin["denses"][i][0], cdt)
        add(fin["denses"][i][1], jnp.float32)
    for i in range(max(depth_att - 1, 0)):
        add(fin["att_stats"][i][0], jnp.float32)
        add(fin["att_stats"][i][1], jnp.float32)
    for i in range(max(depth_att - 1, 0)):
        add(fin["att_bns"][i][0], jnp.float32)
        add(fin["att_bns"][i][1], jnp.float32)
    for i in range(depth_att):
        add(fin["att_denses"][i][0], cdt)
        add(fin["att_denses"][i][1], jnp.float32)
    return ops, specs


def _grid(cfg, bsz, kp, mp):
    return (bsz, mp // cfg.tile_m, kp // cfg.k_planes)


def _call(cfg, kernel, grid, operands, in_specs, out_shapes, out_specs,
          scratch):
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(*operands)


def _depth_width(cfg, depth_loc, depth_att):
    """Width of the pre-BN value after (depth_loc, depth_att) denses."""
    if depth_att > 0:
        return cfg.att_dims[depth_att]
    return cfg.dims[depth_loc]


def _pass_stats(cfg, h1_t, mask2, fin, depth_loc, depth_att):
    bsz, kp, mp, c0 = h1_t.shape
    c = _depth_width(cfg, depth_loc, depth_att)
    consts, cspecs = _const_operands(cfg, fin, depth_loc, depth_att)
    f32 = jnp.float32
    s, ss = _call(
        cfg,
        functools.partial(_stats_kernel, cfg=cfg, depth_loc=depth_loc,
                          depth_att=depth_att),
        _grid(cfg, bsz, kp, mp),
        [h1_t, mask2] + consts,
        [_slab_spec(cfg, c0), _mask_spec(cfg, kp)] + cspecs,
        [jax.ShapeDtypeStruct((1, c), f32), jax.ShapeDtypeStruct((1, c), f32)],
        [_small_spec((1, c)), _small_spec((1, c))],
        [pltpu.VMEM((1, c), f32), pltpu.VMEM((1, c), f32)],
    )
    return s[0], ss[0]


def _pass_out(cfg, h1_t, mask2, fin):
    bsz, kp, mp, c0 = h1_t.shape
    co = cfg.out_c
    attend = cfg.aggr == "attend"
    consts, cspecs = _const_operands(cfg, fin, cfg.n_loc,
                                     cfg.n_att if attend else 0)
    f32 = jnp.float32
    n_out = 3 if attend else 2
    res = _call(
        cfg,
        functools.partial(_out_kernel, cfg=cfg),
        _grid(cfg, bsz, kp, mp),
        [h1_t, mask2] + consts,
        [_slab_spec(cfg, c0), _mask_spec(cfg, kp)] + cspecs,
        [jax.ShapeDtypeStruct((bsz, mp, co), f32)] * n_out,
        [_row_spec(cfg, co)] * n_out,
        [pltpu.VMEM((cfg.tile_m, co), f32)] * n_out,
    )
    return res  # attend: (out, mx, den); max: (out, cnt)


def _pass_b_att(cfg, h1_t, mask2, fin, dout, out, mx, den):
    bsz, kp, mp, c0 = h1_t.shape
    co = cfg.out_c
    a_in = cfg.att_dims[1]
    consts, cspecs = _const_operands(cfg, fin, cfg.n_loc, cfg.n_att)
    f32 = jnp.float32
    dwa1, dba1, rs, rp = _call(
        cfg,
        functools.partial(_b_att_kernel, cfg=cfg),
        _grid(cfg, bsz, kp, mp),
        [h1_t, mask2, dout, out, mx, den] + consts,
        [_slab_spec(cfg, c0), _mask_spec(cfg, kp)]
        + [_row_spec(cfg, co)] * 4 + cspecs,
        [jax.ShapeDtypeStruct((a_in, co), f32),
         jax.ShapeDtypeStruct((1, co), f32),
         jax.ShapeDtypeStruct((1, a_in), f32),
         jax.ShapeDtypeStruct((1, a_in), f32)],
        [_small_spec((a_in, co)),
         _small_spec((1, co)), _small_spec((1, a_in)),
         _small_spec((1, a_in))],
        [pltpu.VMEM((a_in, co), f32), pltpu.VMEM((1, co), f32),
         pltpu.VMEM((1, a_in), f32), pltpu.VMEM((1, a_in), f32)],
    )
    return dwa1, dba1, rs, rp


def _pass_b_msg(cfg, h1_t, mask2, fin, dout, extra):
    """extra: attend -> (out, mx, den, ginva, cga, cpa); max -> (mx, cnt)."""
    bsz, kp, mp, c0 = h1_t.shape
    co = cfg.out_c
    attend = cfg.aggr == "attend"
    li = cfg.n_loc - 1
    c_in, c_prev = cfg.dims[li], cfg.dims[li + 1]
    consts, cspecs = _const_operands(cfg, fin, cfg.n_loc,
                                     cfg.n_att if attend else 0)
    f32 = jnp.float32
    if attend:
        out, mx, den, ginva, cga, cpa = extra
        a_in = cfg.att_dims[1]
        ops = [h1_t, mask2, dout, out, mx, den,
               ginva.reshape(1, -1), cga.reshape(1, -1), cpa.reshape(1, -1)]
        ispecs = [_slab_spec(cfg, c0), _mask_spec(cfg, kp),
                  _row_spec(cfg, co), _row_spec(cfg, co), _row_spec(cfg, co),
                  _row_spec(cfg, co), _small_spec((1, a_in)),
                  _small_spec((1, a_in)), _small_spec((1, a_in))]
    else:
        mx, cnt = extra
        ops = [h1_t, mask2, dout, mx, cnt]
        ispecs = [_slab_spec(cfg, c0), _mask_spec(cfg, kp),
                  _row_spec(cfg, co), _row_spec(cfg, co), _row_spec(cfg, co)]
    out_shapes = [jax.ShapeDtypeStruct((bsz, kp, mp, c_in), h1_t.dtype),
                  jax.ShapeDtypeStruct((c_in, c_prev), f32),
                  jax.ShapeDtypeStruct((1, c_prev), f32)]
    out_specs = [_slab_spec(cfg, c_in), _small_spec((c_in, c_prev)),
                 _small_spec((1, c_prev))]
    scratch = [pltpu.VMEM((c_in, c_prev), f32), pltpu.VMEM((1, c_prev), f32)]
    if attend:
        a_hid = cfg.att_dims[1]
        out_shapes += [jax.ShapeDtypeStruct((co, a_hid), f32),
                       jax.ShapeDtypeStruct((1, a_hid), f32)]
        out_specs += [_small_spec((co, a_hid)), _small_spec((1, a_hid))]
        scratch += [pltpu.VMEM((co, a_hid), f32), pltpu.VMEM((1, a_hid), f32)]
    out_shapes += [jax.ShapeDtypeStruct((1, c_in), f32),
                   jax.ShapeDtypeStruct((1, c_in), f32)]
    out_specs += [_small_spec((1, c_in)), _small_spec((1, c_in))]
    scratch += [pltpu.VMEM((1, c_in), f32), pltpu.VMEM((1, c_in), f32)]
    return _call(
        cfg,
        functools.partial(_b_msg_kernel, cfg=cfg),
        _grid(cfg, bsz, kp, mp),
        ops + consts, ispecs + cspecs, out_shapes, out_specs, scratch)


def _pass_b_mid(cfg, h1_t, mask2, fin, level, tin, mu_l, inv_l, ginv, cg,
                cp):
    bsz, kp, mp, c0 = h1_t.shape
    c_lvl = cfg.dims[level]
    c_in, c_out = cfg.dims[level - 1], cfg.dims[level]
    consts, cspecs = _const_operands(cfg, fin, level, 0)
    f32 = jnp.float32
    ops = [h1_t, mask2, tin, mu_l.reshape(1, -1), inv_l.reshape(1, -1),
           ginv.reshape(1, -1), cg.reshape(1, -1), cp.reshape(1, -1)]
    ispecs = [_slab_spec(cfg, c0), _mask_spec(cfg, kp), _slab_spec(cfg, c_lvl)]
    ispecs += [_small_spec((1, c_lvl))] * 5
    return _call(
        cfg,
        functools.partial(_b_mid_kernel, cfg=cfg, level=level),
        _grid(cfg, bsz, kp, mp),
        ops + consts, ispecs + cspecs,
        [jax.ShapeDtypeStruct((bsz, kp, mp, c_in), h1_t.dtype),
         jax.ShapeDtypeStruct((c_in, c_out), f32),
         jax.ShapeDtypeStruct((1, c_out), f32),
         jax.ShapeDtypeStruct((1, c_in), f32),
         jax.ShapeDtypeStruct((1, c_in), f32)],
        [_slab_spec(cfg, c_in), _small_spec((c_in, c_out)),
         _small_spec((1, c_out)), _small_spec((1, c_in)),
         _small_spec((1, c_in))],
        [pltpu.VMEM((c_in, c_out), f32), pltpu.VMEM((1, c_out), f32),
         pltpu.VMEM((1, c_in), f32), pltpu.VMEM((1, c_in), f32)],
    )

# ---------------------------------------------------------------------------
# forward / backward orchestration (custom VJP)
# ---------------------------------------------------------------------------


def _fin_from(cfg, params, stats, att_stats):
    return {
        "stats": [(mu.reshape(1, -1), inv.reshape(1, -1))
                  for mu, inv in stats],
        "bns": [(g.reshape(1, -1), b.reshape(1, -1))
                for g, b in params["bns"]],
        "denses": list(params["denses"]),
        "att_stats": [(mu.reshape(1, -1), inv.reshape(1, -1))
                      for mu, inv in att_stats],
        "att_bns": [(g.reshape(1, -1), b.reshape(1, -1))
                    for g, b in params["att_bns"]],
        "att_denses": list(params["att_denses"]),
    }


def _forward_impl(cfg: _Cfg, h1, maskf, params):
    h1_t, mask2, kp, mp = _pad_inputs(cfg, h1, maskf)
    n = jnp.clip(jnp.sum(maskf), min=1.0)
    fin = _fin_from(cfg, params, [], [])
    means, varis = [], []
    for i in range(cfg.n_loc):
        s, ss = _pass_stats(cfg, h1_t, mask2, fin, i, 0)
        mu = s / n
        var = jnp.maximum(ss / n - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + cfg.eps)
        fin["stats"].append((mu.reshape(1, -1), inv.reshape(1, -1)))
        means.append(mu)
        varis.append(var)
    att_means, att_varis = [], []
    if cfg.aggr == "attend":
        for j in range(cfg.n_att - 1):
            s, ss = _pass_stats(cfg, h1_t, mask2, fin, cfg.n_loc, j + 1)
            mu = s / n
            var = jnp.maximum(ss / n - mu * mu, 0.0)
            inv = jax.lax.rsqrt(var + cfg.eps)
            fin["att_stats"].append((mu.reshape(1, -1), inv.reshape(1, -1)))
            att_means.append(mu)
            att_varis.append(var)
    extras = _pass_out(cfg, h1_t, mask2, fin)
    out_p = extras[0]
    m = h1.shape[2]
    aux = (tuple(zip(means, varis)), tuple(zip(att_means, att_varis)), n)
    return out_p[:, :m], aux, (h1_t, mask2, extras, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _grouped_core(cfg: _Cfg, h1, maskf, params):
    out, aux, _ = _forward_impl(cfg, h1, maskf, params)
    return out, aux


def _core_fwd(cfg, h1, maskf, params):
    out, aux, (h1_t, mask2, extras, n) = _forward_impl(cfg, h1, maskf,
                                                       params)
    return (out, aux), (h1, maskf, params, aux, extras, n)


def _core_bwd(cfg, res, cts):
    d_out, _ = cts  # stat cotangents ignored (running stats are no_grad)
    h1, maskf, params, aux, extras, n = res
    (loc_stats, att_stats, _) = aux
    h1_t, mask2, kp, mp = _pad_inputs(cfg, h1, maskf)
    bsz, k, m, c0 = h1.shape
    f32 = jnp.float32

    def inv_of(var):
        return jax.lax.rsqrt(var + cfg.eps)

    stats = [(mu, inv_of(var)) for mu, var in loc_stats]
    astats = [(mu, inv_of(var)) for mu, var in att_stats]
    fin = _fin_from(cfg, params,
                    stats, astats)
    d_out_p = jnp.pad(d_out.astype(f32), ((0, 0), (0, mp - m), (0, 0)))

    d_bns = [None] * cfg.n_loc
    d_denses = [None] * cfg.n_loc
    d_att_bns, d_att_denses = [], []
    if cfg.aggr == "attend":
        out_p, mx_p, den_p = extras
        dwa1, dba1, rsa, rpa = _pass_b_att(
            cfg, h1_t, mask2, fin, d_out_p, out_p, mx_p, den_p)
        ga, _ = params["att_bns"][0]
        ginva = (ga.reshape(1, -1) * astats[0][1].reshape(1, -1))[0]
        cga, cpa = rsa[0] / n, rpa[0] / n
        d_att_bns = [(rpa[0], rsa[0])]
        tl, dw, db, dwa0, dba0, rs, rp = _pass_b_msg(
            cfg, h1_t, mask2, fin, d_out_p,
            (out_p, mx_p, den_p, ginva, cga, cpa))
        d_att_denses = [(dwa0, dba0[0]), (dwa1, dba1[0])]
    else:
        out_p, cnt_p = extras
        tl, dw, db, rs, rp = _pass_b_msg(
            cfg, h1_t, mask2, fin, d_out_p, (out_p, cnt_p))
    li = cfg.n_loc - 1
    d_denses[li] = (dw, db[0])
    for level in range(cfg.n_loc - 1, 0, -1):
        d_bns[level] = (rp[0], rs[0])
        g_l, _ = params["bns"][level]
        mu_l, inv_l = stats[level]
        ginv = g_l * inv_l
        cg, cp = rs[0] / n, rp[0] / n
        tl, dw, db, rs, rp = _pass_b_mid(
            cfg, h1_t, mask2, fin, level, tl, mu_l, inv_l, ginv, cg, cp)
        d_denses[level - 1] = (dw, db[0])
    d_bns[0] = (rp[0], rs[0])
    # XLA epilogue: T_0 -> d_h1 (elementwise over the k-major slab)
    g0, _ = params["bns"][0]
    mu0, inv0 = stats[0]
    mask_km = jnp.swapaxes(mask2, 1, 2)[..., None]
    xhat0 = (h1_t.astype(f32) - mu0) * inv0
    cg0, cp0 = rs[0] / n, rp[0] / n
    d_h1_t = (g0 * inv0) * (tl.astype(f32)
                            - mask_km * (cg0 + xhat0 * cp0))
    d_h1 = d_h1_t[:, :k, :m].astype(h1.dtype)
    d_params = {
        "bns": tuple(d_bns),
        "denses": tuple(d_denses),
        "att_bns": tuple(d_att_bns),
        "att_denses": tuple(d_att_denses),
    }
    return d_h1, jnp.zeros_like(maskf), d_params


_grouped_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _mlp_params(pdict, n_denses, start=1):
    """(bns, denses) kernel-param tuples from a flax MLP param dict.

    ``start=1`` skips lin_0 (it runs in XLA before the kernel); BN_i here
    is norm_{start-1+i} (the BN applied to lin_{start-1+i}'s output).
    """
    bns, denses = [], []
    for i in range(n_denses):
        li = start + i
        nrm = pdict[f"norm_{li - 1}"]
        bns.append((nrm["scale"], nrm["bias"]))
        lp = pdict[f"lin_{li}"]
        w = lp["kernel"]
        b = lp.get("bias", jnp.zeros((w.shape[1],), jnp.float32))
        denses.append((w, b))
    return tuple(bns), tuple(denses)


def _att_params(pdict, n_denses):
    """Attention MLP: all denses run in the kernel (layer 0 included)."""
    bns, denses = [], []
    for i in range(n_denses):
        lp = pdict[f"lin_{i}"]
        w = lp["kernel"]
        b = lp.get("bias", jnp.zeros((w.shape[1],), jnp.float32))
        denses.append((w, b))
        if i < n_denses - 1:
            nrm = pdict[f"norm_{i}"]
            bns.append((nrm["scale"], nrm["bias"]))
    return tuple(bns), tuple(denses)


def grouped_train_reduce(h1, mask, local_pdict, n_local_layers,
                         attend_pdict=None, n_attend_layers=0,
                         aggr: str = "attend", act: str = "leaky_relu",
                         attend_act: str = "leaky_relu", eps: float = 1e-5,
                         tile_m: Optional[int] = None,
                         k_planes: Optional[int] = None,
                         interpret: bool = False):
    """Grouped message-MLP + masked aggregation, training mode.

    h1    (B, K, M, C1) position-major layer-0 pre-norm messages (the
          flat lin_0 matmul runs in XLA at the gather output).
    mask  (B, M, K) bool, query-major, column order matching h1's planes.
    local_pdict / attend_pdict: flax param dicts ('nn' / 'attend_nn');
    n_*_layers counts ALL MLP layers incl. lin_0.

    Returns (out (B, M, C_out) f32,
             local_stats [(mean, var, n)] for norm_0..norm_{L-2},
             att_stats   [(mean, var, n)] for the attend norm_0) — exact
    masked batch statistics for the module's running-stat update.
    """
    bsz, k, m, c1 = h1.shape
    n_loc = n_local_layers - 1
    bns, denses = _mlp_params(local_pdict, n_loc)
    att_bns, att_denses = ((), ())
    att_dims = ()
    if aggr == "attend":
        att_bns, att_denses = _att_params(attend_pdict, n_attend_layers)
        att_dims = (att_denses[0][0].shape[0],) + tuple(
            w.shape[1] for w, _ in att_denses)
    params = {"bns": bns, "denses": denses,
              "att_bns": att_bns, "att_denses": att_denses}
    dims = (c1,) + tuple(w.shape[1] for w, _ in denses)
    import os as _os

    if k_planes is None:
        # per-grid-step Mosaic overhead is ~1-2 us; fatter K-plane groups
        # cut the step count (VMEM allowing) — env knob for A/B sweeps
        env_kp = _os.environ.get("CCN_GROUP_TRAIN_KP")
        k_planes = int(env_kp) if env_kp else _pick_k_planes(k)
    cfg = _Cfg(
        dims=dims, att_dims=att_dims, aggr=aggr, act=act,
        attend_act=attend_act, eps=eps,
        tile_m=tile_m if tile_m is not None else _pick_tile_m(m),
        k_planes=k_planes,
        interpret=interpret, cdt=jnp.dtype(h1.dtype).name
        if jnp.dtype(h1.dtype) != jnp.float32 else "float32")
    out, (loc_stats, att_stats, n) = _grouped_core(
        cfg, h1, mask.astype(jnp.float32), params)
    loc = [(mu, var, n) for mu, var in loc_stats]
    att = [(mu, var, n) for mu, var in att_stats]
    return out, loc, att
