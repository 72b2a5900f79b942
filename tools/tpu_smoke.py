#!/usr/bin/env python3
"""Compiled-form Pallas smoke gate: every TPU kernel compiles AND matches
the XLA reference on the real chip.

The interpret-mode CI (tests/test_pallas_*.py) cannot catch the
Mosaic-compile regression class (remote-compile failures, layout limits,
vreg constraints) that has cost real time in every round.  Run this before
every bench:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/tpu_smoke.py

Exit code 0 = all kernels compiled and agreed with XLA.
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/ccn_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from curvecloudnet_tpu.data.synthetic import synthetic_lidar_batch
from curvecloudnet_tpu.ops import neighbors, sampling
from curvecloudnet_tpu.ops.grid_knn import grid_knn
from curvecloudnet_tpu.ops.pallas_fps import fps_pallas
from curvecloudnet_tpu.ops.pallas_knn import knn_pallas_single
from curvecloudnet_tpu.ops.pallas_topk import topk_smallest

FAILURES = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[ok]   {name} ({time.time()-t0:.1f}s)", flush=True)
    except AssertionError as e:
        FAILURES.append(name)
        print(f"[FAIL] {name}: parity: {e}", flush=True)
    except Exception as e:
        FAILURES.append(name)
        msg = str(e).splitlines()[0][:160]
        print(f"[FAIL] {name}: {msg}", flush=True)


def _xla_knn(q, p, qv, pv, k, radius=None):
    old = neighbors.KNN_BACKEND
    neighbors.KNN_BACKEND = "xla"
    try:
        return neighbors.knn(q, p, qv, pv, k, radius=radius)
    finally:
        neighbors.KNN_BACKEND = old


def _assert_knn_close(got, want, tag, ok_floor=0.985):
    d_p, d_x = np.asarray(got[1]), np.asarray(want[1])
    finite = d_x < 1e20
    ok = np.isclose(d_p[finite], d_x[finite], rtol=1e-3, atol=1e-4).mean()
    vm = ((d_p < 1e20) != finite).mean()
    assert ok > ok_floor and vm < 1e-3, \
        f"{tag}: dist-ok={ok:.4f} vm={vm:.5f}"


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    pos, _, cid, valid, _ = synthetic_lidar_batch(rng, 1, 4096)
    pos, valid = jnp.asarray(pos), jnp.asarray(valid)
    cid = jnp.asarray(cid)

    def knn_variant(single, k, radius):
        def run():
            idx, dist = jax.jit(
                lambda q, p, qv, pv: jax.vmap(
                    lambda a, b, c, d: single(a, b, c, d, k=k,
                                              radius=radius)
                )(q, p, qv, pv))(pos, pos, valid, valid)
            jax.block_until_ready(dist)
            want = _xla_knn(pos, pos, valid, valid, k, radius)
            # radius cases see extra near-boundary quantization flips
            _assert_knn_close((idx, dist), want, "knn",
                              ok_floor=0.975 if radius else 0.985)
        return run

    check("pallas_knn v2 k=32", knn_variant(knn_pallas_single, 32, None))
    check("pallas_knn v2 k=20 r=0.04",
          knn_variant(knn_pallas_single, 20, 0.04))

    def fps_check():
        idx, iv = jax.jit(lambda p, v: fps_pallas(p, v, 0.25))(pos, valid)
        jax.block_until_ready(idx)
        idx = np.asarray(idx)[0]
        iv = np.asarray(iv)[0]
        kept = idx[iv]
        assert len(set(kept.tolist())) == iv.sum(), "duplicate FPS picks"
        # FPS picks must be spread out: min pairwise distance among a
        # sample of picks should far exceed the dataset's typical spacing
        p = np.asarray(pos)[0][kept[:256]]
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 1e-4, "FPS picked coincident points"

    check("pallas_fps", fps_check)

    def topk_check():
        d = jnp.asarray(rng.normal(size=(512, 192)) ** 2, jnp.float32)
        idx = jnp.asarray(
            rng.integers(0, 4096, size=(512, 192)), jnp.int32)
        td, ti = jax.jit(lambda a, b: topk_smallest(a, b, 16))(d, idx)
        jax.block_until_ready(td)
        want = np.sort(np.asarray(d), axis=-1)[:, :16]
        np.testing.assert_allclose(np.sort(np.asarray(td), axis=-1),
                                   want, rtol=1e-2, atol=1e-4)

    check("pallas_topk", topk_check)

    def grid_check():
        gi, gd = jax.jit(lambda q, p, qv, pv: grid_knn(
            q, p, qv, pv, 16, 0.08, cap=192))(pos, pos, valid, valid)
        jax.block_until_ready(gd)
        want = _xla_knn(pos, pos, valid, valid, 16, 0.08)
        # grid is capped/approximate: compare recall, not exact distances
        g, b = np.asarray(gi)[0], np.asarray(want[0])[0]
        recalls = []
        for i in range(0, 4096, 16):
            exact = set(b[i][b[i] >= 0].tolist())
            if exact:
                got = set(g[i][g[i] >= 0].tolist())
                recalls.append(len(exact & got) / len(exact))
        r = float(np.mean(recalls))
        assert r > 0.95, f"grid recall {r:.4f}"

    check("grid_knn", grid_check)

    def grid_fused_check():
        # fused vs unfused grid tail on the same inputs (real chip)
        gi, gd = jax.jit(lambda q, p, qv, pv: grid_knn(
            q, p, qv, pv, 16, 0.08, cap=192))(pos, pos, valid, valid)
        jax.block_until_ready(gd)
        os.environ["CCN_GRID_FUSED"] = "0"
        jax.clear_caches()  # env branch is read at trace time
        try:
            gi0, gd0 = jax.jit(lambda q, p, qv, pv: grid_knn(
                q, p, qv, pv, 16, 0.08, cap=192))(pos, pos, valid, valid)
            jax.block_until_ready(gd0)
        finally:
            os.environ.pop("CCN_GRID_FUSED", None)
            jax.clear_caches()
        a, b = np.asarray(gd)[0], np.asarray(gd0)[0]
        fin = b < 1e20
        assert ((np.asarray(gi)[0] >= 0) == (np.asarray(gi0)[0] >= 0)).mean() > 0.999
        np.testing.assert_allclose(a[fin], b[fin], rtol=2e-2, atol=1e-4)

    check("grid_topk_records fused tail", grid_fused_check)

    def group_check():
        from curvecloudnet_tpu.ops import pallas_group

        m, k, c1 = 4096, 65, 64
        dims, att_dims = (128, 192, 256), (256, 256)
        r2 = np.random.default_rng(7)
        h1 = jnp.asarray(r2.normal(size=(1, m, k, c1)), jnp.bfloat16)
        mask = jnp.asarray(r2.random((1, m, k)) > 0.3)
        aff = (jnp.asarray(r2.random(c1) + 0.5, jnp.float32),
               jnp.asarray(r2.normal(size=c1) * 0.1, jnp.float32))

        def mk(prev, ds):
            out = []
            for d in ds:
                out.append(
                    (jnp.asarray(r2.normal(size=(prev, d)) / np.sqrt(prev),
                                 jnp.float32),
                     jnp.asarray(r2.normal(size=d) * 0.1, jnp.float32)))
                prev = d
            return tuple(out), prev

        loc, last = mk(c1, dims)
        att, _ = mk(last, att_dims)
        for aggr in ("attend", "max"):
            got = pallas_group.fused_group_reduce(
                h1, mask, aff, loc, att if aggr == "attend" else None,
                aggr=aggr)
            jax.block_until_ready(got)

            # XLA reference of the same folded composition
            def ref():
                act = lambda v: jnp.where(v > 0, v, 0.01 * v)
                h = (h1.astype(jnp.float32) * aff[0]
                     + aff[1]).astype(h1.dtype)
                h = act(h)
                for li, (w, b) in enumerate(loc):
                    h = (jnp.einsum("bmkc,cd->bmkd", h.astype(jnp.bfloat16),
                                    w.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                         + b).astype(h1.dtype)
                    if li < len(loc) - 1:
                        h = act(h)
                if aggr == "max":
                    return jnp.max(
                        jnp.where(mask[..., None], h.astype(jnp.float32),
                                  -1e2), axis=2)
                lg = h
                for li, (w, b) in enumerate(att):
                    lg = (jnp.einsum("bmkc,cd->bmkd",
                                     lg.astype(jnp.bfloat16),
                                     w.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32)
                          + b).astype(h1.dtype)
                    if li < len(att) - 1:
                        lg = act(lg)
                lg = jnp.where(mask[..., None], lg, -5e2).astype(jnp.float32)
                mx = jnp.max(lg, axis=2, keepdims=True)
                e = jnp.exp(lg - mx)
                return (jnp.sum(e * h.astype(jnp.float32), axis=2)
                        / jnp.sum(e, axis=2))

            want = jax.jit(ref)()
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=0.1, atol=0.1)

            # k-major variant (position-major slab + separate 2D mask
            # operand) must match the query-major kernel EXACTLY — same
            # compute, different DMA layout
            got_km = pallas_group.fused_group_reduce(
                jnp.moveaxis(h1, 2, 1), mask, aff, loc,
                att if aggr == "attend" else None,
                aggr=aggr, k_major=True)
            np.testing.assert_array_equal(np.asarray(got_km),
                                          np.asarray(got))

    check("pallas_group fused MLP+aggregate", group_check)

    def group_train_check():
        from curvecloudnet_tpu.ops import aggregate
        from curvecloudnet_tpu.ops.pallas_group_train import (
            grouped_train_reduce)

        m, k = 2048, 20
        dims, att_dims = (64, 128, 256), (256, 256, 256)
        r2 = np.random.default_rng(11)
        maskf = jnp.asarray(r2.random((1, m, k)) > 0.3, jnp.float32)
        rvec = jnp.asarray(r2.normal(size=(1, m, dims[-1])), jnp.float32)
        eps = 1e-5

        def params_for(dt):
            loc, att = {}, {}
            for i in range(len(dims) - 1):
                loc[f"norm_{i}"] = {
                    "scale": jnp.asarray(r2.random(dims[i]) + 0.5,
                                         jnp.float32),
                    "bias": jnp.asarray(r2.normal(size=dims[i]) * 0.1,
                                        jnp.float32)}
                loc[f"lin_{i + 1}"] = {"kernel": jnp.asarray(
                    r2.normal(size=(dims[i], dims[i + 1]))
                    / np.sqrt(dims[i]), jnp.float32)}
            for i in range(len(att_dims) - 1):
                att[f"lin_{i}"] = {"kernel": jnp.asarray(
                    r2.normal(size=(att_dims[i], att_dims[i + 1]))
                    / np.sqrt(att_dims[i]), jnp.float32)}
                if i < len(att_dims) - 2:
                    att[f"norm_{i}"] = {
                        "scale": jnp.asarray(r2.random(att_dims[i + 1])
                                             + 0.5, jnp.float32),
                        "bias": jnp.asarray(
                            r2.normal(size=att_dims[i + 1]) * 0.1,
                            jnp.float32)}
            return loc, att

        def ref_loss(h1_qm, loc, att, aggr, cdt):
            n = jnp.clip(jnp.sum(maskf), min=1.0)
            act = lambda v: jnp.where(v > 0, v, 0.01 * v)
            v = h1_qm.astype(jnp.float32)
            for i in range(len(dims) - 1):
                mf = maskf[..., None]
                mu = jnp.sum(v * mf, axis=(0, 1, 2)) / n
                var = jnp.sum((v - mu) ** 2 * mf, axis=(0, 1, 2)) / n
                y = ((v - mu) * jax.lax.rsqrt(var + eps)
                     * loc[f"norm_{i}"]["scale"] + loc[f"norm_{i}"]["bias"])
                v = jnp.einsum("bmkc,cd->bmkd", act(y).astype(cdt),
                               loc[f"lin_{i + 1}"]["kernel"].astype(cdt),
                               preferred_element_type=jnp.float32)
            msg = v
            if aggr == "max":
                out = aggregate.masked_max(msg, maskf > 0)
            else:
                g = jnp.einsum("bmkc,cd->bmkd", msg.astype(cdt),
                               att["lin_0"]["kernel"].astype(cdt),
                               preferred_element_type=jnp.float32)
                mf = maskf[..., None]
                mu = jnp.sum(g * mf, axis=(0, 1, 2)) / n
                var = jnp.sum((g - mu) ** 2 * mf, axis=(0, 1, 2)) / n
                ya = ((g - mu) * jax.lax.rsqrt(var + eps)
                      * att["norm_0"]["scale"] + att["norm_0"]["bias"])
                lg = jnp.einsum("bmkc,cd->bmkd", act(ya).astype(cdt),
                                att["lin_1"]["kernel"].astype(cdt),
                                preferred_element_type=jnp.float32)
                out = aggregate.masked_attend(msg, lg, maskf > 0)
            return jnp.sum(out.astype(jnp.float32) * rvec)

        # exactness is pinned by the interpret-mode CI (tests/test_group_
        # train*.py); on-chip tolerances only need to catch Mosaic
        # compile/layout regressions — f32 dots use different default
        # matmul passes in Mosaic vs XLA einsum (measured ~2% grad drift)
        for dt, tol in ((jnp.float32, 8e-3), (jnp.bfloat16, 0.1)):
            h1 = jnp.asarray(r2.normal(size=(1, m, k, dims[0])), dt)
            loc, att = params_for(dt)
            for aggr in ("attend", "max"):
                def ker_loss(h1_, loc_, att_):
                    out, _, _ = grouped_train_reduce(
                        jnp.swapaxes(h1_, 1, 2), maskf > 0, loc_,
                        len(dims), att_ if aggr == "attend" else None,
                        2 if aggr == "attend" else 0, aggr=aggr)
                    return jnp.sum(out * rvec)

                vk, gk = jax.jit(jax.value_and_grad(
                    ker_loss, argnums=(0, 1, 2)))(h1, loc, att)
                vr, gr = jax.jit(jax.value_and_grad(
                    functools.partial(ref_loss, aggr=aggr, cdt=dt),
                    argnums=(0, 1, 2)))(h1, loc, att)
                jax.block_until_ready(gk)
                sc = max(abs(float(vr)), 1.0)
                assert abs(float(vk) - float(vr)) / sc < tol, \
                    f"{aggr}/{dt}: value {float(vk)} vs {float(vr)}"
                for (kp, a), (_, b) in zip(
                        jax.tree_util.tree_flatten_with_path(gr)[0],
                        jax.tree_util.tree_flatten_with_path(gk)[0]):
                    a, b = np.asarray(a, np.float32), np.asarray(
                        b, np.float32)
                    denom = max(np.abs(a).max(), 1e-3)
                    rel = np.abs(b - a).max() / denom
                    assert rel < tol * 5, \
                        f"{aggr}/{dt}: grad at {kp}: relmax {rel}"

    check("pallas_group_train fwd+bwd", group_train_check)

    def tile_gather_check():
        from curvecloudnet_tpu.ops import pallas_gather as pg

        rng = np.random.default_rng(11)
        n, q, k, c = 4096, 1536, 21, 70
        base = np.arange(q)[:, None] * (n // q)
        idx = np.clip(base + rng.integers(-60, 60, (q, k)), 0, n - 1)
        idx[rng.random((q, k)) < 0.03] = -1
        idx_kq = jnp.asarray(idx.T.astype(np.int32))
        src = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)
                          ).astype(jnp.bfloat16)
        pos = jnp.asarray(rng.uniform(-100, 100, (n, 3)).astype(np.float32))
        got = np.asarray(jax.jit(pg.gather_rows)(src, idx_kq))
        want = np.asarray(src[jnp.maximum(idx_kq, 0)])
        assert (got == want).all(), "expand fwd not exact"
        xg, pgout = jax.jit(pg.gather_rows_with_pos)(src, pos, idx_kq)
        assert (np.asarray(pgout)
                == np.asarray(pos[jnp.maximum(idx_kq, 0)])).all(), \
            "triplet positions not exact"
        cot = jnp.asarray(rng.normal(size=(k, q, c)).astype(np.float32))
        gk = jax.jit(jax.grad(lambda s: jnp.sum(
            pg.gather_rows(s, idx_kq).astype(jnp.float32) * cot)))(src)
        gr = jax.jit(jax.grad(lambda s: jnp.sum(
            s[jnp.maximum(idx_kq, 0)].astype(jnp.float32) * cot)))(src)
        a, b = np.asarray(gr, np.float32), np.asarray(gk, np.float32)
        rel = np.abs(b - a).max() / max(np.abs(a).max(), 1e-3)
        # the reference path accumulates the scatter in bf16 while the
        # kernel collapses in f32 and rounds once at the end — the
        # difference is dominated by the REFERENCE's bf16 accumulation
        # noise (~1 ulp per add over ~21 contributions)
        assert rel < 1.2e-1, f"collapse bwd relmax {rel}"

    check("pallas_gather tile-unique fwd+bwd", tile_gather_check)

    def ingraph_grid_check():
        """Grid tables built INSIDE a larger jit must match the standalone
        search.  Guards the round-4 denormal-flush find: point indices
        bitcast into the f32 record were denormals; when XLA routed the
        table through a compute op in a big graph the VPU flushed every
        stored index to 0 and each query collapsed to ONE neighbor
        (self-only tables in the whole round-3 flagship on TPU, while the
        standalone kernel — pure DMA — was exact).  The biased encoding
        (grid_knn._decode_idx) keeps records normal-float; this check
        fails if any future pass reintroduces payload corruption."""
        from curvecloudnet_tpu.ops import neighbors as N

        rng = np.random.default_rng(5)
        n = 23040
        pos = (rng.uniform(-1, 1, (1, n + 64, 3)) * 0.4).astype(np.float32)
        posj = jnp.asarray(pos)
        iv = jnp.ones((1, n), bool)

        def table_counts(p0):
            p1 = p0[:, :n] * 1.0   # in-graph producer (the trigger shape)
            with N.shared_knn_scope():
                t_idx, _ = N._row_table(p1, iv, 0.04)
            return t_idx

        t_in = np.asarray(jax.jit(table_counts)(posj))
        cnt = (t_in >= 0).sum(-1)
        assert cnt.mean() > 3, f"in-graph grid table self-only: {cnt.mean()}"
        # standalone reference on the same data
        with N.shared_knn_scope():
            t_ref = np.asarray(N._row_table(posj[:, :n], iv, 0.04)[0])
        agree = (np.sort(t_in, -1) == np.sort(t_ref, -1)).mean()
        assert agree > 0.999, f"in-graph != standalone: {agree}"

    check("in-graph grid table integrity (denormal guard)",
          ingraph_grid_check)

    def pos_pack_ingraph_check():
        """Packed bf16 positions must survive an in-graph concat + gather
        + select round-trip EXACTLY.  The original bit-split hi/lo pairs
        carried arbitrary bit payloads (~1/128 are bf16 denormals/NaNs)
        and measured 3.4% corrupted components through this exact graph
        on v5e — the shipped 3x-bf16 residual triplets are plain values
        (always normal at lidar scales) and reconstruct bit-exactly."""
        from curvecloudnet_tpu.ops.interpolate import (POS_PACK_CH,
                                                       _pack_pos_bf16,
                                                       _unpack_pos_bf16)

        rng = np.random.default_rng(7)
        # include coordinates whose low 16 bits form denormal/NaN bf16s
        # (the payloads that killed the bit-split scheme)
        base = rng.normal(0, 50, (1, 4096, 3)).astype(np.float32)
        bits = base.view(np.uint32)
        bits[0, :64] = (bits[0, :64] & 0xFFFF0000) | 0x0001
        bits[0, 64:128] = (bits[0, 64:128] & 0xFFFF0000) | 0xFF81
        pos = bits.view(np.float32)
        x = rng.normal(size=(1, 4096, 8)).astype(np.float32)
        idx = jnp.asarray(
            rng.integers(0, 4096, (1, 512, 4)).astype(np.int32))

        def run(xj, pj, ij):
            rec = jnp.concatenate(
                [xj.astype(jnp.bfloat16), _pack_pos_bf16(pj)], axis=-1)
            safe = jnp.maximum(ij, 0)
            out = jax.vmap(lambda rb, ib: rb[ib])(rec, safe)
            out = jnp.where((ij >= 0)[..., None], out, 0.0)
            return _unpack_pos_bf16(out[..., -POS_PACK_CH:])

        got = np.asarray(jax.jit(run)(jnp.asarray(x), jnp.asarray(pos), idx))
        want = pos[0][np.asarray(idx)[0]]
        exact = (got[0] == want).mean()
        assert exact == 1.0, f"packed positions corrupted: {exact}"

    check("bf16 packed-position round-trip in-graph",
          pos_pack_ingraph_check)

    def conv1d_chain_check():
        """conv1d chain megakernel (ops/pallas_conv1d.py) compiled vs the
        XLA exact-path math at a flagship-like shape."""
        from curvecloudnet_tpu.ops import curve1d, pallas_conv1d

        rng = np.random.default_rng(11)
        n_exp, c0, h = 12300, 14, 2
        used = 11900
        xe = rng.normal(size=(n_exp, c0)).astype(np.float32)
        xe[used:] = 0.0
        ws, cin = [], c0
        for cout in (32, 32, 32):
            ws.append((jnp.asarray(rng.normal(
                size=((h + 1) * cin, cout)).astype(np.float32) * 0.1),
                jnp.asarray(rng.normal(size=cout).astype(np.float32) * .1)))
            cin = cout
        got = np.asarray(pallas_conv1d.conv1d_chain_eval(
            jnp.asarray(xe), tuple(ws), used, half_k=h))
        a = jnp.asarray(xe)
        mask = (jnp.arange(n_exp) < used)[:, None]
        for w, bb in ws:
            win = curve1d.window_concat_nomask(a[None], h)[0]
            a = jnp.where(mask, jax.nn.leaky_relu(
                win @ w + bb, negative_slope=0.01), 0.0)
        want = np.asarray(a)
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        assert err < 8e-3, f"conv1d chain relmax {err}"

    check("conv1d chain megakernel", conv1d_chain_check)

    if FAILURES:
        print(f"SMOKE FAILED: {FAILURES}", flush=True)
        sys.exit(1)
    print("SMOKE OK: all kernels compiled + matched", flush=True)


if __name__ == "__main__":
    main()
