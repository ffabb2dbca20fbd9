"""Stage-by-stage device profile of the hybrid scan pipeline at the bench
shape (VERDICT r3 #1: find where the 18.7 ms actually goes before touching
the kernel).

Mirrors bench.py's scan_measure — same synthetic index, same query model,
same U-dedup gate — but (a) pre-generates the query batches OUTSIDE the
timed scan (the bench's in-scan jax.random.categorical over 50k logits
costs ~2.6 ms/batch by itself — generator overhead, not pipeline work) and
(b) times each pipeline stage in isolation under one lax.scan dispatch so
tunnel RTT cancels.  All index arrays are jit ARGUMENTS (closure capture
bakes them into the HLO and kills the remote-compile tunnel with 413s).

Usage:  python tools/profile_pipeline.py [n_docs] [n_scan]
Writes docs/profile_pipeline_<n_docs>.json and prints a breakdown table.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import bench as bench_mod
from modern_search_engines_project_tpu.retrieval import ops
from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
    bm25_score_slots_udedup,
    dedup_query_terms_device,
    u_pad_for,
    udedup_plan,
)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_scan = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    B, T, dim = 64, 8, 768
    k_ret = 1000

    t0 = time.time()
    didx, cfg, dfs = bench_mod.make_synthetic_index(
        n_docs=n_docs,
        n_terms=max(50_000, n_docs // 2),
        avg_chunks=3.0,
        dim=dim,
        nnz_target=80 * n_docs,
    )
    print(f"index built in {time.time() - t0:.1f}s nnz={didx.nnz}", file=sys.stderr)
    k_eff = min(k_ret, didx.n_docs_pad)
    logits = jnp.log(jnp.asarray(dfs, jnp.float32))

    def gen(seed):
        key = jax.random.fold_in(jax.random.key(7), seed)
        k1, k2, k3 = jax.random.split(key, 3)
        tid = jax.random.categorical(k1, logits, shape=(B, T)).astype(jnp.int32)
        tid = tid.at[:, 0].set(0)
        n_q = jax.random.randint(k3, (B, 1), 2, 7)
        valid = jnp.arange(T)[None, :] < n_q
        tid = jnp.where(valid, tid, -1)
        qw = valid.astype(jnp.float32)
        qv = jax.random.normal(k2, (B, dim), jnp.float32)
        qv = qv / jnp.linalg.norm(qv, axis=1, keepdims=True)
        return tid, qw, qv

    gen_j = jax.jit(gen)
    batches = [gen_j(jnp.int32(s)) for s in range(n_scan)]
    max_distinct = max(
        int(np.unique(np.asarray(b[0])).size) for b in batches
    )
    u_pad = u_pad_for(max_distinct)
    plan = udedup_plan(u_pad, B, nnz=didx.nnz)
    print(f"max_distinct={max_distinct} u_pad={u_pad} plan={plan}", file=sys.stderr)

    TID = jnp.stack([b[0] for b in batches])  # (n_scan, B, T)
    QW = jnp.stack([b[1] for b in batches])
    QV = jnp.stack([b[2] for b in batches])  # (n_scan, B, dim)

    sargs = (
        didx.slot_terms, didx.slot_impact, didx.col_unperm,
        didx.bucket_emb, didx.bucket_valid, didx.bucket_start,
    )
    buckets = didx.buckets
    Dp = didx.n_docs_pad
    smoothing = cfg.smoothing
    variant = plan

    # fixed realistic intermediates for tail-only stages
    tid0, qw0, qv0 = batches[0]
    uids0, w0 = dedup_query_terms_device(tid0, qw0, u_pad)
    bm0 = bm25_score_slots_udedup(
        didx.slot_terms, didx.slot_impact, didx.col_unperm, uids0, w0, variant=variant
    )
    bm0 = jax.device_put(np.asarray(bm0))
    tv0, ti0 = lax.top_k(bm0[:, :Dp], k_eff)
    tv0, ti0 = jax.device_put(np.asarray(tv0)), jax.device_put(np.asarray(ti0))
    b_rows = np.arange(B, dtype=np.int32)[:, None]
    sidx0 = np.where(np.asarray(tv0) >= 0.0, np.asarray(ti0), Dp)
    cm = np.zeros((B, Dp + 1), np.bool_)
    cm[b_rows, sidx0] = True
    cand_mask0 = jax.device_put(cm[:, :Dp])
    old_dense0 = jax.device_put(np.zeros((B, Dp), np.float32))

    def scan_time(name, body, extra_args=(), reps=3):
        """body(tid, qw, qv, *extra) -> scalar.  Times n_scan iterations
        under one lax.scan; index arrays & extras are jit args."""

        @jax.jit
        def loop(TID, QW, QV, sargs, extras, salt):
            def one(carry, x):
                tid, qw, qv = x
                return carry + body(
                    tid, qw, qv + salt * 1e-12, sargs, extras
                ).astype(jnp.float32), None

            out, _ = lax.scan(one, jnp.zeros((), jnp.float32), (TID, QW, QV))
            return out

        _ = float(np.asarray(loop(TID, QW, QV, sargs, extra_args, jnp.float32(0.0))))
        best = 1e9
        for r in range(reps):
            t0 = time.time()
            _ = float(
                np.asarray(
                    loop(TID, QW, QV, sargs, extra_args, jnp.float32(r + 1))
                )
            )
            best = min(best, (time.time() - t0) / n_scan * 1e3)
        print(f"{name:44s} {best:8.3f} ms", flush=True)
        return best

    results = {}

    def body_full(tid, qw, qv, sa, ex):
        uids, w = dedup_query_terms_device(tid, qw, u_pad)
        o = ops.hybrid_rank_slots_udedup(
            *sa, uids, w, qv,
            n_docs_pad=Dp, k_ret=k_eff, smoothing=smoothing,
            buckets=buckets, variant=variant,
        )
        return jnp.sum(o[0][:, 0])

    results["full"] = scan_time("FULL pipeline (no gen)", body_full)

    def body_prep(tid, qw, qv, sa, ex):
        uids, w = dedup_query_terms_device(tid, qw, u_pad)
        return jnp.sum(w[:, 0]) + jnp.sum(uids)

    results["prep"] = scan_time("dedup prep only", body_prep)

    def body_bm(tid, qw, qv, sa, ex):
        uids, w = dedup_query_terms_device(tid, qw, u_pad)
        bm = bm25_score_slots_udedup(sa[0], sa[1], sa[2], uids, w, variant=variant)
        return jnp.sum(bm[:, 0])

    results["prep_bm25"] = scan_time("prep + BM25 kernel", body_bm)

    def body_bmtk(tid, qw, qv, sa, ex):
        uids, w = dedup_query_terms_device(tid, qw, u_pad)
        bm = bm25_score_slots_udedup(sa[0], sa[1], sa[2], uids, w, variant=variant)
        tv, ti = lax.top_k(bm[:, :Dp], k_eff)
        return jnp.sum(tv[:, 0]) + jnp.sum(ti[:, 0].astype(jnp.float32))

    results["prep_bm25_topk"] = scan_time("prep + BM25 + top_k", body_bmtk)

    def body_tk(tid, qw, qv, sa, ex):
        bm = ex[0] + qv[0, 0] * 1e-9
        tv, ti = lax.top_k(bm[:, :Dp], k_eff)
        return jnp.sum(tv[:, 0]) + jnp.sum(ti[:, 0].astype(jnp.float32))

    results["topk_alone"] = scan_time(
        "top_k(1000) alone [fixed bm]", body_tk, (bm0,)
    )

    def body_scatter(tid, qw, qv, sa, ex):
        tv = ex[0] + qv[0, 0] * 1e-9
        ti = ex[1]
        valid_c = tv >= 0.0
        lo = jnp.min(jnp.where(valid_c, tv, jnp.inf), axis=1, keepdims=True)
        hi = jnp.max(jnp.where(valid_c, tv, -jnp.inf), axis=1, keepdims=True)
        den = hi - lo
        old_norm = jnp.where(
            valid_c & (den > 0), (tv - lo) / jnp.where(den > 0, den, 1.0), 0.0
        )
        br = jnp.arange(B, dtype=jnp.int32)[:, None]
        sidx = jnp.where(valid_c, ti, Dp)
        cand_mask = (
            jnp.zeros((B, Dp + 1), jnp.bool_).at[br, sidx].set(True)
        )[:, :Dp]
        old_dense = (
            jnp.zeros((B, Dp + 1), jnp.float32).at[br, sidx].set(old_norm)
        )[:, :Dp]
        return jnp.sum(old_dense[:, 0]) + jnp.sum(cand_mask[:, 0])

    results["scatter"] = scan_time(
        "scatter mask alone [fixed topk]", body_scatter, (tv0, ti0)
    )


    def body_tail(tid, qw, qv, sa, ex):
        bm = ex[0] + qv[0, 0] * 1e-9
        o = ops._hybrid_tail_buckets(
            bm, sa[3], sa[4], sa[5], qv,
            n_docs_pad=Dp, k_ret=k_eff, smoothing=smoothing, buckets=buckets,
        )
        return jnp.sum(o[0][:, 0])

    results["tail"] = scan_time("full tail [fixed bm]", body_tail, (bm0,))

    def body_cmask(tid, qw, qv, sa, ex):
        bm = ex[0] + qv[0, 0] * 1e-9
        cand, old_dense, old_norm, valid_c = ops.dense_candidates_from_topk(
            bm, ex[1], Dp
        )
        return (
            jnp.sum(old_dense[:, 0])
            + jnp.sum(cand[:, 0])
            + jnp.sum(old_norm[:, 0])
        )

    results["cand_mask_new"] = scan_time(
        "cand mask (threshold+cumsum)", body_cmask, (bm0, tv0)
    )

    def body_stats(tid, qw, qv, sa, ex):
        # consume ALL five outputs — reading only (v1, vmin) lets XLA
        # dead-code-eliminate the v2/w1/w2 computation and under-report
        stats = ops.bucket_doc_stats(buckets, sa[3], sa[4], qv)
        return sum(
            jnp.sum(s[0][:, 0]) + jnp.sum(s[1][:, 0]) + jnp.sum(s[4][:, 0])
            + jnp.sum(s[2][:, 0].astype(jnp.float32))
            + jnp.sum(s[3][:, 0].astype(jnp.float32))
            for s in stats
        )

    results["doc_stats_new"] = scan_time(
        "bucket_doc_stats (one dense pass)", body_stats
    )

    def body_statsmath(tid, qw, qv, sa, ex):
        stats0 = ex[2]
        lo, hi = ops.stats_pool_extrema(stats0, ex[0], buckets)
        lo = lo + qv[0, 0] * 1e-9
        ds, win = ops.fused_scores_from_stats(
            buckets, sa[5], stats0, ex[0], ex[1], lo[:, None], hi[:, None],
            smoothing,
        )
        return jnp.sum(ds[:, 0]) + jnp.sum(win[:, 0].astype(jnp.float32))

    stats0 = jax.jit(
        lambda be, bv, qv: ops.bucket_doc_stats(buckets, be, bv, qv)
    )(didx.bucket_emb, didx.bucket_valid, qv0)
    stats0 = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x)), stats0
    )
    results["stats_math_new"] = scan_time(
        "extrema+fused math from stats", body_statsmath,
        (cand_mask0, old_dense0, stats0),
    )

    def body_stats_pallas(tid, qw, qv, sa, ex):
        stats = ops.bucket_doc_stats(
            buckets, sa[3], sa[4], qv, use_pallas=True
        )
        return sum(
            jnp.sum(s[0][:, 0]) + jnp.sum(s[1][:, 0]) + jnp.sum(s[4][:, 0])
            + jnp.sum(s[2][:, 0].astype(jnp.float32))
            + jnp.sum(s[3][:, 0].astype(jnp.float32))
            for s in stats
        )

    results["doc_stats_pallas"] = scan_time(
        "bucket stats PALLAS kernel", body_stats_pallas
    )

    def body_blockmax(tid, qw, qv, sa, ex):
        bm = ex[0] + qv[0, 0] * 1e-9
        tv, ti = ops.topk_blockmax(bm[:, :Dp], k_eff)
        return jnp.sum(tv[:, 0]) + jnp.sum(ti[:, 0].astype(jnp.float32))

    results["blockmax_topk"] = scan_time(
        "topk_blockmax (stage-1)", body_blockmax, (bm0,)
    )

    ds0 = jax.device_put(
        np.asarray(
            jax.jit(lambda b: jnp.where(b[:, :Dp] >= 0, b[:, :Dp], -1.0))(bm0)
        )
    )

    def body_flat2(tid, qw, qv, sa, ex):
        ds, ti = ex
        ds = ds + qv[0, 0] * 1e-9
        gflat = ti + jnp.arange(B, dtype=jnp.int32)[:, None] * Dp
        cs = jnp.take(ds.reshape(-1), gflat)
        cw = jnp.take(ds.astype(jnp.int32).reshape(-1), gflat)
        fv, order = lax.top_k(cs, k_eff)
        fd = jnp.take_along_axis(ti, order, axis=1)
        fw = jnp.take_along_axis(cw, order, axis=1)
        return jnp.sum(fv[:, 0]) + jnp.sum((fd + fw)[:, 0].astype(jnp.float32))

    results["final_flat_takes"] = scan_time(
        "final 2x FLAT take + rerank top_k", body_flat2, (ds0, ti0)
    )

    # (take_along_axis variant, for comparison)
    def body_final(tid, qw, qv, sa, ex):
        ds, ti = ex
        ds = ds + qv[0, 0] * 1e-9
        cand_scores = jnp.take_along_axis(ds, ti, axis=1)
        cand_win = jnp.take_along_axis(ds.astype(jnp.int32), ti, axis=1)
        fv, order = lax.top_k(cand_scores, k_eff)
        fd = jnp.take_along_axis(ti, order, axis=1)
        fw = jnp.take_along_axis(cand_win, order, axis=1)
        return jnp.sum(fv[:, 0]) + jnp.sum((fd + fw)[:, 0].astype(jnp.float32))

    results["final_gathers"] = scan_time(
        "final 2x gather + rerank top_k", body_final, (ds0, ti0)
    )

    # --- experiments: candidate stage-1 top-k + final-stage formulations ----
    # lax.top_k vs topk_blockmax at this shape (blockmax won at round-3
    # measurement time; XLA's TopK emitter may have moved)
    def body_tail_lax(tid, qw, qv, sa, ex):
        bm = ex[0] + qv[0, 0] * 1e-9
        top_vals, top_idx = lax.top_k(bm[:, :Dp], k_eff)
        cand_mask, old_dense, old_norm, valid_c = (
            ops.dense_candidates_from_topk(bm, top_vals, Dp)
        )
        stats = ops.bucket_doc_stats(buckets, sa[3], sa[4], qv)
        lo, hi = ops.stats_pool_extrema(stats, cand_mask, buckets)
        doc_score, win = ops.fused_scores_from_stats(
            buckets, sa[5], stats, cand_mask, old_dense,
            lo[:, None], hi[:, None], smoothing,
        )
        o = ops._rank_candidates(
            doc_score, win, top_idx, valid_c, old_norm, k_eff
        )
        return jnp.sum(o[0][:, 0])

    results["tail_laxtopk"] = scan_time(
        "full tail with lax.top_k stage-1", body_tail_lax, (bm0,)
    )

    # final stage as ONE variadic 5-operand sort (no post-sort gathers)
    def body_sort5(tid, qw, qv, sa, ex):
        ds, ti = ex
        ds = ds + qv[0, 0] * 1e-9
        gflat = ti + jnp.arange(B, dtype=jnp.int32)[:, None] * Dp
        cs = jnp.take(ds.reshape(-1), gflat)
        cw = jnp.take(ds.astype(jnp.int32).reshape(-1), gflat)
        valid = cs >= 0.0
        key = jnp.where(valid, cs, -1.0)
        nk, fd, fw, fo, fv2 = lax.sort(
            (-key, ti, cw, cs, valid.astype(jnp.int32)),
            dimension=1, num_keys=1,
        )
        return (
            jnp.sum(-nk[:, 0]) + jnp.sum((fd + fw)[:, 0].astype(jnp.float32))
            + jnp.sum(fo[:, 0]) + jnp.sum(fv2[:, 0].astype(jnp.float32))
        )

    results["final_sort5"] = scan_time(
        "final variadic 5-op sort", body_sort5, (ds0, ti0)
    )

    # split the current final stage: takes alone / top_k alone / the three
    # post-sort take_along_axis alone
    def body_takes_only(tid, qw, qv, sa, ex):
        ds, ti = ex
        ds = ds + qv[0, 0] * 1e-9
        gflat = ti + jnp.arange(B, dtype=jnp.int32)[:, None] * Dp
        cs = jnp.take(ds.reshape(-1), gflat)
        cw = jnp.take(ds.astype(jnp.int32).reshape(-1), gflat)
        return jnp.sum(cs[:, 0]) + jnp.sum(cw[:, 0].astype(jnp.float32))

    results["final_takes_only"] = scan_time(
        "final 2x flat take only", body_takes_only, (ds0, ti0)
    )

    def body_small_topk(tid, qw, qv, sa, ex):
        tv = ex[0] + qv[0, 0] * 1e-9
        fv, order = lax.top_k(tv, k_eff)
        return jnp.sum(fv[:, 0]) + jnp.sum(order[:, 0].astype(jnp.float32))

    results["final_topk_only"] = scan_time(
        "final top_k over (B,k) only", body_small_topk, (tv0,)
    )

    # dispatch floor: trivial body — everything above includes this
    def body_floor(tid, qw, qv, sa, ex):
        return jnp.sum(qv[0, :4])

    results["floor"] = scan_time("scan dispatch floor (empty body)", body_floor)

    out = {
        "n_docs": n_docs, "n_scan": n_scan, "B": B, "u_pad": u_pad,
        "plan": plan, "nnz": didx.nnz, "n_docs_pad": Dp,
        "buckets": list(buckets), "results_ms": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", f"profile_pipeline_{n_docs}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(results, indent=1))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
