"""Capture a jax.profiler trace of the hybrid tail at the bench shape and
print the per-HLO-op time breakdown (tensorboard_plugin_profile xplane
conversion; no TensorBoard UI needed).

Usage: python tools/trace_tail.py [n_docs] [n_scan] [section]
  section: full | tail (default tail)
"""
from __future__ import annotations

import glob
import gzip
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
    section = sys.argv[3] if len(sys.argv) > 3 else "tail"
    B, T, dim = 64, 8, 768
    k_ret = 1000

    didx, cfg, dfs = bench_mod.make_synthetic_index(
        n_docs=n_docs,
        n_terms=max(50_000, n_docs // 2),
        avg_chunks=3.0,
        dim=dim,
        nnz_target=80 * n_docs,
    )
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
    max_distinct = max(int(np.unique(np.asarray(b[0])).size) for b in batches)
    u_pad = u_pad_for(max_distinct)
    plan = udedup_plan(u_pad, B, nnz=didx.nnz)
    variant = plan
    TID = jnp.stack([b[0] for b in batches])
    QW = jnp.stack([b[1] for b in batches])
    QV = jnp.stack([b[2] for b in batches])
    buckets = didx.buckets
    Dp = didx.n_docs_pad
    smoothing = cfg.smoothing

    tid0, qw0, qv0 = batches[0]
    uids0, w0 = dedup_query_terms_device(tid0, qw0, u_pad)
    bm0 = bm25_score_slots_udedup(
        didx.slot_terms, didx.slot_impact, didx.col_unperm, uids0, w0, variant=variant
    )
    bm0 = jax.device_put(np.asarray(bm0))

    sargs = (
        didx.slot_terms, didx.slot_impact, didx.col_unperm,
        didx.bucket_emb, didx.bucket_valid, didx.bucket_start,
    )

    if section == "tail":
        def body(tid, qw, qv, sa, ex):
            bm = ex[0] + qv[0, 0] * 1e-9
            o = ops._hybrid_tail_buckets(
                bm, sa[3], sa[4], sa[5], qv,
                n_docs_pad=Dp, k_ret=k_eff, smoothing=smoothing,
                buckets=buckets,
            )
            return jnp.sum(o[0][:, 0])

        extras = (bm0,)
    else:
        def body(tid, qw, qv, sa, ex):
            uids, w = dedup_query_terms_device(tid, qw, u_pad)
            o = ops.hybrid_rank_slots_udedup(
                *sa, uids, w, qv,
                n_docs_pad=Dp, k_ret=k_eff, smoothing=smoothing,
                buckets=buckets, variant=variant,
            )
            return jnp.sum(o[0][:, 0])

        extras = ()

    @jax.jit
    def loop(TID, QW, QV, sargs, extras, salt):
        def one(carry, x):
            tid, qw, qv = x
            return carry + body(tid, qw, qv + salt * 1e-12, sargs, extras), None

        out, _ = lax.scan(one, jnp.zeros((), jnp.float32), (TID, QW, QV))
        return out

    # warm compile
    _ = float(np.asarray(loop(TID, QW, QV, sargs, extras, jnp.float32(0.0))))
    t0 = time.time()
    _ = float(np.asarray(loop(TID, QW, QV, sargs, extras, jnp.float32(1.0))))
    print(f"{section}: {(time.time() - t0) / n_scan * 1e3:.3f} ms/batch",
          file=sys.stderr)

    trace_dir = "/tmp/jaxtrace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    _ = float(np.asarray(loop(TID, QW, QV, sargs, extras, jnp.float32(2.0))))
    jax.profiler.stop_trace()

    xs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xs, file=sys.stderr)
    if not xs:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("op_profile", "overview_page^"):
        try:
            data, _ = rtd.xspace_to_tool_data(xs, tool, {})
            out = f"/tmp/trace_{tool.strip('^')}.json"
            with open(out, "w") as f:
                f.write(data if isinstance(data, str) else data.decode())
            print("wrote", out, file=sys.stderr)
        except Exception as e:
            print(f"{tool}: {type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
