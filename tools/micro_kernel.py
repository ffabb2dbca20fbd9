"""A/B the U-dedup slot-kernel variants at a bench shape on the real TPU.

Usage: python tools/micro_kernel.py [n_docs] [n_scan] [B]
Prints per-variant ms/batch (salted-sync scan timing, floor printed) and
asserts exact score parity between variants on one batch.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import bench as bench_mod
from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
    bm25_score_slots,
    bm25_score_slots_udedup,
    dedup_query_terms_device,
    u_pad_for,
)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_scan = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    T, dim = 8, 768

    didx, cfg, dfs = bench_mod.make_synthetic_index(
        n_docs=n_docs,
        n_terms=max(50_000, n_docs // 2),
        avg_chunks=3.0,
        dim=dim,
        nnz_target=80 * n_docs,
    )
    print(f"nnz={didx.nnz}", file=sys.stderr)
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
        return tid, qw

    gen_j = jax.jit(gen)
    batches = [gen_j(jnp.int32(s)) for s in range(n_scan)]
    max_distinct = max(int(np.unique(np.asarray(b[0])).size) for b in batches)
    u_pad = u_pad_for(max_distinct)
    print(f"max_distinct={max_distinct} u_pad={u_pad}", file=sys.stderr)
    TID = jnp.stack([b[0] for b in batches])
    QW = jnp.stack([b[1] for b in batches])
    st, si, cu = didx.slot_terms, didx.slot_impact, didx.col_unperm

    # exactness: every variant must produce BIT-IDENTICAL keyed scores
    tid0, qw0 = batches[0]
    uids0, w0 = dedup_query_terms_device(tid0, qw0, u_pad)
    ref = None
    for v in ("sublane", "acc", "i8", "wide", "wide_i8"):
        try:
            out = np.asarray(
                bm25_score_slots_udedup(st, si, cu, uids0, w0, variant=v)
            )
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        if ref is None:
            ref = out
            print(f"{v}: reference")
        else:
            same = np.array_equal(ref, out)
            md = float(np.max(np.abs(ref - out)))
            print(f"{v}: bit-identical={same} maxdiff={md:.3e}")

    def scan_time(name, body, reps=4):
        @jax.jit
        def loop(TID, QW, salt):
            def one(carry, x):
                tid, qw = x
                return carry + body(tid, qw + salt * 1e-12), None

            out, _ = lax.scan(one, jnp.zeros((), jnp.float32), (TID, QW))
            return out

        _ = float(np.asarray(loop(TID, QW, jnp.float32(0.0))))
        best = 1e9
        for r in range(reps):
            t0 = time.time()
            _ = float(np.asarray(loop(TID, QW, jnp.float32(r + 1))))
            best = min(best, (time.time() - t0) / n_scan * 1e3)
        print(f"{name:40s} {best:8.3f} ms", flush=True)
        return best

    def mk(v):
        def body(tid, qw):
            uids, w = dedup_query_terms_device(tid, qw, u_pad)
            bm = bm25_score_slots_udedup(st, si, cu, uids, w, variant=v)
            return jnp.sum(bm[:, 0]) + jnp.sum(bm[:, -2])

        return body

    def body_floor(tid, qw):
        return jnp.sum(qw[0, :2])

    def body_plain(tid, qw):
        bm = bm25_score_slots(st, si, cu, tid, qw)
        return jnp.sum(bm[:, 0]) + jnp.sum(bm[:, -2])

    scan_time("floor", body_floor)
    for v in ("sublane", "acc", "i8", "wide", "wide_i8"):
        try:
            scan_time(f"udedup[{v}] U={u_pad}", mk(v))
        except Exception as e:
            print(f"udedup[{v}]: FAILED {type(e).__name__}: {str(e)[:160]}")
    scan_time("plain slot kernel", body_plain)


if __name__ == "__main__":
    main()
