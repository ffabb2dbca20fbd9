"""Round-5 scan-tail micro-benchmarks (VERDICT r4 #4).

Measures candidate variants of the remaining floor-subtracted costs
(NOTES.md round-4 list) on the real chip, each under lax.scan in one
dispatch (the repo's standard device-time protocol):

  * final gathers: two flat [B,k]-from-[B,Dp] takes (doc_score, win)
    vs ONE take from an interleaved [B, Dp, 2] array;
  * blockmax G sweep at the 100k shape (8/16/32);
  * the full _rank_candidates for context.

Usage: python tools/micro_tail_r5.py [n_docs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from modern_search_engines_project_tpu.retrieval import ops  # noqa: E402

B, K = 64, 1000
N_SCAN = 32


def bench(fn, *args, label=""):
    @jax.jit
    def scan_run(seed0, *a):
        def one(carry, seed):
            out = fn(seed, *a)
            leaves = jax.tree_util.tree_leaves(out)
            # consume FULL outputs: bodies that consume only [:, :1] of a
            # top-k/sort get DCE-narrowed by XLA (NOTES.md round-4 gotcha)
            return carry + sum(jnp.sum(x.astype(jnp.float32))
                               for x in leaves), None

        acc, _ = lax.scan(one, jnp.zeros(()), seed0 + jnp.arange(N_SCAN))
        return acc

    _ = float(np.asarray(scan_run(jnp.int32(0), *args)))
    best = None
    for r in range(3):
        t0 = time.time()
        _ = float(np.asarray(scan_run(jnp.int32(100 * r), *args)))
        dt = (time.time() - t0) / N_SCAN * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{label:46s} {best:7.3f} ms", flush=True)
    return best


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_736
    rng = np.random.default_rng(5)
    doc_score = jnp.asarray(rng.random((B, n_docs), np.float32))
    win = jnp.asarray(rng.integers(0, 120_000, (B, n_docs)), jnp.int32)
    top_idx = jnp.asarray(
        np.stack([
            rng.choice(n_docs, K, replace=False) for _ in range(B)
        ]).astype(np.int32)
    )
    valid = jnp.ones((B, K), bool)
    old_norm = jnp.asarray(rng.random((B, K), np.float32))

    # --- final gather variants ------------------------------------------
    def two_takes(seed, ds, w, ti):
        ds = ds + seed * 0.0
        gflat = ti + jnp.arange(B, dtype=jnp.int32)[:, None] * n_docs
        return jnp.take(ds.reshape(-1), gflat), jnp.take(
            w.reshape(-1), gflat
        )

    def interleaved(seed, ds, w, ti):
        ds = ds + seed * 0.0
        packed = jnp.stack(
            [ds, w.astype(jnp.float32)], axis=-1
        )  # [B, Dp, 2]
        gflat = ti + jnp.arange(B, dtype=jnp.int32)[:, None] * n_docs
        out = jnp.take(packed.reshape(-1, 2), gflat, axis=0)  # [B,K,2]
        return out[..., 0], out[..., 1].astype(jnp.int32)

    bench(two_takes, doc_score, win, top_idx, label="final gather: 2 flat takes")
    bench(interleaved, doc_score, win, top_idx,
          label="final gather: interleaved stack+take")

    # --- full final ranking for context ---------------------------------
    def rank(seed, ds, w, ti):
        ds = ds + seed * 0.0
        return ops._rank_candidates(ds, w, ti, valid, old_norm, K)

    bench(rank, doc_score, win, top_idx, label="_rank_candidates (full)")

    def rank_interleaved(seed, ds, w, ti):
        ds = ds + seed * 0.0
        packed = jnp.stack([ds, w.astype(jnp.float32)], axis=-1)
        gflat = ti + jnp.arange(B, dtype=jnp.int32)[:, None] * n_docs
        out = jnp.take(packed.reshape(-1, 2), gflat, axis=0)
        cand_scores, cand_win = out[..., 0], out[..., 1].astype(jnp.int32)
        sort_key = jnp.where(valid, cand_scores, -1.0)
        neg_vals, fd, fw, fo, fv = lax.sort(
            (-sort_key, ti, cand_win, old_norm, valid),
            dimension=1, num_keys=1, is_stable=True,
        )
        return fd[:, :K], -neg_vals[:, :K], fo[:, :K], fw[:, :K], fv[:, :K]

    bench(rank_interleaved, doc_score, win, top_idx,
          label="_rank_candidates interleaved")

    # --- blockmax G sweep -------------------------------------------------
    scores = jnp.asarray(rng.random((B, n_docs), np.float32))
    for G in (8, 16, 32, 64):
        def bm(seed, s, G=G):
            s = s + seed * 0.0
            return ops.topk_blockmax(s, K, block=G)

        bench(bm, scores, label=f"topk_blockmax G={G}")

    def bm_auto(seed, s):
        s = s + seed * 0.0
        return ops.topk_blockmax(s, K)

    bench(bm_auto, scores, label="topk_blockmax auto")


if __name__ == "__main__":
    main()
