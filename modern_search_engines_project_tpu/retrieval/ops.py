"""Jitted device scoring: the whole online query path as one XLA program.

This replaces the reference's Flask -> DuckDB -> HTTP-reranker hot path
(SURVEY.md §3.1) with a single compiled function:

  1. **BM25 stage** — static-shape CSR gather/scatter.  Each query's term
     postings are flattened into a fixed ``posting_cap`` gather budget via
     searchsorted over cumulative postings lengths (no dynamic shapes, no
     host round-trip), then scatter-added into a dense ``[B, n_docs+1]``
     score accumulator (sentinel row swallows masked lanes).  Terms are
     processed rarest-first so an over-budget query degrades by dropping
     postings of the most common (lowest-idf) term — never the informative
     ones.  Postings carry *precomputed impacts* (idf and tf/length
     saturation folded in at build), so per-posting work is one multiply.
  2. **Dense stage** — one ``[B, dim] x [dim, n_chunks]`` matmul against the
     whole chunk bank (MXU-shaped; no gathers), then per-document top-2 via
     sorted segment reductions.
  3. **Fusion** — per-pool min-max normalization (cosine over candidate
     chunks, BM25 over candidate docs, reranker_api.py:289-296,357-362),
     0.85/0.15 fusion, additive positional adjustment of each doc's best
     chunk with post-adjustment winner re-selection
     (reranker_api.py:299-334,370-372), and a fused final top-k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from modern_search_engines_project_tpu.retrieval.device_index import DeviceIndex

# np (not jnp): a module-level jnp scalar initializes the XLA backend at
# import time, which breaks jax.distributed.initialize (multihost.py)
_BIG = np.int32(2**31 - 1)


def bm25_score_batch(
    indptr: jnp.ndarray,
    post_docs: jnp.ndarray,
    post_impact: jnp.ndarray,
    term_ids: jnp.ndarray,  # int32 [B, T], pad = -1
    qtf: jnp.ndarray,  # float32 [B, T]
    *,
    n_docs_pad: int,
    posting_cap: int,
) -> jnp.ndarray:
    """Keyed BM25 scores [B, n_docs_pad + 1] (last row = scatter sentinel).

    Admissible candidates (matched, score >= 0) keep their raw score;
    everything else is -1.0 so it sorts below every candidate."""
    B, T = term_ids.shape
    nnz = post_docs.shape[0]
    n_terms = indptr.shape[0] - 1

    valid_term = term_ids >= 0
    tid = jnp.clip(term_ids, 0, max(n_terms - 1, 0))
    starts = indptr[tid]
    lens = jnp.where(valid_term, indptr[tid + 1] - starts, 0)

    # rarest-first ordering: graceful degradation under the gather budget
    order = jnp.argsort(lens, axis=1)
    lens_s = jnp.take_along_axis(lens, order, axis=1)
    starts_s = jnp.take_along_axis(starts, order, axis=1)
    qtf_s = jnp.take_along_axis(qtf, order, axis=1)

    cum = jnp.cumsum(lens_s, axis=1)  # [B, T]
    total = cum[:, -1:]
    j = jnp.arange(posting_cap, dtype=jnp.int32)[None, :]  # [1, Q]

    # slot assignment via compare-all over the T term boundaries (T is tiny;
    # a vmapped searchsorted costs ~100s of TPU compile time vs <1s for this)
    slot = jnp.zeros((B, posting_cap), jnp.int32)
    for t in range(T):
        slot = slot + (j >= cum[:, t : t + 1]).astype(jnp.int32)
    slot = jnp.clip(slot, 0, T - 1)

    cum0 = jnp.concatenate(
        [jnp.zeros((B, 1), cum.dtype), cum[:, :-1]], axis=1
    )
    prev = jnp.take_along_axis(cum0, slot, axis=1)
    within = j - prev
    src = jnp.take_along_axis(starts_s, slot, axis=1) + within
    src = jnp.clip(src, 0, max(nnz - 1, 0))

    valid = j < total
    d = jnp.where(valid, post_docs[src], n_docs_pad)
    contrib = jnp.where(
        valid, post_impact[src] * jnp.take_along_axis(qtf_s, slot, axis=1), 0.0
    )

    # one scatter accumulates (score, match-count): the reference's
    # ``score >= min_score(=0.0)`` rule admits *matched* docs whose score is
    # exactly 0 (idf==0 terms), so matched-ness must be tracked, not inferred
    # from score sign (bm25_indexer.py:383,481).
    updates = jnp.stack([contrib, valid.astype(jnp.float32)], axis=-1)
    acc = jnp.zeros((B, n_docs_pad + 1, 2), jnp.float32)
    b_rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    acc = acc.at[b_rows, d].add(
        updates, indices_are_sorted=False, unique_indices=False
    )
    scores, matched = acc[..., 0], acc[..., 1] > 0
    # ranking key: matched docs with score >= 0 keep their score, everything
    # else sorts below all admissible candidates (parity with min_score=0.0)
    return jnp.where(matched & (scores >= 0.0), scores, -1.0)


def exact_topk(scores: jnp.ndarray, k: int):
    """Two-stage blocked exact top-k for large doc axes.

    NOT on the hot path — measured end-to-end NEUTRAL inside the fused
    pipeline (1M scan b64 197.0 vs 196.3 ms; 500k deployment 99.7 vs
    98.9), although STANDALONE it beats single-stage lax.top_k 126 -> 65
    ms at [64, 1M] k=1000 on v5e: under jit XLA already overlaps the
    single-stage top-k with surrounding work, so the hot path keeps
    ``lax.top_k`` (also preserving its exact tie-ordering semantics).
    Kept for standalone/top-k-dominated uses; values are EXACT, ties at
    the k-th value may resolve to different equal-scoring docs.
    """
    B, N = scores.shape
    L = 8000
    if N <= 131072 or k > L:
        return lax.top_k(scores, k)
    pad = (-N) % L
    if pad:
        scores = jnp.pad(
            scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
    nb = (N + pad) // L
    x = scores.reshape(B, nb, L)
    bv, bi = lax.top_k(x, k)
    gi = bi + (jnp.arange(nb, dtype=jnp.int32) * L)[None, :, None]
    v, sel = lax.top_k(bv.reshape(B, -1), k)
    i = jnp.take_along_axis(gi.reshape(B, -1), sel, axis=1)
    return v, i


def topk_blockmax(scores: jnp.ndarray, k: int, block=None):
    """EXACT top-k with lax.top_k's tie semantics, via a block-max prefilter.

    ``lax.top_k(k=1000)`` over [64, 100k] lowers to a full stable variadic
    sort on TPU — measured 7.2 ms/batch, the single largest op in the
    hybrid pipeline (docs/profile_pipeline_100000.json + trace).  This
    computes the same (values, indices) with:

      1. per-block max over G consecutive docs (one cheap pass),
      2. lax.top_k over the [B, D/G] block maxima (a G-times-smaller sort),
      3. expand the k selected blocks to their k*G member docs (strided
         flat take), and
      4. one small [B, k*G] two-key sort by (-value, doc_idx) whose first
         k columns are the answer.

    EXACTNESS.  Let tau be the k-th doc value under the (-value, idx)
    order.  Every doc with value > tau lies in a block whose max > tau;
    there are at most k such docs, hence at most k such blocks, and every
    one of them outranks any block with max <= tau, so stage 2 selects
    them all.  Ties AT tau: stage 2 fills its remaining slots with
    max == tau blocks in ascending block index (lax.top_k tie rule), and
    because blocks are CONSECUTIVE doc ranges, ascending block index is
    ascending doc index — so the q = k - #(>tau) lowest-index tau docs
    not already inside a selected >tau block sit in the lowest-index
    tau blocks, all of which get slots (q <= free slots).  The expanded
    pool therefore contains the exact lax.top_k doc set, and the final
    two-key sort reproduces its (value desc, index asc) ordering.

    ~4x cheaper than the full sort at [64, 100k] k=1000 (measured 1.65 vs
    6.6 ms true, /tmp-era variant sweep round 4).  ``block`` auto-picks
    per shape: G=8 when the block-max row still fits one plain sort
    (N/8 <= 16384 — measured 2.57 vs 2.76 for G=16 at [64,100k] k=1000,
    tools/micro_tail_r5.py full-consumption sweep: the k*G expansion
    sort halves with G while the 2x-wider level-1 sort costs less than
    that; G=32+ is 2.9x WORSE — the expansion pool dwarfs the saving),
    else G=4 with recursion (at 1M+ a 62k-wide level-1 sort would
    dominate; G=4 recurses it down to ~16k).
    """
    B, N = scores.shape
    if block is None:
        block = 8 if (N + 7) // 8 <= 16384 else 4
    if k >= N or N <= 4 * k * block:
        return lax.top_k(scores, k)
    pad = (-N) % block
    if pad:
        scores = jnp.pad(
            scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
    nb = (N + pad) // block
    s3 = scores.reshape(B, nb, block)
    bmax = jnp.max(s3, axis=2)
    nblk = min(k, nb)
    # recurse on the block-max ranking while it is still large: the
    # recursive call is itself an exact lax.top_k drop-in, so tie order
    # (value desc, block idx asc) is preserved at every level
    _, bidx = topk_blockmax(bmax, nblk, block)
    # contiguous-slice row gather: 3x cheaper than an elementwise flat
    # take of the same k*G values (0.6 vs 1.9 ms at [64,100k] k=1000)
    dvals = jnp.take_along_axis(s3, bidx[:, :, None], axis=1).reshape(
        B, nblk * block
    )
    didx = (
        bidx[:, :, None] * block
        + jnp.arange(block, dtype=jnp.int32)[None, None, :]
    ).reshape(B, nblk * block)
    # two-key sort: value desc, doc index asc == lax.top_k tie order
    nv, si = lax.sort((-dvals, didx), dimension=1, num_keys=2)
    return -nv[:, :k], si[:, :k]


def _segment(op, data_bt: jnp.ndarray, seg: jnp.ndarray, num_segments: int):
    """Batched sorted-segment reduction: data [B, C] -> [B, num_segments]."""
    return op(
        data_bt.T, seg, num_segments=num_segments, indices_are_sorted=True
    ).T


def _rank_candidates(doc_score, win, top_idx, valid_c, old_norm, k_ret: int):
    """Final candidate ranking shared by every hybrid tail: gather the
    per-doc fused score/winner at the top-k doc ids and re-sort.  Flat 1-D
    takes instead of take_along_axis — ~30% cheaper on TPU for a
    (B, k)-from-(B, Dp) row gather (tools/micro_stats.py G4 vs G1).

    The re-sort is ONE variadic stable sort carrying every output as an
    operand — measured 0.91 vs 2.35 ms/batch-64 at 100k docs for the
    previous top_k + three take_along_axis formulation
    (docs/profile_pipeline_100000.json final_sort5 vs final_flat_takes):
    the payload columns ride the sort network instead of paying three
    separate (B,k) gathers.  ``is_stable`` preserves lax.top_k's tie rule
    (equal fused scores keep candidate order = ascending stage-1 rank).

    The score/winner pair rides ONE interleaved [B*W, 2] gather instead
    of two flat takes (1.43 vs 1.72 ms/batch-64 at 100k incl. the sort,
    tools/micro_tail_r5.py): the stack write is sequential HBM traffic
    while the second random gather pass is not.  ``win`` crosses the
    f32 lanes as a BITCAST — a float convert would round any index
    >= 2^24 (the _BIG sentinel is 2^31-1), a bitcast is a pure data
    move through the gather."""
    B, W = doc_score.shape
    gflat = top_idx + jnp.arange(B, dtype=jnp.int32)[:, None] * W
    packed = jnp.stack(
        [doc_score, lax.bitcast_convert_type(win, jnp.float32)], axis=-1
    )
    out = jnp.take(packed.reshape(-1, 2), gflat, axis=0)  # [B, k, 2]
    cand_scores = out[..., 0]
    cand_win = lax.bitcast_convert_type(out[..., 1], jnp.int32)
    sort_key = jnp.where(valid_c, cand_scores, -1.0)
    neg_vals, final_doc, final_win, final_old, final_valid = lax.sort(
        (-sort_key, top_idx, cand_win, old_norm, valid_c),
        dimension=1,
        num_keys=1,
        is_stable=True,
    )
    return (
        final_doc[:, :k_ret],
        -neg_vals[:, :k_ret],
        final_old[:, :k_ret],
        final_win[:, :k_ret],
        final_valid[:, :k_ret],
    )


@functools.partial(
    jax.jit, static_argnames=("n_docs_pad", "k_ret", "smoothing")
)
def _hybrid_tail(
    bm,
    chunk_emb,
    chunk_doc,
    doc_chunk_start,
    doc_n_chunks,
    qvec,
    *,
    n_docs_pad: int,
    k_ret: int,
    smoothing: float,
):
    """Stages 2+3 of the hybrid ranking, shared by the scatter-based and the
    Pallas-blocked BM25 front ends.  ``bm`` is keyed scores [B, Dp+1]."""
    B = qvec.shape[0]
    Dp1 = n_docs_pad + 1
    C = chunk_emb.shape[0]
    b_rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    top_vals, top_idx = topk_blockmax(bm[:, :n_docs_pad], k_ret)
    valid_c = top_vals >= 0.0

    # min-max normalize BM25 over the candidate pool (reranker_api.py:361)
    lo = jnp.min(jnp.where(valid_c, top_vals, jnp.inf), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(valid_c, top_vals, -jnp.inf), axis=1, keepdims=True)
    denom = hi - lo
    ok = valid_c & (denom > 0)
    old_norm = jnp.where(ok, (top_vals - lo) / jnp.where(denom > 0, denom, 1.0), 0.0)

    # scatter candidate info onto dense doc axis (invalid -> sentinel row)
    scatter_idx = jnp.where(valid_c, top_idx, n_docs_pad)
    cand_mask = (
        jnp.zeros((B, Dp1), jnp.bool_).at[b_rows, scatter_idx].set(True)
    )
    cand_mask = cand_mask.at[:, n_docs_pad].set(False)
    old_dense = (
        jnp.zeros((B, Dp1), jnp.float32).at[b_rows, scatter_idx].set(old_norm)
    )

    # ---- stage 2: dense similarity over the whole bank ---------------------
    sims = jnp.dot(
        qvec.astype(chunk_emb.dtype),
        chunk_emb.T,
        preferred_element_type=jnp.float32,
    )  # [B, C]
    chunk_mask = jnp.take(cand_mask, chunk_doc, axis=1)

    # min-max normalize cosine over candidate *chunks* (reranker_api.py:360)
    lo_c = jnp.min(jnp.where(chunk_mask, sims, jnp.inf), axis=1, keepdims=True)
    hi_c = jnp.max(jnp.where(chunk_mask, sims, -jnp.inf), axis=1, keepdims=True)
    den_c = hi_c - lo_c
    new_norm = jnp.where(
        chunk_mask & (den_c > 0),
        (sims - lo_c) / jnp.where(den_c > 0, den_c, 1.0),
        0.0,
    )

    # ---- fusion + positional (reranker_api.py:362,299-334) -----------------
    old_chunk = jnp.take(old_dense, chunk_doc, axis=1)
    fused = jnp.where(
        chunk_mask,
        new_norm * (1.0 - smoothing) + old_chunk * smoothing,
        -jnp.inf,
    )

    seg = chunk_doc  # sorted ascending (doc-major bank)
    cidx = jnp.arange(C, dtype=jnp.int32)[None, :]

    m1 = _segment(jax.ops.segment_max, fused, seg, Dp1)  # best chunk score
    m1_chunk = jnp.take(m1, seg, axis=1)
    is_w1 = (fused == m1_chunk) & chunk_mask
    w1 = _segment(
        jax.ops.segment_min,
        jnp.where(is_w1, cidx, _BIG),
        seg,
        Dp1,
    )  # first argmax chunk (pandas idxmax parity)
    w1_chunk = jnp.take(w1, seg, axis=1)

    fused2 = jnp.where(cidx == w1_chunk, -jnp.inf, fused)
    m2 = _segment(jax.ops.segment_max, fused2, seg, Dp1)
    is_w2 = (fused2 == jnp.take(m2, seg, axis=1)) & chunk_mask
    w2 = _segment(
        jax.ops.segment_min, jnp.where(is_w2, cidx, _BIG), seg, Dp1
    )

    nck = doc_n_chunks[None, :]  # [1, Dp1]
    pos = w1 - doc_chunk_start[None, :]
    ratio = pos.astype(jnp.float32) / jnp.maximum(nck - 1, 1).astype(jnp.float32)
    adj = 0.10 - (0.10 + 0.05) * ratio
    m1_adj = jnp.where(nck > 1, jnp.clip(m1 + adj, 0.0, 1.0), m1)

    doc_score = jnp.maximum(m1_adj, m2)
    win = jnp.where(m1_adj >= m2, w1, w2)

    # ---- final ranking over candidates -------------------------------------
    return _rank_candidates(doc_score, win, top_idx, valid_c, old_norm, k_ret)


@functools.partial(
    jax.jit,
    static_argnames=("n_docs_pad", "posting_cap", "k_ret", "smoothing"),
)
def hybrid_rank(
    indptr,
    post_docs,
    post_impact,
    chunk_emb,
    chunk_doc,
    doc_chunk_start,
    doc_n_chunks,
    term_ids,
    qtf,
    qvec,
    *,
    n_docs_pad: int,
    posting_cap: int,
    k_ret: int,
    smoothing: float = 0.15,
):
    """Full hybrid ranking (XLA gather/scatter BM25 front end).  Returns per
    query the k_ret fused-ranked candidates:
    (doc_idx, fused_score, bm25_norm, winner_chunk, valid)."""
    bm = bm25_score_batch(
        indptr,
        post_docs,
        post_impact,
        term_ids,
        qtf,
        n_docs_pad=n_docs_pad,
        posting_cap=posting_cap,
    )
    return _hybrid_tail(
        bm,
        chunk_emb,
        chunk_doc,
        doc_chunk_start,
        doc_n_chunks,
        qvec,
        n_docs_pad=n_docs_pad,
        k_ret=k_ret,
        smoothing=smoothing,
    )


def hybrid_rank_blocked(
    blk_terms,
    blk_impact,
    blk_local,
    chunk_emb,
    chunk_doc,
    doc_chunk_start,
    doc_n_chunks,
    term_ids,
    qtf,
    qvec,
    *,
    n_docs_pad: int,
    k_ret: int,
    smoothing: float = 0.15,
    interpret: bool = False,
):
    """Full hybrid ranking with the Pallas doc-major blocked BM25 kernel
    (bm25_pallas.py) — the TPU fast path (no gathers/scatters)."""
    from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
        bm25_score_blocked,
    )

    bm = bm25_score_blocked(
        blk_terms,
        blk_impact,
        blk_local,
        term_ids,
        qtf,
        n_docs_pad=n_docs_pad,
        interpret=interpret,
    )
    return _hybrid_tail(
        bm,
        chunk_emb,
        chunk_doc,
        doc_chunk_start,
        doc_n_chunks,
        qvec,
        n_docs_pad=n_docs_pad,
        k_ret=k_ret,
        smoothing=smoothing,
    )


def bm25_topk_blocked(index, term_ids, qtf, k: int, interpret: bool = False):
    """BM25-only retrieval via the Pallas kernel."""
    from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
        bm25_score_blocked,
    )

    bm = bm25_score_blocked(
        index.blk_terms,
        index.blk_impact,
        index.blk_local,
        jnp.asarray(term_ids),
        jnp.asarray(qtf),
        n_docs_pad=index.n_docs_pad,
        interpret=interpret,
    )
    vals, idx = topk_blockmax(bm[:, : index.n_docs_pad], k)
    return idx, vals


def bm25_topk(
    index: DeviceIndex, term_ids, qtf, k: int
):
    """BM25-only retrieval (reference BM25.search / USE_BM25=false-off path)."""
    bm = bm25_score_batch(
        index.indptr,
        index.post_docs,
        index.post_impact,
        term_ids,
        qtf,
        n_docs_pad=index.n_docs_pad,
        posting_cap=index.posting_cap,
    )
    vals, idx = topk_blockmax(bm[:, : index.n_docs_pad], k)
    return idx, vals


@functools.partial(jax.jit, static_argnames=("n_docs_pad", "k"))
def dense_rank(
    chunk_emb,
    chunk_doc,
    qvec,
    *,
    n_docs_pad: int,
    k: int,
):
    """Exact brute-force dense retrieval over every chunk (BASELINE.json
    config "exact brute-force dense search over all chunk embeddings"):
    one q x bank matmul, per-doc max pool, top-k by cosine.  Returns
    (doc_idx [B,k], cosine [B,k], winner_chunk [B,k])."""
    sims = jnp.dot(
        qvec.astype(chunk_emb.dtype),
        chunk_emb.T,
        preferred_element_type=jnp.float32,
    )  # [B, C]
    C = chunk_emb.shape[0]
    Dp1 = n_docs_pad + 1
    # padded chunks (chunk_doc == sentinel) must not win
    masked = jnp.where((chunk_doc < n_docs_pad)[None, :], sims, -jnp.inf)
    m1 = _segment(jax.ops.segment_max, masked, chunk_doc, Dp1)
    cidx = jnp.arange(C, dtype=jnp.int32)[None, :]
    is_w = masked == jnp.take(m1, chunk_doc, axis=1)
    w1 = _segment(
        jax.ops.segment_min, jnp.where(is_w, cidx, _BIG), chunk_doc, Dp1
    )
    vals, idx = topk_blockmax(m1[:, :n_docs_pad], k)
    win = jnp.take_along_axis(w1, idx, axis=1)
    return idx, vals, win


# ---- shared per-bucket scoring (single-chip tail AND the sharded SPMD fn
# call these; the two paths must stay in exact parity) -----------------------


def _bucket_sims(qvec, emb, cnt: int, n: int):
    """Query x bucket-bank similarities -> [B, n, cnt].  ``emb`` is either
    a dense SLOT-MAJOR [n, cnt, dim] bank, or an int8 pair (q8 [n,cnt,dim],
    inv_scale [n,cnt]) from device_index.quantize_bank_int8 — then the
    query is symmetrically quantized per row and the dot runs
    s8 x s8 -> s32 on the MXU.  Slot-major output: slot s of every doc is
    a contiguous plane, so per-doc streaming reductions slice axis 1."""
    B = qvec.shape[0]
    if isinstance(emb, tuple):
        q8, inv = emb
        qm = jnp.max(jnp.abs(qvec), axis=1, keepdims=True)
        qm = jnp.where(qm > 0, qm, 1.0)
        qi = jnp.clip(
            jnp.round(qvec / qm * 127.0), -127, 127
        ).astype(jnp.int8)
        raw = jnp.einsum(
            "bd,ncd->bnc", qi, q8, preferred_element_type=jnp.int32
        )
        return (
            raw.astype(jnp.float32)
            * (qm[:, :, None] / 127.0)
            * inv[None, :, :]
        )
    return jnp.einsum(
        "bd,ncd->bnc",
        qvec.astype(emb.dtype),
        emb,
        preferred_element_type=jnp.float32,
    )


def dense_candidates_from_topk(bm, top_vals, n_docs_pad: int, n_valid=None):
    """Candidate mask + normalized-BM25 dense arrays WITHOUT a scatter.

    The previous formulation scattered the top-k results into
    ``[B, n_docs_pad]`` arrays — measured 3.2 ms/batch-64 at 100k docs
    (XLA TPU scatter serializes; docs/profile_pipeline_100000.json).  This
    one reconstructs the exact same arrays from the dense score vector with
    elementwise ops plus one cumsum:

      * threshold: a doc is a candidate iff its keyed score clears the
        k-th admissible value tau,
      * tie quota: docs tied AT tau are admitted lowest-index-first until
        the candidate count matches lax.top_k's (which breaks ties toward
        lower indices), so the set is IDENTICAL to the scattered one.

    SPMD use: ``bm`` may be the SHARD-LOCAL score block while ``top_vals``
    is the GLOBAL merged top-k — pass ``n_valid`` = the per-query count of
    global candidates living on this shard.  tau/normalization stay global
    (top_vals), the tie quota local; within a shard the global merge
    admits equal-valued docs lowest-local-index-first (all_gather layout
    is shard-major, per-shard blocks are local top_k output), which is
    exactly this construction's tie order.

    Returns (cand_mask [B, Dp] bool, old_dense [B, Dp] f32, old_norm
    [B, k] f32, valid_c [B, k] bool) — old_norm/valid_c are the
    candidate-major twins the final ranking stage consumes.
    """
    bmd = bm[:, :n_docs_pad]
    valid_c = top_vals >= 0.0
    lo = jnp.min(
        jnp.where(valid_c, top_vals, jnp.inf), axis=1, keepdims=True
    )
    hi = jnp.max(
        jnp.where(valid_c, top_vals, -jnp.inf), axis=1, keepdims=True
    )
    denom = hi - lo
    old_norm = jnp.where(
        valid_c & (denom > 0),
        (top_vals - lo) / jnp.where(denom > 0, denom, 1.0),
        0.0,
    )
    if n_valid is None:
        n_valid = jnp.sum(valid_c, axis=1, keepdims=True).astype(jnp.int32)
    # tau = +inf when nothing is admissible -> empty mask (matches scatter)
    above = bmd > lo
    ties = bmd == lo
    quota = n_valid - jnp.sum(above, axis=1, keepdims=True).astype(jnp.int32)
    n_ties = jnp.sum(ties, axis=1, keepdims=True).astype(jnp.int32)
    # The tie-rank cumsum over the full doc axis costs ~2 ms/batch-64 at
    # 100k docs — gate it behind a cond: it only matters when docs tied AT
    # tau straddle the k-boundary (n_ties > quota for some query), which is
    # rare (requires >k docs at or above the k-th score).
    boundary_ties = jnp.any(n_ties > quota)

    def with_tie_rank(_):
        tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=1)
        return above | (ties & (tie_rank <= quota))

    def without(_):
        return above | ties

    cand_mask = lax.cond(boundary_ties, with_tie_rank, without, None)
    old_dense = jnp.where(
        cand_mask & (denom > 0),
        (bmd - lo) / jnp.where(denom > 0, denom, 1.0),
        0.0,
    )
    return cand_mask, old_dense, old_norm, valid_c


def bucket_doc_stats(
    buckets, bucket_emb, bucket_valid, qvec,
    use_pallas: bool = False, interpret: bool = False,
):
    """ONE dense pass over the chunk bank -> per-doc raw-sim statistics.

    Replaces the two-pass extrema+fused structure (each pass re-read the
    full bank: 3.4 + 2.1 ms/batch-64 at 100k docs).  Per bucket returns
    (v1, v2, w1, w2, vmin), each [B, cnt]: the doc's two largest raw chunk
    sims with their slot positions, and its smallest raw sim.  Sufficient
    because per-query fusion is affine in sims with positive scale, and
    within a doc the fused offset is constant — so the fused top-2 chunks
    ARE the raw-sim top-2 chunks (ties included; lax.top_k semantics are
    preserved because the transform maps equal values to equal values).
    Rows for bucket-pad docs are garbage; callers mask by candidacy (pad
    docs can never be candidates: their keyed BM25 score is -1).
    """
    stats = []
    for (n, cnt), emb, dvalid in zip(buckets, bucket_emb, bucket_valid):
        if use_pallas and not isinstance(emb, tuple):
            # fused matmul + streaming-top-2 kernel: sims never leave VMEM
            # (dense_pallas; int8 pair banks keep the XLA path)
            from modern_search_engines_project_tpu.retrieval.dense_pallas import (
                bucket_stats_pallas,
            )

            stats.append(bucket_stats_pallas(emb, qvec, interpret=interpret))
            continue
        sims = _bucket_sims(qvec, emb, cnt, n)  # (B, n, cnt) slot-major
        if n == 1:
            v1 = sims[:, 0, :]
            zi = jnp.zeros_like(v1, dtype=jnp.int32)
            stats.append((v1, v1, zi, zi, v1))
        else:
            # streaming top-2 over the (tiny, static) slot axis: one read
            # of sims with O(n) selects — measured 1.0 ms vs 2.5 for
            # max/argmax + masked re-max and ~6 for lax.top_k(sims, 2) at
            # the 100k shape (tools/micro_stats.py).  Strict > keeps the
            # LOWEST slot on ties — identical to argmax/top_k tie order
            # (a duplicate of the max still lands in v2 via the is2 arm).
            v1 = sims[:, 0, :]
            w1 = jnp.zeros_like(v1, dtype=jnp.int32)
            v2 = jnp.full_like(v1, -jnp.inf)
            w2 = jnp.zeros_like(v1, dtype=jnp.int32)
            vm = v1
            for s in range(1, n):
                x = sims[:, s, :]
                is1 = x > v1
                is2 = (~is1) & (x > v2)
                v2 = jnp.where(is1, v1, jnp.where(is2, x, v2))
                w2 = jnp.where(is1, w1, jnp.where(is2, s, w2))
                v1 = jnp.where(is1, x, v1)
                w1 = jnp.where(is1, s, w1)
                vm = jnp.minimum(vm, x)
            stats.append((v1, v2, w1, w2, vm))
    return stats


def stats_pool_extrema(stats, cand_mask, buckets):
    """Candidate-pool raw-sim extrema from per-doc stats -> (lo, hi) [B]."""
    lo_parts, hi_parts = [], []
    off = 0
    for (n, cnt), (v1, _v2, _w1, _w2, vmin) in zip(buckets, stats):
        m = cand_mask[:, off : off + cnt]
        lo_parts.append(jnp.min(jnp.where(m, vmin, jnp.inf), axis=1))
        hi_parts.append(jnp.max(jnp.where(m, v1, -jnp.inf), axis=1))
        off += cnt
    return (
        jnp.min(jnp.stack(lo_parts), axis=0),
        jnp.max(jnp.stack(hi_parts), axis=0),
    )


def fused_scores_from_stats(
    buckets,
    bucket_start,
    stats,
    cand_mask,
    old_dense,
    lo_c,
    hi_c,
    smoothing: float,
):
    """Per-doc fusion/positional math from one-pass stats (no bank reads).

    Exact reference math (reranker_api.py:289-334,360-372): min-max
    normalize raw sims over the candidate pool, fuse (1-s)*cos + s*bm25,
    +10%/-5% linear positional adjustment of the best chunk, clamp [0,1],
    post-adjustment winner re-selection against the runner-up.  lo_c/hi_c
    are [B, 1] (global across shards in SPMD use).  When the pool is
    degenerate (hi == lo) every fused value is s*old (constant per doc), so
    the previous formulation's top-2 fell back to slots (0, 1) — replicated
    explicitly here.  Returns (doc_score, win_gid) each [B, sum cnt];
    non-candidate docs score -inf.
    """
    den = hi_c - lo_c
    ok = den > 0
    den_safe = jnp.where(ok, den, 1.0)
    score_parts, win_parts = [], []
    off = 0
    for (n, cnt), bstart, (v1, v2, w1, w2, _vmin) in zip(
        buckets, bucket_start, stats
    ):
        cand = cand_mask[:, off : off + cnt]
        old = old_dense[:, off : off + cnt]
        n1 = jnp.where(ok, (v1 - lo_c) / den_safe, 0.0)
        f1 = n1 * (1.0 - smoothing) + old * smoothing
        if n == 1:
            doc_score = f1
            win_slot = jnp.zeros_like(w1)
        else:
            n2 = jnp.where(ok, (v2 - lo_c) / den_safe, 0.0)
            f2 = n2 * (1.0 - smoothing) + old * smoothing
            # degenerate pool: fused is constant over slots -> top-2 was
            # (slot 0, slot 1) in the two-pass formulation
            w1e = jnp.where(ok, w1, 0)
            w2e = jnp.where(ok, w2, 1)
            ratio = w1e.astype(jnp.float32) / jnp.float32(n - 1)
            adj = 0.10 - (0.10 + 0.05) * ratio
            m1_adj = jnp.clip(f1 + adj, 0.0, 1.0)
            doc_score = jnp.maximum(m1_adj, f2)
            win_slot = jnp.where(m1_adj >= f2, w1e, w2e)
        score_parts.append(jnp.where(cand, doc_score, -jnp.inf))
        win_parts.append(bstart[None, :] + win_slot)
        off += cnt
    return (
        jnp.concatenate(score_parts, axis=1),
        jnp.concatenate(win_parts, axis=1),
    )


def bucket_dense_best(buckets, bucket_emb, bucket_valid, bucket_start, qvec):
    """Brute-force dense per-doc best over every bucket ->
    (doc_best [B, sum cnt], win_gid [B, sum cnt])."""
    score_parts, win_parts = [], []
    for (n, cnt), emb, dv, bs in zip(
        buckets, bucket_emb, bucket_valid, bucket_start
    ):
        sims = jnp.where(
            dv[None, None, :], _bucket_sims(qvec, emb, cnt, n), -jnp.inf
        )  # (B, n, cnt)
        score_parts.append(jnp.max(sims, axis=1))
        slot = jnp.argmax(sims, axis=1).astype(jnp.int32)
        win_parts.append(bs[None, :] + slot)
    return (
        jnp.concatenate(score_parts, axis=1),
        jnp.concatenate(win_parts, axis=1),
    )


@functools.partial(
    jax.jit, static_argnames=("n_docs_pad", "k", "buckets")
)
def dense_rank_buckets(
    bucket_emb,
    bucket_valid,
    bucket_start,
    qvec,
    *,
    n_docs_pad: int,
    k: int,
    buckets,
):
    """dense_rank over the bucketed exact-stride layout (used when the
    packed bank stays host-side).  Returned doc indices are in the PERMUTED
    order; callers map back via DeviceIndex.doc_perm."""
    doc_best, win = bucket_dense_best(
        buckets, bucket_emb, bucket_valid, bucket_start, qvec
    )
    doc_best, win = doc_best[:, :n_docs_pad], win[:, :n_docs_pad]
    vals, idx = topk_blockmax(doc_best, k)
    return idx, vals, jnp.take_along_axis(win, idx, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_docs_pad", "k_ret", "smoothing", "buckets", "approx",
        "stats_pallas", "interpret",
    ),
)
def _hybrid_tail_buckets(
    bm,
    bucket_emb,
    bucket_valid,
    bucket_start,
    qvec,
    *,
    n_docs_pad: int,
    k_ret: int,
    smoothing: float,
    buckets,
    approx: bool = False,
    stats_pallas: bool = False,
    interpret: bool = False,
):
    """Stages 2+3 over the bucketed exact-stride layout.

    Documents are grouped by chunk count (device_index doc permutation);
    bucket b holds ``cnt_pad`` docs with exactly ``n`` chunks each, stored
    at stride n — zero padding waste.  Per-document top-2 is a last-axis
    ``lax.top_k``; everything per-doc concatenates along the (permuted)
    document axis.  Same math as the reference rerank (normalization,
    fusion, positional, post-adjustment winner), exact parity.
    """
    Dp = n_docs_pad

    if approx:
        # TPU-native approximate top-k (recall ~0.95-0.99); opt-in, not the
        # reference-parity default
        top_vals, top_idx = lax.approx_max_k(bm[:, :Dp], k_ret)
        top_idx = top_idx.astype(jnp.int32)
    else:
        top_vals, top_idx = topk_blockmax(bm[:, :Dp], k_ret)

    # scatter-free candidate mask (measured 3.2 -> ~0.3 ms/batch-64)
    cand_mask, old_dense, old_norm, valid_c = dense_candidates_from_topk(
        bm, top_vals, Dp
    )

    # ---- ONE dense pass: per-doc raw stats, then cheap per-doc fusion ------
    # (the two-pass extrema+fused structure re-read the full chunk bank
    # twice: 3.4 + 2.1 ms/batch-64 at 100k docs; the one-pass form reads it
    # once and never materializes [B, n_chunks] between passes)
    stats = bucket_doc_stats(
        buckets, bucket_emb, bucket_valid, qvec,
        use_pallas=stats_pallas, interpret=interpret,
    )
    lo, hi = stats_pool_extrema(stats, cand_mask, buckets)
    doc_score, win = fused_scores_from_stats(
        buckets,
        bucket_start,
        stats,
        cand_mask,
        old_dense,
        lo[:, None],
        hi[:, None],
        smoothing,
    )  # [B, Dp] each

    return _rank_candidates(doc_score, win, top_idx, valid_c, old_norm, k_ret)


def hybrid_rank_buckets(
    blk_terms,
    blk_impact,
    blk_local,
    bucket_emb,
    bucket_valid,
    bucket_start,
    term_ids,
    qtf,
    qvec,
    *,
    n_docs_pad: int,
    k_ret: int,
    smoothing: float = 0.15,
    buckets=(),
    interpret: bool = False,
    approx: bool = False,
):
    """Pallas blocked BM25 + bucketed dense tail — the fast-compile,
    fast-run, memory-exact TPU configuration.  Returned doc indices are in
    the PERMUTED order; callers map back via DeviceIndex.doc_perm."""
    from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
        bm25_score_blocked,
    )

    bm = bm25_score_blocked(
        blk_terms,
        blk_impact,
        blk_local,
        term_ids,
        qtf,
        n_docs_pad=n_docs_pad,
        interpret=interpret,
    )
    return _hybrid_tail_buckets(
        bm,
        bucket_emb,
        bucket_valid,
        bucket_start,
        qvec,
        n_docs_pad=n_docs_pad,
        k_ret=k_ret,
        smoothing=smoothing,
        buckets=buckets,
        approx=approx,
        stats_pallas=True,
        interpret=interpret,
    )


def hybrid_rank_buckets_udedup(
    blk_terms,
    blk_impact,
    blk_local,
    bucket_emb,
    bucket_valid,
    bucket_start,
    uids,
    w,
    qvec,
    *,
    n_docs_pad: int,
    k_ret: int,
    smoothing: float = 0.15,
    buckets=(),
    interpret: bool = False,
    approx: bool = False,
):
    """hybrid_rank_buckets with the U-dedup BM25 front end: postings match
    against the batch's DISTINCT query terms (bm25_pallas.dedup_query_terms
    prepares uids/w on host).  Exact same scores; wins whenever the batch's
    distinct-term count is below ~1.5 * B * T (always true for shared-term
    production batches — every augmented query carries "tuebingen")."""
    from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
        bm25_score_blocked_udedup,
    )

    bm = bm25_score_blocked_udedup(
        blk_terms,
        blk_impact,
        blk_local,
        uids,
        w,
        n_docs_pad=n_docs_pad,
        interpret=interpret,
    )
    return _hybrid_tail_buckets(
        bm,
        bucket_emb,
        bucket_valid,
        bucket_start,
        qvec,
        n_docs_pad=n_docs_pad,
        k_ret=k_ret,
        smoothing=smoothing,
        buckets=buckets,
        approx=approx,
        stats_pallas=True,
        interpret=interpret,
    )


def hybrid_rank_slots(
    slot_terms,
    slot_impact,
    col_unperm,
    bucket_emb,
    bucket_valid,
    bucket_start,
    term_ids,
    qtf,
    qvec,
    *,
    n_docs_pad: int,
    k_ret: int,
    smoothing: float = 0.15,
    buckets=(),
    interpret: bool = False,
    approx: bool = False,
):
    """Doc-slot Pallas BM25 + bucketed dense tail — the fastest single-chip
    configuration (no one-hot doc-reduction matmul; see bm25_pallas
    _kernel_slots).  Returned doc indices are in the PERMUTED order;
    callers map back via DeviceIndex.doc_perm."""
    from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
        bm25_score_slots,
    )

    bm = bm25_score_slots(
        slot_terms,
        slot_impact,
        col_unperm,
        term_ids,
        qtf,
        interpret=interpret,
    )
    return _hybrid_tail_buckets(
        bm,
        bucket_emb,
        bucket_valid,
        bucket_start,
        qvec,
        n_docs_pad=n_docs_pad,
        k_ret=k_ret,
        smoothing=smoothing,
        buckets=buckets,
        approx=approx,
        stats_pallas=True,
        interpret=interpret,
    )


def hybrid_rank_slots_udedup(
    slot_terms,
    slot_impact,
    col_unperm,
    bucket_emb,
    bucket_valid,
    bucket_start,
    uids,
    w,
    qvec,
    *,
    n_docs_pad: int,
    k_ret: int,
    smoothing: float = 0.15,
    buckets=(),
    interpret: bool = False,
    approx: bool = False,
    acc: bool = True,
    variant: str = None,
):
    """hybrid_rank_slots with the U-dedup front end (shared-term batches).
    ``variant`` picks the kernel (bm25_pallas.udedup_plan); the legacy
    ``acc`` flag applies only when variant is None."""
    from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
        bm25_score_slots_udedup,
    )

    bm = bm25_score_slots_udedup(
        slot_terms,
        slot_impact,
        col_unperm,
        uids,
        w,
        interpret=interpret,
        acc=acc,
        variant=variant,
    )
    return _hybrid_tail_buckets(
        bm,
        bucket_emb,
        bucket_valid,
        bucket_start,
        qvec,
        n_docs_pad=n_docs_pad,
        k_ret=k_ret,
        smoothing=smoothing,
        buckets=buckets,
        approx=approx,
        stats_pallas=True,
        interpret=interpret,
    )


def bm25_topk_slots(index, term_ids, qtf, k: int, interpret: bool = False):
    """BM25-only retrieval via the doc-slot kernel."""
    from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
        bm25_score_slots,
    )

    bm = bm25_score_slots(
        index.slot_terms,
        index.slot_impact,
        index.col_unperm,
        jnp.asarray(term_ids),
        jnp.asarray(qtf),
        interpret=interpret,
    )
    vals, idx = topk_blockmax(bm[:, : index.n_docs_pad], k)
    return idx, vals
