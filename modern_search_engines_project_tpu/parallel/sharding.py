"""Multi-chip sharded serving: postings + chunk banks partitioned over a mesh.

TPU-native replacement for the reference's "distributed architecture"
(three localhost HTTP processes sharing one DuckDB file, SURVEY.md §5.8):
the document axis is range-partitioned across a 1-D ``jax.sharding.Mesh``
axis ``"shard"``; every shard holds its own CSR impact postings and the
chunk embeddings of its documents (chunks colocate with their documents, so
per-doc pooling never crosses chips).

Query flow inside ONE ``shard_map`` program (BASELINE.json P8):
  1. per-shard BM25 scoring + local top-k,
  2. ``all_gather`` of (global doc id, score) candidate sets over ICI and a
     replicated re-top-k merge,
  3. per-shard dense scoring of the local chunk bank, with the candidate-
     pool min/max reduced via ``pmin``/``pmax`` (the reference's per-pool
     normalization needs global extrema),
  4. per-shard fusion + positional adjustment for locally-owned candidates,
     combined across shards with ``pmax`` (each doc is owned by exactly one
     shard), and a replicated final top-k.

Only O(B x k) tensors ever cross ICI; the banks never move.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index.builder import IndexArtifacts
from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
    bm25_score_blocked,
)
from modern_search_engines_project_tpu.retrieval.device_index import (
    build_blocked_postings,
)
from modern_search_engines_project_tpu.retrieval.ops import (
    bm25_score_batch,
    _segment,
)

_BIG = jnp.int32(2**31 - 1)


def make_mesh(n_devices: Optional[int] = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class ShardedDeviceIndex:
    """Stacked per-shard arrays, leading axis sharded over the mesh."""

    indptr: jnp.ndarray  # [S, V+1]
    post_docs: jnp.ndarray  # [S, nnz_pad] local doc ids
    post_impact: jnp.ndarray  # [S, nnz_pad]
    blk_terms: jnp.ndarray  # [S, n_blocks_loc, p_blk] doc-major blocked
    blk_impact: jnp.ndarray
    blk_local: jnp.ndarray
    doc_n_chunks: jnp.ndarray  # [S, D_loc+1]
    slot_emb: jnp.ndarray  # [S, D_loc * stride, dim] fixed-stride slots
    slot_valid: jnp.ndarray  # [S, D_loc, stride]
    slot_gid: jnp.ndarray  # [S, D_loc, stride] global chunk ids (pad 0)
    slot_stride: int
    mesh: Mesh
    n_shards: int
    n_docs: int
    d_loc: int  # docs per shard (padded)
    c_loc: int  # chunks per shard (padded)
    posting_cap: int

    @property
    def n_docs_pad(self) -> int:
        return self.n_shards * self.d_loc

    @classmethod
    def from_artifacts(
        cls,
        art: IndexArtifacts,
        mesh: Mesh,
        config: Optional[Config] = None,
        bank_dtype=jnp.float32,
        posting_cap: Optional[int] = None,
    ) -> "ShardedDeviceIndex":
        cfg = config or art.config
        S = mesh.devices.size
        n_docs = art.n_docs
        # 128-multiple: each local doc range tiles exactly into the Pallas
        # kernel's doc blocks
        d_loc = max(_round_up(-(-max(n_docs, 1) // S), 128), 128)
        V = art.n_terms
        dim = art.chunk_emb.shape[1]

        term_of_post = np.repeat(
            np.arange(V, dtype=np.int64), np.diff(art.indptr)
        )

        indptr_l, docs_l, imp_l = [], [], []
        chunks_per_shard = []
        for s in range(S):
            lo, hi = s * d_loc, min((s + 1) * d_loc, n_docs)
            mask = (art.post_docs >= lo) & (art.post_docs < hi)
            docs_l.append(art.post_docs[mask].astype(np.int32) - lo)
            imp_l.append(art.post_impact[mask])
            counts = np.bincount(term_of_post[mask], minlength=V)
            ip = np.zeros(V + 1, np.int32)
            np.cumsum(counts, out=ip[1:])
            indptr_l.append(ip)
            # chunk range of this shard's docs (chunks are doc-major)
            if hi > lo:
                c0 = int(art.doc_chunk_start[lo])
                c1 = (
                    int(art.doc_chunk_start[hi - 1] + art.doc_n_chunks[hi - 1])
                )
            else:
                c0 = c1 = 0
            chunks_per_shard.append((c0, c1))

        nnz_pad = max(_round_up(max(len(d) for d in docs_l), 128), 128)
        c_loc = max(
            _round_up(max(c1 - c0 for c0, c1 in chunks_per_shard), 128), 128
        )

        post_docs = np.zeros((S, nnz_pad), np.int32)
        post_impact = np.zeros((S, nnz_pad), np.float32)
        doc_n_chunks = np.ones((S, d_loc + 1), np.int32)
        indptr = np.stack(indptr_l)

        for s in range(S):
            nl = len(docs_l[s])
            post_docs[s, :nl] = docs_l[s]
            post_impact[s, :nl] = imp_l[s]
            lo = s * d_loc
            hi = min((s + 1) * d_loc, n_docs)
            if hi > lo:
                doc_n_chunks[s, : hi - lo] = art.doc_n_chunks[lo:hi]

        # per-shard doc-major blocked layout (Pallas fast path); pad the
        # posting capacity to a common p_blk across shards so they stack
        blocked = [
            build_blocked_postings(indptr_l[s_], docs_l[s_], imp_l[s_], d_loc)
            for s_ in range(S)
        ]
        p_blk_max = max(b[0].shape[1] for b in blocked)
        n_blocks_loc = d_loc // 128
        blk_terms = np.full((S, n_blocks_loc, p_blk_max), -1, np.int32)
        blk_impactA = np.zeros((S, n_blocks_loc, p_blk_max), np.float32)
        blk_localA = np.zeros((S, n_blocks_loc, p_blk_max), np.int32)
        for s_, (bt, bi, bl) in enumerate(blocked):
            blk_terms[s_, :, : bt.shape[1]] = bt
            blk_impactA[s_, :, : bt.shape[1]] = bi
            blk_localA[s_, :, : bt.shape[1]] = bl

        dnc_all = np.asarray(art.doc_n_chunks)
        stride = int(min(cfg.max_chunks_per_doc, max(int(dnc_all.max()) if n_docs else 1, 1)))
        slot_emb = np.zeros((S, d_loc * stride, dim), np.float32)
        slot_valid = np.zeros((S, d_loc, stride), bool)
        slot_gid = np.zeros((S, d_loc, stride), np.int32)
        starts_all = np.asarray(art.doc_chunk_start)
        for s_ in range(S):
            lo, hi = s_ * d_loc, min((s_ + 1) * d_loc, n_docs)
            for d in range(lo, hi):
                n = min(int(dnc_all[d]), stride)
                s0 = int(starts_all[d])
                row = (d - lo) * stride
                slot_emb[s_, row : row + n] = art.chunk_emb[s0 : s0 + n]
                slot_valid[s_, d - lo, :n] = True
                slot_gid[s_, d - lo, :n] = np.arange(s0, s0 + n)

        if posting_cap is None:
            caps = []
            for s in range(S):
                lens = np.diff(indptr[s])
                top = np.sort(lens)[::-1][: cfg.max_query_terms]
                caps.append(int(top.sum()) + 1)
            posting_cap = max(1024, _round_up(max(caps), 1024))

        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        sh = P("shard")
        return cls(
            indptr=put(indptr, sh),
            post_docs=put(post_docs, sh),
            post_impact=put(post_impact, sh),
            blk_terms=put(blk_terms, sh),
            blk_impact=put(blk_impactA, sh),
            blk_local=put(blk_localA, sh),
            doc_n_chunks=put(doc_n_chunks, sh),
            slot_emb=put(slot_emb.astype(bank_dtype), sh),
            slot_valid=put(slot_valid, sh),
            slot_gid=put(slot_gid, sh),
            slot_stride=stride,
            mesh=mesh,
            n_shards=S,
            n_docs=n_docs,
            d_loc=d_loc,
            c_loc=c_loc,
            posting_cap=int(posting_cap),
        )


def _sharded_hybrid_fn(
    d_loc: int,
    posting_cap: int,
    k_ret: int,
    smoothing: float,
    stride: int,
    axis: str = "shard",
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Per-shard hybrid ranking under shard_map (slot-layout dense stage)."""

    def fn(
        indptr,
        post_docs,
        post_impact,
        blk_terms,
        blk_impact,
        blk_local,
        slot_emb,
        slot_valid,
        slot_gid,
        doc_n_chunks,
        term_ids,
        qtf,
        qvec,
    ):
        # local blocks arrive with a leading shard axis of size 1
        indptr, post_docs, post_impact = indptr[0], post_docs[0], post_impact[0]
        blk_terms, blk_impact, blk_local = (
            blk_terms[0],
            blk_impact[0],
            blk_local[0],
        )
        slot_emb, slot_valid, slot_gid = slot_emb[0], slot_valid[0], slot_gid[0]
        doc_n_chunks = doc_n_chunks[0]

        B = term_ids.shape[0]
        s_id = lax.axis_index(axis)
        b_rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        k_loc = min(k_ret, d_loc)
        S = stride

        # ---- stage 1: local BM25 + global candidate merge over ICI ---------
        if use_pallas:
            bm = bm25_score_blocked(
                blk_terms,
                blk_impact,
                blk_local,
                term_ids,
                qtf,
                n_docs_pad=d_loc,
                interpret=interpret,
            )
        else:
            bm = bm25_score_batch(
                indptr,
                post_docs,
                post_impact,
                term_ids,
                qtf,
                n_docs_pad=d_loc,
                posting_cap=posting_cap,
            )
        lvals, lidx = lax.top_k(bm[:, :d_loc], k_loc)
        gidx = lidx + s_id * d_loc

        all_vals = lax.all_gather(lvals, axis)  # [n_shards, B, k_loc]
        all_idx = lax.all_gather(gidx, axis)
        all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(B, -1)
        all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(B, -1)
        k_eff = min(k_ret, all_vals.shape[1])
        top_vals, sel = lax.top_k(all_vals, k_eff)
        top_idx = jnp.take_along_axis(all_idx, sel, axis=1)
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

        # ---- local candidate scatter ---------------------------------------
        local = top_idx - s_id * d_loc
        in_shard = (local >= 0) & (local < d_loc) & valid_c
        scatter_idx = jnp.where(in_shard, local, d_loc).astype(jnp.int32)
        cand_mask = (
            jnp.zeros((B, d_loc + 1), jnp.bool_)
            .at[b_rows, scatter_idx]
            .set(True)
        )[:, :d_loc]
        old_dense = (
            jnp.zeros((B, d_loc + 1), jnp.float32)
            .at[b_rows, scatter_idx]
            .set(jnp.where(in_shard, old_norm, 0.0))
        )[:, :d_loc]

        # ---- stage 2: local slot-layout dense + global pool extrema --------
        sims = jnp.dot(
            qvec.astype(slot_emb.dtype),
            slot_emb.T,
            preferred_element_type=jnp.float32,
        ).reshape(B, d_loc, S)
        mask3 = cand_mask[:, :, None] & slot_valid[None]
        lo_l = jnp.min(
            jnp.where(mask3, sims, jnp.inf), axis=(1, 2), keepdims=True
        )
        hi_l = jnp.max(
            jnp.where(mask3, sims, -jnp.inf), axis=(1, 2), keepdims=True
        )
        lo_c = lax.pmin(lo_l, axis)
        hi_c = lax.pmax(hi_l, axis)
        den_c = hi_c - lo_c
        new_norm = jnp.where(
            mask3 & (den_c > 0),
            (sims - lo_c) / jnp.where(den_c > 0, den_c, 1.0),
            0.0,
        )

        fused = jnp.where(
            mask3,
            new_norm * (1.0 - smoothing) + old_dense[:, :, None] * smoothing,
            -jnp.inf,
        )
        m1 = jnp.max(fused, axis=2)
        w1s = jnp.argmax(fused, axis=2).astype(jnp.int32)
        slot_ids = jnp.arange(S, dtype=jnp.int32)[None, None, :]
        fused2 = jnp.where(slot_ids == w1s[:, :, None], -jnp.inf, fused)
        m2 = jnp.max(fused2, axis=2)
        w2s = jnp.argmax(fused2, axis=2).astype(jnp.int32)

        nck = doc_n_chunks[None, :d_loc]
        ratio = w1s.astype(jnp.float32) / jnp.maximum(nck - 1, 1).astype(
            jnp.float32
        )
        adj = 0.10 - (0.10 + 0.05) * ratio
        m1_adj = jnp.where(nck > 1, jnp.clip(m1 + adj, 0.0, 1.0), m1)
        doc_score = jnp.maximum(m1_adj, m2)
        win_slot = jnp.where(m1_adj >= m2, w1s, w2s)
        win_gid = jnp.take_along_axis(
            jnp.broadcast_to(slot_gid[None], (B,) + slot_gid.shape),
            win_slot[:, :, None],
            axis=2,
        )[..., 0]

        # ---- combine per-candidate results across shards -------------------
        scatter_c = jnp.clip(scatter_idx, 0, d_loc - 1)
        cand_scores_l = jnp.where(
            in_shard,
            jnp.take_along_axis(doc_score, scatter_c, axis=1),
            -jnp.inf,
        )
        cand_win_l = jnp.where(
            in_shard, jnp.take_along_axis(win_gid, scatter_c, axis=1), -1
        )
        cand_scores = lax.pmax(cand_scores_l, axis)
        cand_win = lax.pmax(cand_win_l, axis)

        sort_key = jnp.where(valid_c, cand_scores, -1.0)
        final_vals, order = lax.top_k(sort_key, k_eff)
        final_doc = jnp.take_along_axis(top_idx, order, axis=1)
        final_win = jnp.take_along_axis(cand_win, order, axis=1)
        final_old = jnp.take_along_axis(old_norm, order, axis=1)
        final_valid = jnp.take_along_axis(valid_c, order, axis=1)
        return final_doc, final_vals, final_old, final_win, final_valid

    return fn


class ShardedEngineBackend:
    """Drop-in replacement for the single-chip device call in SearchEngine."""

    def __init__(
        self,
        art: IndexArtifacts,
        mesh: Mesh,
        config: Optional[Config] = None,
        bank_dtype=jnp.float32,
        use_pallas: Optional[bool] = None,
    ):
        from jax import shard_map

        cfg = config or art.config
        backend = jax.default_backend()
        self.use_pallas = (
            use_pallas if use_pallas is not None else backend == "tpu"
        )
        self._interpret = backend != "tpu"
        self.sidx = ShardedDeviceIndex.from_artifacts(
            art, mesh, cfg, bank_dtype=bank_dtype
        )
        s = self.sidx
        self.k_ret = min(cfg.top_k_retrieval, s.n_docs_pad)
        fn = _sharded_hybrid_fn(
            s.d_loc,
            s.posting_cap,
            self.k_ret,
            cfg.smoothing,
            s.slot_stride,
            use_pallas=self.use_pallas,
            interpret=self._interpret,
        )
        sharded = P("shard")
        repl = P()
        self._ranker = jax.jit(
            shard_map(
                fn,
                mesh=mesh,
                in_specs=(sharded,) * 10 + (repl, repl, repl),
                out_specs=(repl, repl, repl, repl, repl),
                check_vma=False,
            )
        )

    def rank(self, term_ids, qtf, qvec):
        s = self.sidx
        return self._ranker(
            s.indptr,
            s.post_docs,
            s.post_impact,
            s.blk_terms,
            s.blk_impact,
            s.blk_local,
            s.slot_emb,
            s.slot_valid,
            s.slot_gid,
            s.doc_n_chunks,
            jnp.asarray(term_ids),
            jnp.asarray(qtf),
            jnp.asarray(qvec),
        )

    def bm25_topk(self, term_ids, qtf, k: int):
        """Sharded BM25-only retrieval: local top-k + allgather merge."""
        from jax import shard_map

        s = self.sidx
        d_loc, cap = s.d_loc, s.posting_cap
        k_loc = min(k, d_loc)

        def fn(indptr, post_docs, post_impact, tids, qw):
            bm = bm25_score_batch(
                indptr[0],
                post_docs[0],
                post_impact[0],
                tids,
                qw,
                n_docs_pad=d_loc,
                posting_cap=cap,
            )
            lvals, lidx = lax.top_k(bm[:, :d_loc], k_loc)
            gidx = lidx + lax.axis_index("shard") * d_loc
            av = jnp.moveaxis(lax.all_gather(lvals, "shard"), 0, 1).reshape(
                lvals.shape[0], -1
            )
            ai = jnp.moveaxis(lax.all_gather(gidx, "shard"), 0, 1).reshape(
                lvals.shape[0], -1
            )
            vals, sel = lax.top_k(av, min(k, av.shape[1]))
            return jnp.take_along_axis(ai, sel, axis=1), vals

        ranker = jax.jit(
            shard_map(
                fn,
                mesh=s.mesh,
                in_specs=(P("shard"),) * 3 + (P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )
        return ranker(
            s.indptr,
            s.post_docs,
            s.post_impact,
            jnp.asarray(term_ids),
            jnp.asarray(qtf),
        )
