"""SearchEngine: host orchestration around the jitted hybrid query path.

The reference's three cooperating processes (Flask search_api -> FastAPI
reranker -> DuckDB, SURVEY.md §1) collapse into this one class: query
preprocessing + term lookup on host, one compiled device program for
BM25 + dense + fusion + ranking, then host-side domain diversification and
result formatting over the (at most) ``top_k_retrieval`` candidates.
"""

from __future__ import annotations

import dataclasses
from collections import Counter
from typing import List, Optional, Sequence

import numpy as np

from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index.builder import IndexArtifacts
from modern_search_engines_project_tpu.retrieval import ops
from modern_search_engines_project_tpu.retrieval.device_index import DeviceIndex
from modern_search_engines_project_tpu.retrieval.numpy_ref import preprocess_query
from modern_search_engines_project_tpu.retrieval.rerank import (
    RankedDoc,
    factorize,
    finish_positions,
)
from modern_search_engines_project_tpu.text.analyzer import Analyzer
from modern_search_engines_project_tpu.utils.timing import StageTimes, stage_timer


_NORM_JIT = None


def _normalize_rows(q):
    """Jitted row L2-normalization (device in, device out — no sync).
    The jit wrapper is built lazily ONCE (a fresh wrapper per call would
    re-trace every query)."""
    global _NORM_JIT
    if _NORM_JIT is None:
        import jax
        import jax.numpy as jnp

        def norm(q):
            q = q.astype(jnp.float32)
            n = jnp.linalg.norm(q, axis=1, keepdims=True)
            return q / jnp.maximum(n, 1e-12)

        _NORM_JIT = jax.jit(norm)
    return _NORM_JIT(q)


class SearchEngine:
    def __init__(
        self,
        artifacts: IndexArtifacts,
        encoder,
        config: Optional[Config] = None,
        bank_dtype=None,
        analyzer: Optional[Analyzer] = None,
        use_pallas: Optional[bool] = None,
        cross_encoder=None,
    ):
        import jax
        import jax.numpy as jnp

        self.art = artifacts
        self.cfg = config or artifacts.config
        self.encoder = encoder
        self.analyzer = analyzer or Analyzer()
        # Pallas blocked BM25 kernel: the TPU fast path (bm25_pallas.py).
        # On CPU it runs in interpreter mode — correct but slow, so only
        # when explicitly requested (tests do, for parity coverage).
        backend = jax.default_backend()
        # bf16 chunk bank on TPU (half the HBM, MXU-native matmul — the
        # benchmarked serving config); f32 on CPU where the parity suite
        # compares against the numpy oracle bit-for-bit
        dtype = bank_dtype if bank_dtype is not None else (
            jnp.bfloat16 if backend == "tpu" else jnp.float32
        )
        self.use_pallas = (
            use_pallas if use_pallas is not None else backend == "tpu"
        )
        self.didx = DeviceIndex.from_artifacts(
            artifacts,
            self.cfg,
            bank_dtype=dtype,
            # when the bucketed Pallas path serves, the packed bank + CSR
            # copies are the scatter fallback only — keep them on host
            # (duplicate HBM residency OOMs at 1M docs)
            packed_device=not self.use_pallas,
            bm25_layout=getattr(self.cfg, "bm25_layout", "slots"),
            # the engine only ever drives the configured layout; skip the
            # host-heavy construction of the other one (halves index-load
            # time at 1M+ docs)
            build_unused_layout=False,
        )
        self.k_ret = min(self.cfg.top_k_retrieval, self.didx.n_docs_pad)
        # quality-gated candidate selection: "auto" turns approx_max_k on
        # only at corpus sizes where exact top_k dominates latency
        from modern_search_engines_project_tpu.config import resolve_approx

        self._approx = resolve_approx(self.cfg, self.didx.n_docs_pad)
        self._pallas_interpret = backend != "tpu"
        self.times = StageTimes()
        # optional stage-3: joint query x window scoring over the final list
        # (models/cross_encoder.py; anything with rescore(query, texts))
        self.cross_encoder = cross_encoder
        # pallas paths rank in the bucketed (permuted) doc order
        self._result_perm = (
            self.didx.doc_perm if self.use_pallas else None
        )
        self._init_finish_codes()

    def _init_finish_codes(self) -> None:
        """Per-doc integer codes for the array-native finishing pass
        (dedup by query-stripped url + domain diversification)."""
        self._domain_codes = factorize(self.art.domains)
        self._base_codes = factorize(
            [u.split("?", 1)[0] for u in self.art.urls]
        )

    # --- host-side query prep ----------------------------------------------

    def prepare_queries(self, queries: Sequence[str], augment: bool = True):
        """queries -> (term_ids [B, T], qtf [B, T], processed texts).

        Mirrors search_api.preprocess_query (tübingen augmentation,
        search_api.py:155-166) + BM25._tokenize (bm25_indexer.py:149-155).
        Unique terms with query-term-frequency weights, parity with
        bm25_indexer.py:455-479.
        """
        T = self.cfg.max_query_terms
        B = len(queries)
        term_ids = np.full((B, T), -1, np.int32)
        qtf = np.zeros((B, T), np.float32)
        processed = []
        max_slots = 0
        for i, q in enumerate(queries):
            pq = preprocess_query(q) if augment else q
            processed.append(pq)
            counts = Counter(self.analyzer.tokens(pq))
            slot = 0
            for term, tf in counts.items():
                tid = self.art.vocab.get(term)
                if tid < 0:
                    continue
                if slot >= T:
                    break
                term_ids[i, slot] = tid
                qtf[i, slot] = float(tf)
                slot += 1
            max_slots = max(max_slots, slot)
        # bucket the term axis (4/8/.../T): the kernels' match loop is
        # linear in the PADDED T, and real queries carry 2-6 terms after
        # augmentation — always padding to max_query_terms doubles the
        # plain-kernel time for nothing.  Bounded compiled shapes.
        t_eff = 4
        while t_eff < max_slots:
            t_eff *= 2
        t_eff = min(t_eff, T)
        return term_ids[:, :t_eff], qtf[:, :t_eff], processed

    def encode_queries(self, processed: Sequence[str]):
        """Unit-norm query embeddings [B, dim].

        Device-capable encoders (JaxEncoder.encode_batch_device) return a
        DEVICE array with no host sync — the subsequent ranking dispatch
        enqueues behind the encode on the same device stream, so the
        online path pays ONE host round trip instead of two (the encode
        sync alone was ~40 ms of tunnel RTT per query on a
        remote-attached chip).  Host encoders keep the numpy path."""
        senc = getattr(self, "_sharded_enc", None)
        if senc is not None:
            # multi-chip: data-parallel forward over the index mesh +
            # ICI all_gather (already normalized, replicated, no sync)
            return senc(list(processed))
        enc_dev = getattr(self.encoder, "encode_batch_device", None)
        if enc_dev is not None:
            return _normalize_rows(enc_dev(list(processed)))
        q = np.asarray(self.encoder.encode_batch(list(processed)), np.float32)
        norms = np.linalg.norm(q, axis=1, keepdims=True)
        return q / np.maximum(norms, 1e-12)

    # --- device calls -------------------------------------------------------

    def _device_rank(self, term_ids, qtf, qvec):
        d = self.didx
        use_slots = (
            self.use_pallas
            and d.buckets
            and getattr(self.cfg, "bm25_layout", "slots") == "slots"
        )
        if use_slots and self.cfg.bm25_udedup:
            from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
                dedup_query_terms,
                u_pad_for,
                udedup_plan,
            )

            tids_np = np.asarray(term_ids)
            B, T = tids_np.shape
            u_pad = u_pad_for(int(np.unique(tids_np[tids_np >= 0]).size))
            # variant selection from the measured v5e cost model
            # (bm25_pallas.udedup_plan); bm25_udedup="always" pins the
            # U-dedup path (tests / unusual workloads).
            plan = udedup_plan(u_pad, B, nnz=d.nnz)
            if self.cfg.bm25_udedup == "always" and plan is None:
                plan = "sublane"
            if plan is not None:
                uids, w = dedup_query_terms(term_ids, qtf)
                return ops.hybrid_rank_slots_udedup(
                    d.slot_terms,
                    d.slot_impact,
                    d.col_unperm,
                    d.bucket_emb,
                    d.bucket_valid,
                    d.bucket_start,
                    uids,
                    w,
                    qvec,
                    n_docs_pad=d.n_docs_pad,
                    k_ret=self.k_ret,
                    smoothing=self.cfg.smoothing,
                    buckets=d.buckets,
                    interpret=self._pallas_interpret,
                    approx=self._approx,
                    variant=plan,
                )
        if use_slots:
            return ops.hybrid_rank_slots(
                d.slot_terms,
                d.slot_impact,
                d.col_unperm,
                d.bucket_emb,
                d.bucket_valid,
                d.bucket_start,
                term_ids,
                qtf,
                qvec,
                n_docs_pad=d.n_docs_pad,
                k_ret=self.k_ret,
                smoothing=self.cfg.smoothing,
                buckets=d.buckets,
                interpret=self._pallas_interpret,
                approx=self._approx,
            )
        if self.use_pallas and d.buckets and self.cfg.bm25_udedup:
            from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
                dedup_query_terms,
                u_pad_for,
            )

            tids_np = np.asarray(term_ids)
            B, T = tids_np.shape
            u_pad = u_pad_for(int(np.unique(tids_np[tids_np >= 0]).size))
            # measured v5e crossover: the (2B,U)@(U,pcL) weight-recovery
            # matmul eats the VPU savings above U ~ B*T/4 (at B=64,T=16:
            # U_pad=128 is 20% faster, 512 slower, 1024 ~2x slower).
            # Gate BEFORE building the weight matrix — batch-1 traffic can
            # never qualify and must not pay the prep on its hot path.
            if 4 * u_pad <= B * T:
                uids, w = dedup_query_terms(term_ids, qtf)
                return ops.hybrid_rank_buckets_udedup(
                    d.blk_terms,
                    d.blk_impact,
                    d.blk_local,
                    d.bucket_emb,
                    d.bucket_valid,
                    d.bucket_start,
                    uids,
                    w,
                    qvec,
                    n_docs_pad=d.n_docs_pad,
                    k_ret=self.k_ret,
                    smoothing=self.cfg.smoothing,
                    buckets=d.buckets,
                    interpret=self._pallas_interpret,
                    approx=self._approx,
                )
        if self.use_pallas and d.buckets:
            return ops.hybrid_rank_buckets(
                d.blk_terms,
                d.blk_impact,
                d.blk_local,
                d.bucket_emb,
                d.bucket_valid,
                d.bucket_start,
                term_ids,
                qtf,
                qvec,
                n_docs_pad=d.n_docs_pad,
                k_ret=self.k_ret,
                smoothing=self.cfg.smoothing,
                buckets=d.buckets,
                interpret=self._pallas_interpret,
                approx=self._approx,
            )
        if self.use_pallas:
            return ops.hybrid_rank_blocked(
                d.blk_terms,
                d.blk_impact,
                d.blk_local,
                d.chunk_emb,
                d.chunk_doc,
                d.doc_chunk_start,
                d.doc_n_chunks,
                term_ids,
                qtf,
                qvec,
                n_docs_pad=d.n_docs_pad,
                k_ret=self.k_ret,
                smoothing=self.cfg.smoothing,
                interpret=self._pallas_interpret,
            )
        return ops.hybrid_rank(
            d.indptr,
            d.post_docs,
            d.post_impact,
            d.chunk_emb,
            d.chunk_doc,
            d.doc_chunk_start,
            d.doc_n_chunks,
            term_ids,
            qtf,
            qvec,
            n_docs_pad=d.n_docs_pad,
            posting_cap=d.posting_cap,
            k_ret=self.k_ret,
            smoothing=self.cfg.smoothing,
        )

    # --- public API ---------------------------------------------------------

    @staticmethod
    def _bucket(n: int) -> int:
        """Round batch up to a power of two: bounded set of compiled shapes."""
        b = 1
        while b < n:
            b *= 2
        return b

    def rank_batch(self, queries: Sequence[str], augment: bool = True):
        """Device half of ``search_batch``: query prep + encode + the one
        compiled ranking program.  Returns a raw array tuple for
        ``finish_batch`` — serving overlaps this (device worker) with the
        previous batch's host finishing.

        Batches larger than ``cfg.query_batch_size`` are chunked and the
        chunk dispatches PIPELINED (all chunks enqueue before the first
        sync): a single device program over thousands of queries is not
        just slow, it cannot compile — the slot kernels' VMEM footprint
        scales with B (measured: 1,377-query batch at 100k docs = 342 MB
        of VMEM against a 128 MB budget).  Found by the labeled-eval run
        pushing the whole query file through /api/batch_search_file."""
        cap = max(1, int(getattr(self.cfg, "query_batch_size", 64) or 64))
        if len(queries) > cap:
            pending = []
            for i in range(0, len(queries), cap):
                chunk = list(queries[i : i + cap])
                padded = chunk + [""] * (self._bucket(len(chunk)) - len(chunk))
                term_ids, qtf, processed = self.prepare_queries(
                    padded, augment
                )
                qvec = self.encode_queries(processed)
                pending.append(
                    (len(chunk), self._device_rank(term_ids, qtf, qvec))
                )
            for _n, outs in pending:
                for x in outs:
                    if hasattr(x, "copy_to_host_async"):
                        try:
                            x.copy_to_host_async()
                        except Exception:
                            break
            parts = [
                tuple(np.asarray(x)[:n] for x in outs) for n, outs in pending
            ]
            return tuple(
                np.concatenate(cols, axis=0) for cols in zip(*parts)
            )
        n_real = len(queries)
        padded = list(queries) + [""] * (self._bucket(n_real) - n_real)
        with stage_timer("query_prep", self.times):
            term_ids, qtf, processed = self.prepare_queries(padded, augment)
        with stage_timer("query_encode", self.times):
            qvec = self.encode_queries(processed)
        with stage_timer("device_rank", self.times):
            outs = self._device_rank(term_ids, qtf, qvec)
            # start all five device->host copies before blocking on any:
            # serial np.asarray pays one transfer round trip PER array
            # (5x the link latency on remote-attached chips); async copies
            # overlap to ~one round trip
            for x in outs:
                if hasattr(x, "copy_to_host_async"):
                    try:
                        x.copy_to_host_async()
                    except Exception:
                        break  # backend without async copies: plain path
            return tuple(np.asarray(x) for x in outs)

    def search_batch(
        self,
        queries: Sequence[str],
        top_k: Optional[int] = None,
        augment: bool = True,
    ) -> List[List[RankedDoc]]:
        """Hybrid two-stage search for a batch of queries (reference P3:
        all batch queries scored as one device batch)."""
        return self.finish_batch(
            self.rank_batch(queries, augment), queries, top_k
        )

    def finish_batch(
        self,
        raw,
        queries: Sequence[str],
        top_k: Optional[int] = None,
    ) -> List[List[RankedDoc]]:
        """Host half of ``search_batch``: dedup + diversification over the
        candidate pool and RankedDoc materialization for the top-k rows.
        Pure host work — independent of the device worker."""
        top_k = top_k or self.cfg.top_k_reranking
        n_real = len(queries)
        doc, vals, old, win, valid = raw
        perm = getattr(self, "_result_perm", None)
        if perm is not None:
            doc = np.where(valid, perm[np.clip(doc, 0, len(perm) - 1)], doc)
        out: List[List[RankedDoc]] = []
        fmt_timer = stage_timer("format_diversify", self.times)
        fmt_timer.__enter__()
        # array-native finishing: dedup + diversification run on integer
        # codes over the ~1000-candidate pool; RankedDoc objects are only
        # built for the <= top_k selected rows (constructing 1000 dataclass
        # rows per query to throw 90% away was the serving host bottleneck)
        n_valid = valid.sum(axis=1).tolist()
        n_docs_real = len(self.art.doc_ids)
        n_wins = len(self.art.window_texts)
        for b in range(n_real):
            nv = n_valid[b]
            db = doc[b, :nv]
            ok = (db >= 0) & (db < n_docs_real)
            pos0 = np.nonzero(ok)[0]
            db = db[pos0]
            sel, sc = finish_positions(
                vals[b, :nv][pos0],
                self._domain_codes[db],
                self._base_codes[db],
                top_k,
                relevance_threshold=self.cfg.diversification_threshold,
                diversification=self.cfg.diversification,
            )
            d_sel = db[sel].tolist()
            o_sel = old[b, :nv][pos0][sel].tolist()
            w_sel = win[b, :nv][pos0][sel].tolist()
            ranked: List[RankedDoc] = []
            for d, s, o, w in zip(d_sel, sc.tolist(), o_sel, w_sel):
                w_ok = 0 <= w < n_wins
                w = w if w_ok else 0
                ranked.append(
                    RankedDoc(
                        doc_id=self.art.doc_ids[d],
                        url=self.art.urls[d],
                        title=self.art.titles[d],
                        similarity_score=s,
                        original_similarity=o,
                        window_index=w,
                        window_text=self.art.window_texts[w] if w_ok else "",
                        domain=self.art.domains[d],
                    )
                )
            if self.cross_encoder is not None and ranked:
                ce = self.cross_encoder.rescore(
                    queries[b], [r.window_text for r in ranked]
                )
                ranked = sorted(
                    (
                        dataclasses.replace(r, similarity_score=float(sc))
                        for r, sc in zip(ranked, ce)
                    ),
                    key=lambda r: -r.similarity_score,
                )
            out.append(ranked)
        fmt_timer.__exit__(None, None, None)
        return out

    def search_batch_indices(
        self,
        queries: Sequence[str],
        top_k: Optional[int] = None,
        augment: bool = True,
    ) -> List[List[tuple]]:
        """``search_batch`` for the native fast path: full device rank +
        host finishing, but returns per-query ``(window_idx, score)`` pairs
        instead of materializing RankedDoc objects — the C++ serving core
        (native/http_server.cpp) splices pre-escaped per-window JSON
        fragments by index, so building Python row objects would be pure
        overhead."""
        top_k = top_k or self.cfg.top_k_reranking
        raw = self.rank_batch(queries, augment=augment)
        doc, vals, old, win, valid = raw
        perm = getattr(self, "_result_perm", None)
        if perm is not None:
            doc = np.where(valid, perm[np.clip(doc, 0, len(perm) - 1)], doc)
        n_valid = valid.sum(axis=1).tolist()
        n_docs_real = len(self.art.doc_ids)
        n_wins = len(self.art.window_texts)
        start = self.art.doc_chunk_start
        out: List[List[tuple]] = []
        for b in range(len(queries)):
            nv = n_valid[b]
            db = doc[b, :nv]
            ok = (db >= 0) & (db < n_docs_real)
            pos0 = np.nonzero(ok)[0]
            db = db[pos0]
            sel, sc = finish_positions(
                vals[b, :nv][pos0],
                self._domain_codes[db],
                self._base_codes[db],
                top_k,
                relevance_threshold=self.cfg.diversification_threshold,
                diversification=self.cfg.diversification,
            )
            d_sel = db[sel]
            w_sel = win[b, :nv][pos0][sel]
            # out-of-range window -> the doc's first chunk (fragments are
            # per chunk, always valid)
            bad = (w_sel < 0) | (w_sel >= n_wins)
            w_sel = np.where(bad, start[d_sel], w_sel)
            out.append(list(zip(w_sel.tolist(), sc.tolist())))
        return out

    def search(self, query: str, top_k: Optional[int] = None) -> List[RankedDoc]:
        return self.search_batch([query], top_k=top_k)[0]

    def warmup(self, batch_sizes: Sequence[int] = (1, 64)) -> int:
        """Compile the hot query shapes before traffic arrives.

        Each (batch-bucket, term-bucket, front-end) combination is a
        separate XLA compile (tens of seconds on a cold TPU) — a cold
        serve would pay that on the first unlucky request.  Runs one
        throwaway batch per requested size with both a short query (term
        bucket 4) and a long one (the max bucket).  Returns the number of
        device calls made."""
        # warmup queries need REAL vocab terms: unknown terms are dropped
        # before term-axis bucketing, and the U-dedup bucket follows the
        # batch's distinct-term count
        T = self.cfg.max_query_terms
        vocab_terms = []
        for t in self.art.vocab.term_to_id:
            vocab_terms.append(t)
            if len(vocab_terms) >= max(batch_sizes, default=1) * T:
                break
        long_q = " ".join(vocab_terms[:T]) if vocab_terms else "warmup"
        calls = 0
        for b in batch_sizes:
            b = max(1, int(b))
            batches = [["warmup"] * b, [long_q] * b]
            if b > 1 and len(vocab_terms) >= b * T:
                # all-distinct batch: warms the largest U-dedup bucket
                batches.append(
                    [
                        " ".join(vocab_terms[i * T : (i + 1) * T])
                        for i in range(b)
                    ]
                )
            for qs in batches:
                self.search_batch(qs, top_k=1)
                calls += 1
        return calls

    @classmethod
    def sharded(
        cls,
        artifacts: IndexArtifacts,
        encoder,
        mesh,
        config: Optional[Config] = None,
        bank_dtype=None,
        analyzer: Optional[Analyzer] = None,
    ) -> "SearchEngine":
        """Multi-chip engine: same API, index sharded over ``mesh`` with
        per-shard top-k + ICI allgather merge (parallel/sharding.py)."""
        import jax.numpy as jnp

        from modern_search_engines_project_tpu.parallel.sharding import (
            ShardedEngineBackend,
        )

        self = cls.__new__(cls)
        self.art = artifacts
        self.cfg = config or artifacts.config
        self.encoder = encoder
        self.analyzer = analyzer or Analyzer()
        import jax as _jax

        backend = ShardedEngineBackend(
            artifacts,
            mesh,
            self.cfg,
            bank_dtype=bank_dtype if bank_dtype is not None else (
                jnp.bfloat16
                if _jax.default_backend() == "tpu"
                else jnp.float32
            ),
        )
        self.didx = backend.sidx  # for introspection
        self.k_ret = backend.k_ret
        self.use_pallas = False  # sharded backend has its own dispatch
        self.times = StageTimes()
        # sharded docs are bucket-permuted per shard; map back on host
        self._result_perm = backend.doc_perm
        self.cross_encoder = None
        self._backend = backend
        self._device_rank = backend.rank  # type: ignore[method-assign]
        if all(hasattr(encoder, a) for a in ("model", "params", "tokenizer")):
            # JaxEncoder-shaped: encode data-parallel over the index mesh
            from modern_search_engines_project_tpu.parallel.sharding import (
                ShardedQueryEncoder,
            )

            self._sharded_enc = ShardedQueryEncoder(encoder, mesh)
        self._init_finish_codes()
        return self

    def dense_search(self, query: str, top_k: int = 100, augment: bool = True):
        """Exact brute-force dense retrieval (no BM25 candidate filter):
        per-doc max cosine over every chunk in the bank."""
        pq = preprocess_query(query) if augment else query
        qvec = self.encode_queries([pq])
        d = self.didx
        backend = getattr(self, "_backend", None)
        if backend is not None:
            idx, vals, win = backend.dense_topk(
                qvec, min(top_k, d.n_docs_pad)
            )
        elif self.use_pallas and d.buckets:
            # bucketed layout (the packed bank stays host-side on this path)
            idx, vals, win = ops.dense_rank_buckets(
                d.bucket_emb,
                d.bucket_valid,
                d.bucket_start,
                qvec,
                n_docs_pad=d.n_docs_pad,
                k=min(top_k, d.n_docs_pad),
                buckets=d.buckets,
            )
        else:
            idx, vals, win = ops.dense_rank(
                d.chunk_emb,
                d.chunk_doc,
                qvec,
                n_docs_pad=d.n_docs_pad,
                k=min(top_k, d.n_docs_pad),
            )
        if backend is not None or (self.use_pallas and d.buckets):
            idx = np.asarray(idx)
            perm = getattr(self, "_result_perm", None)
            if perm is not None:
                idx = np.where(
                    np.isfinite(np.asarray(vals)),
                    perm[np.clip(idx, 0, len(perm) - 1)],
                    idx,
                )
        idx, vals, win = np.asarray(idx)[0], np.asarray(vals)[0], np.asarray(win)[0]
        out = []
        for di, v, w in zip(idx, vals, win):
            if not np.isfinite(v) or int(di) >= len(self.art.doc_ids):
                continue
            w = int(w)
            w = w if 0 <= w < len(self.art.window_texts) else 0
            out.append(
                RankedDoc(
                    doc_id=self.art.doc_ids[int(di)],
                    url=self.art.urls[int(di)],
                    title=self.art.titles[int(di)],
                    similarity_score=float(v),
                    original_similarity=0.0,
                    window_index=w,
                    window_text=self.art.window_texts[w],
                    domain=self.art.domains[int(di)],
                )
            )
        return out[:top_k]

    def bm25_search(self, query: str, top_k: int = 1000, augment: bool = False):
        """Stage-1-only search (BM25.search parity, bm25_indexer.py:383-514).

        Returns [{doc_id, score, text_snippet}] like the reference.
        """
        term_ids, qtf, _ = self.prepare_queries([query], augment=augment)
        backend = getattr(self, "_backend", None)
        if backend is not None:
            idx, vals = backend.bm25_topk(
                term_ids, qtf, min(top_k, self.didx.n_docs_pad)
            )
            perm = getattr(self, "_result_perm", None)
            if perm is not None:
                idx = np.where(
                    np.asarray(vals) >= 0,
                    perm[np.clip(np.asarray(idx), 0, len(perm) - 1)],
                    np.asarray(idx),
                )
        elif self.use_pallas:
            topk_fn = (
                ops.bm25_topk_slots
                if getattr(self.cfg, "bm25_layout", "slots") == "slots"
                and self.didx.col_unperm is not None
                else ops.bm25_topk_blocked
            )
            idx, vals = topk_fn(
                self.didx,
                term_ids,
                qtf,
                min(top_k, self.didx.n_docs_pad),
                interpret=self._pallas_interpret,
            )
            perm = getattr(self, "_result_perm", None)
            if perm is not None:
                idx = np.where(
                    np.asarray(vals) >= 0,
                    perm[np.clip(np.asarray(idx), 0, len(perm) - 1)],
                    np.asarray(idx),
                )
        else:
            idx, vals = ops.bm25_topk(
                self.didx, term_ids, qtf, min(top_k, self.didx.n_docs_pad)
            )
        idx, vals = np.asarray(idx)[0], np.asarray(vals)[0]
        results = []
        for d, s in zip(idx, vals):
            if s < 0:
                break  # keyed scores: inadmissible candidates are -1
            results.append(
                {
                    "doc_id": self.art.doc_ids[int(d)],
                    "score": float(s),
                    "text_snippet": self.art.snippets[int(d)],
                }
            )
        return results
