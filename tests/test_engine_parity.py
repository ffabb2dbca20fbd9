"""Device engine vs numpy golden reference: full-pipeline parity.

SURVEY.md §4(d): the jitted TPU path must reproduce the reference scoring
(reimplemented faithfully in retrieval/numpy_ref.py) on a synthetic corpus.
"""

import numpy as np
import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import (
    SearchEngine,
    bm25_search_numpy,
    hybrid_search_numpy,
    preprocess_query,
)


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(n_docs=80, seed=42)


@pytest.fixture(scope="module")
def built(corpus):
    cfg = Config(
        embedding_dim=64,
        window_size=64,
        step_size=50,
        top_k_retrieval=50,
        top_k_reranking=10,
        max_query_terms=8,
    )
    enc = HashingEncoder(dim=64)
    art = IndexBuilder(enc, cfg).build(corpus)
    eng = SearchEngine(art, enc, cfg)
    return art, enc, eng, cfg


# mid-df terms: informative (positive idf) in the seed-42 corpus; the
# ubiquitous zipf-head words ("castle", "river") have negative idf there and
# are excluded by the reference's min_score=0 rule — also covered below.
QUERIES = [
    "research square law",
    "ai faculty cyber",
    "neuro tour square",
    "castleaq gardenaq universityaq",
    "tübingen research faculty",
]


class TestBM25Parity:
    def test_bm25_topk_matches_numpy(self, built):
        art, enc, eng, cfg = built
        for q in QUERIES:
            ref_idx, ref_vals = bm25_search_numpy(
                art, preprocess_query(q), top_k=50
            )
            got = eng.bm25_search(preprocess_query(q), top_k=50)
            got_ids = [g["doc_id"] for g in got]
            got_vals = np.array([g["score"] for g in got])
            ref_ids = [art.doc_ids[i] for i in ref_idx]
            assert len(ref_ids) > 0, f"vacuous test: no candidates for {q!r}"
            # scores must match; order may differ only within exact ties
            assert np.allclose(
                np.sort(got_vals)[::-1], np.sort(ref_vals)[::-1], atol=1e-4
            ), q
            assert set(got_ids) == set(ref_ids), q
            # non-tied prefix must match exactly
            for a, b, va, vb in zip(got_ids, ref_ids, got_vals, ref_vals):
                if abs(va - vb) > 1e-5:
                    break
                assert a == b or abs(va - vb) < 1e-5


class TestHybridParity:
    def test_full_pipeline_matches_numpy(self, built):
        art, enc, eng, cfg = built
        for q in QUERIES:
            pq = preprocess_query(q)
            qemb = enc.encode(pq)
            ref = hybrid_search_numpy(
                art,
                pq,
                qemb,
                top_k_retrieval=cfg.top_k_retrieval,
                top_k=cfg.top_k_reranking,
                smoothing=cfg.smoothing,
                diversification=True,
            )
            got = eng.search(q, top_k=cfg.top_k_reranking)
            assert len(ref) > 0, f"vacuous test: no results for {q!r}"
            assert len(got) == len(ref), q
            got_scores = np.array([r.similarity_score for r in got])
            ref_scores = np.array([r.similarity_score for r in ref])
            assert np.allclose(got_scores, ref_scores, atol=2e-4), (
                q,
                got_scores,
                ref_scores,
            )
            # doc identity parity where scores are distinct
            for g, r in zip(got, ref):
                if abs(g.similarity_score - r.similarity_score) < 1e-5:
                    pass
                assert g.doc_id == r.doc_id or abs(
                    g.similarity_score - r.similarity_score
                ) < 1e-5, q

    def test_window_selection_parity(self, built):
        art, enc, eng, cfg = built
        for q in QUERIES[:3]:
            pq = preprocess_query(q)
            ref = hybrid_search_numpy(
                art, pq, enc.encode(pq), cfg.top_k_retrieval,
                cfg.top_k_reranking, diversification=False,
            )
            got_all = eng.search_batch([q], top_k=cfg.top_k_reranking)
            eng_no_div = SearchEngine(
                art, enc, cfg.replace(diversification=False)
            )
            got = eng_no_div.search(q, top_k=cfg.top_k_reranking)
            for g, r in zip(got, ref):
                if g.doc_id == r.doc_id:
                    assert g.window_index == r.window_index

    def test_batch_equals_single(self, built):
        # batch size changes XLA matmul tiling -> 1-ulp float differences can
        # flip exact ties; require score parity and id parity off-ties.
        art, enc, eng, cfg = built
        batch = eng.search_batch(QUERIES, top_k=10)
        for q, expected in zip(QUERIES, batch):
            single = eng.search(q, top_k=10)
            ss = np.array([r.similarity_score for r in single])
            bs = np.array([r.similarity_score for r in expected])
            assert np.allclose(ss, bs, atol=1e-4), q
            for a, b, va, vb in zip(single, expected, ss, bs):
                assert a.doc_id == b.doc_id or abs(va - vb) < 1e-4

    def test_oversized_batch_chunks_and_matches(self, built):
        """Batches beyond cfg.query_batch_size must chunk into pipelined
        device dispatches, not one giant program (a 1,377-query batch at
        100k docs exceeded the slot kernels' VMEM budget — found by the
        labeled-eval run).  Results must equal the per-chunk outputs."""
        art, enc, eng, cfg = built
        small = SearchEngine(art, enc, cfg.replace(query_batch_size=4))
        queries = (QUERIES * 3)[:11]  # 11 > 4: 3 chunks, last one ragged
        got = small.search_batch(queries, top_k=10)
        want = eng.search_batch(queries, top_k=10)
        assert len(got) == len(want) == 11
        for g_list, w_list in zip(got, want):
            gs = np.array([r.similarity_score for r in g_list])
            ws = np.array([r.similarity_score for r in w_list])
            assert np.allclose(gs, ws, atol=1e-4)
            for g, w, vg, vw in zip(g_list, w_list, gs, ws):
                assert g.doc_id == w.doc_id or abs(vg - vw) < 1e-4

    def test_scores_sorted_desc(self, built):
        _, _, eng, _ = built
        res = eng.search("research square", top_k=10)
        scores = [r.similarity_score for r in res]
        assert scores == sorted(scores, reverse=True)

    def test_no_match_query(self, built):
        _, _, eng, _ = built
        res = eng.search("zzzzqqqq xxyyzz", top_k=10)
        # query augmentation appends tuebingen -> docs containing it match
        assert all(r.similarity_score >= 0 for r in res)

    def test_empty_query_no_crash(self, built):
        _, _, eng, _ = built
        eng.search("", top_k=5)


class TestDiversification:
    def test_domain_cap_applied(self, built):
        art, enc, eng, cfg = built
        res = eng.search("research law faculty", top_k=10)
        high = [r for r in res if r.similarity_score >= 0.8]
        domains = [r.domain for r in high]
        assert len(domains) == len(set(domains))


class TestUrlDedup:
    def test_query_param_urls_collapse(self):
        from modern_search_engines_project_tpu.retrieval import (
            RankedDoc,
            dedup_by_base_url,
        )

        docs = [
            RankedDoc(1, "https://a.de/p?x=1", "t", 0.9, 0.5, 0, domain="a.de"),
            RankedDoc(2, "https://a.de/p?x=2", "t", 0.8, 0.4, 0, domain="a.de"),
            RankedDoc(3, "https://a.de/q", "t", 0.7, 0.3, 0, domain="a.de"),
        ]
        out = dedup_by_base_url(docs)
        assert [d.doc_id for d in out] == [1, 3]


class TestDenseOnly:
    def test_dense_search_matches_numpy(self, built):
        art, enc, eng, cfg = built
        q = "research square law"
        pq = preprocess_query(q)
        res = eng.dense_search(q, top_k=10)
        assert len(res) == 10
        # numpy ground truth: per-doc max cosine over all chunks
        qv = enc.encode(pq)
        qv = qv / np.linalg.norm(qv)
        sims = art.chunk_emb @ qv
        doc_max = np.full(art.n_docs, -np.inf)
        np.maximum.at(doc_max, art.chunk_doc, sims)
        order = np.argsort(-doc_max)[:10]
        got_scores = np.array([r.similarity_score for r in res])
        assert np.allclose(got_scores, doc_max[order], atol=1e-4)
        for r, d in zip(res, order):
            if abs(r.similarity_score - doc_max[d]) < 1e-6:
                pass
            assert r.doc_id == art.doc_ids[d] or abs(
                r.similarity_score - doc_max[d]
            ) < 1e-4

    def test_dense_scores_descending(self, built):
        _, _, eng, _ = built
        res = eng.dense_search("ai faculty", top_k=5)
        s = [r.similarity_score for r in res]
        assert s == sorted(s, reverse=True)
