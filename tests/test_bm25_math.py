"""BM25 math vs a hand-computed corpus + builder invariants."""

import math

import numpy as np

from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import Document, IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import bm25_search_numpy


def build(docs_texts, cfg=None):
    cfg = cfg or Config(embedding_dim=32, max_query_terms=8)
    docs = [
        Document(doc_id=100 + i, url=f"https://site{i}.de/page", title="", text=t)
        for i, t in enumerate(docs_texts)
    ]
    b = IndexBuilder(HashingEncoder(dim=cfg.embedding_dim), cfg)
    return b.build(docs), cfg


class TestBM25HandComputed:
    def test_single_term_corpus(self):
        # 5 docs; "castle" appears in docs 0 (2x), 1 (1x); doc lengths differ
        texts = [
            "castle castle river",  # len 3
            "castle museum",  # len 2
            "river museum park",  # len 3
            "park river",  # len 2
            "museum museum",  # len 2
        ]
        art, cfg = build(texts)
        N, df = 5, 2
        idf = math.log((N - df + 0.5) / (df + 0.5))
        avgdl = (3 + 2 + 3 + 2 + 2) / 5
        k1, b = 1.2, 0.75

        def score(tf, dl):
            return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

        idx, vals = bm25_search_numpy(art, "castle", top_k=10)
        got = {art.doc_ids[i] - 100: v for i, v in zip(idx, vals)}
        assert set(got) == {0, 1}
        assert np.isclose(got[0], score(2, 3), atol=1e-5)
        assert np.isclose(got[1], score(1, 2), atol=1e-5)
        # doc 0 has tf=2 -> higher score despite longer doc
        assert got[0] > got[1]

    def test_multi_term_additive_and_qtf(self):
        texts = [
            "castle river",
            "castle park",
            "river park",
            "museum garden",
            "garden tower",
            "tower museum",
        ]
        art, _ = build(texts)
        i1, v1 = bm25_search_numpy(art, "castle river", top_k=10)
        # doc 0 contains both -> sum of both impacts, ranked first
        assert art.doc_ids[i1[0]] - 100 == 0
        # repeated query term doubles its contribution (qtf multiply)
        i2, v2 = bm25_search_numpy(art, "castle castle", top_k=10)
        i3, v3 = bm25_search_numpy(art, "castle", top_k=10)
        assert np.isclose(v2[0], 2 * v3[0], atol=1e-5)

    def test_negative_idf_for_ubiquitous_term(self):
        # term in >half the docs -> idf < 0 (reference keeps raw log form)
        texts = ["common a b", "common c d", "common e f", "rare x y"]
        art, _ = build(texts)
        tid = art.vocab.get("common")
        assert tid >= 0 and art.idf[tid] < 0

    def test_negative_total_scores_are_dropped_min_score_parity(self):
        # A query whose every term has idf < 0 produces only negative doc
        # totals, and the reference DROPS them: BM25.search filters
        # ``bm25_score >= min_score`` with min_score=0.0
        # (bm25_indexer.py:383,480-481) — zero results, NOT a ranking of
        # negative scores.  The engine's keyed-score admissibility
        # contract (matched & score >= 0, bm25_pallas._accum_keyed)
        # reproduces exactly that.  Deliberate parity, not a bug: checked
        # against the reference source in round 5 after a common-term
        # query on a synthetic corpus returned empty.
        texts = [f"common word{i}" for i in range(8)] + ["rare thing"]
        art, _ = build(texts)
        tid = art.vocab.get("common")
        assert art.idf[tid] < 0  # precondition: df 8/9 > N/2
        idx, vals = bm25_search_numpy(art, "common", top_k=10)
        assert len(idx) == 0  # matched docs all scored < 0 -> filtered
        # a mixed query stays ranked by the SIGNED total: the negative
        # common-term contribution still penalizes docs containing it
        idx2, vals2 = bm25_search_numpy(art, "rare common", top_k=10)
        assert len(idx2) >= 1
        assert all(v >= 0.0 for v in vals2)

    def test_impact_ordering(self):
        texts = ["apple apple apple", "apple b c d e f g h i j", "apple k"]
        art, _ = build(texts)
        tid = art.vocab.get("apple")
        s, e = int(art.indptr[tid]), int(art.indptr[tid + 1])
        imp = np.abs(art.post_impact[s:e])
        assert np.all(np.diff(imp) <= 1e-7)  # descending |impact|

    def test_index_stats(self):
        texts = ["castle river", "castle park"]
        art, _ = build(texts)
        st = art.index_stats()
        assert st["total_documents"] == 2
        assert st["unique_terms"] == 3
        assert st["total_postings"] == 4
        assert np.isclose(st["avg_doc_length"], 2.0)


class TestArtifactsRoundtrip:
    def test_save_load(self, tmp_path):
        from modern_search_engines_project_tpu.index import (
            load_artifacts,
            save_artifacts,
        )

        art, _ = build(["castle river neckar", "museum park tübingen"])
        save_artifacts(art, str(tmp_path / "idx"))
        art2 = load_artifacts(str(tmp_path / "idx"))
        assert art2.n_docs == art.n_docs
        assert np.allclose(art2.post_impact, art.post_impact)
        assert np.allclose(art2.chunk_emb, art.chunk_emb)
        assert art2.urls == art.urls
        assert art2.vocab.term_to_id == art.vocab.term_to_id
        assert art2.avgdl == art.avgdl
        i1, v1 = bm25_search_numpy(art, "castle", top_k=5)
        i2, v2 = bm25_search_numpy(art2, "castle", top_k=5)
        assert list(i1) == list(i2) and np.allclose(v1, v2)
