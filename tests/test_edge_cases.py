"""Robustness: degenerate corpora, empty queries, tiny indexes, sharded serving."""

import numpy as np
import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import Document, IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import SearchEngine

CFG = Config(
    embedding_dim=32, window_size=16, step_size=12,
    top_k_retrieval=10, top_k_reranking=5, max_query_terms=8,
)


def _engine(docs, cfg=CFG):
    enc = HashingEncoder(dim=cfg.embedding_dim)
    return SearchEngine(IndexBuilder(enc, cfg).build(docs), enc, cfg)


class TestDegenerateCorpora:
    def test_single_doc_negative_idf(self):
        # N=1: every term has df==N -> idf<0 -> the reference's min_score=0
        # rule admits nothing. Faithful emptiness, no crash.
        eng = _engine([Document(1, "https://a.de/x", "title", "castle river neckar")])
        assert eng.search("castle", top_k=5) == []
        assert eng.bm25_search("castle", top_k=5) == []

    def test_single_matching_doc_in_pair(self):
        eng = _engine([
            Document(1, "https://a.de/x", "t", "castle river neckar"),
            Document(2, "https://a.de/y", "t", "pizza dough flour"),
        ])
        res = eng.bm25_search("castle", top_k=5)
        assert [r["doc_id"] for r in res] == [1]

    def test_empty_text_doc(self):
        eng = _engine([
            Document(1, "https://a.de/x", "", ""),
            Document(2, "https://a.de/y", "t", "castle museum park"),
        ])
        res = eng.search("castle", top_k=5)
        assert [r.doc_id for r in res] == [2]

    def test_doc_with_only_stopwords(self):
        eng = _engine([
            Document(1, "https://a.de/x", "", "the and of to in is"),
            Document(2, "https://a.de/y", "", "castle museum"),
        ])
        assert [r.doc_id for r in eng.search("castle", top_k=5)] == [2]

    def test_unicode_heavy_doc(self):
        eng = _engine([
            Document(1, "https://a.de/x", "tÜbInGeN", "Tübingen café naïve ß"),
            Document(2, "https://a.de/y", "t", "castle"),
        ])
        res = eng.bm25_search("tübingen", top_k=5)
        assert res and res[0]["doc_id"] == 1

    def test_very_long_doc_truncated(self):
        long_doc = Document(1, "https://a.de/x", "t", "castle " * 500_000)
        eng = _engine([long_doc, Document(2, "https://a.de/y", "t", "park")])
        res = eng.bm25_search("castle", top_k=5)
        assert res[0]["doc_id"] == 1

    def test_chunk_cap_respected(self):
        # doc long enough for far more than max_chunks_per_doc windows
        text = " ".join(f"w{i}" for i in range(1000))
        eng = _engine([Document(1, "https://a.de/x", "", text)])
        assert eng.art.doc_n_chunks[0] == CFG.max_chunks_per_doc

    def test_identical_docs_tie_handling(self):
        docs = [
            Document(i, f"https://a.de/{i}", "t", "castle museum river")
            for i in range(4)
        ] + [
            Document(10 + i, f"https://b.de/o{i}", "t",
                     f"pizza dough flour salt batch{i}")
            for i in range(5)  # keep df("castle") < N/2 so idf > 0
        ]
        eng = _engine(docs)
        res = eng.bm25_search("castle", top_k=10)
        assert len(res) == 4  # identical docs all admitted
        scores = [r["score"] for r in res]
        assert max(scores) - min(scores) < 1e-6  # exact ties handled


class TestQueryEdgeCases:
    @pytest.fixture(scope="class")
    def eng(self):
        return _engine(make_corpus(30, seed=4, min_len=30, max_len=80))

    def test_query_only_stopwords(self, eng):
        eng.search("the and of", top_k=5)  # no crash

    def test_query_with_punctuation(self, eng):
        eng.search("castle!!! ... (museum)?", top_k=5)

    def test_query_more_terms_than_cap(self, eng):
        q = " ".join(f"term{i}" for i in range(30))
        eng.search(q, top_k=5)  # silently truncates to max_query_terms

    def test_repeated_terms_qtf(self, eng):
        r1 = eng.bm25_search("forest", top_k=5)
        r2 = eng.bm25_search("forest forest", top_k=5)
        if r1 and r2:
            assert abs(r2[0]["score"] - 2 * r1[0]["score"]) < 1e-4


class TestShardedSmall:
    def test_sharded_on_tiny_corpus(self, eight_devices):
        from modern_search_engines_project_tpu.parallel import make_mesh

        docs = [
            Document(i, f"https://s{i}.de/p", "t", f"castle doc{i} river")
            for i in range(3)  # fewer docs than shards
        ] + [
            Document(10 + i, f"https://t{i}.de/p", "t",
                     f"pizza chess flour board opening{i}")
            for i in range(5)  # keep df("castle") < N/2
        ]
        enc = HashingEncoder(dim=32)
        art = IndexBuilder(enc, CFG).build(docs)
        eng = SearchEngine.sharded(art, enc, make_mesh(8), CFG)
        res = eng.bm25_search("castle", top_k=5)
        assert len(res) == 3


class TestEmptyIndex:
    def test_empty_index_all_paths(self):
        eng = _engine([])
        assert eng.search("castle", top_k=5) == []
        assert eng.bm25_search("castle") == []
        assert eng.dense_search("castle", top_k=5) == []

    def test_empty_index_pallas(self):
        enc = HashingEncoder(dim=CFG.embedding_dim)
        art = IndexBuilder(enc, CFG).build([])
        eng = SearchEngine(art, enc, CFG, use_pallas=True)
        assert eng.search("castle", top_k=5) == []


class TestUseBm25Flag:
    def test_dense_only_index(self):
        # reference USE_BM25=False gates the sparse build (config.py:24)
        cfg = CFG.replace(use_bm25=False)
        docs = [
            Document(1, "https://a.de/x", "t", "castle river neckar hills"),
            Document(2, "https://a.de/y", "t", "pizza dough flour salt"),
        ]
        eng = _engine(docs, cfg)
        assert eng.art.n_terms == 0
        assert eng.bm25_search("castle") == []
        assert eng.search("castle", top_k=5) == []  # hybrid needs stage 1
        dense = eng.dense_search("castle river", top_k=2)
        assert dense and dense[0].doc_id == 1
