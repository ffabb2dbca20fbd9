"""Quality parity: engine-vs-reference IR metrics on a batch run.

BASELINE.md requires matching the reference's recall@10 / NDCG@10; here the
numpy reimplementation of the reference scoring IS the reference run, and
the device engine must reproduce it to metric-parity 1.0 (modulo exact
score ties).
"""

import numpy as np
import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.eval import (
    evaluate_run,
    ndcg_at_k,
    ranking_overlap_at_k,
    recall_at_k,
)
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import (
    SearchEngine,
    hybrid_search_numpy,
    preprocess_query,
)

QUERIES = {
    1: "research square law",
    2: "ai faculty cyber",
    3: "neuro tour square",
    4: "tübingen research faculty",
    5: "castleaq gardenaq universityaq",
}


@pytest.fixture(scope="module")
def runs():
    cfg = Config(
        embedding_dim=64, window_size=64, step_size=50,
        top_k_retrieval=50, top_k_reranking=10, max_query_terms=8,
    )
    enc = HashingEncoder(dim=64)
    art = IndexBuilder(enc, cfg).build(make_corpus(n_docs=80, seed=42))
    eng = SearchEngine(art, enc, cfg)

    engine_run, ref_run, ref_rels = {}, {}, {}
    for qn, q in QUERIES.items():
        got = eng.search(q, top_k=10)
        engine_run[qn] = [r.doc_id for r in got]
        pq = preprocess_query(q)
        ref = hybrid_search_numpy(
            art, pq, enc.encode(pq),
            top_k_retrieval=cfg.top_k_retrieval, top_k=10,
        )
        ref_run[qn] = [r.doc_id for r in ref]
        # graded qrels from the reference scores
        ref_rels[qn] = {
            r.doc_id: max(r.similarity_score, 0.0) for r in ref
        }
    return engine_run, ref_run, ref_rels


class TestQualityParity:
    def test_recall_at_10_is_one(self, runs):
        engine_run, ref_run, _ = runs
        for qn in QUERIES:
            relevant = set(ref_run[qn])
            assert relevant, f"vacuous: query {qn}"
            r = recall_at_k(engine_run[qn], relevant, 10)
            assert r == 1.0, (qn, engine_run[qn], ref_run[qn])

    def test_ndcg_at_10_near_one(self, runs):
        engine_run, _, ref_rels = runs
        for qn in QUERIES:
            n = ndcg_at_k(engine_run[qn], ref_rels[qn], 10)
            assert n > 0.999, (qn, n)

    def test_overlap(self, runs):
        engine_run, ref_run, _ = runs
        for qn in QUERIES:
            assert ranking_overlap_at_k(engine_run[qn], ref_run[qn], 10) == 1.0

    def test_evaluate_run_summary(self, runs):
        engine_run, ref_run, ref_rels = runs
        qrels = {
            qn: {d: 1 for d in ref_run[qn]} for qn in QUERIES
        }
        m = evaluate_run(engine_run, qrels, k=10)
        assert m["recall@10"] == 1.0
        assert m["mrr"] == 1.0
