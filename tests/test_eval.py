"""Batch eval harness + IR metrics tests."""

import math

import pytest

from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.eval import (
    evaluate_run,
    mrr,
    ndcg_at_k,
    parse_queries_file,
    precision_at_k,
    ranking_overlap_at_k,
    recall_at_k,
    run_batch,
    run_batch_file,
)
from corpus_util import make_corpus
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import SearchEngine


class TestMetrics:
    def test_recall(self):
        assert recall_at_k([1, 2, 3], {2, 9}, 3) == 0.5
        assert recall_at_k([1, 2], set(), 2) == 0.0

    def test_precision(self):
        assert precision_at_k([1, 2, 3, 4], {1, 4}, 4) == 0.5

    def test_mrr(self):
        assert mrr([5, 7, 2], {2}) == pytest.approx(1 / 3)
        assert mrr([5], {9}) == 0.0

    def test_ndcg_perfect(self):
        rels = {1: 3, 2: 2, 3: 1}
        assert ndcg_at_k([1, 2, 3], rels, 3) == pytest.approx(1.0)

    def test_ndcg_reversed_lower(self):
        rels = {1: 3, 2: 2, 3: 1}
        assert ndcg_at_k([3, 2, 1], rels, 3) < 1.0

    def test_overlap(self):
        assert ranking_overlap_at_k([1, 2, 3], [3, 2, 1], 3) == 1.0
        assert ranking_overlap_at_k([1, 2], [3, 4], 2) == 0.0

    def test_evaluate_run(self):
        run = {1: [10, 11], 2: [20, 21]}
        qrels = {1: {10: 1}, 2: {99: 1}}
        m = evaluate_run(run, qrels, k=2)
        assert m["recall@2"] == 0.5
        assert m["mrr"] == 0.5


class TestQueriesFile:
    def test_parse(self):
        content = "1\tcastle tour\n\n2\tfood and drinks\nbadline\nx\tbad\n"
        qs = parse_queries_file(content)
        assert qs == [(1, "castle tour"), (2, "food and drinks")]


@pytest.fixture(scope="module")
def engine():
    docs = make_corpus(n_docs=30, seed=7, min_len=40, max_len=80, n_domains=9)
    cfg = Config(
        embedding_dim=32, top_k_retrieval=20, top_k_reranking=10,
        window_size=32, step_size=25, max_query_terms=8,
    )
    enc = HashingEncoder(dim=32)
    return SearchEngine(IndexBuilder(enc, cfg).build(docs), enc, cfg)


class TestBatchEval:
    def test_run_batch_and_file(self, engine, tmp_path):
        qpath = tmp_path / "queries.txt"
        qpath.write_text("1\tforest library\n2\tcafe bakery\n")
        opath = tmp_path / "out.txt"
        results = run_batch_file(engine, str(qpath), str(opath), top_k=5)
        assert results
        lines = opath.read_text().strip().splitlines()
        assert len(lines) == len(results)
        first = lines[0].split("\t")
        assert first[0] == "1" and first[1] == "1"
        assert first[2].startswith("https://")
        float(first[3])
        # ranks are 1..n contiguous per query
        ranks = [int(l.split("\t")[1]) for l in lines if l.split("\t")[0] == "1"]
        assert ranks == list(range(1, len(ranks) + 1))

    def test_batch_matches_individual(self, engine):
        queries = [(1, "forest library"), (2, "cafe bakery"), (3, "boat mountain")]
        rows = run_batch(engine, queries, top_k=5, batch_size=2)
        for qn, qt in queries:
            expected = engine.search(qt, top_k=5)
            got = [r for r in rows if r.query_num == qn]
            assert [g.url for g in got] == [e.url for e in expected]
