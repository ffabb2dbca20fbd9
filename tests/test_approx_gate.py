"""Quality-gated approx top-k default (VERDICT r2 #6): "auto" enables
lax.approx_max_k only at corpus sizes where exact top_k dominates the
latency budget, so the out-of-box config meets the 1M p50 target without
manual flags while small corpora keep exact parity."""

import numpy as np

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config, resolve_approx
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import SearchEngine


class TestResolveApprox:
    def test_auto_below_threshold_is_exact(self):
        cfg = Config()
        assert cfg.approx_candidates == "auto"
        assert resolve_approx(cfg, 100_000) is False

    def test_auto_above_threshold_is_approx(self):
        assert resolve_approx(Config(), 500_000) is True
        assert resolve_approx(Config(), 2_000_000) is True

    def test_explicit_booleans_pass_through(self):
        assert resolve_approx(Config(approx_candidates=True), 10) is True
        assert resolve_approx(
            Config(approx_candidates=False), 10_000_000
        ) is False

    def test_custom_threshold(self):
        cfg = Config(approx_auto_min_docs=1000)
        assert resolve_approx(cfg, 999) is False
        assert resolve_approx(cfg, 1000) is True


class TestEngineGate:
    def _build(self, cfg):
        docs = make_corpus(n_docs=80, seed=9, min_len=30, max_len=100)
        enc = HashingEncoder(dim=32)
        art = IndexBuilder(enc, cfg).build(docs)
        return SearchEngine(art, enc, cfg)

    def test_small_corpus_stays_exact(self):
        cfg = Config(
            embedding_dim=32, window_size=32, step_size=25,
            top_k_retrieval=30, top_k_reranking=10, max_query_terms=8,
        )
        eng = self._build(cfg)
        assert eng._approx is False

    def test_gated_engine_still_ranks(self):
        """With the threshold forced below the corpus size, the engine
        takes the approx path end-to-end and rankings stay near-exact
        (identical on CPU, where approx_max_k lowers to exact sort)."""
        base = dict(
            embedding_dim=32, window_size=32, step_size=25,
            top_k_retrieval=30, top_k_reranking=10, max_query_terms=8,
        )
        exact = self._build(Config(**base, approx_candidates=False))
        gated = self._build(
            Config(**base, approx_auto_min_docs=1)
        )
        assert gated._approx is True
        for q in ("research law", "castle river"):
            a = [r.url for r in exact.search(q)]
            b = [r.url for r in gated.search(q)]
            assert a == b
