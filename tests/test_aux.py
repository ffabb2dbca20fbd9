"""Aux subsystems: rate limiter, timing, preprocessor merge, introspection."""

import asyncio
import logging

import pytest

from modern_search_engines_project_tpu.crawler.preprocess import merge_crawls
from modern_search_engines_project_tpu.crawler.storage import CrawlStore
from modern_search_engines_project_tpu.serving.rate_limiter import RateLimiter
from modern_search_engines_project_tpu.utils import StageTimes, stage_timer

EN = (
    "The castle and the university are the main attractions of the old town "
    "and they are visited by many students every year."
)
DE = (
    "Die Burg und die Universität sind die wichtigsten Sehenswürdigkeiten "
    "der Altstadt und sie werden von vielen Studenten besucht."
)


class TestRateLimiter:
    def test_admits_under_limit(self):
        rl = RateLimiter(requests_per_minute=3)
        results = [asyncio.run(rl.acquire(now=100.0 + i)) for i in range(3)]
        assert all(results)

    def test_blocks_over_limit(self):
        rl = RateLimiter(requests_per_minute=2)
        assert asyncio.run(rl.acquire(now=100.0))
        assert asyncio.run(rl.acquire(now=100.5))
        assert not asyncio.run(rl.acquire(now=101.0))

    def test_window_slides(self):
        rl = RateLimiter(requests_per_minute=1)
        assert asyncio.run(rl.acquire(now=100.0))
        assert not asyncio.run(rl.acquire(now=130.0))
        assert asyncio.run(rl.acquire(now=161.0))

    def test_disabled_always_admits(self):
        rl = RateLimiter(requests_per_minute=0, enabled=False)
        assert asyncio.run(rl.acquire())

    def test_status(self):
        rl = RateLimiter(requests_per_minute=4)
        asyncio.run(rl.acquire(now=100.0))
        st = rl.status(now=100.1)
        assert st["current_usage"] == 1
        assert st["utilization"] == 0.25


class TestTiming:
    def test_stage_timer_records(self, caplog):
        times = StageTimes()
        with caplog.at_level(logging.INFO, logger="timing"):
            with stage_timer("bm25", times):
                pass
        assert "bm25" in times.totals
        rep = times.report()
        assert rep["bm25"]["count"] == 1
        assert any("bm25 in" in r.message for r in caplog.records)


class TestPreprocessMerge:
    def _store(self, tmp_path, name, rows):
        st = CrawlStore(str(tmp_path / name))
        st.upsert_documents(rows)
        return st

    def test_merge_dedup_and_language(self, tmp_path):
        hist = self._store(
            tmp_path, "hist.sqlite",
            [{"url": "https://a.de/page", "title": "t", "text": EN,
              "tue_eng_score": 0.5}],
        )
        inc = self._store(
            tmp_path, "inc.sqlite",
            [
                # duplicate of historical modulo protocol/trailing slash
                {"url": "http://a.de/page/", "title": "t", "text": EN},
                {"url": "https://b.de/new", "title": "t", "text": EN},
                # in-batch duplicate modulo query string... (normalize keeps
                # path only up to query? normalize strips query)
                {"url": "https://b.de/new?utm=1", "title": "t", "text": EN},
                {"url": "https://c.de/german", "title": "t", "text": DE},
            ],
        )
        report = merge_crawls(hist, inc)
        assert report.incoming == 4
        assert report.dropped_duplicate_historical == 1
        assert report.dropped_duplicate_batch == 1
        assert report.dropped_language == 1
        assert report.merged == 1
        urls = {d.url for d in hist.iter_documents(min_score=-1)}
        assert "https://b.de/new" in urls
        assert "https://c.de/german" not in urls


class TestServingIntrospection:
    def test_stats_and_config_endpoints(self, tmp_path):
        from aiohttp.test_utils import TestClient, TestServer

        from corpus_util import make_corpus
        from modern_search_engines_project_tpu.config import Config
        from modern_search_engines_project_tpu.index import IndexBuilder
        from modern_search_engines_project_tpu.models import HashingEncoder
        from modern_search_engines_project_tpu.retrieval import SearchEngine
        from modern_search_engines_project_tpu.serving import SearchService

        cfg = Config(embedding_dim=32, window_size=32, step_size=25,
                     top_k_retrieval=10, top_k_reranking=5, max_query_terms=8)
        enc = HashingEncoder(dim=32)
        eng = SearchEngine(
            IndexBuilder(enc, cfg).build(make_corpus(10, 2, min_len=20,
                                                     max_len=40)),
            enc, cfg,
        )
        service = SearchService(eng)

        async def run():
            client = TestClient(TestServer(service.build_app()))
            await client.start_server()
            try:
                r = await client.get("/api/stats")
                stats = await r.json()
                assert stats["total_documents"] == 10
                assert stats["unique_terms"] > 0
                r = await client.get("/api/config")
                conf = await r.json()
                assert conf["smoothing"] == 0.15
                assert conf["k1"] == 1.2
                r = await client.get("/api/rate-limit-status")
                st = await r.json()
                assert st["enabled"] is False
            finally:
                await client.close()

        asyncio.run(run())
