"""Fault injection: the reference has none (SURVEY §5.3) — these tests
prove the failure-detection machinery actually recovers, not just exists.

Covers: flaky transport (intermittent connection failures retried within
the per-code budget, permanent failures dropped + logged), and serving
isolation (a device failure 500s one request without wedging the app)."""

import asyncio

import pytest

from modern_search_engines_project_tpu.crawler import (
    Crawler,
    CrawlStore,
    Fetcher,
)
from test_crawler import FakeTransport, _page


class FlakyTransport(FakeTransport):
    """Raises ConnectionError the first `fail_times` times a URL is hit."""

    def __init__(self, pages, fail_times=None, dead=None, **kw):
        super().__init__(pages, **kw)
        self.fail_times = dict(fail_times or {})
        self.dead = set(dead or [])
        self.attempts = {}

    async def get(self, url):
        self.attempts[url] = self.attempts.get(url, 0) + 1
        if url in self.dead:
            raise ConnectionError("host permanently unreachable")
        left = self.fail_times.get(url, 0)
        if left > 0:
            self.fail_times[url] = left - 1
            raise ConnectionError("transient network failure")
        return await super().get(url)


@pytest.fixture()
def site():
    return {
        "https://uni.de/a": _page("A", ["https://uni.de/b",
                                        "https://other.de/c"]),
        "https://uni.de/b": _page("B", []),
        "https://other.de/c": _page("C", []),
    }


def _run(crawler, seeds):
    crawler.robots.delay = lambda d: 0.0
    # zero retry delays so transient-failure retries are immediate
    orig = crawler.policy.record

    def fast(url, status, retry_after, location):
        d = orig(url, status, retry_after, location)
        if d.action == "retry":
            d.delay = 0.0
        return d

    crawler.policy.record = fast
    return asyncio.run(crawler.run(seeds=seeds))


class TestFlakyNetwork:
    def test_transient_failures_retried_to_success(self, site, tmp_path):
        # two consecutive connection failures stay inside the reference's
        # connection-failure budget (3), so the page must still land
        t = FlakyTransport(site, fail_times={"https://uni.de/b": 2})
        store = CrawlStore(str(tmp_path / "c.sqlite"))
        crawler = Crawler(store, Fetcher(t), max_pages=10)
        _run(crawler, ["https://uni.de/a"])
        urls = {d.url for d in store.iter_documents()}
        assert "https://uni.de/b" in urls
        assert t.attempts["https://uni.de/b"] >= 3

    def test_dead_host_dropped_and_logged(self, site, tmp_path):
        t = FlakyTransport(site, dead={"https://other.de/c"})
        store = CrawlStore(str(tmp_path / "c.sqlite"))
        crawler = Crawler(store, Fetcher(t), max_pages=10)
        _run(crawler, ["https://uni.de/a"])
        urls = {d.url for d in store.iter_documents()}
        assert "https://uni.de/a" in urls and "https://uni.de/b" in urls
        assert "https://other.de/c" not in urls
        # budget exhausted -> disallowed + error-logged, crawl completed
        assert "https://other.de/c" in crawler.frontier.disallowed_urls
        errors = store.recent_errors()
        assert any("other.de/c" in r[0] for r in errors)

    def test_crawl_survives_every_domain_flaky(self, site, tmp_path):
        t = FlakyTransport(
            site, fail_times={u: 1 for u in site}
        )
        store = CrawlStore(str(tmp_path / "c.sqlite"))
        crawler = Crawler(store, Fetcher(t), max_pages=10)
        n = _run(crawler, ["https://uni.de/a"])
        assert n >= 3  # everything recovered


class TestServingIsolation:
    def test_device_failure_isolated_per_request(self):
        from aiohttp.test_utils import TestClient, TestServer

        from modern_search_engines_project_tpu.serving.api import SearchService

        class Engine:
            calls = 0

            class cfg:
                top_k_reranking = 10
                query_batch_size = 8

            times = None

            def rank_batch(self, queries, augment=True):
                Engine.calls += 1
                if Engine.calls == 1:
                    raise RuntimeError("transient device failure")
                return queries

            def finish_batch(self, raw, queries, top_k=10):
                return [[] for _ in queries]

        service = SearchService(Engine())

        async def body():
            client = TestClient(TestServer(service.build_app()))
            await client.start_server()
            try:
                r1 = await client.post("/api/search", json={"query": "x"})
                assert r1.status == 500
                # the app is not wedged: the next request succeeds
                r2 = await client.post("/api/search", json={"query": "x"})
                assert r2.status == 200
            finally:
                await client.close()

        asyncio.run(body())
