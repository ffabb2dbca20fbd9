"""CLI smoke tests: crawl -> index build -> artifacts load round trip."""

import asyncio
import json
import os

import pytest

from modern_search_engines_project_tpu.crawler import Crawler, CrawlStore, Fetcher
from test_crawler import FakeTransport, _page


@pytest.fixture()
def crawl_db(tmp_path):
    pages = {
        "https://uni.de/a": _page("Uni A", ["https://uni.de/b"]),
        "https://uni.de/b": _page("Uni B", []),
    }
    db = str(tmp_path / "crawl.sqlite")
    store = CrawlStore(db)
    crawler = Crawler(store, Fetcher(FakeTransport(pages)), max_pages=10)
    crawler.robots.delay = lambda d: 0.0
    asyncio.run(crawler.run(seeds=["https://uni.de/a"]))
    store.close()
    return db


class TestIndexCli:
    def test_build_and_load(self, crawl_db, tmp_path):
        from modern_search_engines_project_tpu.index.__main__ import main

        out = str(tmp_path / "artifacts")
        main(["--db", crawl_db, "--out", out, "--shard-size", "1"])
        assert os.path.exists(os.path.join(out, "arrays.npz"))
        assert os.path.exists(os.path.join(out, "manifest.json"))
        with open(os.path.join(out, "manifest.json")) as f:
            manifest = json.load(f)
        assert manifest["n_docs"] == 2

        from modern_search_engines_project_tpu.index import load_artifacts

        art = load_artifacts(out)
        assert art.n_docs == 2
        # and it serves
        from modern_search_engines_project_tpu.models import HashingEncoder
        from modern_search_engines_project_tpu.retrieval import SearchEngine

        eng = SearchEngine(art, HashingEncoder(dim=art.config.embedding_dim))
        eng.search("university")  # no crash

    def test_force_rebuild(self, crawl_db, tmp_path):
        from modern_search_engines_project_tpu.index.__main__ import main

        out = str(tmp_path / "artifacts")
        main(["--db", crawl_db, "--out", out])
        shard = os.path.join(out, "shards", "shard_00000.pkl")
        m1 = os.path.getmtime(shard)
        main(["--db", crawl_db, "--out", out, "--force"])
        assert os.path.getmtime(shard) != m1
