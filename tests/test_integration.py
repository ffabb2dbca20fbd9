"""End-to-end integration: crawl -> store -> index build -> search -> eval.

The whole reference pipeline (SURVEY.md §1 L0-L5) exercised in one offline
test using the fake website transport: pages are crawled and scored, the
index is built through the sharded pipeline, the engine serves hybrid
queries, and the batch harness writes the course-format results file.
"""

import asyncio

import pytest

from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.crawler import Crawler, CrawlStore, Fetcher
from modern_search_engines_project_tpu.eval import run_batch_file
from modern_search_engines_project_tpu.index.pipeline import BuildPipeline
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import SearchEngine
from test_crawler import FakeTransport, _page


@pytest.fixture(scope="module")
def site():
    pages = {}
    topics = [
        ("castle", "The castle museum overlooks the river and the old town."),
        ("punting", "Punt boats and the Stocherkahn race on the Neckar."),
        ("library", "The university library lends books to every student."),
        ("chocolate", "The chocolate festival ChocolART fills the market."),
        ("cyber", "Cyber Valley hosts ai research and machine learning."),
        ("medicine", "The university clinic teaches medicine and biology."),
    ]
    urls = [f"https://site{i}.de/{t}" for i, (t, _) in enumerate(topics)]
    for i, (topic, extra) in enumerate(topics):
        links = [urls[(i + 1) % len(urls)], urls[(i + 2) % len(urls)]]
        pages[urls[i]] = _page(f"{topic.title()} page", links, extra * 4)
    return urls, pages


def test_full_pipeline(site, tmp_path):
    urls, pages = site
    # 1. crawl
    store = CrawlStore(str(tmp_path / "crawl.sqlite"))
    crawler = Crawler(store, Fetcher(FakeTransport(pages)), max_pages=20)
    crawler.robots.delay = lambda d: 0.0
    n = asyncio.run(crawler.run(seeds=[urls[0]]))
    assert n >= len(urls), f"crawled only {n}"
    assert store.n_documents() >= len(urls)

    # 2. index build (sharded + resumable)
    cfg = Config(
        embedding_dim=32, window_size=32, step_size=25,
        top_k_retrieval=20, top_k_reranking=10, max_query_terms=8,
    )
    enc = HashingEncoder(dim=32)
    pipe = BuildPipeline(enc, str(tmp_path / "idx"), cfg, shard_size=3)
    art = pipe.build(list(store.iter_documents(min_score=0.0)))
    assert art.n_docs >= len(urls)
    stats = art.index_stats()
    assert stats["unique_terms"] > 10

    # 3. hybrid search finds the right page
    engine = SearchEngine(art, enc, cfg)
    res = engine.search("chocolate festival market", top_k=5)
    assert res, "no results"
    assert any("chocolate" in r.url for r in res[:2]), [r.url for r in res]

    # ("punting" appears in every page's boilerplate -> negative idf; use
    # the page's discriminative terms instead)
    res2 = engine.search("library books student", top_k=5)
    assert any("library" in r.url for r in res2[:2]), [r.url for r in res2]

    # 4. batch eval file in course format
    qfile = tmp_path / "queries.txt"
    qfile.write_text("1\tchocolate festival market\n2\tlibrary books student\n")
    out = tmp_path / "results.txt"
    rows = run_batch_file(engine, str(qfile), str(out), top_k=5)
    lines = out.read_text().strip().splitlines()
    assert len(lines) == len(rows) > 0
    assert all(len(l.split("\t")) == 4 for l in lines)

    # 5. resume property: a second build run reuses shards (no rebuild)
    import os

    shard0 = os.path.join(str(tmp_path / "idx"), "shards", "shard_00000.pkl")
    mtime = os.path.getmtime(shard0)
    pipe.build(list(store.iter_documents(min_score=0.0)))
    assert os.path.getmtime(shard0) == mtime
