"""HTTP serving surface tests: endpoint schema parity with the reference."""

import asyncio
from pathlib import Path

import pytest
from aiohttp.test_utils import TestClient, TestServer

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import SearchEngine
from modern_search_engines_project_tpu.serving import (
    ExtractiveSummarizer,
    SearchService,
    extract_domain_topic,
)


class TestDomainTopic:
    def test_simple(self):
        assert extract_domain_topic("https://www.tuebingen.de/x") == "tuebingen"

    def test_subdomain(self):
        assert extract_domain_topic("https://en.wikipedia.org/wiki/X") == "wikipedia"

    def test_hyphen_domain(self):
        assert extract_domain_topic("https://uni-tuebingen.de/") == "uni-tuebingen"

    def test_empty(self):
        assert extract_domain_topic("") == "unknown"
        assert extract_domain_topic("#") == "unknown"


class TestSummarizer:
    def test_extractive_query_focus(self):
        s = ExtractiveSummarizer()
        windows = [
            "The castle of Tuebingen overlooks the Neckar river valley below. "
            "Unrelated filler sentence about nothing in particular here now.",
            "The castle museum hosts ancient cultures and is open daily today.",
        ]
        out = s.generate_summary("castle museum", windows)
        assert "castle" in out.lower()
        assert len(out) <= 700

    def test_empty_windows(self):
        assert ExtractiveSummarizer().generate_summary("x", []) == ""


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    docs = make_corpus(n_docs=40, seed=3, min_len=40, max_len=120)
    cfg = Config(
        embedding_dim=32, window_size=32, step_size=25,
        top_k_retrieval=20, top_k_reranking=10, max_query_terms=8,
    )
    enc = HashingEncoder(dim=32)
    engine = SearchEngine(IndexBuilder(enc, cfg).build(docs), enc, cfg)
    tmp = tmp_path_factory.mktemp("serving")
    qfile = tmp / "queries.txt"
    qfile.write_text("1\tresearch law\n2\tforest library\n")
    return SearchService(
        engine,
        queries_path=str(qfile),
        results_path=str(tmp / "batch_search_results.txt"),
    )


def with_client(service, coro):
    """Run an async test body against a live test server (no async plugin
    in the image, so tests drive the loop explicitly)."""

    async def runner():
        client = TestClient(TestServer(service.build_app()))
        await client.start_server()
        try:
            return await coro(client)
        finally:
            await client.close()

    return asyncio.run(runner())


class TestEndpoints:
    def test_health(self, service):
        async def body(client):
            resp = await client.get("/api/health")
            assert resp.status == 200
            data = await resp.json()
            assert data["status"] == "healthy"
            assert data["search_engine_ready"] is True

        with_client(service, body)

    def test_search_schema(self, service):
        async def body(client):
            resp = await client.post(
                "/api/search",
                json={"query": "research law faculty", "top_k": 5},
            )
            assert resp.status == 200
            data = await resp.json()
            assert "documents" in data and "llm_response" in data
            docs = data["documents"]
            assert len(docs) > 0
            first = docs[0]
            for key in ("query_id", "rank", "url", "score", "title",
                        "snippet", "domain", "doc_id"):
                assert key in first, key
            assert first["rank"] == 1
            ranks = [d["rank"] for d in docs]
            assert ranks == list(range(1, len(docs) + 1))
            scores = [d["score"] for d in docs]
            assert scores == sorted(scores, reverse=True)

        with_client(service, body)

    def test_search_empty_query_400(self, service):
        async def body(client):
            resp = await client.post("/api/search", json={"query": "  "})
            assert resp.status == 400

        with_client(service, body)

    def test_search_invalid_json_400(self, service):
        async def body(client):
            resp = await client.post("/api/search", data=b"not json")
            assert resp.status == 400

        with_client(service, body)

    def test_batch_search(self, service):
        async def body(client):
            resp = await client.post("/api/batch_search")
            assert resp.status == 200
            data = await resp.json()
            assert data["total_queries"] == 2
            assert data["total_results"] > 0
            row = data["results"][0]
            assert row["formatted_line"].count("\t") == 3
            qn, rank, url, score = row["formatted_line"].split("\t")
            assert qn == row["query_num"] and int(rank) == row["rank"]
            float(score)

        with_client(service, body)

    def test_batch_search_file(self, service):
        async def body(client):
            resp = await client.post("/api/batch_search_file")
            assert resp.status == 200
            data = await resp.json()
            lines = open(data["output_file"]).read().strip().splitlines()
            assert len(lines) == data["total_results"]
            assert all(l.count("\t") == 3 for l in lines)

        with_client(service, body)

    def test_generate_summary(self, service):
        async def body(client):
            resp = await client.post(
                "/api/generate_summary",
                json={
                    "most_relevant_windows": [
                        "The Neckar river flows through the old town daily."
                    ],
                    "query": "neckar river",
                },
            )
            assert resp.status == 200
            data = await resp.json()
            assert "response" in data

        with_client(service, body)


class TestShardedServing:
    def test_search_endpoint_on_sharded_engine(self, eight_devices, tmp_path):
        from modern_search_engines_project_tpu.parallel import make_mesh

        docs = make_corpus(n_docs=40, seed=3, min_len=40, max_len=120)
        cfg = Config(
            embedding_dim=32, window_size=32, step_size=25,
            top_k_retrieval=16, top_k_reranking=5, max_query_terms=8,
        )
        enc = HashingEncoder(dim=32)
        from modern_search_engines_project_tpu.index import IndexBuilder

        art = IndexBuilder(enc, cfg).build(docs)
        engine = SearchEngine.sharded(art, enc, make_mesh(8), cfg)
        service = SearchService(engine, queries_path=str(tmp_path / "q.txt"))

        async def body(client):
            resp = await client.post(
                "/api/search", json={"query": "research law faculty", "top_k": 5}
            )
            assert resp.status == 200
            data = await resp.json()
            assert len(data["documents"]) > 0
            assert data["documents"][0]["rank"] == 1

        with_client(service, body)


class TestReloadAndWarmup:
    def _build(self, n_docs, seed=3):
        docs = make_corpus(n_docs=n_docs, seed=seed, min_len=40, max_len=120)
        cfg = Config(
            embedding_dim=32, window_size=32, step_size=25,
            top_k_retrieval=20, top_k_reranking=10, max_query_terms=8,
        )
        enc = HashingEncoder(dim=32)
        return SearchEngine(IndexBuilder(enc, cfg).build(docs), enc, cfg)

    def test_reload_swaps_engine(self):
        """POST /api/reload rebuilds the engine via the factory and swaps
        it in; subsequent searches see the new corpus size."""
        sizes = iter([20, 50])
        factory = lambda: self._build(next(sizes))  # noqa: E731
        svc = SearchService(factory(), engine_factory=factory)
        assert svc.engine.art.n_docs == 20

        async def body(client):
            r = await client.post("/api/reload")
            assert r.status == 200
            data = await r.json()
            assert data["status"] == "reloaded" and data["n_docs"] == 50
            # the batcher routes to the NEW engine
            r = await client.post(
                "/api/search", json={"query": "research law"}
            )
            assert r.status == 200
            return None

        with_client(svc, body)
        assert svc.engine.art.n_docs == 50
        assert svc.batcher.engine is svc.engine

    def test_reload_without_factory_409(self):
        svc = SearchService(self._build(20))

        async def body(client):
            r = await client.post("/api/reload")
            assert r.status == 409

        with_client(svc, body)

    def test_reload_failure_keeps_old_engine(self):
        def boom():
            raise RuntimeError("disk gone")

        svc = SearchService(self._build(20), engine_factory=boom)
        old = svc.engine

        async def body(client):
            r = await client.post("/api/reload")
            assert r.status == 500

        with_client(svc, body)
        assert svc.engine is old

    def test_query_cache_hits_skip_device(self):
        """Repeated identical queries are served from the LRU cache (no
        second device batch), responses byte-identical apart from
        query_id; /api/reload clears the cache."""
        sizes = iter([30, 30])
        factory = lambda: self._build(next(sizes))  # noqa: E731
        svc = SearchService(factory(), engine_factory=factory)

        async def body(client):
            r1 = await (await client.post(
                "/api/search", json={"query": "research law"}
            )).json()
            calls_after_first = svc.batcher.device_batches
            r2 = await (await client.post(
                "/api/search", json={"query": "research law"}
            )).json()
            assert svc.batcher.device_batches == calls_after_first
            assert svc._cache_hits == 1
            strip = lambda d: [  # noqa: E731
                {k: v for k, v in doc.items() if k != "query_id"}
                for doc in d["documents"]
            ]
            assert strip(r1) == strip(r2)
            assert r1["llm_response"] == r2["llm_response"]
            # reload invalidates
            assert (await client.post("/api/reload")).status == 200
            assert len(svc._query_cache) == 0
            await (await client.post(
                "/api/search", json={"query": "research law"}
            )).json()
            assert svc.batcher.device_batches == calls_after_first + 1

        with_client(svc, body)

    def test_query_cache_disabled(self):
        svc = SearchService(self._build(20), query_cache_size=0)

        async def body(client):
            for _ in range(2):
                await client.post(
                    "/api/search", json={"query": "research law"}
                )
            assert svc._cache_hits == 0 and len(svc._query_cache) == 0

        with_client(svc, body)

    def test_query_cache_lru_eviction(self):
        svc = SearchService(self._build(20), query_cache_size=2)

        async def body(client):
            for q in ("a law", "b law", "c law"):
                await client.post("/api/search", json={"query": q})
            assert len(svc._query_cache) == 2
            assert ("a law", 10) not in svc._query_cache

        with_client(svc, body)

    def test_profile_endpoint_captures_trace(self, tmp_path):
        svc = SearchService(self._build(20), trace_root=str(tmp_path))
        out = str(tmp_path / "trace")

        async def body(client):
            # client-supplied paths are ignored; only the sanitized label
            # picks a subdirectory under the server's trace_root
            r = await client.post(
                "/api/profile",
                json={
                    "queries": ["research law"],
                    "label": "trace",
                    "out_dir": "/definitely/not/honored",
                },
            )
            assert r.status == 200
            data = await r.json()
            assert data["trace_dir"] == out and data["wall_seconds"] > 0
            # a plugins/profile/<ts>/ dir with at least one trace artifact
            found = list(Path(out).rglob("*"))
            assert any(p.is_file() for p in found), found

        with_client(svc, body)

    def test_admin_token_gates_profile_and_reload(self):
        svc = SearchService(self._build(20), admin_token="s3cret")

        async def body(client):
            r = await client.post("/api/profile", json={})
            assert r.status == 403
            r = await client.post("/api/reload")
            assert r.status == 403
            # with the token, reload reaches its normal no-factory 409
            r = await client.post(
                "/api/reload", headers={"X-Admin-Token": "s3cret"}
            )
            assert r.status == 409

        with_client(svc, body)

    def test_profile_endpoint_rejects_bad_queries(self):
        svc = SearchService(self._build(20))

        async def body(client):
            r = await client.post("/api/profile", json={"queries": [1, 2]})
            assert r.status == 400

        with_client(svc, body)

    def test_warmup_compiles_hot_shapes(self):
        eng = self._build(30)
        n = eng.warmup(batch_sizes=(1, 4))
        # 2 single + 2 batch + 1 all-distinct batch (vocab is large enough)
        assert n == 5
        # warmed engine still answers correctly
        assert isinstance(eng.search("research law", top_k=5), list)


class TestReloadUnderLoad:
    def test_soak_search_with_concurrent_reloads(self):
        """200 concurrent searches with 5 index reloads mid-flight: every
        response must be 200 and well-formed — in-flight batches finish on
        the engine they started on (the batcher pins it per batch)."""
        import itertools

        sizes = itertools.cycle([30, 40, 50])
        docs = make_corpus(n_docs=30, seed=3, min_len=40, max_len=120)
        cfg = Config(
            embedding_dim=32, window_size=32, step_size=25,
            top_k_retrieval=20, top_k_reranking=10, max_query_terms=8,
        )

        def factory():
            enc = HashingEncoder(dim=32)
            corpus = make_corpus(
                n_docs=next(sizes), seed=3, min_len=40, max_len=120
            )
            return SearchEngine(IndexBuilder(enc, cfg).build(corpus), enc, cfg)

        svc = SearchService(factory(), engine_factory=factory,
                            query_cache_size=0)

        async def body(client):
            queries = [f"research law {i % 7}" for i in range(200)]

            async def one(q):
                r = await client.post("/api/search", json={"query": q})
                assert r.status == 200, await r.text()
                data = await r.json()
                assert "documents" in data
                return len(data["documents"])

            async def reloader():
                for _ in range(5):
                    await asyncio.sleep(0.05)
                    r = await client.post("/api/reload")
                    assert r.status == 200

            sem = asyncio.Semaphore(32)

            async def guarded(q):
                async with sem:
                    return await one(q)

            results, _ = await asyncio.gather(
                asyncio.gather(*(guarded(q) for q in queries)),
                reloader(),
            )
            assert all(n >= 1 for n in results)

        with_client(svc, body)


class TestSummarizerRedundancy:
    def test_near_duplicate_sentences_not_repeated(self):
        """Overlapping windows repeat the same sentence under different
        prefixes; the summary must not contain it twice."""
        s = ExtractiveSummarizer()
        core = "The castle of Tuebingen overlooks the Neckar river and the old town."
        windows = [
            f"Hohentuebingen Castle {core} The museum is inside the walls.",
            f"{core} Visitors climb up from the market square every day.",
        ]
        out = s.generate_summary("castle neckar", windows)
        assert out.count("overlooks the Neckar river") == 1, out

    def test_distinct_sentences_still_picked(self):
        s = ExtractiveSummarizer()
        windows = [
            "The castle hosts the museum of ancient cultures upstairs. "
            "The Neckar river flows below the castle hill all year round.",
        ]
        out = s.generate_summary("castle neckar museum", windows)
        assert "museum" in out and "Neckar river flows" in out


class TestIntrospectionEndpoints:
    def test_term_stats(self, service):
        async def body(client):
            # pick a term that's definitely indexed
            art = service.engine.art
            term = next(iter(art.vocab.term_to_id))
            r = await client.get(f"/api/terms/{term}")
            assert r.status == 200
            data = await r.json()
            assert data["term"] == term
            assert data["doc_freq"] >= 1 and "idf" in data

            r404 = await client.get("/api/terms/zzzznotaterm")
            assert r404.status == 404

        with_client(service, body)

    def test_document_terms(self, service):
        async def body(client):
            doc_id = service.engine.art.doc_ids[0]
            r = await client.get(f"/api/document/{doc_id}/terms?top_n=5")
            assert r.status == 200
            data = await r.json()
            assert data["doc_id"] == doc_id
            assert 1 <= len(data["terms"]) <= 5
            assert {"term", "impact"} <= set(data["terms"][0])

            assert (
                await client.get("/api/document/99999999/terms")
            ).status == 404
            assert (
                await client.get("/api/document/notanint/terms")
            ).status == 400

        with_client(service, body)
