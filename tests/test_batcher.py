"""Dynamic online query batching (VERDICT r1 #7): concurrent /api/search
requests must coalesce into few device batches, and results must match
unbatched search exactly."""

import asyncio
import time
from concurrent.futures import ThreadPoolExecutor

import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import SearchEngine
from modern_search_engines_project_tpu.serving.batcher import QueryBatcher


class StubEngine:
    """Fixed per-CALL latency, batch-size invariant — models the TPU device
    call (one q x bank matmul regardless of batch size)."""

    def __init__(self, call_latency_s=0.05):
        self.latency = call_latency_s
        self.calls = []

        class _Cfg:
            top_k_reranking = 10
            query_batch_size = 64

        self.cfg = _Cfg()

    def rank_batch(self, queries, augment=True):
        """Device half: fixed-latency call, returns a raw handle."""
        self.calls.append(list(queries))
        time.sleep(self.latency)
        return list(queries)

    def finish_batch(self, raw, queries, top_k=10):
        assert raw == list(queries)  # raw handle routed with its batch
        return [[f"{q}::r{i}" for i in range(top_k)] for q in queries]

    def search_batch(self, queries, top_k=10):
        return self.finish_batch(self.rank_batch(queries), queries, top_k)

    def search(self, query, top_k=10):
        return self.search_batch([query], top_k)[0]


def run_concurrent(batcher, queries, top_k=5):
    async def body():
        return await asyncio.gather(
            *(batcher.search(q, top_k) for q in queries)
        )

    return asyncio.run(body())


class TestCoalescing:
    def test_concurrent_requests_share_device_calls(self):
        eng = StubEngine()
        pool = ThreadPoolExecutor(max_workers=1)
        batcher = QueryBatcher(eng, pool, max_batch=64, window_ms=3.0)
        queries = [f"query {i}" for i in range(64)]
        results = run_concurrent(batcher, queries)
        assert len(results) == 64
        # 64 concurrent requests must NOT make 64 device calls
        assert len(eng.calls) <= 4, len(eng.calls)
        assert batcher.stats()["coalescing_ratio"] >= 16

    def test_throughput_vs_single_worker(self):
        """The VERDICT acceptance bar: >5x single-worker throughput under
        64-way concurrency (stub device with 50 ms batch-invariant calls)."""
        eng = StubEngine(call_latency_s=0.05)
        pool = ThreadPoolExecutor(max_workers=1)
        batcher = QueryBatcher(eng, pool, max_batch=64, window_ms=3.0)
        queries = [f"query {i}" for i in range(64)]

        t0 = time.time()
        run_concurrent(batcher, queries)
        batched_dt = time.time() - t0

        single_dt = 64 * eng.latency  # one 50 ms device call per request
        assert batched_dt * 5 < single_dt, (batched_dt, single_dt)

    def test_results_routed_to_correct_request(self):
        eng = StubEngine(call_latency_s=0.01)
        pool = ThreadPoolExecutor(max_workers=1)
        batcher = QueryBatcher(eng, pool, max_batch=8, window_ms=2.0)
        queries = [f"q{i}" for i in range(20)]
        results = run_concurrent(batcher, queries, top_k=3)
        for q, r in zip(queries, results):
            assert r == [f"{q}::r0", f"{q}::r1", f"{q}::r2"]

    def test_per_request_top_k_respected(self):
        eng = StubEngine(call_latency_s=0.01)
        pool = ThreadPoolExecutor(max_workers=1)
        batcher = QueryBatcher(eng, pool, max_batch=8, window_ms=2.0)

        async def body():
            return await asyncio.gather(
                batcher.search("a", 2), batcher.search("b", 7)
            )

        ra, rb = asyncio.run(body())
        assert len(ra) == 2 and len(rb) == 7

    def test_engine_failure_propagates(self):
        class Boom(StubEngine):
            def rank_batch(self, queries, augment=True):
                raise RuntimeError("device on fire")

        batcher = QueryBatcher(
            Boom(), ThreadPoolExecutor(max_workers=1), max_batch=8,
            window_ms=1.0,
        )
        with pytest.raises(RuntimeError, match="device on fire"):
            run_concurrent(batcher, ["a", "b"])


class TestRealEngineParity:
    def test_batched_matches_unbatched(self):
        docs = make_corpus(n_docs=30, seed=5, min_len=30, max_len=90)
        cfg = Config(
            embedding_dim=32, window_size=32, step_size=25,
            top_k_retrieval=20, top_k_reranking=10, max_query_terms=8,
        )
        enc = HashingEncoder(dim=32)
        engine = SearchEngine(IndexBuilder(enc, cfg).build(docs), enc, cfg)
        batcher = QueryBatcher(
            engine, ThreadPoolExecutor(max_workers=1), max_batch=16,
            window_ms=3.0,
        )
        queries = ["research law", "forest library", "market festival"] * 3
        batched = run_concurrent(batcher, queries, top_k=5)
        for q, ranked in zip(queries, batched):
            direct = engine.search(q, top_k=5)
            assert [r.doc_id for r in ranked] == [r.doc_id for r in direct]
            assert all(
                abs(a.similarity_score - b.similarity_score) < 1e-6
                for a, b in zip(ranked, direct)
            )
