"""Standalone /rerank endpoint (reference reranker sidecar parity):
schema, validation, and consistency with the in-engine fused device path."""

import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import SearchEngine
from modern_search_engines_project_tpu.retrieval.rerank import (
    rerank_candidates,
)
from modern_search_engines_project_tpu.serving.api import SearchService

CFG = Config(
    embedding_dim=32, window_size=32, step_size=25,
    top_k_retrieval=20, top_k_reranking=10, max_query_terms=8,
)
QUERIES = ["research law", "faculty seminar", "research faculty"]


@pytest.fixture(scope="module")
def engine():
    docs = make_corpus(n_docs=40, seed=3, min_len=40, max_len=120)
    enc = HashingEncoder(dim=32)
    return SearchEngine(IndexBuilder(enc, CFG).build(docs), enc, CFG)


def with_client(service, coro):
    async def runner():
        client = TestClient(TestServer(service.build_app()))
        await client.start_server()
        try:
            return await coro(client)
        finally:
            await client.close()

    return asyncio.run(runner())


class TestRerankFunction:
    def test_matches_fused_device_path(self, engine):
        """stage-1 scores piped through rerank_candidates must reproduce the
        engine's single fused device program (same normalization, fusion,
        positional, diversification math)."""
        for q in QUERIES:
            stage1 = engine.bm25_search(q, top_k=20, augment=False)
            assert stage1, q
            host = rerank_candidates(
                engine.art,
                engine.encoder,
                q,
                [r["doc_id"] for r in stage1],
                [r["score"] for r in stage1],
                top_k=10,
                smoothing=CFG.smoothing,
            )
            device = engine.search_batch([q], top_k=10, augment=False)[0]
            assert [r.doc_id for r in host] == [r.doc_id for r in device], q
            np.testing.assert_allclose(
                [r.similarity_score for r in host],
                [r.similarity_score for r in device],
                atol=2e-4,
            )
            assert [r.window_index for r in host] == [
                r.window_index for r in device
            ]

    def test_unknown_doc_ids_skipped(self, engine):
        out = rerank_candidates(
            engine.art, engine.encoder, "research", [999999], [1.0]
        )
        assert out == []


class TestRerankEndpoint:
    def test_schema(self, engine):
        service = SearchService(engine)

        async def body(client):
            stage1 = engine.bm25_search("research law", top_k=10,
                                        augment=False)
            resp = await client.post(
                "/rerank",
                json={
                    "doc_ids": [r["doc_id"] for r in stage1],
                    "similarities": [r["score"] for r in stage1],
                    "query": "research law",
                },
            )
            assert resp.status == 200
            data = await resp.json()
            for key in ("document_scores", "top_windows",
                        "total_documents", "total_windows"):
                assert key in data, key
            first = data["document_scores"][0]
            for key in ("doc_id", "title", "url", "similarity_score",
                        "original_similarity", "most_relevant_window"):
                assert key in first, key
            w = first["most_relevant_window"]
            for key in ("text", "similarity_score", "doc_id", "title",
                        "window_index"):
                assert key in w, key
            scores = [d["similarity_score"] for d in data["document_scores"]]
            assert scores == sorted(scores, reverse=True)

        with_client(service, body)

    def test_validation_and_unknown_ids(self, engine):
        service = SearchService(engine)

        async def body(client):
            resp = await client.post("/rerank", json={"query": "x"})
            assert resp.status == 400
            # malformed values are a client error (400), not a 500
            resp = await client.post(
                "/rerank",
                json={"doc_ids": ["abc"], "similarities": [0.5],
                      "query": "x"},
            )
            assert resp.status == 400
            resp = await client.post(
                "/rerank",
                json={"doc_ids": [123456], "similarities": [1.0],
                      "query": "x"},
            )
            assert resp.status == 401  # reference status for no docs found

        with_client(service, body)
