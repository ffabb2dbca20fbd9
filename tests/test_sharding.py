"""Sharded (multi-chip) serving vs single-device engine: result parity.

Runs on the 8-virtual-CPU-device mesh (conftest) — the TPU-native answer to
"test multi-node without a cluster" (SURVEY.md §4c).
"""

import numpy as np
import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.parallel import make_mesh
from modern_search_engines_project_tpu.retrieval import SearchEngine

QUERIES = [
    "research square law",
    "ai faculty cyber",
    "tübingen research faculty",
]


@pytest.fixture(scope="module")
def engines(eight_devices):
    docs = make_corpus(n_docs=100, seed=11, min_len=30, max_len=150)
    cfg = Config(
        embedding_dim=32,
        window_size=32,
        step_size=25,
        top_k_retrieval=40,
        top_k_reranking=10,
        max_query_terms=8,
    )
    enc = HashingEncoder(dim=32)
    art = IndexBuilder(enc, cfg).build(docs)
    single = SearchEngine(art, enc, cfg)
    mesh = make_mesh(8)
    sharded = SearchEngine.sharded(art, enc, mesh, cfg)
    return single, sharded


class TestShardedParity:
    def test_mesh_has_8_devices(self, engines):
        _, sharded = engines
        assert sharded.didx.n_shards == 8

    def test_hybrid_results_match(self, engines):
        single, sharded = engines
        for q in QUERIES:
            r1 = single.search(q, top_k=10)
            r2 = sharded.search(q, top_k=10)
            assert len(r1) > 0, f"vacuous: {q!r}"
            assert len(r1) == len(r2), q
            s1 = np.array([r.similarity_score for r in r1])
            s2 = np.array([r.similarity_score for r in r2])
            assert np.allclose(s1, s2, atol=2e-4), (q, s1, s2)
            for a, b in zip(r1, r2):
                assert a.doc_id == b.doc_id or abs(
                    a.similarity_score - b.similarity_score
                ) < 1e-4, q

    def test_bm25_results_match(self, engines):
        single, sharded = engines
        for q in QUERIES:
            r1 = single.bm25_search(q, top_k=30)
            r2 = sharded.bm25_search(q, top_k=30)
            assert len(r1) > 0
            assert len(r1) == len(r2), q
            v1 = np.array([r["score"] for r in r1])
            v2 = np.array([r["score"] for r in r2])
            assert np.allclose(v1, v2, atol=1e-4), q

    def test_batch_path(self, engines):
        _, sharded = engines
        res = sharded.search_batch(QUERIES, top_k=5)
        assert len(res) == 3
        for r in res:
            scores = [d.similarity_score for d in r]
            assert scores == sorted(scores, reverse=True)

    def test_dense_search_matches(self, engines):
        single, sharded = engines
        for q in QUERIES:
            r1 = single.dense_search(q, top_k=10)
            r2 = sharded.dense_search(q, top_k=10)
            assert len(r1) == len(r2) > 0, q
            s1 = np.array([r.similarity_score for r in r1])
            s2 = np.array([r.similarity_score for r in r2])
            assert np.allclose(s1, s2, atol=2e-4), (q, s1, s2)
            for a, b in zip(r1, r2):
                assert a.doc_id == b.doc_id or abs(
                    a.similarity_score - b.similarity_score
                ) < 1e-4, q

    def test_window_ids_global(self, engines):
        single, sharded = engines
        for q in QUERIES[:1]:
            r1 = single.search(q, top_k=10)
            r2 = sharded.search(q, top_k=10)
            m1 = {r.doc_id: r.window_index for r in r1}
            m2 = {r.doc_id: r.window_index for r in r2}
            for doc in set(m1) & set(m2):
                assert m1[doc] == m2[doc]


class TestShardedBucketLayout:
    """VERDICT r1 #5: the sharded dense layout must match the single-chip
    bucketed layout's memory behavior — exact strides per chunk-count
    bucket, not one max-stride slot for the whole shard."""

    @pytest.fixture(scope="class")
    def skewed(self, eight_devices):
        # skewed chunks/doc: most docs 1 window, a few giants with 10 —
        # the single-stride layout would pad EVERY doc to stride 10
        docs = make_corpus(n_docs=96, seed=23, min_len=10, max_len=25)
        giants = make_corpus(n_docs=4, seed=24, min_len=2000, max_len=2500)
        for i, g in enumerate(giants):
            docs.append(
                type(g)(1000 + i, f"https://giant{i}.de/x", g.title, g.text)
            )
        cfg = Config(
            embedding_dim=32,
            window_size=32,
            step_size=25,
            top_k_retrieval=40,
            top_k_reranking=10,
            max_query_terms=8,
        )
        enc = HashingEncoder(dim=32)
        art = IndexBuilder(enc, cfg).build(docs)
        return art, enc, cfg

    def test_memory_tracks_chunks_not_max_stride(self, skewed):
        from modern_search_engines_project_tpu.parallel.sharding import (
            ShardedDeviceIndex,
        )

        art, enc, cfg = skewed
        mesh = make_mesh(8)
        sidx = ShardedDeviceIndex.from_artifacts(art, mesh, cfg)
        n_chunk_counts = sorted({int(n) for n in art.doc_n_chunks})
        assert len(sidx.buckets) == len(n_chunk_counts)
        # chunk rows per shard bank: [S, n, cnt_pad, dim] -> S * n * cnt_pad
        total_rows = sum(
            e.shape[0] * e.shape[1] * e.shape[2] for e in sidx.bucket_emb
        )
        max_stride = max(n_chunk_counts)
        # the old single-stride layout pays max_stride for EVERY doc slot;
        # the bucketed one pays real chunks + bounded alignment overhead
        # (each bucket 128-padded per shard for the fused stats kernel's
        # lane tiling, + one DOC_BLOCK absorb in the smallest bucket)
        from modern_search_engines_project_tpu.retrieval.device_index import (
            DOC_BLOCK,
        )

        align_rows = sidx.n_shards * (
            sum(128 * n for n, _ in sidx.buckets)
            + DOC_BLOCK * min(n for n, _ in sidx.buckets)
        )
        assert total_rows <= art.n_chunks + align_rows, (
            total_rows, art.n_chunks, align_rows,
        )
        # at any corpus size the alignment overhead must stay below what
        # the single-stride layout wastes on ONE shard's worth of slots
        old_layout_rows = sidx.n_shards * sidx.d_loc * max_stride
        assert total_rows < old_layout_rows, (total_rows, old_layout_rows)

    def test_skewed_parity_with_single_chip(self, skewed):
        art, enc, cfg = skewed
        single = SearchEngine(art, enc, cfg)
        sharded = SearchEngine.sharded(art, enc, make_mesh(8), cfg)
        for q in QUERIES:
            r1 = single.search(q, top_k=10)
            r2 = sharded.search(q, top_k=10)
            assert len(r1) == len(r2), q
            s1 = np.array([r.similarity_score for r in r1])
            s2 = np.array([r.similarity_score for r in r2])
            assert np.allclose(s1, s2, atol=2e-4), (q, s1, s2)
            for a, b in zip(r1, r2):
                assert a.doc_id == b.doc_id or abs(
                    a.similarity_score - b.similarity_score
                ) < 1e-4, q


class TestDeploymentMeshes:
    """2-D (dp, shard) meshes: dp replicates the index for query-batch data
    parallelism; shard partitions documents.  All shapes must reproduce the
    single-chip results exactly."""

    @pytest.mark.parametrize("dp,shard", [(8, 1), (2, 4), (4, 2)])
    def test_2d_mesh_matches_single(self, engines, dp, shard):
        from modern_search_engines_project_tpu.parallel.sharding import (
            make_mesh_2d,
        )

        single, _ = engines
        art, cfg = single.art, single.cfg
        enc = single.encoder
        eng2d = SearchEngine.sharded(art, enc, make_mesh_2d(dp, shard), cfg)
        assert eng2d.didx.n_shards == shard
        # batch path exercises the dp split (batch 6 pads to dp multiple)
        res_b = eng2d.search_batch(QUERIES * 2, top_k=10)
        ref_b = single.search_batch(QUERIES * 2, top_k=10)
        for a_list, b_list in zip(res_b, ref_b):
            assert len(a_list) == len(b_list)
            for a, b in zip(a_list, b_list):
                assert a.doc_id == b.doc_id or abs(
                    a.similarity_score - b.similarity_score
                ) < 1e-4
        # single query (B=1 < dp: padding path)
        r1 = single.search(QUERIES[0], top_k=10)
        r2 = eng2d.search(QUERIES[0], top_k=10)
        s1 = np.array([r.similarity_score for r in r1])
        s2 = np.array([r.similarity_score for r in r2])
        assert np.allclose(s1, s2, atol=2e-4)
        # bm25-only and dense-only paths
        b1 = single.bm25_search(QUERIES[0], top_k=20)
        b2 = eng2d.bm25_search(QUERIES[0], top_k=20)
        assert np.allclose(
            [r["score"] for r in b1], [r["score"] for r in b2], atol=1e-4
        )
        d1 = single.dense_search(QUERIES[0], top_k=10)
        d2 = eng2d.dense_search(QUERIES[0], top_k=10)
        assert np.allclose(
            [r.similarity_score for r in d1],
            [r.similarity_score for r in d2],
            atol=2e-4,
        )


class TestShardedPallas:
    def test_sharded_pallas_matches_scatter(self, engines, eight_devices):
        import numpy as np

        from modern_search_engines_project_tpu.parallel.sharding import (
            ShardedEngineBackend,
        )

        single, sharded = engines
        art, cfg = single.art, single.cfg
        mesh = sharded.didx.mesh
        pallas_backend = ShardedEngineBackend(
            art, mesh, cfg, use_pallas=True
        )
        assert pallas_backend._interpret  # CPU -> interpreter mode
        term_ids, qtf, processed = single.prepare_queries(QUERIES)
        qvec = single.encode_queries(processed)
        out_p = [np.asarray(x) for x in pallas_backend.rank(term_ids, qtf, qvec)]
        out_s = [np.asarray(x) for x in sharded._backend.rank(term_ids, qtf, qvec)]
        # same candidates, same fused scores
        assert np.allclose(out_p[1], out_s[1], atol=1e-4)
        same = out_p[0] == out_s[0]
        close = np.abs(out_p[1] - out_s[1]) < 1e-4
        assert np.all(same | close)

    @pytest.mark.parametrize("variant", ["sublane", "wide_i8"])
    def test_sharded_udedup_matches_scatter(
        self, engines, eight_devices, monkeypatch, variant
    ):
        """Both U-dedup kernel variants, dispatched through the sharded
        backend's gate, must match the scatter backend exactly."""
        import numpy as np

        from modern_search_engines_project_tpu.parallel.sharding import (
            ShardedEngineBackend,
        )
        from modern_search_engines_project_tpu.retrieval import bm25_pallas

        single, sharded = engines
        art, cfg = single.art, single.cfg
        mesh = sharded.didx.mesh
        pallas_backend = ShardedEngineBackend(
            art, mesh, cfg, use_pallas=True
        )
        monkeypatch.setattr(
            bm25_pallas, "udedup_plan", lambda u, b, nnz=None: variant
        )
        term_ids, qtf, processed = single.prepare_queries(QUERIES)
        qvec = single.encode_queries(processed)
        out_p = [
            np.asarray(x) for x in pallas_backend.rank(term_ids, qtf, qvec)
        ]
        assert variant in pallas_backend._ranker_ud  # gate actually fired
        out_s = [
            np.asarray(x)
            for x in sharded._backend.rank(term_ids, qtf, qvec)
        ]
        assert np.allclose(out_p[1], out_s[1], atol=1e-4)
        same = out_p[0] == out_s[0]
        close = np.abs(out_p[1] - out_s[1]) < 1e-4
        assert np.all(same | close)


class TestCollectiveAccounting:
    def test_collective_ops_in_compiled_program(self, engines):
        """The merge cost in bench.py's v5e-8 projection is analytic
        (README "Multi-chip projection formula"); this pins the compiled
        sharded program's actual collectives on the virtual 8-device mesh:
        the per-shard top-k merge must lower to all-gather ops (candidate
        ids + scores ride ICI), and their count is small and fixed — no
        hidden per-shard chatter."""
        single, sharded = engines
        backend = sharded._backend
        captured = {}
        orig = backend._ranker

        def capture(*a, **k):
            captured["args"] = a
            return orig(*a, **k)

        backend._ranker = capture
        try:
            sharded.search_batch(["research law"], top_k=5)
        finally:
            backend._ranker = orig
        hlo = orig.lower(*captured["args"]).compile().as_text()
        n_all_gather = hlo.count("all-gather(") + hlo.count(
            "all-gather-start("
        )
        assert n_all_gather >= 1, "top-k merge must use all-gather"
        # bounded: the merge gathers a handful of candidate arrays (ids,
        # scores, windows, aux) once per step, not per bucket/chunk
        assert n_all_gather <= 16, f"unexpected collective count: {n_all_gather}"
        # nothing routes through host transfers
        assert "outfeed" not in hlo and "infeed" not in hlo


class TestShardedQueryEncode:
    """Data-parallel query encode over the index mesh (ShardedQueryEncoder):
    the dp forward + ICI all_gather must equal the single-device encode, and
    a sharded engine with a JaxEncoder must route queries through it."""

    @pytest.fixture(scope="class")
    def tiny_jax_encoder(self, eight_devices):
        from modern_search_engines_project_tpu.models.encoder import (
            EncoderConfig,
            JaxEncoder,
        )

        cfg = EncoderConfig(
            vocab_size=512, dim=32, n_layers=2, n_heads=4,
            mlp_ratio=2, max_len=16,
        )
        return JaxEncoder(cfg, seed=3, batch_size=8)

    @pytest.mark.parametrize("n_texts", [8, 5, 17])
    def test_matches_single_device_encode(self, tiny_jax_encoder, n_texts):
        from modern_search_engines_project_tpu.parallel.sharding import (
            ShardedQueryEncoder,
        )

        enc = tiny_jax_encoder
        texts = [f"castle river doc {i} neckar museum" for i in range(n_texts)]
        mesh = make_mesh(8)
        senc = ShardedQueryEncoder(enc, mesh)
        got = np.asarray(senc(texts))
        want = enc.encode_batch(texts)
        want = want / np.maximum(
            np.linalg.norm(want, axis=1, keepdims=True), 1e-12
        )
        assert got.shape == (n_texts, enc.dim)
        assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()

    def test_2d_mesh_batch_order_preserved(self, tiny_jax_encoder):
        from modern_search_engines_project_tpu.parallel.sharding import (
            ShardedQueryEncoder,
            make_mesh_2d,
        )

        enc = tiny_jax_encoder
        texts = [f"query number {i}" for i in range(16)]
        senc = ShardedQueryEncoder(enc, make_mesh_2d(4, 2))
        got = np.asarray(senc(texts))
        want = enc.encode_batch(texts)
        want = want / np.maximum(
            np.linalg.norm(want, axis=1, keepdims=True), 1e-12
        )
        assert np.allclose(got, want, atol=1e-5)

    def test_sharded_engine_routes_through_mesh_encode(
        self, tiny_jax_encoder, eight_devices
    ):
        docs = make_corpus(n_docs=60, seed=7, min_len=30, max_len=120)
        cfg = Config(
            embedding_dim=32,
            window_size=16,
            step_size=12,
            top_k_retrieval=30,
            top_k_reranking=10,
            max_query_terms=8,
        )
        enc = tiny_jax_encoder
        art = IndexBuilder(enc, cfg).build(docs)
        single = SearchEngine(art, enc, cfg)
        sharded = SearchEngine.sharded(art, enc, make_mesh(8), cfg)
        assert getattr(sharded, "_sharded_enc", None) is not None
        assert getattr(single, "_sharded_enc", None) is None
        for q in ("research square law", "tübingen research faculty"):
            r1 = single.search(q, top_k=8)
            r2 = sharded.search(q, top_k=8)
            assert len(r1) > 0, f"vacuous: {q!r}"
            assert len(r1) == len(r2)
            s1 = np.array([r.similarity_score for r in r1])
            s2 = np.array([r.similarity_score for r in r2])
            assert np.allclose(s1, s2, atol=2e-4), (q, s1, s2)
