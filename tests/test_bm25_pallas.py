"""Pallas blocked BM25 kernel vs scatter path vs numpy reference.

Runs the kernel in interpreter mode on CPU (SURVEY.md §4b: kernel tests vs
a dense reference) — the compiled path is exercised on real TPU by bench.py.
"""

import numpy as np
import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import (
    SearchEngine,
    bm25_search_numpy,
    preprocess_query,
)
from modern_search_engines_project_tpu.retrieval.device_index import (
    DeviceIndex,
    build_blocked_postings,
)

QUERIES = ["research square law", "ai faculty cyber", "tübingen research faculty"]


@pytest.fixture(scope="module")
def built():
    cfg = Config(
        embedding_dim=32,
        window_size=32,
        step_size=25,
        top_k_retrieval=30,
        top_k_reranking=10,
        max_query_terms=8,
    )
    enc = HashingEncoder(dim=32)
    art = IndexBuilder(enc, cfg).build(make_corpus(60, seed=5))
    return art, enc, cfg


class TestBlockedLayout:
    def test_blocked_roundtrip(self, built):
        art, _, _ = built
        n_docs_pad = 128
        bt, bi, bl = build_blocked_postings(
            np.asarray(art.indptr),
            np.asarray(art.post_docs),
            np.asarray(art.post_impact),
            n_docs_pad,
            posting_chunk=256,
        )
        # every real posting appears exactly once with its impact
        total = (bt >= 0).sum()
        assert total == art.post_docs.shape[0]
        # reconstruct per-doc impact sums and compare with CSR
        want = np.zeros(n_docs_pad)
        np.add.at(want, art.post_docs, art.post_impact)
        got = np.zeros(n_docs_pad)
        for b in range(bt.shape[0]):
            mask = bt[b] >= 0
            np.add.at(got, b * 128 + bl[b][mask], bi[b][mask])
        assert np.allclose(got, want, atol=1e-4)


class TestPallasParity:
    def test_engine_pallas_matches_scatter(self, built):
        art, enc, cfg = built
        eng_scatter = SearchEngine(art, enc, cfg, use_pallas=False)
        eng_pallas = SearchEngine(art, enc, cfg, use_pallas=True)
        assert eng_pallas._pallas_interpret  # CPU -> interpreter mode
        for q in QUERIES[:2]:
            r1 = eng_scatter.search(q, top_k=10)
            r2 = eng_pallas.search(q, top_k=10)
            assert len(r1) > 0
            assert len(r1) == len(r2)
            s1 = np.array([r.similarity_score for r in r1])
            s2 = np.array([r.similarity_score for r in r2])
            assert np.allclose(s1, s2, atol=1e-4), (q, s1, s2)
            for a, b in zip(r1, r2):
                assert a.doc_id == b.doc_id or abs(
                    a.similarity_score - b.similarity_score
                ) < 1e-4

    def test_bm25_only_pallas_matches_numpy(self, built):
        art, enc, cfg = built
        eng = SearchEngine(art, enc, cfg, use_pallas=True)
        for q in QUERIES:
            pq = preprocess_query(q)
            ref_idx, ref_vals = bm25_search_numpy(art, pq, top_k=30)
            got = eng.bm25_search(pq, top_k=30)
            assert len(got) == len(ref_idx), q
            got_vals = np.sort([g["score"] for g in got])[::-1]
            assert np.allclose(
                got_vals, np.sort(ref_vals)[::-1], atol=1e-4
            ), q
            assert {g["doc_id"] for g in got} == {
                art.doc_ids[i] for i in ref_idx
            }


class TestUdedupKernel:
    def test_kernel_matches_base(self, built):
        import jax.numpy as jnp

        from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
            bm25_score_blocked,
            bm25_score_blocked_udedup,
            dedup_query_terms,
        )
        from modern_search_engines_project_tpu.retrieval.device_index import (
            DeviceIndex,
        )

        art, _, cfg = built
        d = DeviceIndex.from_artifacts(art, cfg)
        rng = np.random.default_rng(3)
        B, T = 8, cfg.max_query_terms
        tids = rng.integers(-1, art.n_terms, (B, T)).astype(np.int32)
        tids[1] = tids[0]  # shared-term queries (the dedup win case)
        tids[3, :4] = tids[2, :4]
        qtf = np.where(tids >= 0, rng.integers(1, 4, (B, T)), 0).astype(
            np.float32
        )
        base = np.asarray(
            bm25_score_blocked(
                d.blk_terms, d.blk_impact, d.blk_local,
                jnp.asarray(tids), jnp.asarray(qtf),
                n_docs_pad=d.n_docs_pad, interpret=True,
            )
        )
        uids, w = dedup_query_terms(tids, qtf)
        ud = np.asarray(
            bm25_score_blocked_udedup(
                d.blk_terms, d.blk_impact, d.blk_local,
                jnp.asarray(uids), jnp.asarray(w),
                n_docs_pad=d.n_docs_pad, interpret=True,
            )
        )
        np.testing.assert_allclose(ud, base, atol=1e-4)

    def test_engine_udedup_batch_matches_scatter(self, built):
        """A multi-query batch takes the U-dedup path (heuristic) and must
        match the scatter reference exactly."""
        art, enc, cfg = built
        eng_scatter = SearchEngine(art, enc, cfg, use_pallas=False)
        eng_ud = SearchEngine(
            art, enc, cfg.replace(bm25_udedup="always"), use_pallas=True
        )
        batch = QUERIES[:3] * 3  # shared terms across the batch
        r_ud = eng_ud.search_batch(batch, top_k=10)
        r_sc = eng_scatter.search_batch(batch, top_k=10)
        for q, a_list, b_list in zip(batch, r_ud, r_sc):
            assert len(a_list) == len(b_list), q
            for a, b in zip(a_list, b_list):
                assert a.doc_id == b.doc_id or abs(
                    a.similarity_score - b.similarity_score
                ) < 1e-4, q

    def test_heuristic_prep(self):
        from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
            dedup_query_terms,
        )

        tids = np.array([[5, 9, -1], [5, 2, -1]], np.int32)
        qtf = np.array([[2.0, 1.0, 0.0], [1.0, 3.0, 0.0]], np.float32)
        uids, w = dedup_query_terms(tids, qtf)
        assert len(uids) == 128 and set(uids[:3]) == {2, 5, 9}
        u = {int(t): i for i, t in enumerate(uids[:3])}
        assert w[0, u[5]] == 2.0 and w[0, u[9]] == 1.0 and w[0, u[2]] == 0.0
        assert w[1, u[5]] == 1.0 and w[1, u[2]] == 3.0
        # presence rows
        assert w[2, u[5]] == 1.0 and w[2, u[2]] == 0.0
        assert w[3, u[2]] == 1.0


class TestBucketedDenseSearch:
    def test_dense_search_pallas_matches_scatter(self, built):
        """With the packed bank host-side, dense_search runs over buckets
        (ops.dense_rank_buckets) and must match the packed-layout path."""
        art, enc, cfg = built
        eng_packed = SearchEngine(art, enc, cfg, use_pallas=False)
        eng_buckets = SearchEngine(art, enc, cfg, use_pallas=True)
        # bucketed path serves: the packed duplicate bank is not even
        # built (build_packed_bank auto-off — it only feeds fallbacks)
        assert eng_buckets.didx.chunk_emb is None
        for q in QUERIES[:2]:
            r1 = eng_packed.dense_search(q, top_k=10)
            r2 = eng_buckets.dense_search(q, top_k=10)
            assert len(r1) == len(r2) > 0, q
            for a, b in zip(r1, r2):
                assert abs(a.similarity_score - b.similarity_score) < 1e-4
                assert a.doc_id == b.doc_id or abs(
                    a.similarity_score - b.similarity_score
                ) < 1e-4, q


class TestApproxCandidates:
    def test_approx_matches_exact_on_small_corpus(self, built):
        art, enc, cfg = built
        exact = SearchEngine(art, enc, cfg, use_pallas=True)
        approx = SearchEngine(
            art, enc, cfg.replace(approx_candidates=True), use_pallas=True
        )
        for q in QUERIES[:2]:
            r1 = exact.search(q, top_k=10)
            r2 = approx.search(q, top_k=10)
            # with candidates << corpus, approx selection is exact
            assert [r.doc_id for r in r1] == [r.doc_id for r in r2]


class TestSlotLayout:
    def test_slot_roundtrip(self, built):
        """Every posting appears exactly once in its doc's column; per-doc
        impact sums match the CSR."""
        from modern_search_engines_project_tpu.retrieval.device_index import (
            build_slot_postings,
        )

        art, _, _ = built
        n_docs_pad = 128
        terms, impact, col_unperm = build_slot_postings(
            np.asarray(art.indptr),
            np.asarray(art.post_docs),
            np.asarray(art.post_impact),
            n_docs_pad,
        )
        total = sum(int((t >= 0).sum()) for t in terms)
        assert total == art.post_docs.shape[0]
        want = np.zeros(n_docs_pad)
        np.add.at(want, art.post_docs, art.post_impact)
        # per-class per-group column sums, gathered into dense doc order
        col_sums = np.concatenate(
            [im.sum(axis=1).reshape(-1) for im in impact]
        )
        got = col_sums[col_unperm]
        assert np.allclose(got, want, atol=1e-4)

    def test_slot_kernel_matches_scatter(self, built):
        """bm25_score_slots (plain + udedup) vs the scatter path, exact."""
        import jax.numpy as jnp

        from modern_search_engines_project_tpu.retrieval import ops
        from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
            bm25_score_slots,
            bm25_score_slots_udedup,
            dedup_query_terms,
        )

        art, _, cfg = built
        d = DeviceIndex.from_artifacts(art, cfg)
        rng = np.random.default_rng(7)
        B, T = 4, cfg.max_query_terms
        tids = rng.integers(-1, art.n_terms, (B, T)).astype(np.int32)
        tids[1] = tids[0]
        qtf = np.where(tids >= 0, rng.integers(1, 4, (B, T)), 0).astype(
            np.float32
        )
        ref = np.asarray(
            ops.bm25_score_batch(
                d.indptr,
                jnp.asarray(np.asarray(d.post_docs)),
                jnp.asarray(np.asarray(d.post_impact)),
                tids,
                qtf,
                n_docs_pad=d.n_docs_pad,
                posting_cap=d.posting_cap,
            )
        )[:, : d.n_docs_pad]
        # scatter scores are in ORIGINAL doc order; slots in permuted order
        perm = d.doc_perm
        real = perm >= 0
        ref_perm = np.full_like(ref, -1.0)
        ref_perm[:, real] = ref[:, perm[real]]
        got = np.asarray(
            bm25_score_slots(
                d.slot_terms, d.slot_impact, d.col_unperm,
                jnp.asarray(tids), jnp.asarray(qtf), interpret=True,
            )
        )[:, : d.n_docs_pad]
        np.testing.assert_allclose(got, ref_perm, atol=1e-5)
        uids, w = dedup_query_terms(tids, qtf)
        got_ud = np.asarray(
            bm25_score_slots_udedup(
                d.slot_terms, d.slot_impact, d.col_unperm,
                jnp.asarray(uids), jnp.asarray(w), interpret=True,
            )
        )[:, : d.n_docs_pad]
        np.testing.assert_allclose(got_ud, ref_perm, atol=1e-5)

    def test_blocked_layout_still_serves(self, built):
        """cfg.bm25_layout='blocked' keeps the old kernel path working."""
        art, enc, cfg = built
        eng_scatter = SearchEngine(art, enc, cfg, use_pallas=False)
        eng_blk = SearchEngine(
            art, enc, cfg.replace(bm25_layout="blocked"), use_pallas=True
        )
        for q in QUERIES[:2]:
            r1 = eng_scatter.search(q, top_k=10)
            r2 = eng_blk.search(q, top_k=10)
            assert len(r1) == len(r2) > 0
            for a, b in zip(r1, r2):
                assert a.doc_id == b.doc_id or abs(
                    a.similarity_score - b.similarity_score
                ) < 1e-4, q


class TestExactTopkBlocked:
    def test_matches_lax_topk_distinct_values(self):
        """Above the blocked-scheme gate, values AND indices must match
        single-stage lax.top_k when scores are distinct."""
        import numpy as np
        import jax.numpy as jnp
        from jax import lax

        from modern_search_engines_project_tpu.retrieval.ops import exact_topk

        rng = np.random.default_rng(4)
        # > 131072 gate, NOT a multiple of the 8000 block (pad path)
        scores = rng.permutation(200_001).astype(np.float32)[None, :]
        scores = np.concatenate([scores, scores[:, ::-1]], axis=0)
        v1, i1 = lax.top_k(jnp.asarray(scores), 1000)
        v2, i2 = exact_topk(jnp.asarray(scores), 1000)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_small_axis_uses_single_stage(self):
        import numpy as np
        import jax.numpy as jnp
        from jax import lax

        from modern_search_engines_project_tpu.retrieval.ops import exact_topk

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(3, 500)).astype(np.float32)
        )
        v1, i1 = lax.top_k(x, 10)
        v2, i2 = exact_topk(x, 10)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_keyed_scores_values_exact_with_ties(self):
        """With massive -1 ties (the keyed contract), the VALUE multiset
        must still be exact."""
        import numpy as np
        import jax.numpy as jnp
        from jax import lax

        from modern_search_engines_project_tpu.retrieval.ops import exact_topk

        rng = np.random.default_rng(7)
        scores = np.full((2, 160_000), -1.0, np.float32)
        pos = rng.choice(160_000, size=500, replace=False)
        scores[0, pos] = rng.gamma(2.0, 2.0, size=500).astype(np.float32)
        scores[1, pos[:300]] = rng.gamma(2.0, 2.0, size=300).astype(np.float32)
        v1, _ = lax.top_k(jnp.asarray(scores), 1000)
        v2, _ = exact_topk(jnp.asarray(scores), 1000)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


class TestBuildUnusedLayout:
    """build_unused_layout=False must skip exactly the non-resident BM25
    layout (index-load cost halves at 1M+ docs) without changing results."""

    def test_slots_resident_blocked_skipped(self, built):
        art, _, cfg = built
        d = DeviceIndex.from_artifacts(
            art, cfg, bm25_layout="slots", build_unused_layout=False
        )
        assert d.blk_terms is None and d.blk_impact is None
        assert d.blk_local is None
        assert d.slot_terms is not None and d.col_unperm is not None

    def test_blocked_resident_slots_skipped(self, built):
        art, _, cfg = built
        d = DeviceIndex.from_artifacts(
            art, cfg, bm25_layout="blocked", build_unused_layout=False
        )
        assert d.slot_terms is None and d.slot_impact is None
        assert d.col_unperm is None
        assert d.blk_terms is not None

    def test_no_buckets_always_carries_blocked(self, built):
        """The non-bucketed fallback (slot_layout=False) only understands
        the blocked layout, so it must be built even when bm25_layout
        says slots."""
        art, _, cfg = built
        d = DeviceIndex.from_artifacts(
            art, cfg, bm25_layout="slots", slot_layout=False,
            build_unused_layout=False,
        )
        assert d.blk_terms is not None

    def test_engine_results_unchanged(self, built):
        """Both skip-built resident layouts (slots and blocked) must rank
        identically — skipping the other layout corrupts neither."""
        art, enc, cfg = built
        eng_s = SearchEngine(art, enc, cfg, use_pallas=True)
        assert eng_s.didx.blk_terms is None  # engine skipped the unused one
        eng_b = SearchEngine(
            art, enc, cfg.replace(bm25_layout="blocked"), use_pallas=True
        )
        assert eng_b.didx.slot_terms is None
        for q in QUERIES[:2]:
            r1 = eng_s.search(q, top_k=10)
            r2 = eng_b.search(q, top_k=10)
            assert len(r1) == len(r2) > 0
            for a, b in zip(r1, r2):
                assert a.doc_id == b.doc_id or abs(
                    a.similarity_score - b.similarity_score
                ) < 1e-4, q


class TestDenseStatsKernel:
    def test_stats_kernel_matches_xla_path(self):
        """The fused dense-stats kernel (dense_pallas.bucket_stats_pallas,
        interpret mode) must match ops.bucket_doc_stats' XLA formulation
        on every output, including tie handling."""
        import numpy as np
        import jax.numpy as jnp

        from modern_search_engines_project_tpu.retrieval import ops
        from modern_search_engines_project_tpu.retrieval.dense_pallas import (
            bucket_stats_pallas,
        )

        rng = np.random.default_rng(5)
        B, dim = 8, 64
        qv = jnp.asarray(rng.standard_normal((B, dim)), jnp.float32)
        buckets = ((1, 16), (3, 24), (5, 8))
        emb = []
        for n, cnt in buckets:
            e = rng.standard_normal((n, cnt, dim)).astype(np.float32)
            # force exact ties between slots of some docs
            if n > 1:
                e[1, :4] = e[0, :4]
            emb.append(jnp.asarray(e))
        valid = tuple(jnp.ones(c, bool) for _, c in buckets)

        ref = ops.bucket_doc_stats(buckets, tuple(emb), valid, qv)
        for (n, cnt), e, r in zip(buckets, emb, ref):
            got = bucket_stats_pallas(e, qv, interpret=True)
            for a, b, name in zip(
                got, r, ("v1", "v2", "w1", "w2", "vmin")
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                    err_msg=f"n={n} {name}",
                )
