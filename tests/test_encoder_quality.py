"""Trained-encoder quality: the bi-encoder must beat the hashing baseline
on the semantic-gap retrieval task (VERDICT r1 #4).

Queries use topic-specific vocabulary disjoint from the documents', so a
lexical encoder retrieves at chance while a trained encoder learns the
alignment from (query, passage) pairs — the air-gapped analog of the
reference's GooAQ fine-tune win (embedder_training/train.py:93-112).
Quick config (~1 layer, 25 steps); the full table is produced by
``python -m modern_search_engines_project_tpu.eval.encoder_quality``
(docs/METRICS.md).
"""

import pytest

from modern_search_engines_project_tpu.eval.encoder_quality import (
    dense_retrieval_metrics,
    semantic_corpus,
    train_and_compare,
)
from modern_search_engines_project_tpu.models import HashingEncoder


class TestSemanticCorpus:
    def test_query_vocab_disjoint_from_docs(self):
        c = semantic_corpus(n_topics=4, n_train_pairs=40)
        doc_words = set(w for d in c.eval_docs for w in d.split())
        query_words = set(w for q in c.eval_queries for w in q.split())
        assert not doc_words & query_words

    def test_hashing_is_chance(self):
        c = semantic_corpus(n_topics=16, n_train_pairs=16)
        m = dense_retrieval_metrics(HashingEncoder(dim=64), c, k=10)
        # 8 relevant of 128 docs; chance recall@10 ~= 10/128 * ... << 0.3
        assert m["recall@10"] < 0.3


class TestTrainedBeatsHashing:
    @pytest.mark.slow
    def test_quality_win(self):
        results, trained = train_and_compare(
            n_topics=16,
            n_train_pairs=800,
            n_layers=1,
            epochs=1,
            lr=3e-3,
            negatives=1,
        )
        h, t = results["hashing"], results["trained"]
        # decisive, not marginal: the trained encoder must dominate on
        # every metric
        assert t["recall@10"] > 0.7, results
        assert t["recall@10"] > h["recall@10"] + 0.4, results
        assert t["ndcg@10"] > h["ndcg@10"] + 0.4, results
        assert t["mrr"] > h["mrr"] + 0.4, results

    @pytest.mark.slow
    def test_cross_encoder_quality_win(self):
        """The optional stage-3 cross-encoder must beat an untrained one at
        joint rescoring (MRR over relevant-vs-offtopic candidates)."""
        from modern_search_engines_project_tpu.eval.encoder_quality import (
            train_and_compare_cross_encoder,
        )

        r = train_and_compare_cross_encoder()
        assert r["trained_mrr"] > 0.6, r
        assert r["trained_mrr"] > r["untrained_mrr"] + 0.2, r

    @pytest.mark.slow
    def test_checkpoint_roundtrip_preserves_quality(self, tmp_path):
        from modern_search_engines_project_tpu.models import JaxEncoder

        ckpt = str(tmp_path / "ck")
        results, trained = train_and_compare(
            n_topics=8,
            n_train_pairs=400,
            n_layers=1,
            epochs=1,
            lr=3e-3,
            negatives=1,
            ckpt_out=ckpt,
        )
        # reload through the provenance path and re-evaluate
        enc2 = JaxEncoder.from_checkpoint(ckpt, batch_size=64, max_len=32)
        c = semantic_corpus(n_topics=8, n_train_pairs=8)
        m1 = dense_retrieval_metrics(trained, c, k=10)
        m2 = dense_retrieval_metrics(enc2, c, k=10)
        assert abs(m1["recall@10"] - m2["recall@10"]) < 1e-6
        assert enc2.params_digest() == trained.params_digest()
