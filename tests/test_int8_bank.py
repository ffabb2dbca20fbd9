"""int8-quantized dense bank (opt-in bank_dtype="int8"): half the HBM of
bf16, s8 MXU matmul.  Quantization error must stay small enough that
rankings are near-identical to the f32 bank."""

import numpy as np
import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import SearchEngine
from modern_search_engines_project_tpu.retrieval.device_index import (
    quantize_bank_int8,
)

QUERIES = [
    "research square law",
    "ai faculty cyber",
    "tübingen research faculty",
    "castle river town",
]


@pytest.fixture(scope="module")
def built():
    docs = make_corpus(n_docs=120, seed=7, min_len=40, max_len=200)
    cfg = Config(
        embedding_dim=48,
        window_size=32,
        step_size=25,
        top_k_retrieval=60,
        top_k_reranking=10,
        max_query_terms=8,
    )
    enc = HashingEncoder(dim=48)
    art = IndexBuilder(enc, cfg).build(docs)
    return art, enc, cfg


class TestQuantizer:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(64, 48)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q8, inv = quantize_bank_int8(emb)
        assert q8.dtype == np.int8 and inv.dtype == np.float32
        rec = q8.astype(np.float32) * inv[:, None]
        # per-row scale keeps absolute error <= max|row|/254
        assert np.max(np.abs(rec - emb)) <= np.abs(emb).max() / 127.0

    def test_zero_row_safe(self):
        q8, inv = quantize_bank_int8(np.zeros((3, 8), np.float32))
        assert np.all(q8 == 0) and np.all(inv > 0)


class TestInt8Engine:
    def test_rankings_match_f32(self, built):
        art, enc, cfg = built
        f32 = SearchEngine(art, enc, cfg, use_pallas=True)
        i8 = SearchEngine(
            art, enc, cfg, use_pallas=True, bank_dtype="int8"
        )
        # bank really is int8 + scale
        e0 = i8.didx.bucket_emb[0]
        assert isinstance(e0, tuple) and e0[0].dtype == np.int8

        for q in QUERIES:
            a = f32.search(q, top_k=10)
            b = i8.search(q, top_k=10)
            ids_a = [r.doc_id for r in a]
            ids_b = [r.doc_id for r in b]
            if not ids_a:  # out-of-vocab query: both must agree it's empty
                assert not ids_b, q
                continue
            overlap = len(set(ids_a) & set(ids_b)) / len(ids_a)
            assert overlap >= 0.9, (q, ids_a, ids_b)
            for ra, rb in zip(a, b):
                if ra.doc_id == rb.doc_id:
                    assert abs(ra.similarity_score - rb.similarity_score) < 0.05

    def test_sharded_int8_matches_single_int8(self, built, eight_devices):
        from modern_search_engines_project_tpu.parallel import make_mesh

        art, enc, cfg = built
        single = SearchEngine(
            art, enc, cfg, use_pallas=True, bank_dtype="int8"
        )
        sharded = SearchEngine.sharded(
            art, enc, make_mesh(8), cfg, bank_dtype="int8"
        )
        for q in QUERIES[:2]:
            a = single.search(q, top_k=10)
            b = sharded.search(q, top_k=10)
            sa = np.array([r.similarity_score for r in a])
            sb = np.array([r.similarity_score for r in b])
            assert np.allclose(sa, sb, atol=2e-4), q
            for ra, rb in zip(a, b):
                assert (
                    ra.doc_id == rb.doc_id
                    or abs(ra.similarity_score - rb.similarity_score) < 2e-4
                )
