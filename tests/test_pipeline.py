"""Build pipeline: shard/resume semantics + merge parity with IndexBuilder."""

import os

import numpy as np
import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import IndexBuilder
from modern_search_engines_project_tpu.index.pipeline import (
    BuildPipeline,
    DataParallelEncoder,
)
from modern_search_engines_project_tpu.models import HashingEncoder
from modern_search_engines_project_tpu.retrieval import bm25_search_numpy

CFG = Config(
    embedding_dim=32, window_size=32, step_size=25,
    top_k_retrieval=20, top_k_reranking=10, max_query_terms=8,
)


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(n_docs=25, seed=9, min_len=30, max_len=90)


class TestPipeline:
    def test_merge_matches_oneshot_builder(self, corpus, tmp_path):
        enc = HashingEncoder(dim=32)
        art1 = IndexBuilder(enc, CFG).build(corpus)
        pipe = BuildPipeline(enc, str(tmp_path / "idx"), CFG, shard_size=8)
        art2 = pipe.build(corpus)
        assert art2.n_docs == art1.n_docs
        assert art2.n_chunks == art1.n_chunks
        assert np.isclose(art2.avgdl, art1.avgdl)
        assert art2.vocab.term_to_id == art1.vocab.term_to_id
        assert np.allclose(art2.chunk_emb, art1.chunk_emb, atol=1e-6)
        # identical BM25 behavior
        for q in ["research law", "forest library"]:
            i1, v1 = bm25_search_numpy(art1, q, top_k=10)
            i2, v2 = bm25_search_numpy(art2, q, top_k=10)
            assert list(i1) == list(i2)
            assert np.allclose(v1, v2, atol=1e-5)

    def test_resume_skips_built_shards(self, corpus, tmp_path):
        enc = HashingEncoder(dim=32)
        out = str(tmp_path / "idx")
        pipe = BuildPipeline(enc, out, CFG, shard_size=10)
        pipe.build(corpus)
        shard0 = os.path.join(out, "shards", "shard_00000.pkl")
        mtime = os.path.getmtime(shard0)
        # second build must not rebuild existing shards
        pipe2 = BuildPipeline(enc, out, CFG, shard_size=10)
        pipe2.build(corpus)
        assert os.path.getmtime(shard0) == mtime

    def test_partial_build_then_resume(self, corpus, tmp_path):
        enc = HashingEncoder(dim=32)
        out = str(tmp_path / "idx")
        pipe = BuildPipeline(enc, out, CFG, shard_size=10)
        # build only shard 0, as an interrupted run would
        pipe.build_shard(0, corpus[:10])
        art = pipe.build(corpus)  # completes the rest and merges
        assert art.n_docs == len(corpus)


class TestDataParallelEncoder:
    def test_sharded_encode_matches_single(self, eight_devices):
        import numpy as np
        from jax.sharding import Mesh

        from modern_search_engines_project_tpu.models.encoder import (
            EncoderConfig,
            JaxEncoder,
        )

        tiny = EncoderConfig(
            vocab_size=256, dim=64, n_layers=1, n_heads=4, mlp_ratio=2,
            max_len=16,
        )
        enc = JaxEncoder(tiny, batch_size=8, max_len=16)
        texts = [f"document number {i} about castles" for i in range(11)]
        plain = enc.encode_batch(texts)
        mesh = Mesh(np.array(eight_devices), ("dp",))
        dp = DataParallelEncoder(enc, mesh)
        sharded = dp.encode_batch(texts)
        assert sharded.shape == plain.shape
        assert np.allclose(sharded, plain, atol=1e-4)
