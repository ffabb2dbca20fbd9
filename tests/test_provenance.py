"""Encoder provenance: artifacts record the embedding encoder; serving
refuses to pair an index with a mismatched query encoder (ADVICE r1)."""

import numpy as np
import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import (
    IndexBuilder,
    load_artifacts,
    save_artifacts,
)
from modern_search_engines_project_tpu.models import (
    EncoderConfig,
    HashingEncoder,
    JaxEncoder,
)
from modern_search_engines_project_tpu.models.checkpoint import save_encoder
from modern_search_engines_project_tpu.serving.__main__ import resolve_encoder

CFG = Config(
    embedding_dim=32, window_size=16, step_size=12,
    top_k_retrieval=10, top_k_reranking=5, max_query_terms=8,
)
TINY = EncoderConfig(
    vocab_size=256, dim=32, n_layers=1, n_heads=2, mlp_ratio=2, max_len=16
)


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(n_docs=6, seed=3, min_len=20, max_len=50)


class TestProvenanceRecording:
    def test_hashing_meta_roundtrip(self, corpus, tmp_path):
        enc = HashingEncoder(dim=32, seed=7)
        art = IndexBuilder(enc, CFG).build(corpus)
        assert art.encoder_meta["kind"] == "hashing"
        assert art.encoder_meta["seed"] == 7
        save_artifacts(art, str(tmp_path / "idx"))
        loaded = load_artifacts(str(tmp_path / "idx"))
        assert loaded.encoder_meta == art.encoder_meta

    def test_jax_meta_records_digest(self, corpus):
        enc = JaxEncoder(TINY, batch_size=4)
        art = IndexBuilder(enc, CFG).build(corpus)
        meta = art.encoder_meta
        assert meta["kind"] == "jax_biencoder"
        assert meta["params_digest"] == enc.params_digest()

    def test_pipeline_merge_records_meta(self, corpus, tmp_path):
        from modern_search_engines_project_tpu.index.pipeline import (
            BuildPipeline,
        )

        enc = HashingEncoder(dim=32, seed=4)
        art = BuildPipeline(
            enc, str(tmp_path / "p"), CFG, shard_size=3
        ).build(corpus)
        assert art.encoder_meta["kind"] == "hashing"
        assert art.encoder_meta["seed"] == 4


class TestResolveEncoder:
    def test_hashing_reconstructed_exactly(self, corpus, tmp_path):
        enc = HashingEncoder(dim=32, seed=7)
        art = IndexBuilder(enc, CFG).build(corpus)
        got = resolve_encoder(art)
        assert isinstance(got, HashingEncoder)
        a = enc.encode_batch(["castle neckar"])
        b = got.encode_batch(["castle neckar"])
        assert np.allclose(a, b)

    def test_jax_index_without_ckpt_refuses(self, corpus):
        enc = JaxEncoder(TINY, batch_size=4)
        art = IndexBuilder(enc, CFG).build(corpus)
        with pytest.raises(SystemExit):
            resolve_encoder(art)
        # --force-encoder downgrades to hashing instead of failing
        got = resolve_encoder(art, force=True)
        assert isinstance(got, HashingEncoder)

    def test_jax_index_with_matching_ckpt(self, corpus, tmp_path):
        enc = JaxEncoder(TINY, batch_size=4)
        ckpt = str(tmp_path / "ck")
        save_encoder(enc.params, TINY, ckpt)
        art = IndexBuilder(enc, CFG).build(corpus)
        got = resolve_encoder(art, ckpt=ckpt)
        assert isinstance(got, JaxEncoder)
        assert got.params_digest() == enc.params_digest()

    def test_mismatched_ckpt_refused(self, corpus, tmp_path):
        enc = JaxEncoder(TINY, batch_size=4, seed=0)
        other = JaxEncoder(TINY, batch_size=4, seed=1)
        ckpt = str(tmp_path / "other")
        save_encoder(other.params, TINY, ckpt)
        art = IndexBuilder(enc, CFG).build(corpus)
        with pytest.raises(SystemExit):
            resolve_encoder(art, ckpt=ckpt)
        got = resolve_encoder(art, ckpt=ckpt, force=True)
        assert isinstance(got, JaxEncoder)

    def test_ckpt_against_hashing_index_refused(self, corpus, tmp_path):
        enc = HashingEncoder(dim=32)
        art = IndexBuilder(enc, CFG).build(corpus)
        jx = JaxEncoder(TINY, batch_size=4)
        ckpt = str(tmp_path / "ck")
        save_encoder(jx.params, TINY, ckpt)
        with pytest.raises(SystemExit):
            resolve_encoder(art, ckpt=ckpt)

    def test_recorded_ckpt_path_used(self, corpus, tmp_path):
        enc = JaxEncoder(TINY, batch_size=4)
        ckpt = str(tmp_path / "ck")
        save_encoder(enc.params, TINY, ckpt)
        enc.ckpt_path = ckpt  # as JaxEncoder.from_checkpoint would set
        art = IndexBuilder(enc, CFG).build(corpus)
        got = resolve_encoder(art)
        assert isinstance(got, JaxEncoder)
        assert got.params_digest() == enc.params_digest()
