"""Encoder forward + training tests (single-device and dp x tp sharded)."""

import numpy as np
import pytest

from modern_search_engines_project_tpu.models.encoder import (
    BiEncoder,
    EncoderConfig,
    JaxEncoder,
)
from modern_search_engines_project_tpu.models.train import (
    TrainConfig,
    Trainer,
    mine_hard_negatives,
)

TINY = EncoderConfig(
    vocab_size=1024, dim=64, n_layers=2, n_heads=4, mlp_ratio=2, max_len=32
)


class TestEncoderForward:
    def test_output_shape_and_norm(self):
        enc = JaxEncoder(TINY, batch_size=4, max_len=32)
        out = enc.encode_batch(["hello world", "tübingen castle tour"])
        assert out.shape == (2, 64)
        assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)

    def test_deterministic(self):
        enc = JaxEncoder(TINY, batch_size=4, max_len=32)
        a = enc.encode("the neckar river")
        b = enc.encode("the neckar river")
        assert np.allclose(a, b)

    def test_padding_invariance(self):
        # same text in different batch positions -> same embedding
        enc = JaxEncoder(TINY, batch_size=4, max_len=32)
        alone = enc.encode_batch(["castle tour"])[0]
        batched = enc.encode_batch(["castle tour", "x", "y z", "w q r"])[0]
        assert np.allclose(alone, batched, atol=1e-4)

    def test_mask_respected(self):
        # trailing pad must not change the embedding
        enc = JaxEncoder(TINY, batch_size=2, max_len=32)
        e1 = enc.encode("short text")
        enc2 = JaxEncoder(TINY, batch_size=2, max_len=16)
        e2 = enc2.encode("short text")
        assert np.allclose(e1, e2, atol=1e-3)

    def test_length_buckets(self):
        """Length-bucketed encode (VERDICT r4 #2): short queries pick the
        smallest bucket and the embedding matches max_len padding."""
        enc = JaxEncoder(TINY, batch_size=2, max_len=32)
        assert enc.len_buckets == (16, 32)
        # 3 words + CLS/SEP = 5 tokens -> bucket 16
        tok = [enc.tokenizer.encode("castle of tuebingen")]
        assert enc.bucket_len(tok) == 16
        # a long text overflows bucket 16 -> max_len
        long_tok = [enc.tokenizer.encode(" ".join(["w"] * 30))]
        assert enc.bucket_len(long_tok) == 32
        # bucketed output == full-length output (mask makes pad inert)
        short = enc.encode_batch(["castle of tuebingen"])
        ids, mask = enc.tokenizer.pad_batch(tok, 32)
        import jax.numpy as jnp

        full = np.asarray(
            enc._fwd(
                enc.params,
                jnp.asarray(ids * 2, jnp.int32),
                jnp.asarray(mask * 2, jnp.int32),
            )
        )[0]
        assert np.allclose(short[0], full, atol=1e-3)


class TestTraining:
    def test_loss_decreases(self):
        cfg = TrainConfig(
            learning_rate=3e-3, batch_size=8, epochs=30, max_len=16, seed=0
        )
        tr = Trainer(TINY, cfg).init(total_steps=60)
        triples = [
            ("castle tour", "the castle overlooks the town", 1.0),
            ("castle tour", "pizza dough recipe", 0.0),
            ("river punting", "boats race on the neckar", 1.0),
            ("river punting", "tax law seminar", 0.0),
            ("university library", "books and study halls", 1.0),
            ("university library", "chocolate festival stalls", 0.0),
            ("market square", "stalls on the town square", 1.0),
            ("market square", "hospital emergency room", 0.0),
        ]
        losses = tr.train(triples)
        assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])

    def test_trained_encoder_usable(self):
        cfg = TrainConfig(batch_size=4, epochs=1, max_len=16)
        tr = Trainer(TINY, cfg).init(total_steps=2)
        tr.train([("a b", "a b c", 1.0), ("d", "e f", 0.0)] * 2)
        enc = tr.to_encoder(batch_size=2)
        out = enc.encode_batch(["query text"])
        assert out.shape == (1, 64)

    def test_mining(self):
        enc = JaxEncoder(TINY, batch_size=4, max_len=32)
        queries = ["castle", "river"]
        positives = ["castle hill", "river bank"]
        pool = ["castle hill", "river bank", "pizza", "law", "cyber", "art"]
        triples = mine_hard_negatives(enc, queries, positives, pool, k=2)
        # 2 positives + 2x2 negatives
        assert len(triples) == 6
        assert triples[0] == ("castle", "castle hill", 1.0)
        labels = [t[2] for t in triples]
        assert labels.count(1.0) == 2 and labels.count(0.0) == 4
        # negatives never equal the positive
        for q, p, l in triples:
            if l == 0.0:
                assert p != dict(zip(queries, positives))[q]


class TestShardedTraining:
    def test_dp_tp_train_step(self, eight_devices):
        import jax
        import numpy as np_
        from jax.sharding import Mesh

        mesh = Mesh(np.array(eight_devices).reshape(4, 2), ("dp", "tp"))
        cfg = TrainConfig(batch_size=8, epochs=2, max_len=16, seed=1)
        tr = Trainer(TINY, cfg, mesh=mesh).init(total_steps=4)
        triples = [
            ("castle tour", "the castle overlooks the town", 1.0),
            ("castle tour", "pizza dough recipe", 0.0),
            ("river punting", "boats race on the neckar", 1.0),
            ("river punting", "tax law seminar", 0.0),
        ] * 2
        losses = tr.train(triples)
        assert len(losses) == 2
        assert all(np.isfinite(l) for l in losses)

    def test_dp_tp_train_step_hard_negatives(self, eight_devices):
        """infonce_hn on a dp x tp mesh: the third-tower batch keys
        (ids3/mask3/nid) must carry dp shardings like the others."""
        import numpy as np_
        from jax.sharding import Mesh

        mesh = Mesh(np.array(eight_devices).reshape(4, 2), ("dp", "tp"))
        cfg = TrainConfig(batch_size=8, epochs=2, max_len=16, seed=1,
                          loss="infonce_hn", learning_rate=1e-3)
        tr = Trainer(TINY, cfg, mesh=mesh).init(total_steps=4)
        triples = [
            ("castle tour", "the castle overlooks the town", "pizza dough"),
            ("river punting", "boats race on the neckar", "tax law"),
            ("old town walk", "narrow lanes and gables", "matrix algebra"),
            ("market day", "stalls sell fruit and cheese", "train timetable"),
        ] * 2
        losses = tr.train(triples)
        assert len(losses) == 2
        assert all(np.isfinite(l) for l in losses)

    def test_sharded_matches_single(self, eight_devices):
        import numpy as np_
        from jax.sharding import Mesh

        triples = [
            ("castle", "castle hill town", 1.0),
            ("castle", "pizza", 0.0),
            ("river", "neckar water boats", 1.0),
            ("river", "law faculty", 0.0),
        ]
        cfg = TrainConfig(batch_size=4, epochs=1, max_len=16, seed=3)
        tr1 = Trainer(TINY, cfg).init(total_steps=1)
        l1 = tr1.train(triples)
        mesh = Mesh(np.array(eight_devices).reshape(4, 2), ("dp", "tp"))
        tr2 = Trainer(TINY, cfg, mesh=mesh).init(total_steps=1)
        l2 = tr2.train(triples)
        assert abs(l1[0] - l2[0]) < 1e-3, (l1, l2)


class TestDataAndCheckpoint:
    def test_synthetic_pairs_deterministic(self):
        from modern_search_engines_project_tpu.models.data import synthetic_pairs

        a = synthetic_pairs(16, seed=1)
        b = synthetic_pairs(16, seed=1)
        assert a == b and len(a) == 16
        assert all(q and p for q, p in a)

    def test_load_pairs_tsv(self, tmp_path):
        from modern_search_engines_project_tpu.models.data import load_pairs_tsv

        f = tmp_path / "pairs.tsv"
        f.write_text("q one\tp one\nbadline\nq two\tp two\n\n")
        pairs = load_pairs_tsv(str(f))
        assert pairs == [("q one", "p one"), ("q two", "p two")]
        assert load_pairs_tsv(str(f), limit=1) == [("q one", "p one")]

    def test_checkpoint_roundtrip(self, tmp_path):
        import numpy as np

        from modern_search_engines_project_tpu.models.checkpoint import (
            load_encoder,
            save_encoder,
        )

        enc = JaxEncoder(TINY, batch_size=2, max_len=16)
        save_encoder(enc.params, TINY, str(tmp_path / "ckpt"))
        params2, cfg2 = load_encoder(str(tmp_path / "ckpt"))
        assert cfg2 == TINY
        enc2 = JaxEncoder(cfg2, params=params2, batch_size=2, max_len=16)
        a = enc.encode("castle on the hill")
        b = enc2.encode("castle on the hill")
        assert np.allclose(a, b, atol=1e-6)

    def test_params_pinned_on_device(self, tmp_path):
        """Checkpoint loads hand numpy param leaves; JaxEncoder must pin
        them on device ONCE — jit does not cache host->device transfers
        of numpy args, so numpy leaves re-upload the full 152M-param tree
        every encode dispatch (measured: ~600 MB/dispatch over the TPU
        tunnel, 60+ GB of accumulated transfer buffers in a real index
        build before the fix)."""
        import jax

        from modern_search_engines_project_tpu.models.checkpoint import (
            load_encoder,
            save_encoder,
        )

        enc = JaxEncoder(TINY, batch_size=2, max_len=16)
        save_encoder(enc.params, TINY, str(tmp_path / "ckpt"))
        enc2 = JaxEncoder.from_checkpoint(
            str(tmp_path / "ckpt"), batch_size=2, max_len=16
        )
        for e in (enc, enc2):
            for leaf in jax.tree_util.tree_leaves(e.params):
                assert isinstance(leaf, jax.Array), type(leaf)

    def test_train_cli_synthetic(self, tmp_path):
        from modern_search_engines_project_tpu.models.train_cli import main

        out = str(tmp_path / "enc")
        main([
            "--synthetic", "24", "--epochs", "1", "--batch-size", "8",
            "--dim", "64", "--layers", "1", "--max-len", "16",
            "--negatives", "2", "--out", out,
        ])
        import os

        assert os.path.exists(os.path.join(out, "params.msgpack"))
        assert os.path.exists(os.path.join(out, "config.json"))


class TestCrossEncoder:
    def test_forward_and_rescore(self):
        from modern_search_engines_project_tpu.models.cross_encoder import (
            CrossEncoderReranker,
        )

        ce = CrossEncoderReranker(TINY, batch_size=4, max_len=32)
        scores = ce.rescore(
            "castle tour", ["the castle on the hill", "pizza dough", "x"]
        )
        assert scores.shape == (3,)
        assert np.all((scores >= 0) & (scores <= 1))
        # deterministic
        again = ce.rescore(
            "castle tour", ["the castle on the hill", "pizza dough", "x"]
        )
        assert np.allclose(scores, again)

    def test_checkpoint_roundtrip(self, tmp_path):
        from modern_search_engines_project_tpu.models.cross_encoder import (
            CrossEncoderReranker,
        )

        ce = CrossEncoderReranker(TINY, batch_size=4, max_len=32)
        texts = ["the castle on the hill", "pizza dough"]
        want = ce.rescore("castle tour", texts)
        ce.save(str(tmp_path / "ce"))
        back = CrossEncoderReranker.from_checkpoint(
            str(tmp_path / "ce"), batch_size=4, max_len=32
        )
        got = back.rescore("castle tour", texts)
        # f16 on disk -> ~1e-3 round-trip tolerance
        assert np.allclose(want, got, atol=5e-3)

    def test_training_reduces_loss(self):
        from modern_search_engines_project_tpu.models.cross_encoder import (
            train_cross_encoder,
        )

        triples = [
            ("castle tour", "the castle overlooks the town", 1.0),
            ("castle tour", "pizza dough recipe", 0.0),
            ("river punting", "boats race on the neckar", 1.0),
            ("river punting", "tax law seminar", 0.0),
        ] * 8
        ce, losses = train_cross_encoder(
            triples, TINY, epochs=4, batch_size=8, learning_rate=3e-3,
            max_len=24,
        )
        assert losses[-1] < losses[0], (losses[0], losses[-1])

    def test_engine_stage3_integration(self):
        import sys

        sys.path.insert(0, "tests")
        from corpus_util import make_corpus
        from modern_search_engines_project_tpu.config import Config
        from modern_search_engines_project_tpu.index import IndexBuilder
        from modern_search_engines_project_tpu.models import HashingEncoder
        from modern_search_engines_project_tpu.models.cross_encoder import (
            CrossEncoderReranker,
        )
        from modern_search_engines_project_tpu.retrieval import SearchEngine

        cfg = Config(
            embedding_dim=32, window_size=32, step_size=25,
            top_k_retrieval=16, top_k_reranking=5, max_query_terms=8,
        )
        enc = HashingEncoder(dim=32)
        art = IndexBuilder(enc, cfg).build(
            make_corpus(30, seed=3, min_len=40, max_len=100)
        )
        ce = CrossEncoderReranker(TINY, batch_size=4, max_len=32)
        eng = SearchEngine(art, enc, cfg, cross_encoder=ce)
        res = eng.search("research law faculty", top_k=5)
        assert res
        scores = [r.similarity_score for r in res]
        assert scores == sorted(scores, reverse=True)
        assert all(0.0 <= s <= 1.0 for s in scores)


class TestHashingEncoderIdPath:
    def test_builder_id_fast_path_matches_text_path(self):
        """The dense build's pre-tokenized fast path must produce
        BIT-IDENTICAL embeddings to re-tokenizing each window's text
        (window spans start/end on token boundaries, so ids[s:e] must
        round-trip exactly)."""
        import numpy as np

        from corpus_util import make_corpus
        from modern_search_engines_project_tpu.config import Config
        from modern_search_engines_project_tpu.index import IndexBuilder
        from modern_search_engines_project_tpu.models import HashingEncoder

        docs = make_corpus(n_docs=80, seed=9, min_len=40, max_len=300)
        # adversarial extras: unicode whitespace, umlauts, empty doc
        docs[0].text = "Tübingen castle  straße tour " * 30
        docs[1].text = ""
        cfg = Config(embedding_dim=48, window_size=16, step_size=12)

        class TextOnly:
            """Same encoder, fast path hidden -> text round-trip."""

            def __init__(self):
                self._e = HashingEncoder(dim=48)
                self.tokenizer = self._e.tokenizer

            def describe(self):
                return self._e.describe()

            def encode_batch(self, texts):
                return self._e.encode_batch(texts)

        fast = IndexBuilder(HashingEncoder(dim=48), cfg).build(docs)
        slow = IndexBuilder(TextOnly(), cfg).build(docs)
        assert fast.n_chunks == slow.n_chunks
        np.testing.assert_array_equal(fast.chunk_emb, slow.chunk_emb)
        assert fast.window_texts == slow.window_texts


class TestInfoNCE:
    def test_learns_tiny_retrieval_from_scratch(self):
        """The from-scratch recipe (TrainConfig.loss="infonce"): in-batch
        contrastive must learn a small retrieval task where pairwise
        cosine-MSE from random init barely moves (the round-3 finding
        that motivated it: a 152M model trained 1828 steps at lr 2e-5
        with cosine loss LOST to the hashing baseline on held-out real
        pairs)."""
        import numpy as np

        from modern_search_engines_project_tpu.models.encoder import (
            EncoderConfig,
        )
        from modern_search_engines_project_tpu.models.train import (
            TrainConfig,
            Trainer,
        )

        pairs = [
            (f"query topic{t} variant{v}", f"passage about topic{t} item{v}")
            for t in range(20)
            for v in range(5)
        ]
        triples = [(q, p, 1.0) for q, p in pairs]
        cfg = EncoderConfig(dim=32, n_layers=2, n_heads=2, max_len=24,
                            vocab_size=2003)
        tr = Trainer(
            cfg,
            TrainConfig(loss="infonce", learning_rate=2e-3, batch_size=25,
                        epochs=6, max_len=24),
        )
        losses = tr.train(triples)
        assert losses[0] > 2.0 and np.mean(losses[-4:]) < 0.5 * losses[0]
        enc = tr.to_encoder(batch_size=32)
        q = np.asarray(enc.encode_batch([p[0] for p in pairs]))
        p = np.asarray(enc.encode_batch([p[1] for p in pairs]))
        acc = float(np.mean((q @ p.T).argmax(1) == np.arange(len(pairs))))
        assert acc > 0.6

    def test_duplicate_texts_masked(self):
        """Duplicate passages in a batch are false negatives; the qid/pid
        masks must keep the loss finite and well-posed."""
        import jax
        import numpy as np

        from modern_search_engines_project_tpu.models.encoder import (
            EncoderConfig,
        )
        from modern_search_engines_project_tpu.models.train import (
            Trainer,
            TrainConfig,
            infonce_loss,
        )

        cfg = EncoderConfig(dim=16, n_layers=1, n_heads=2, max_len=16,
                            vocab_size=1009)
        tr = Trainer(cfg, TrainConfig(loss="infonce", max_len=16))
        tr.init(total_steps=4)
        # two rows share the SAME passage text (and two share a query)
        triples = [
            ("alpha one", "shared body text", 1.0),
            ("beta two", "shared body text", 1.0),
            ("same query", "body aaa", 1.0),
            ("same query", "body bbb", 1.0),
        ]
        batch = tr.encode_pairs(triples)
        loss = infonce_loss(tr.model, tr.params, batch, 0.05)
        assert np.isfinite(float(loss))
        g = jax.grad(
            lambda p: infonce_loss(tr.model, p, batch, 0.05)
        )(tr.params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)

    def test_hard_negative_tower(self):
        """loss="infonce_hn": the two-stage DPR-style recipe — stage-A
        in-batch training, mine with the stage-A tower, continue with a
        third tower of mined negatives — must run end-to-end, keep the
        loss finite under false-negative collisions, and sharpen the
        retrieval accuracy of the stage-A model."""
        import dataclasses

        import numpy as np

        from modern_search_engines_project_tpu.models.encoder import (
            EncoderConfig,
        )
        from modern_search_engines_project_tpu.models.train import (
            TrainConfig,
            Trainer,
            mine_hn_triples,
        )

        pairs = [
            (f"query topic{t} variant{v}", f"passage about topic{t} item{v}")
            for t in range(20)
            for v in range(5)
        ]
        cfg = EncoderConfig(dim=32, n_layers=2, n_heads=2, max_len=24,
                            vocab_size=2003)
        tcfg = TrainConfig(loss="infonce", learning_rate=2e-3,
                           batch_size=25, epochs=4, max_len=24)
        tr = Trainer(cfg, tcfg)
        tr.train([(q, p, 1.0) for q, p in pairs])

        hn = mine_hn_triples(tr.to_encoder(batch_size=32), pairs)
        assert len(hn) == len(pairs)
        # a mined negative is a REAL pool passage and never the positive
        passages = {p for _, p in pairs}
        assert all(n in passages and n != p for _, p, n in hn)

        tcfg_b = dataclasses.replace(tcfg, loss="infonce_hn", epochs=4,
                                     learning_rate=6e-4)
        tr_b = Trainer(cfg, tcfg_b)
        tr_b.init(total_steps=16, params=tr.params)
        losses = tr_b.train(hn)
        assert all(np.isfinite(losses))
        enc = tr_b.to_encoder(batch_size=32)
        q = np.asarray(enc.encode_batch([p[0] for p in pairs]))
        p = np.asarray(enc.encode_batch([p[1] for p in pairs]))
        acc = float(np.mean((q @ p.T).argmax(1) == np.arange(len(pairs))))
        assert acc > 0.6

    def test_hn_false_negative_masked(self):
        """A mined negative whose text EQUALS a row's positive must be
        masked out of that row's denominator (nid/pid hash), keeping loss
        and gradients finite and bounded."""
        import jax
        import numpy as np

        from modern_search_engines_project_tpu.models.encoder import (
            EncoderConfig,
        )
        from modern_search_engines_project_tpu.models.train import (
            TrainConfig,
            Trainer,
            infonce_loss,
        )

        cfg = EncoderConfig(dim=16, n_layers=1, n_heads=2, max_len=16,
                            vocab_size=1009)
        tr = Trainer(cfg, TrainConfig(loss="infonce_hn", max_len=16))
        tr.init(total_steps=4)
        # row 0's mined negative IS row 1's positive text (legit), and
        # row 2's mined negative IS row 2's own positive (collision that
        # mining should never emit, but the loss must tolerate)
        triples = [
            ("alpha one", "body aaa", "body bbb"),
            ("beta two", "body bbb", "body ccc"),
            ("gamma three", "body ccc", "body ccc"),
            ("delta four", "body ddd", "body aaa"),
        ]
        batch = tr.encode_pairs(triples)
        assert "ids3" in batch and batch["nid"].shape == (4,)
        loss = infonce_loss(tr.model, tr.params, batch, 0.05)
        assert np.isfinite(float(loss))
        g = jax.grad(
            lambda p: infonce_loss(tr.model, p, batch, 0.05)
        )(tr.params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
