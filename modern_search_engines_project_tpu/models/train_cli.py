"""Training entry point (reference ``embedder_training/train.py`` analog).

    python -m modern_search_engines_project_tpu.models.train_cli \
        [--pairs pairs.tsv] [--out runs/encoder] [--epochs 1] \
        [--batch-size 256] [--dp N --tp M]

Without --pairs it trains on deterministic synthetic pairs (air-gapped
default).  Hard negatives are mined with the untrained encoder (the
reference mines with a separate static model, train.py:48-60), labels are
binary, loss is CosineSimilarityLoss, optimizer AdamW with 10% linear
warmup — all reference-parity hyperparameters (train.py:93-112).
"""

from __future__ import annotations

import argparse
import logging
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", default=None, help="TSV query\\tpassage")
    parser.add_argument("--limit", type=int, default=10_000)
    parser.add_argument("--out", default="runs/encoder")
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--negatives", type=int, default=5)
    parser.add_argument("--max-len", type=int, default=128)
    parser.add_argument("--dim", type=int, default=768)
    parser.add_argument("--layers", type=int, default=12)
    parser.add_argument("--dp", type=int, default=0, help="data-parallel axis")
    parser.add_argument("--tp", type=int, default=1, help="tensor-parallel axis")
    parser.add_argument("--synthetic", type=int, default=2048)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("train")

    from modern_search_engines_project_tpu.models.checkpoint import save_encoder
    from modern_search_engines_project_tpu.models.data import (
        load_pairs_tsv,
        make_triples,
        synthetic_pairs,
    )
    from modern_search_engines_project_tpu.models.encoder import (
        EncoderConfig,
        JaxEncoder,
    )
    from modern_search_engines_project_tpu.models.train import (
        TrainConfig,
        Trainer,
    )

    pairs = (
        load_pairs_tsv(args.pairs, args.limit)
        if args.pairs
        else synthetic_pairs(args.synthetic)
    )
    log.info("loaded %d pairs", len(pairs))

    enc_cfg = EncoderConfig(
        dim=args.dim,
        n_layers=args.layers,
        n_heads=max(1, args.dim // 64),
        max_len=512,
    )
    mining_encoder = JaxEncoder(enc_cfg, max_len=args.max_len)
    t0 = time.time()
    triples = make_triples(pairs, mining_encoder, num_negatives=args.negatives)
    log.info("mined %d triples in %.1fs", len(triples), time.time() - t0)

    mesh = None
    if args.dp:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[: args.dp * args.tp])
        mesh = Mesh(devs.reshape(args.dp, args.tp), ("dp", "tp"))
        log.info("mesh: dp=%d tp=%d", args.dp, args.tp)

    tcfg = TrainConfig(
        learning_rate=args.lr,
        batch_size=args.batch_size,
        epochs=args.epochs,
        num_negatives=args.negatives,
        max_len=args.max_len,
    )
    trainer = Trainer(enc_cfg, tcfg, mesh=mesh)
    t0 = time.time()
    losses = trainer.train(triples)
    log.info(
        "trained %d steps in %.1fs: loss %.4f -> %.4f",
        len(losses), time.time() - t0, losses[0], losses[-1],
    )
    save_encoder(trainer.params, enc_cfg, args.out)
    log.info("saved encoder to %s", args.out)


if __name__ == "__main__":
    main()
