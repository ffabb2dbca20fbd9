"""Train the FLAGSHIP bi-encoder (12-layer, 768-d) on real pairs and
evaluate it against the hashing baseline on held-out real queries
(VERDICT r2 #5 — round 2 only ever trained a 2-layer dim-64 toy on
synthetic data).

Pairs are real human-written (summary-line -> docstring-body) pairs from
tools/make_real_corpus.py --pairs (the air-gapped analog of the
reference's GooAQ question->answer pairs, embedder_training/train.py:40-60);
hard negatives are mined with the untrained encoder via the chunked
device matmul (models/train.mine_hard_negatives).

Protocol:
  * strict held-out split: only pairs whose query AND passage are unique
    corpus-wide are eligible (docstring texts repeat heavily);
  * train on the rest — default recipe is from-scratch InfoNCE
    (see TrainConfig.loss; the reference's CosineSimilarityLoss recipe is
    kept for fine-tuning a pretrained backbone and available via
    --loss cosine — trained from scratch it LOSES to the hash baseline,
    NOTES.md round 3);
  * evaluate retrieval on the held-out set: each held-out query must find
    its own passage inside the full held-out passage pool
    (recall@1/@10, MRR), trained encoder vs HashingEncoder;
  * save the checkpoint + append the quality row to docs/METRICS.md.

Usage:
    python tools/real_encoder.py --pairs /tmp/real_pairs.tsv \
        [--limit 120000] [--out runs/encoder-real] [--epochs 1]
"""

from __future__ import annotations

import argparse
import faulthandler
import signal

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps stacks
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def holdout_split(pairs, every=40, max_held=3000):
    """Strict held-out: only pairs whose query AND passage text occur
    exactly once in the whole set are eligible (docstring corpora repeat
    both heavily — 'Initialize self' etc.; a 'held-out' text that also
    appears in training would leak, and duplicated texts make the
    retrieve-your-own-passage metric ill-defined)."""
    from collections import Counter

    qc = Counter(q for q, _ in pairs)
    pc = Counter(p for _, p in pairs)
    train, held = [], []
    n_eligible = 0
    for pr in pairs:
        q, p = pr
        if qc[q] == 1 and pc[p] == 1:
            n_eligible += 1
            if n_eligible % every == 0 and len(held) < max_held:
                held.append(pr)
                continue
        train.append(pr)
    return train, held


def retrieval_metrics(encoder, held, k=10, batch=256):
    """Each held-out query retrieves from the full held-out passage pool."""
    queries = [q for q, _ in held]
    passages = [p for _, p in held]
    qv = np.asarray(encoder.encode_batch(queries), np.float32)
    pv = np.asarray(encoder.encode_batch(passages), np.float32)
    qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-9)
    pv /= np.maximum(np.linalg.norm(pv, axis=1, keepdims=True), 1e-9)
    n = len(held)
    r1 = r10 = 0
    mrr = 0.0
    for c0 in range(0, n, 2048):
        sims = qv[c0 : c0 + 2048] @ pv.T
        ranks = (-sims).argsort(axis=1)
        for r, row in enumerate(ranks):
            i = c0 + r
            pos = int(np.where(row == i)[0][0])
            r1 += pos == 0
            r10 += pos < k
            mrr += 1.0 / (pos + 1)
    return {
        "recall@1": round(r1 / n, 4),
        f"recall@{k}": round(r10 / n, 4),
        "mrr": round(mrr / n, 4),
        "n_queries": n,
        "pool": n,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", required=True)
    ap.add_argument("--limit", type=int, default=120_000)
    ap.add_argument("--out", default=str(REPO / "runs" / "encoder-real"))
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--negatives", type=int, default=3)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--holdout-every", type=int, default=10)
    ap.add_argument("--loss", choices=["cosine", "infonce", "infonce_hn"],
                    default="infonce",
                    help="cosine = reference CosineSimilarityLoss parity "
                         "(for FINE-TUNING a pretrained backbone); "
                         "infonce = from-scratch contrastive recipe "
                         "(no pretrained backbone exists air-gapped); "
                         "infonce_hn = two-stage: in-batch infonce, then "
                         "mine hard negatives with the stage-A tower and "
                         "continue with a DPR-style third tower")
    ap.add_argument("--stage-a-epochs", type=int, default=None,
                    help="infonce_hn: epochs before mining "
                         "(default: half of --epochs)")
    ap.add_argument("--stage-b-batch-size", type=int, default=None,
                    help="infonce_hn stage B trains THREE towers per row "
                         "(~1.5x the activation HBM of stage A) — batch "
                         "256 OOMs a 16 GB v5e at 12L/768d/len128; "
                         "default: 5/8 of --batch-size rounded to 32")
    ap.add_argument("--lr", type=float, default=None,
                    help="default: 2e-5 for cosine (reference), 1e-3 for "
                         "from-scratch infonce")
    ap.add_argument("--temperature", type=float, default=0.05)
    ap.add_argument("--exclude-holdout-of", default=None,
                    help="path to ANOTHER pairs TSV whose holdout_split "
                         "held texts must not be trained on (contamination "
                         "control: tools/real_eval.py's labeled queries come "
                         "from that file's holdout, so an encoder trained "
                         "on a rescaled pair file stays comparable)")
    args = ap.parse_args()

    from modern_search_engines_project_tpu.models.checkpoint import (
        save_encoder,
    )
    from modern_search_engines_project_tpu.models.data import load_pairs_tsv
    from modern_search_engines_project_tpu.models.encoder import (
        EncoderConfig,
        JaxEncoder,
    )
    from modern_search_engines_project_tpu.models.hash_encoder import (
        HashingEncoder,
    )
    from modern_search_engines_project_tpu.models.train import (
        TrainConfig,
        Trainer,
        mine_hard_negatives,
    )

    record: dict = {"argv": sys.argv[1:]}
    pairs = load_pairs_tsv(args.pairs, args.limit)
    train_pairs, held = holdout_split(pairs, args.holdout_every)
    n_excluded = 0
    if args.exclude_holdout_of:
        other = load_pairs_tsv(args.exclude_holdout_of, 0)
        _, other_held = holdout_split(other, args.holdout_every)
        banned = {q for q, _ in other_held} | {p for _, p in other_held}
        kept = [
            pr for pr in train_pairs
            if pr[0] not in banned and pr[1] not in banned
        ]
        n_excluded = len(train_pairs) - len(kept)
        train_pairs = kept
    print(
        f"{len(pairs)} real pairs -> {len(train_pairs)} train / "
        f"{len(held)} held out"
        + (f" / {n_excluded} excluded (foreign holdout)"
           if args.exclude_holdout_of else ""),
        file=sys.stderr,
    )
    record["pairs"] = {
        "total": len(pairs), "train": len(train_pairs), "held": len(held),
        "excluded_foreign_holdout": n_excluded,
    }

    enc_cfg = EncoderConfig(
        dim=args.dim,
        n_layers=args.layers,
        n_heads=max(1, args.dim // 64),
        max_len=512,
    )
    if args.loss in ("infonce", "infonce_hn"):
        # contrastive recipe: every other batch row is a negative.
        # infonce_hn additionally mines hard negatives AFTER stage A
        # (mining with the untrained tower is noise when training from
        # scratch; mining with the stage-A tower is the DPR recipe).
        triples = [(q, p, 1.0) for q, p in train_pairs]
        record["mining"] = {"triples": len(triples), "skipped": True}
    else:
        # mining with the untrained encoder (reference mines with a
        # separate static model; the untrained tower plays that role
        # air-gapped)
        mining = JaxEncoder(enc_cfg, max_len=args.max_len, batch_size=256)
        t0 = time.time()
        queries = [q for q, _ in train_pairs]
        positives = [p for _, p in train_pairs]
        pool = list(dict.fromkeys(positives))
        triples = mine_hard_negatives(
            mining, queries, positives, pool, k=args.negatives
        )
        record["mining"] = {
            "triples": len(triples),
            "pool": len(pool),
            "seconds": round(time.time() - t0, 1),
        }
        print(f"mined {record['mining']}", file=sys.stderr)

    lr = args.lr or (2e-5 if args.loss == "cosine" else 1e-3)
    two_stage = args.loss == "infonce_hn"
    if two_stage and args.epochs < 2:
        ap.error("--loss infonce_hn needs --epochs >= 2 (stage A + B)")
    stage_a = (
        min(args.stage_a_epochs or max(1, args.epochs // 2),
            args.epochs - 1)
        if two_stage else args.epochs
    )
    tcfg = TrainConfig(
        learning_rate=lr,
        batch_size=args.batch_size,
        epochs=stage_a,
        num_negatives=args.negatives,
        max_len=args.max_len,
        loss="infonce" if two_stage else args.loss,
        temperature=args.temperature,
    )
    record["recipe"] = {"loss": args.loss, "lr": lr, "epochs": args.epochs}
    trainer = Trainer(enc_cfg, tcfg)
    t0 = time.time()
    losses = trainer.train(triples)
    if two_stage:
        import dataclasses

        from modern_search_engines_project_tpu.models.train import (
            mine_hn_triples,
        )

        stage_b = args.epochs - stage_a  # >= 1 by the stage_a clamp
        # insurance: a stage-B failure (e.g. OOM) must not lose stage A
        save_encoder(trainer.params, enc_cfg, args.out + "-stageA",
                     dtype="float16")
        t_mine = time.time()
        miner = trainer.to_encoder(batch_size=256)
        hn_triples = mine_hn_triples(miner, train_pairs, per_pair=1)
        record["mining"] = {
            "triples": len(hn_triples),
            "stage_a_epochs": stage_a,
            "seconds": round(time.time() - t_mine, 1),
        }
        print(f"mined {record['mining']}", file=sys.stderr, flush=True)
        # never EXCEED the user's batch size (it may already be the OOM
        # ceiling); the 32-floor is only a rounding guard below it.  An
        # explicit --stage-b-batch-size is clamped to the same ceiling —
        # stage B adds a third tower, so a value above the stage-A batch
        # would bypass the OOM guard (ADVICE r3)
        if args.stage_b_batch_size:
            bs_b = min(args.stage_b_batch_size, args.batch_size)
            if bs_b != args.stage_b_batch_size:
                print(
                    f"--stage-b-batch-size {args.stage_b_batch_size} "
                    f"clamped to --batch-size {args.batch_size}",
                    file=sys.stderr,
                )
        else:
            bs_b = min(
                args.batch_size,
                max(32, args.batch_size * 5 // 8 // 32 * 32),
            )
        tcfg_b = dataclasses.replace(
            tcfg, loss="infonce_hn", epochs=stage_b, batch_size=bs_b,
            learning_rate=lr * 0.3,  # fine-tune phase: warm params
        )
        trainer_b = Trainer(enc_cfg, tcfg_b)
        steps_b = max(1, len(hn_triples) // bs_b) * stage_b
        trainer_b.init(total_steps=steps_b, params=trainer.params)
        losses += trainer_b.train(hn_triples)
        trainer = trainer_b
    wall = time.time() - t0
    record["train"] = {
        "steps": len(losses),
        "seconds": round(wall, 1),
        "loss_first": round(float(np.mean(losses[:20])), 4),
        "loss_last": round(float(np.mean(losses[-20:])), 4),
        "params_m": round(
            sum(x.size for x in __import__("jax").tree_util.tree_leaves(
                trainer.params
            )) / 1e6, 1
        ),
    }
    print(f"trained {record['train']}", file=sys.stderr)
    # f16 checkpoint (halves the committed artifact); evaluate the
    # RELOADED encoder so the published numbers describe the committed file
    save_encoder(trainer.params, enc_cfg, args.out, dtype="float16")
    trained = JaxEncoder.from_checkpoint(
        args.out, batch_size=256, max_len=args.max_len
    )
    t0 = time.time()
    m_trained = retrieval_metrics(trained, held)
    m_hash = retrieval_metrics(
        HashingEncoder(dim=args.dim), held
    )
    record["eval"] = {
        "trained": m_trained,
        "hashing_baseline": m_hash,
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(record["eval"]))

    rec_path = REPO / "docs" / "real_encoder_record.json"
    rec_path.write_text(json.dumps(record, indent=1))

    # append the non-toy row to METRICS.md
    row = (
        f"| **real pairs (flagship)** | {args.layers}L dim-{args.dim} "
        f"({record['train']['params_m']}M params) | "
        f"{record['pairs']['train']} real pairs, "
        f"{record['recipe']['loss']} lr={record['recipe']['lr']} "
        f"x{args.epochs} epochs, {record['train']['steps']} "
        f"steps | strict held-out {record['pairs']['held']} queries vs "
        f"{record['eval']['trained']['pool']}-passage pool | "
        f"recall@10 **{m_trained['recall@10']}** vs "
        f"{m_hash['recall@10']} (hash), MRR {m_trained['mrr']} vs "
        f"{m_hash['mrr']} |"
    )
    metrics = REPO / "docs" / "METRICS.md"
    text = metrics.read_text() if metrics.exists() else "# METRICS\n"
    text += (
        "\n## Real-pair flagship training (tools/real_encoder.py)\n\n"
        "| run | model | training data | eval protocol | result |\n"
        "|---|---|---|---|---|\n" + row + "\n"
    )
    metrics.write_text(text)
    print(f"metrics appended: {metrics}", file=sys.stderr)


if __name__ == "__main__":
    main()
