"""Train the on-TPU generative summarizer on REAL mined pairs (VERDICT r4 #10).

The reference's search assistant calls an external 235B LLM
(``search_assistant/main.py:57-65``); the repo's offline default is
extractive.  This closes the abstractive gap TPU-first: a small causal
decoder (``models/decoder.py``) learns (window text -> summary head) from
the same mined pair file the bi-encoder trains on, so
``/api/generate_summary`` can serve model-generated text with zero
external dependencies.

Row construction (mirrors GenerativeSummarizer's serving prompt):
    [BOS] pseudo-query <sep> body-words <sep> summary-words [EOS]
where the pseudo-query is a few content words sampled from the summary —
at serving time the REAL user query sits in that slot, so the model
learns query-conditioned summarization rather than lead-sentence copying.
Loss is teacher-forced cross-entropy masked to the summary span.

Eval: held-out token-level F1 of the greedy decode vs the true summary
head, against the extractive backend on the same inputs.

Usage:
    python tools/real_summarizer.py --pairs /tmp/real_pairs3.tsv \
        [--limit 200000] [--epochs 2] [--out runs/summarizer-real]
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from real_encoder import holdout_split  # noqa: E402


def build_rows(pairs, vocab, cfg, max_new, rng):
    """Returns (ids, mask, tpos, tlab, tw): the loss runs only on the
    target span's positions (tpos, [N, max_new+1]) with next-token labels
    tlab and weights tw — the full [B, L, vocab] logits tensor is 3.1 GB
    per batch-128 step at L=192/V=32k, so the vocab projection must only
    ever see the ~max_new masked positions."""
    from modern_search_engines_project_tpu.models.word_vocab import (
        BOS_ID,
        EOS_ID,
        SEP_ID,
        UNK_ID,
    )

    L = cfg.max_len
    P = max_new + 1
    tgt_budget = max_new - 1
    n = len(pairs)
    ids = np.zeros((n, L), np.int32)
    mask = np.zeros((n, L), np.int32)
    tpos = np.zeros((n, P), np.int32)
    tlab = np.zeros((n, P), np.int32)
    tw = np.zeros((n, P), np.float32)
    kept = 0
    for summary, body in pairs:
        t = vocab.encode(summary)[:tgt_budget]
        if len(t) < 3 or sum(1 for x in t if x == UNK_ID) > len(t) // 2:
            continue
        content = [x for x in t if x != UNK_ID]
        k = rng.randint(2, 4)
        pq = rng.sample(content, min(k, len(content)))
        src_budget = L - max_new - len(pq) - 3
        s = vocab.encode(body)[:src_budget]
        seq = [BOS_ID] + pq + [SEP_ID] + s + [SEP_ID] + t + [EOS_ID]
        start = len(seq) - len(t) - 2  # index of the 2nd SEP
        ids[kept, : len(seq)] = seq
        mask[kept, : len(seq)] = 1
        span = len(t) + 1  # predict t... plus EOS
        tpos[kept, :span] = start + np.arange(span)
        tlab[kept, :span] = seq[start + 1 : start + span + 1]
        tw[kept, :span] = 1.0
        kept += 1
    return ids[:kept], mask[:kept], tpos[:kept], tlab[:kept], tw[:kept]


def token_f1(hyp: str, ref: str) -> float:
    h, r = hyp.lower().split(), ref.lower().split()
    if not h or not r:
        return 0.0
    from collections import Counter

    common = sum((Counter(h) & Counter(r)).values())
    if not common:
        return 0.0
    p, rr = common / len(h), common / len(r)
    return 2 * p * rr / (p + rr)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from modern_search_engines_project_tpu.models.decoder import (
        DecoderConfig,
        DecoderLM,
        GreedyGenerator,
        save_decoder,
    )
    from modern_search_engines_project_tpu.models.word_vocab import (
        BOS_ID,
        SEP_ID,
        WordVocab,
    )
    from modern_search_engines_project_tpu.serving.assistant import (
        ExtractiveSummarizer,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", required=True)
    ap.add_argument("--limit", type=int, default=200_000)
    ap.add_argument("--out", default=str(REPO / "runs" / "summarizer-real"))
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--vocab-size", type=int, default=32000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=192)
    ap.add_argument("--max-new", type=int, default=48)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--holdout-every", type=int, default=10)
    ap.add_argument("--eval-queries", type=int, default=300)
    ap.add_argument("--record", default=str(
        REPO / "docs" / "real_summarizer_record.json"
    ))
    args = ap.parse_args()
    rng = random.Random(7)
    record = {"argv": sys.argv[1:]}

    pairs = []
    with open(args.pairs, encoding="utf-8") as f:
        for line in f:
            q, _, p = line.rstrip("\n").partition("\t")
            if q and p:
                pairs.append((q, p))
            if args.limit and len(pairs) >= args.limit:
                break
    train, held = holdout_split(pairs, every=args.holdout_every)
    record["pairs"] = {"total": len(pairs), "train": len(train),
                       "held": len(held)}
    print(f"{len(train)} train / {len(held)} held", file=sys.stderr)

    vocab = WordVocab.build(
        (s + " " + b for s, b in train), max_words=args.vocab_size
    )
    cfg = DecoderConfig(
        vocab_size=len(vocab), dim=args.dim, n_layers=args.layers,
        n_heads=max(2, args.dim // 64), max_len=args.max_len,
    )
    ids, mask, tpos, tlab, tw = build_rows(
        train, vocab, cfg, args.max_new, rng
    )
    record["rows"] = int(ids.shape[0])
    print(f"{ids.shape[0]} training rows, vocab {len(vocab)}",
          file=sys.stderr)

    model = DecoderLM(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, cfg.max_len), jnp.int32),
        jnp.ones((1, cfg.max_len), jnp.int32),
    )["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    bs = args.batch_size
    steps_per_epoch = max(1, ids.shape[0] // bs)
    total_steps = steps_per_epoch * args.epochs
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, max(10, total_steps // 20), total_steps
    )
    opt = optax.adamw(sched, weight_decay=0.01)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, bi, bm, bp, blab, bw):
        def loss_fn(p):
            logits = model.apply({"params": p}, bi, bm, positions=bp)
            ll = optax.softmax_cross_entropy_with_integer_labels(
                logits, blab
            )
            return (ll * bw).sum() / jnp.maximum(bw.sum(), 1.0)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, ost = opt.update(g, ost, params)
        return optax.apply_updates(params, up), ost, loss

    t0 = time.time()
    losses = []
    loss_dev = None
    n_steps = 0
    order = np.arange(ids.shape[0])
    nprng = np.random.default_rng(11)
    for ep in range(args.epochs):
        nprng.shuffle(order)
        for i in range(steps_per_epoch):
            sel = order[i * bs : (i + 1) * bs]
            if len(sel) < bs:
                break
            params, ost, loss_dev = step(
                params, ost, jnp.asarray(ids[sel]),
                jnp.asarray(mask[sel]), jnp.asarray(tpos[sel]),
                jnp.asarray(tlab[sel]), jnp.asarray(tw[sel]),
            )
            n_steps += 1
            # sync only every 50 steps: float() blocks on the device, and
            # a per-step sync pays a full tunnel RTT per step
            if (i + 1) % 50 == 0 or i == 0:
                losses.append(float(loss_dev))
                if (i + 1) % 200 == 0 or i == 0:
                    print(
                        f"epoch {ep} step {i + 1}/{steps_per_epoch} "
                        f"loss {losses[-1]:.4f} "
                        f"({time.time() - t0:.0f}s)",
                        file=sys.stderr, flush=True,
                    )
    wall = time.time() - t0
    record["train"] = {
        "steps": n_steps, "seconds": round(wall, 1),
        # losses are sampled every 50 steps (per-step sync would pay a
        # tunnel RTT each step)
        "loss_first": round(float(np.mean(losses[:4])), 4),
        "loss_last": round(float(np.mean(losses[-4:])), 4),
        "params_m": round(n_params / 1e6, 2),
    }
    print(f"trained {record['train']}", file=sys.stderr)

    save_decoder(params, cfg, args.out, vocab=vocab)

    # held-out eval: greedy decode vs true summary head, token F1;
    # extractive baseline summarizes the same body text
    gen = GreedyGenerator(model, params, cfg)
    extr = ExtractiveSummarizer()
    f1_gen, f1_ext = [], []
    t0 = time.time()
    evalset = held[: args.eval_queries]
    B_EVAL = 32
    for i in range(0, len(evalset), B_EVAL):
        chunk = evalset[i : i + B_EVAL]
        prompts = []
        for summary, body in chunk:
            content = [
                x for x in vocab.encode(summary)[:40]
                if x >= 5
            ]
            pq = content[:3]
            budget = cfg.max_len - args.max_new - 3
            p = [BOS_ID] + pq + [SEP_ID]
            p += vocab.encode(body)[: budget - len(p)]
            prompts.append(p[:budget] + [SEP_ID])
        toks = gen.generate(prompts, max_new=args.max_new)
        for (summary, body), t in zip(chunk, toks):
            hyp = vocab.decode(t)
            f1_gen.append(token_f1(hyp, summary))
            pseudo_q = " ".join(summary.split()[:3])
            f1_ext.append(
                token_f1(extr.generate_summary(pseudo_q, [body]), summary)
            )
    record["eval"] = {
        "queries": len(f1_gen),
        "token_f1_generative": round(float(np.mean(f1_gen)), 4),
        "token_f1_extractive_baseline": round(float(np.mean(f1_ext)), 4),
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(record["eval"]))
    with open(args.record, "w") as f:
        json.dump(record, f, indent=1)
    print(f"checkpoint: {args.out}\nrecord: {args.record}", file=sys.stderr)


if __name__ == "__main__":
    main()
