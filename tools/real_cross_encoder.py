"""Train the stage-3 cross-encoder on the REAL mined pairs (VERDICT r3 #7).

The bi-encoder retrieves; the cross-encoder jointly reads
[CLS] query [SEP] window [SEP] and rescoring the top-k pool is the
classic quality/cost trade (reference capability bar: its "reranker" is
bi-encoder cosine only — reranker_api.py — so this is an extension; the
VERDICT asks for the trade to be MEASURED, then kept or cut).

Recipe: pointwise sigmoid BCE on (q, p, 1) positives + per-positive
sampled in-corpus negatives (q, p', 0) — the standard MS-MARCO-style
construction, air-gapped.  Everything pre-tokenized once; the train step
is one jitted forward/backward at a fixed shape.

Round-5 (VERDICT r4 #3): ``--hard-negatives N --neg-encoder CKPT`` adds
RETRIEVAL-hard negatives — the random-negative CE measured in round 4
learns relevant-vs-random and destroys an already-relevant top-100 pool
when rescoring it (docs/REAL_EVAL.md, recall@10 0.23).  Hard negatives
come from the promoted flagship bi-encoder's rank band: per query, take
the top (skip+band) most-similar pool passages, drop the first ``skip``
ranks (docstring corpora: the nearest non-positive is frequently a
PARAPHRASE of the positive — the round-3 infonce_hn lesson), drop
near-paraphrases by token Jaccard, and sample ``N`` from the rest.
This matches the CE's serving task: ordering WITHIN a retrieval pool.

Outputs: checkpoint (runs/cross-encoder-real), a held-out pool ranking
eval (CE vs bi-encoder-score-free random baseline), the measured
device cost of a top-100 rescore, and a JSON record.

Usage:
    python tools/real_cross_encoder.py --pairs /tmp/real_pairs3.tsv \
        [--out runs/cross-encoder-real] [--limit 120000] [--epochs 1]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from real_encoder import holdout_split  # noqa: E402


def tokenize_joint(tokenizer, max_len, q, p):
    q_ids = list(tokenizer.encode(q))
    from modern_search_engines_project_tpu.text.hash_tokenizer import SEP_ID

    budget = max_len - 3 - len(q_ids)
    return q_ids + [SEP_ID] + list(tokenizer.encode(p))[: max(budget, 0)]


def pad_all(tokenizer, seqs, max_len):
    ids, mask = tokenizer.pad_batch(seqs, max_len)
    return np.asarray(ids, np.int32), np.asarray(mask, np.int32)


def _tokset(text):
    return frozenset(text.lower().split())


def mine_band_negatives(ckpt, train_pairs, per_pos, skip, band, seed):
    """(query -> [hard negative texts]) via the bi-encoder's rank band.

    Embeds queries + the unique-passage pool with the checkpointed
    flagship (the tower that builds the serving pool), takes the top
    (skip+band) pool passages per query on device, skips the first
    ``skip`` ranks and any candidate with token-Jaccard > 0.6 against
    the positive (paraphrase false-negative guard), then samples
    ``per_pos`` of the remainder."""
    import jax
    import jax.numpy as jnp

    from modern_search_engines_project_tpu.models.encoder import JaxEncoder

    enc = JaxEncoder.from_checkpoint(ckpt, batch_size=256)
    queries = [q for q, _ in train_pairs]
    positives = [p for _, p in train_pairs]
    pool = list(dict.fromkeys(positives))
    t0 = time.time()
    qv = np.asarray(enc.encode_batch(queries), np.float32)
    pv = np.asarray(enc.encode_batch(pool), np.float32)
    embed_s = time.time() - t0
    top = min(skip + band, len(pool))

    @jax.jit
    def _top_slice(qc, pT):
        return jax.lax.top_k(qc @ pT, top)

    pT = jnp.asarray(pv).T
    rng = random.Random(seed)
    pos_toks = None
    out = []
    kept = dropped_para = 0
    chunk = 2048
    for c0 in range(0, len(queries), chunk):
        c1 = min(c0 + chunk, len(queries))
        _, idx = _top_slice(jnp.asarray(qv[c0:c1]), pT)
        idx = np.asarray(idx)
        for r in range(c1 - c0):
            pos = positives[c0 + r]
            pos_toks = _tokset(pos)
            cands = []
            for j in idx[r][skip:]:
                cand = pool[j]
                if cand == pos:
                    continue
                ct = _tokset(cand)
                inter = len(ct & pos_toks)
                if inter > 0.6 * len(ct | pos_toks):
                    dropped_para += 1
                    continue
                cands.append(cand)
            rng.shuffle(cands)
            out.append(cands[:per_pos])
            kept += len(cands[:per_pos])
    stats = {
        "pool": len(pool), "embed_seconds": round(embed_s, 1),
        "mine_seconds": round(time.time() - t0 - embed_s, 1),
        "hard_kept": kept, "paraphrase_dropped": dropped_para,
        "skip": skip, "band": band,
    }
    return out, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", required=True)
    ap.add_argument("--limit", type=int, default=120_000,
                    help="max PAIRS read (triples = ~(1+negatives)x)")
    ap.add_argument("--out", default=str(REPO / "runs" / "cross-encoder-real"))
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--negatives", type=int, default=1,
                    help="RANDOM negatives per positive")
    ap.add_argument("--hard-negatives", type=int, default=0,
                    help="retrieval-hard negatives per positive, mined "
                         "with --neg-encoder's rank band")
    ap.add_argument("--neg-encoder", default=None,
                    help="bi-encoder checkpoint to mine hard negatives "
                         "with (e.g. runs/encoder-real)")
    ap.add_argument("--neg-skip", type=int, default=2,
                    help="skip the closest ranks (paraphrase guard)")
    ap.add_argument("--neg-band", type=int, default=48,
                    help="sample hard negatives from ranks "
                         "[skip, skip+band)")
    ap.add_argument("--max-len", type=int, default=192)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--holdout-every", type=int, default=10)
    ap.add_argument("--eval-queries", type=int, default=300)
    ap.add_argument("--eval-pool", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from modern_search_engines_project_tpu.models.cross_encoder import (
        CrossEncoderReranker,
    )
    from modern_search_engines_project_tpu.models.data import load_pairs_tsv
    from modern_search_engines_project_tpu.models.encoder import EncoderConfig

    record: dict = {"argv": sys.argv[1:]}
    pairs = load_pairs_tsv(args.pairs, args.limit)
    train_pairs, held = holdout_split(pairs, args.holdout_every)
    print(f"{len(pairs)} pairs -> {len(train_pairs)} train / {len(held)} held",
          file=sys.stderr)
    record["pairs"] = {
        "total": len(pairs), "train": len(train_pairs), "held": len(held),
    }

    hard = [[] for _ in train_pairs]
    if args.hard_negatives:
        if not args.neg_encoder:
            ap.error("--hard-negatives needs --neg-encoder")
        hard, mine_stats = mine_band_negatives(
            args.neg_encoder, train_pairs, args.hard_negatives,
            args.neg_skip, args.neg_band, seed=17,
        )
        record["mining"] = mine_stats
        print(f"mined {mine_stats}", file=sys.stderr)

    rng = random.Random(11)
    passages = [p for _, p in train_pairs]
    triples = []
    for i, (q, p) in enumerate(train_pairs):
        triples.append((q, p, 1.0))
        for neg in hard[i]:
            triples.append((q, neg, 0.0))
        for _ in range(args.negatives):
            neg = passages[rng.randrange(len(passages))]
            if neg != p:
                triples.append((q, neg, 0.0))
    rng.shuffle(triples)
    record["triples"] = len(triples)

    enc_cfg = EncoderConfig(
        dim=args.dim,
        n_layers=args.layers,
        n_heads=max(1, args.dim // 64),
        max_len=max(args.max_len, 192),
    )
    reranker = CrossEncoderReranker(
        enc_cfg, batch_size=args.batch_size, max_len=args.max_len
    )
    tok = reranker.tokenizer

    t0 = time.time()
    seqs = [tokenize_joint(tok, args.max_len, q, p) for q, p, _ in triples]
    ids, mask = pad_all(tok, seqs, args.max_len)
    labels = np.asarray([l for _, _, l in triples], np.float32)
    print(f"pre-tokenized {len(seqs)} joints in {time.time() - t0:.1f}s",
          file=sys.stderr)

    model = reranker.model
    tx = optax.adamw(args.lr)
    params = reranker.params
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids, mask, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, ids, mask)
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(logits, labels)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = args.batch_size
    n = (len(triples) // bs) * bs
    order = np.arange(n)
    t0 = time.time()
    first = last = None
    steps = 0
    nprng = np.random.default_rng(5)
    for ep in range(args.epochs):
        nprng.shuffle(order)
        for s in range(0, n, bs):
            sel = order[s : s + bs]
            params, opt_state, loss = step(
                params, opt_state,
                jnp.asarray(ids[sel]), jnp.asarray(mask[sel]),
                jnp.asarray(labels[sel]),
            )
            steps += 1
            if steps % 100 == 0:
                lv = float(loss)
                last = lv
                if first is None:
                    first = lv
                print(f"step {steps} loss {lv:.4f} "
                      f"({(time.time() - t0) / steps:.2f}s/step)",
                      file=sys.stderr)
    train_s = time.time() - t0
    record["train"] = {
        "steps": steps, "seconds": round(train_s, 1),
        "loss_first": first, "loss_last": last,
        "params_m": round(
            sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6, 1
        ),
    }
    reranker.params = jax.device_put(jax.tree_util.tree_map(np.asarray, params))

    # ---- held-out pool ranking: does the CE rank its positive first? ------
    # with --neg-encoder the pool is the bi-encoder's own top-(P-1) most
    # similar held passages (the serving regime: rescoring an
    # already-relevant retrieval pool); otherwise random passages.
    t0 = time.time()
    eval_q = held[: args.eval_queries]
    pool_src = [p for _, p in held]
    hard_pools = None
    if args.neg_encoder:
        from modern_search_engines_project_tpu.models.encoder import (
            JaxEncoder,
        )

        menc = JaxEncoder.from_checkpoint(args.neg_encoder, batch_size=256)
        uniq = list(dict.fromkeys(pool_src))
        qv = np.asarray(
            menc.encode_batch([q for q, _ in eval_q]), np.float32
        )
        pv = np.asarray(menc.encode_batch(uniq), np.float32)
        topn = min(args.eval_pool + 4, len(uniq))
        _, hp_idx = jax.lax.top_k(
            jnp.asarray(qv) @ jnp.asarray(pv).T, topn
        )
        hp_idx = np.asarray(hp_idx)
        hard_pools = [[uniq[j] for j in row] for row in hp_idx]
    recall1 = recall10 = mrr = 0.0
    fwd = jax.jit(
        lambda p, i, m: model.apply({"params": p}, i, m)
    )
    for qi, (q, pos) in enumerate(eval_q):
        pool = [pos]
        if hard_pools is not None:
            pool += [c for c in hard_pools[qi] if c != pos][
                : args.eval_pool - 1
            ]
        prng = random.Random(1000 + qi)
        while len(pool) < args.eval_pool:
            cand = pool_src[prng.randrange(len(pool_src))]
            if cand != pos:
                pool.append(cand)
        seqs = [tokenize_joint(tok, args.max_len, q, p) for p in pool]
        pi, pm = pad_all(tok, seqs, args.max_len)
        logits = np.asarray(fwd(reranker.params, jnp.asarray(pi),
                                jnp.asarray(pm)))
        rank = int((logits > logits[0]).sum()) + 1
        recall1 += rank == 1
        recall10 += rank <= 10
        mrr += 1.0 / rank
    nq = max(len(eval_q), 1)
    record["eval"] = {
        "recall@1": round(recall1 / nq, 4),
        "recall@10": round(recall10 / nq, 4),
        "mrr": round(mrr / nq, 4),
        "n_queries": nq,
        "pool": args.eval_pool,
        "random_recall@10": round(10 / args.eval_pool, 4),
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(record["eval"]), file=sys.stderr)

    # ---- device cost of a top-100 rescore (the serving trade) -------------
    k = 100
    dummy = jnp.asarray(ids[:k]), jnp.asarray(mask[:k])
    rs = jax.jit(lambda p, i, m: jnp.sum(model.apply({"params": p}, i, m)))
    _ = float(rs(reranker.params, *dummy))
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        _ = float(rs(reranker.params, *dummy))
        best = min(best, time.time() - t0)
    record["rescore_top100_ms"] = round(best * 1e3, 2)
    print(f"top-100 rescore: {record['rescore_top100_ms']} ms", file=sys.stderr)

    reranker.save(args.out)
    record["saved_to"] = args.out
    rec_path = str(REPO / "docs" / "real_cross_encoder_record.json")
    with open(rec_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "argv"}))
    print(f"wrote {rec_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
