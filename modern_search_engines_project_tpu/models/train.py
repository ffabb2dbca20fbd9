"""Bi-encoder fine-tuning: cosine-similarity loss + hard-negative mining.

TPU-native port of the reference's embedder training
(``embedder_training/train.py``): pairs with binary labels trained under
``CosineSimilarityLoss`` (MSE between cosine and label, train.py:93),
hard negatives mined per anchor with an embedding model (train.py:48-60 —
the reference uses a static retrieval model + FAISS; here mining is one
brute-force device matmul, which on TPU *is* the fast path), AdamW with
linear warmup (warmup_ratio 0.1, lr 2e-5, train.py:96-112), bf16 compute.

Multi-chip: parameters are sharded tensor-parallel over axis ``"tp"`` and
the batch data-parallel over ``"dp"`` via NamedSharding annotations — XLA's
SPMD partitioner inserts the psum/all-gather collectives (no hand-written
NCCL analog, SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modern_search_engines_project_tpu.models.encoder import (
    BiEncoder,
    EncoderConfig,
)
from modern_search_engines_project_tpu.text.hash_tokenizer import HashTokenizer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5  # train.py:101
    warmup_ratio: float = 0.1  # train.py:102
    batch_size: int = 256  # train.py:99 (report: 1024 on H100)
    epochs: int = 1  # train.py:100
    num_negatives: int = 5  # train.py:54
    max_len: int = 128
    weight_decay: float = 0.01
    seed: int = 0
    # "cosine": reference CosineSimilarityLoss parity (train.py:93) — the
    #   right objective when FINE-TUNING a pretrained backbone like the
    #   reference does.  "infonce": symmetric in-batch contrastive — the
    #   from-scratch recipe (no pretrained backbone exists air-gapped);
    #   every other batch row is a negative, so the retrieval signal per
    #   step is ~B x stronger than pairwise MSE.  "infonce_hn": infonce
    #   plus one MINED hard negative per row (DPR-style third tower) —
    #   the denominator sees B-1 in-batch + B mined negatives; used for
    #   stage-B training after mining with the stage-A encoder (the
    #   air-gapped analog of the reference's static-model FAISS mining,
    #   train.py:48-60).
    loss: str = "cosine"
    temperature: float = 0.05


def cosine_loss(model: BiEncoder, params, batch) -> jnp.ndarray:
    """CosineSimilarityLoss parity: MSE(cos(e1, e2), label)."""
    e1 = model.apply({"params": params}, batch["ids1"], batch["mask1"])
    e2 = model.apply({"params": params}, batch["ids2"], batch["mask2"])
    cos = jnp.sum(e1 * e2, axis=-1)
    return jnp.mean((cos - batch["label"]) ** 2)


def infonce_loss(
    model: BiEncoder, params, batch, temperature: float
) -> jnp.ndarray:
    """Symmetric in-batch contrastive loss over positive pairs.

    Rows whose query/passage TEXT repeats elsewhere in the batch (real
    docstring corpora repeat both: "Initialize self", shared bodies) are
    masked out of the negative set via the qid/pid hashes — otherwise
    they are false negatives and the objective fights itself."""
    e1 = model.apply({"params": params}, batch["ids1"], batch["mask1"])
    e2 = model.apply({"params": params}, batch["ids2"], batch["mask2"])
    logits = (e1 @ e2.T) / temperature  # [B, B]
    B = logits.shape[0]
    eye = jnp.eye(B, dtype=bool)
    dup_p = (batch["pid"][:, None] == batch["pid"][None, :]) & ~eye
    dup_q = (batch["qid"][:, None] == batch["qid"][None, :]) & ~eye
    diag = jnp.diagonal(logits)
    l_qp = jnp.where(dup_p, -1e9, logits)
    l_pq = jnp.where(dup_q, -1e9, logits.T)
    if "ids3" in batch:
        # DPR-style mined hard negatives: a third tower of one mined
        # negative per row extends the q->p denominator to [B, 2B].
        # A mined negative whose TEXT equals query i's own positive is a
        # false negative for row i — masked via the nid/pid hashes.
        e3 = model.apply({"params": params}, batch["ids3"], batch["mask3"])
        l_neg = (e1 @ e3.T) / temperature  # [B, B]
        false_neg = batch["pid"][:, None] == batch["nid"][None, :]
        l_neg = jnp.where(false_neg, -1e9, l_neg)
        l_qp = jnp.concatenate([l_qp, l_neg], axis=1)  # [B, 2B]
    loss_qp = jnp.mean(jax.nn.logsumexp(l_qp, axis=1) - diag)
    loss_pq = jnp.mean(jax.nn.logsumexp(l_pq, axis=1) - diag)
    return 0.5 * (loss_qp + loss_pq)


def mine_hard_negatives(
    encoder,
    queries: Sequence[str],
    positives: Sequence[str],
    pool: Sequence[str],
    k: int = 5,
) -> List[Tuple[str, str, float]]:
    """(query, passage, label) triples: each positive pair plus the k
    most-similar non-positive pool passages as negatives (train.py:48-92).

    ``encoder`` is any encode_batch model (typically the untrained or a
    frozen encoder, mirroring the reference's separate static mining model).
    """
    q = np.asarray(encoder.encode_batch(list(queries)), np.float32)
    p = np.asarray(encoder.encode_batch(list(pool)), np.float32)
    triples: List[Tuple[str, str, float]] = []
    # chunked scoring: the full [n_queries, n_pool] similarity matrix is
    # ~100 GB at the 160k-pair real-corpus scale — score a query chunk per
    # device matmul, take the top slice ON DEVICE (lax.top_k), and only
    # move [chunk, top] back (the host-numpy version of this loop cost
    # 26 min at 118k x 52k on the 1-core dev box; the device does it in
    # seconds and transfers ~100x less)
    chunk = 4096
    top = min(k + 8, len(pool))  # headroom to skip the positive (+ dups)

    @jax.jit
    def _top_slice(qc, pT):
        return jax.lax.top_k(qc @ pT, top)

    p_dev = jnp.asarray(p).T
    for c0 in range(0, len(queries), chunk):
        c1 = min(c0 + chunk, len(queries))
        _, idx = _top_slice(jnp.asarray(q[c0:c1]), p_dev)
        idx = np.asarray(idx)
        for r in range(c1 - c0):
            i = c0 + r
            query, pos = queries[i], positives[i]
            triples.append((query, pos, 1.0))
            negs = 0
            for j in idx[r]:
                if pool[j] == pos:
                    continue
                triples.append((query, pool[j], 0.0))
                negs += 1
                if negs >= k:
                    break
    return triples


def mine_hn_triples(
    encoder,
    pairs: Sequence[Tuple[str, str]],
    pool: Optional[Sequence[str]] = None,
    per_pair: int = 1,
) -> List[Tuple[str, str, str]]:
    """(query, positive, mined-negative) triples for ``loss="infonce_hn"``.

    Mines with ``encoder`` (typically the stage-A in-batch-trained tower —
    the air-gapped analog of the reference's static mining model,
    train.py:48-60) and emits ``per_pair`` rows per pair, one mined
    negative each (rank 1..per_pair below the positive)."""
    queries = [q for q, _ in pairs]
    positives = [p for _, p in pairs]
    if pool is None:
        pool = list(dict.fromkeys(positives))
    flat = mine_hard_negatives(
        encoder, queries, positives, pool, k=per_pair
    )
    out: List[Tuple[str, str, str]] = []
    cur_q = cur_p = None
    mined_pairs = set()
    for q, text, label in flat:
        if label == 1.0:
            cur_q, cur_p = q, text
        else:
            out.append((cur_q, cur_p, text))
            mined_pairs.add((cur_q, cur_p))
    # a pair whose candidate slice is all its own positive text yields no
    # negative and is silently dropped; an entirely degenerate pool (e.g.
    # one unique passage) would hand stage B an empty set — fail loudly
    # here, not after hours of stage-A training
    if not out:
        raise ValueError(
            "hard-negative mining produced no triples: the passage pool "
            f"({len(pool)} texts) has no non-positive candidates"
        )
    # partial degeneracy is quieter but still data loss: say how many
    # pairs contributed nothing so a heavily-deduplicated corpus doesn't
    # silently train stage B on a fraction of the data (ADVICE r3)
    dropped = len(pairs) - len(mined_pairs)
    if dropped:
        import logging

        logging.getLogger(__name__).warning(
            "mine_hn_triples: %d/%d pairs yielded no mined negative "
            "(candidate slices exhausted by duplicates/positives); "
            "stage B trains on %d triples",
            dropped, len(pairs), len(out),
        )
    return out


class Trainer:
    def __init__(
        self,
        enc_cfg: Optional[EncoderConfig] = None,
        train_cfg: Optional[TrainConfig] = None,
        mesh: Optional[Mesh] = None,
        dp_axis: str = "dp",
        tp_axis: str = "tp",
    ):
        self.enc_cfg = enc_cfg or EncoderConfig()
        self.cfg = train_cfg or TrainConfig()
        self.model = BiEncoder(self.enc_cfg)
        self.tokenizer = HashTokenizer(self.enc_cfg.vocab_size)
        self.mesh = mesh
        self.dp_axis, self.tp_axis = dp_axis, tp_axis
        self._step_fn = None
        self.params = None
        self.opt_state = None
        self.tx = None
        self.step_count = 0

    # -- setup ---------------------------------------------------------------

    def init(self, total_steps: int = 1000, params=None):
        """Create params + optimizer.  Pass ``params`` to warm-start from a
        previously trained tower (stage-B mined-negative training)."""
        cfg = self.cfg
        L = cfg.max_len
        ids = jnp.zeros((1, L), jnp.int32)
        mask = jnp.ones((1, L), jnp.int32)
        if params is None:
            params = self.model.init(
                jax.random.key(cfg.seed), ids, mask
            )["params"]
        else:
            # the step function DONATES its param buffers — warm-starting
            # from a caller's live tree (stage-B training) must copy, or
            # the caller's params (and any encoder aliasing them) are
            # deleted at the first step
            params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params
            )
        warmup = max(1, int(total_steps * cfg.warmup_ratio))
        sched = optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, warmup),
                optax.linear_schedule(
                    cfg.learning_rate, 0.0, max(1, total_steps - warmup)
                ),
            ],
            [warmup],
        )
        self.tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
        if self.mesh is not None:
            params = jax.device_put(params, self.param_shardings(params))
        self.params = params
        self.opt_state = self.tx.init(params)
        self._step_fn = self._build_step()
        return self

    # -- sharding rules (tp over feature axes, scaling-book style) -----------

    def _param_spec(self, path: Tuple[str, ...], x) -> P:
        names = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(names)
        if x.ndim < 2:
            return P()
        if "tok" in joined and "embedding" in joined:
            return P(None, self.tp_axis)
        if "qkv" in joined or "wi" in joined:
            return P(None, self.tp_axis)
        if "proj" in joined or "wo" in joined:
            return P(self.tp_axis, None)
        return P()

    def param_shardings(self, params):
        mesh = self.mesh
        return jax.tree_util.tree_map_with_path(
            lambda path, x: NamedSharding(mesh, self._param_spec(path, x)),
            params,
        )

    # -- train step ----------------------------------------------------------

    def _build_step(self):
        model, tx = self.model, self.tx
        use_infonce = self.cfg.loss in ("infonce", "infonce_hn")
        temp = self.cfg.temperature

        def step(params, opt_state, batch):
            if use_infonce:
                loss_fn = lambda p: infonce_loss(model, p, batch, temp)  # noqa: E731
            else:
                loss_fn = lambda p: cosine_loss(model, p, batch)  # noqa: E731
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0, 1))
        pshard = self.param_shardings(self.params)
        dshard = NamedSharding(self.mesh, P(self.dp_axis))
        keys = ["ids1", "mask1", "ids2", "mask2", "label", "qid", "pid"]
        if self.cfg.loss == "infonce_hn":
            keys += ["ids3", "mask3", "nid"]
        batch_shardings = {k: dshard for k in keys}
        # opt_state sharding is inherited from the (sharded) params it was
        # initialized from; jit keeps it via in_shardings=None passthrough
        return jax.jit(
            step,
            in_shardings=(pshard, None, batch_shardings),
            # pin output param shardings: otherwise GSPMD may re-propagate a
            # different layout and step N+1's input constraint mismatches
            out_shardings=(pshard, None, NamedSharding(self.mesh, P())),
            donate_argnums=(0, 1),
        )

    # -- data ----------------------------------------------------------------

    def encode_pairs(
        self, triples: Sequence[Tuple[str, str, float]]
    ) -> dict:
        """Tokenize (query, passage, label) triples into a train batch.

        When the third element is a STRING it is a mined hard-negative
        passage (loss="infonce_hn"): a third tower ids3/mask3 plus its
        text-identity hash ``nid`` are emitted and ``label`` is fixed 1.0.
        """
        L = self.cfg.max_len
        import zlib

        hn = bool(triples) and isinstance(triples[0][2], str)
        # the step function's loss AND (on a mesh) its batch shardings are
        # keyed off cfg.loss — mismatched data would crash at step 1 on a
        # mesh or silently train the wrong objective off one
        if hn and self.cfg.loss != "infonce_hn":
            raise ValueError(
                "(q, p, negative-text) triples require loss='infonce_hn' "
                f"(got {self.cfg.loss!r})"
            )
        if not triples:
            raise ValueError("no training examples provided (empty batch)")
        if self.cfg.loss == "infonce_hn" and not hn:
            raise ValueError(
                "loss='infonce_hn' requires (q, p, negative-text) triples "
                "(e.g. from mine_hn_triples); got float labels"
            )
        t1 = [self.tokenizer.encode(a) for a, _, _ in triples]
        t2 = [self.tokenizer.encode(b) for _, b, _ in triples]
        ids1, mask1 = self.tokenizer.pad_batch(t1, L)
        ids2, mask2 = self.tokenizer.pad_batch(t2, L)
        extra: dict = {}
        if hn:
            t3 = [self.tokenizer.encode(c) for _, _, c in triples]
            ids3, mask3 = self.tokenizer.pad_batch(t3, L)
            extra = {
                "ids3": np.asarray(ids3, np.int32),
                "mask3": np.asarray(mask3, np.int32),
                "nid": np.asarray(
                    [zlib.crc32(c.encode()) for _, _, c in triples],
                    np.uint32,
                ),
            }
        return {
            **extra,
            "ids1": np.asarray(ids1, np.int32),
            "mask1": np.asarray(mask1, np.int32),
            "ids2": np.asarray(ids2, np.int32),
            "mask2": np.asarray(mask2, np.int32),
            "label": np.asarray(
                [1.0] * len(triples) if hn else [l for _, _, l in triples],
                np.float32,
            ),
            # text-identity hashes: infonce masks in-batch false negatives
            "qid": np.asarray(
                [zlib.crc32(a.encode()) for a, _, _ in triples], np.uint32
            ),
            "pid": np.asarray(
                [zlib.crc32(b.encode()) for _, b, _ in triples], np.uint32
            ),
        }

    def train(
        self,
        triples: Sequence[Tuple[str, str, float]],
        epochs: Optional[int] = None,
        batch_size: Optional[int] = None,
        log_every: int = 50,
    ) -> List[float]:
        """Mini-batch training loop; returns per-step losses."""
        epochs = epochs or self.cfg.epochs
        bs = batch_size or self.cfg.batch_size
        n = len(triples)
        steps_per_epoch = max(1, n // bs)
        if self.params is None:
            import sys as _sys
            import time as _time

            _t0 = _time.time()
            print("trainer.init ...", file=_sys.stderr, flush=True)
            self.init(total_steps=steps_per_epoch * epochs)
            print(f"trainer.init done in {_time.time() - _t0:.1f}s",
                  file=_sys.stderr, flush=True)
        rng = np.random.default_rng(self.cfg.seed)
        losses: List[float] = []
        order = np.arange(n)
        # pre-tokenize the whole set once when it fits (~16 bytes/token):
        # per-step host tokenization otherwise serializes with the device
        # step and starves the chip at real-corpus scale
        pre = None
        bytes_per_tok = 24 if self.cfg.loss == "infonce_hn" else 16
        if n * self.cfg.max_len * bytes_per_tok < 6e9:
            import sys as _sys
            import time as _time

            _t0 = _time.time()
            print(f"pre-tokenizing {n} triples ...", file=_sys.stderr,
                  flush=True)
            pre = self.encode_pairs(triples)
            print(f"pre-tokenized in {_time.time() - _t0:.1f}s",
                  file=_sys.stderr, flush=True)
        for _ in range(epochs):
            rng.shuffle(order)
            for s in range(steps_per_epoch):
                idx = order[s * bs : (s + 1) * bs]
                if len(idx) < bs:  # static shapes: wrap around
                    idx = np.concatenate([idx, order[: bs - len(idx)]])
                if pre is not None:
                    batch = {k: v[idx] for k, v in pre.items()}
                else:
                    batch = self.encode_pairs([triples[i] for i in idx])
                self.params, self.opt_state, loss = self._step_fn(
                    self.params, self.opt_state, batch
                )
                self.step_count += 1
                losses.append(float(loss))
        return losses

    def to_encoder(self, batch_size: int = 64):
        from modern_search_engines_project_tpu.models.encoder import JaxEncoder

        return JaxEncoder(
            self.enc_cfg,
            params=self.params,
            batch_size=batch_size,
            max_len=self.cfg.max_len,
        )
