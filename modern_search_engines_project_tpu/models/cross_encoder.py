"""Cross-encoder reranker: joint query+window scoring (stage 3, optional).

BASELINE.json lists "cross-encoder reranker (reranker_api path) batched on
top-k hybrid candidates" among the target configs.  The reference's
"reranker" is actually a bi-encoder cosine rerank (reranker_api.py); this
module adds the genuine cross-encoder upgrade: the query and the candidate
window are encoded JOINTLY ([CLS] query [SEP] window [SEP]) through the
same pre-LN/RoPE/GeGLU trunk as the bi-encoder, with a scalar relevance
head on the CLS position.  TPU-shaped: one batched forward over all
(query, window) pairs of the rerank pool.

Training: pointwise sigmoid BCE on (query, passage, label) triples — the
same mined data the bi-encoder uses (models/data.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from modern_search_engines_project_tpu.models.encoder import (
    Block,
    EncoderConfig,
    _rope_angles,
)
from modern_search_engines_project_tpu.text.hash_tokenizer import (
    HashTokenizer,
    SEP_ID,
)


class CrossEncoder(nn.Module):
    """(ids, mask) of joint sequences -> relevance logit [B]."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        x = nn.Embed(c.vocab_size, c.dim, dtype=dt, name="tok")(ids)
        rope = jnp.asarray(
            _rope_angles(c.dim // c.n_heads, c.max_len, c.rope_base),
            jnp.float32,
        )
        bool_mask = mask > 0
        for i in range(c.n_layers):
            x = Block(c, name=f"block{i}")(x, bool_mask, rope)
        x = nn.LayerNorm(dtype=dt, name="ln_f")(x)
        cls = x[:, 0].astype(jnp.float32)  # CLS position
        h = nn.Dense(c.dim, name="head_hidden")(cls)
        h = jax.nn.gelu(h)
        return nn.Dense(1, name="head_out")(h)[:, 0]


class CrossEncoderReranker:
    """Batched (query, window) joint scoring with the protocol the engine's
    optional stage-3 expects: ``rescore(query, texts) -> float32 [n]``."""

    def __init__(
        self,
        cfg: Optional[EncoderConfig] = None,
        params=None,
        seed: int = 0,
        batch_size: int = 32,
        max_len: Optional[int] = None,
    ):
        self.cfg = cfg or EncoderConfig()
        self.model = CrossEncoder(self.cfg)
        self.tokenizer = HashTokenizer(self.cfg.vocab_size)
        self.batch_size = batch_size
        self.max_len = max_len or self.cfg.max_len
        if params is None:
            ids = jnp.zeros((1, self.max_len), jnp.int32)
            mask = jnp.ones((1, self.max_len), jnp.int32)
            params = self.model.init(jax.random.key(seed), ids, mask)["params"]
        self.params = params
        self._fwd = jax.jit(
            lambda p, ids, mask: self.model.apply({"params": p}, ids, mask)
        )

    def save(self, path: str, dtype: str = "float16") -> None:
        """Persist params + config (models/checkpoint.py format; the
        config.json round-trips through EncoderConfig)."""
        from modern_search_engines_project_tpu.models.checkpoint import (
            save_encoder,
        )

        save_encoder(self.params, self.cfg, path, dtype=dtype)

    @classmethod
    def from_checkpoint(
        cls, path: str, batch_size: int = 32, max_len: Optional[int] = None
    ) -> "CrossEncoderReranker":
        import json as _json
        import os as _os

        from flax import serialization

        with open(_os.path.join(path, "config.json")) as f:
            cfg = EncoderConfig(**_json.load(f))
        inst = cls(cfg, batch_size=batch_size, max_len=max_len)
        with open(_os.path.join(path, "params.msgpack"), "rb") as f:
            params = serialization.from_bytes(inst.params, f.read())
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32)
            if getattr(x, "dtype", None) == np.float16
            else x,
            params,
        )
        inst.params = jax.device_put(params)  # pin: jit won't cache numpy args
        return inst

    def _encode_pairs(self, query: str, texts: Sequence[str]):
        q_ids = list(self.tokenizer.encode(query))
        joint = []
        for t in texts:
            t_ids = list(self.tokenizer.encode(t))
            # [CLS] q [SEP] t [SEP], truncating the window first
            body_budget = self.max_len - 3 - len(q_ids)
            joint.append(q_ids + [SEP_ID] + t_ids[: max(body_budget, 0)])
        return self.tokenizer.pad_batch(joint, self.max_len)

    def rescore(self, query: str, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros(len(texts), np.float32)
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            chunk = texts[i : i + bs]
            ids, mask = self._encode_pairs(query, chunk)
            pad = bs - len(chunk) if i + bs > len(texts) else 0
            if pad:
                ids += [[0] * self.max_len] * pad
                mask += [[1] + [0] * (self.max_len - 1)] * pad
            logits = self._fwd(
                self.params,
                jnp.asarray(ids, jnp.int32),
                jnp.asarray(mask, jnp.int32),
            )
            out[i : i + len(chunk)] = np.asarray(
                jax.nn.sigmoid(logits)
            )[: len(chunk)]
        return out


def train_cross_encoder(
    triples: Sequence[Tuple[str, str, float]],
    cfg: Optional[EncoderConfig] = None,
    epochs: int = 1,
    batch_size: int = 16,
    learning_rate: float = 2e-5,
    max_len: int = 128,
    seed: int = 0,
) -> Tuple[object, List[float]]:
    """Pointwise BCE fine-tune; returns (params, losses)."""
    enc_cfg = cfg or EncoderConfig()
    reranker = CrossEncoderReranker(
        enc_cfg, batch_size=batch_size, max_len=max_len, seed=seed
    )
    model = reranker.model
    tx = optax.adamw(learning_rate)
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

    rng = np.random.default_rng(seed)
    order = np.arange(len(triples))
    losses: List[float] = []
    for _ in range(epochs):
        rng.shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[s : s + batch_size]
            batch = [triples[i] for i in idx]
            # per-row queries differ: encode each pair individually
            ids, mask = [], []
            for q, t, _ in batch:
                i2, m2 = reranker._encode_pairs(q, [t])
                ids.append(i2[0])
                mask.append(m2[0])
            labels = jnp.asarray([l for _, _, l in batch], jnp.float32)
            params, opt_state, loss = step(
                params,
                opt_state,
                jnp.asarray(ids, jnp.int32),
                jnp.asarray(mask, jnp.int32),
                labels,
            )
            losses.append(float(loss))
    reranker.params = params
    return reranker, losses
