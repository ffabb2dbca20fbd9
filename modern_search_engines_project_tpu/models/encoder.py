"""TPU-native bi-encoder: ModernBERT-style transformer in flax.

Replaces the reference's downloaded SentenceTransformer
(``as-bessonov/reranker_searchengines_cos2``, a fine-tuned
``answerdotai/ModernBERT-base`` — reference ``embedder_training/train.py:30``,
``config.py:1``).  Architectural traits mirrored from ModernBERT the
TPU-idiomatic way: pre-LayerNorm blocks, rotary position embeddings (no
learned absolute positions), GeGLU feed-forward, mean pooling over the
attention mask, L2-normalized sentence embeddings.

Everything is shaped for the MXU: model dims multiples of 128, bf16
activations with f32 accumulation (``preferred_element_type``), static
sequence length (the chunker guarantees <= window_size tokens per window).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from modern_search_engines_project_tpu.text.hash_tokenizer import HashTokenizer


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 50257
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    mlp_ratio: int = 4
    max_len: int = 512
    dtype: str = "bfloat16"  # activation dtype; params stay f32
    rope_base: float = 10000.0


def _rope_angles(head_dim: int, max_len: int, base: float) -> np.ndarray:
    inv = 1.0 / (base ** (np.arange(0, head_dim, 2) / head_dim))
    t = np.arange(max_len)
    freqs = np.outer(t, inv)  # [L, hd/2]
    return np.stack([np.cos(freqs), np.sin(freqs)], axis=-1)  # [L, hd/2, 2]


def apply_rope(x: jnp.ndarray, rope: jnp.ndarray) -> jnp.ndarray:
    """x: [B, L, H, hd]; rope: [L, hd/2, 2]."""
    L = x.shape[1]
    cos = rope[:L, :, 0][None, :, None, :]
    sin = rope[:L, :, 1][None, :, None, :]
    x1, x2 = x[..., ::2], x[..., 1::2]
    out1 = x1 * cos - x2 * sin
    out2 = x1 * sin + x2 * cos
    return jnp.stack([out1, out2], axis=-1).reshape(x.shape)


class Attention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask, rope):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        hd = c.dim // c.n_heads
        qkv = nn.Dense(3 * c.dim, use_bias=False, dtype=dt, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, L = x.shape[0], x.shape[1]

        def heads(t):
            return t.reshape(B, L, c.n_heads, hd)

        q, k, v = heads(q), heads(k), heads(v)
        q = apply_rope(q, rope).astype(dt)
        k = apply_rope(k, rope).astype(dt)
        att = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(hd))
        att = jnp.where(mask[:, None, None, :], att, -1e30)
        att = jax.nn.softmax(att, axis=-1).astype(dt)
        out = jnp.einsum(
            "bhlm,bmhd->blhd", att, v, preferred_element_type=jnp.float32
        ).astype(dt)
        out = out.reshape(B, L, c.dim)
        return nn.Dense(c.dim, use_bias=False, dtype=dt, name="proj")(out)


class GeGLU(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        hidden = c.dim * c.mlp_ratio
        gate_up = nn.Dense(2 * hidden, use_bias=False, dtype=dt, name="wi")(x)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        return nn.Dense(c.dim, use_bias=False, dtype=dt, name="wo")(
            nn.gelu(gate) * up
        )


class Block(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask, rope):
        dt = jnp.dtype(self.cfg.dtype)
        h = nn.LayerNorm(dtype=dt, name="ln1")(x)
        x = x + Attention(self.cfg, name="attn")(h, mask, rope)
        h = nn.LayerNorm(dtype=dt, name="ln2")(x)
        return x + GeGLU(self.cfg, name="mlp")(h)


class BiEncoder(nn.Module):
    """token ids + mask -> L2-normalized sentence embedding [B, dim]."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        emb = nn.Embed(c.vocab_size, c.dim, dtype=dt, name="tok")(ids)
        rope = jnp.asarray(
            _rope_angles(c.dim // c.n_heads, c.max_len, c.rope_base),
            jnp.float32,
        )
        x = emb
        bool_mask = mask > 0
        for i in range(c.n_layers):
            x = Block(c, name=f"block{i}")(x, bool_mask, rope)
        x = nn.LayerNorm(dtype=dt, name="ln_f")(x)
        # mean pooling over valid tokens (sentence-transformers default)
        m = mask[..., None].astype(jnp.float32)
        pooled = (x.astype(jnp.float32) * m).sum(1) / jnp.maximum(
            m.sum(1), 1.0
        )
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )


class JaxEncoder:
    """encode_batch protocol over the flax BiEncoder (drop-in for
    HashingEncoder in IndexBuilder / SearchEngine)."""

    def __init__(
        self,
        cfg: Optional[EncoderConfig] = None,
        params=None,
        seed: int = 0,
        batch_size: int = 64,
        max_len: Optional[int] = None,
    ):
        self.cfg = cfg or EncoderConfig()
        self.model = BiEncoder(self.cfg)
        self.tokenizer = HashTokenizer(self.cfg.vocab_size)
        self.batch_size = batch_size
        # sequences can't exceed the model's trained position range
        self.max_len = min(max_len or self.cfg.max_len, self.cfg.max_len)
        # Length buckets (VERDICT r4 #2): real queries are 2-6 terms but a
        # single compiled max_len shape padded EVERY query to len-128 — the
        # encoder forward was ~2.3x the whole hybrid rank and mostly padding
        # compute.  Each batch pads to the smallest bucket that fits its
        # longest sequence; one compile per (batch, bucket) shape.
        self.len_buckets = tuple(
            L for L in (16, 32, 64, 128, 256, 512) if L < self.max_len
        ) + (self.max_len,)
        if params is None:
            ids = jnp.zeros((1, self.max_len), jnp.int32)
            mask = jnp.ones((1, self.max_len), jnp.int32)
            params = self.model.init(jax.random.key(seed), ids, mask)["params"]
        # pin the tree on device ONCE: checkpoint loads hand numpy leaves,
        # and jit does NOT cache host->device transfers of numpy args — a
        # 152M-param tree passed as numpy re-uploads ~600 MB per dispatch
        # (measured: a 34k-chunk index build crawled at ~13 batches/min
        # and grew 60+ GB of tunnel transfer buffers before the fix)
        self.params = jax.device_put(params)
        self._fwd = jax.jit(
            lambda p, ids, mask: self.model.apply({"params": p}, ids, mask)
        )

    @property
    def dim(self) -> int:
        return self.cfg.dim

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "JaxEncoder":
        """Load params + config saved by models/checkpoint.save_encoder."""
        from modern_search_engines_project_tpu.models.checkpoint import (
            load_encoder,
        )

        params, enc_cfg = load_encoder(path)
        enc = cls(enc_cfg, params=params, **kw)
        enc.ckpt_path = path
        return enc

    def params_digest(self) -> str:
        """Stable short digest of the parameter tree (provenance).

        Hashes a canonical (sorted path, dtype, shape, raw bytes) form —
        ``flax.serialization.to_bytes`` is NOT stable across jax.Array vs
        numpy leaf types, so hashing it directly would make a freshly
        trained tree and its checkpoint reload disagree."""
        import hashlib

        h = hashlib.sha1()
        leaves = jax.tree_util.tree_leaves_with_path(self.params)
        for path, leaf in sorted(
            leaves, key=lambda kv: jax.tree_util.keystr(kv[0])
        ):
            arr = np.asarray(leaf)
            h.update(jax.tree_util.keystr(path).encode())
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes())
        return h.hexdigest()[:16]

    def describe(self) -> dict:
        """Provenance record stored in index artifacts so serving can refuse
        to pair an index with a mismatched query encoder (ADVICE r1)."""
        return {
            "kind": "jax_biencoder",
            "dim": self.cfg.dim,
            "config": dataclasses.asdict(self.cfg),
            "params_digest": self.params_digest(),
            "ckpt": getattr(self, "ckpt_path", None),
        }

    def bucket_len(self, tok: Sequence[Sequence[int]]) -> int:
        """Smallest length bucket fitting the longest sequence (+2 for
        the tokenizer's CLS/SEP framing), capped at max_len."""
        need = max((len(t) for t in tok), default=0) + 2
        for L in self.len_buckets:
            if L >= need:
                return L
        return self.max_len

    def encode_batch(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.cfg.dim), np.float32)
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            chunk = texts[i : i + bs]
            tok = [self.tokenizer.encode(t) for t in chunk]
            L = self.bucket_len(tok)
            ids, mask = self.tokenizer.pad_batch(tok, L)
            n = len(chunk)
            pad_n = bs - n if i + bs > len(texts) else 0
            if pad_n:  # keep a single compiled batch shape
                ids += [[0] * L] * pad_n
                mask += [[1] + [0] * (L - 1)] * pad_n
            emb = self._fwd(
                self.params,
                jnp.asarray(ids, jnp.int32),
                jnp.asarray(mask, jnp.int32),
            )
            out[i : i + n] = np.asarray(emb)[:n]
        return out

    def encode(self, text: str) -> np.ndarray:
        return self.encode_batch([text])[0]

    def encode_batch_device(self, texts: Sequence[str]):
        """Like encode_batch but returns the (unnormalized) embeddings as a
        DEVICE array with NO host sync: the online serving path feeds this
        straight into the ranking dispatch, so encode and rank ride ONE
        device queue instead of paying a host round trip between them
        (~40 ms of tunnel RTT per online query on a remote-attached chip)."""
        chunks = []
        bs = self.batch_size
        for i in range(0, len(texts), bs):
            chunk = texts[i : i + bs]
            tok = [self.tokenizer.encode(t) for t in chunk]
            L = self.bucket_len(tok)
            ids, mask = self.tokenizer.pad_batch(tok, L)
            n = len(chunk)
            pad_n = bs - n if i + bs > len(texts) else 0
            if pad_n:  # keep a single compiled batch shape
                ids += [[0] * L] * pad_n
                mask += [[1] + [0] * (L - 1)] * pad_n
            emb = self._fwd(
                self.params,
                jnp.asarray(ids, jnp.int32),
                jnp.asarray(mask, jnp.int32),
            )
            chunks.append(emb[:n] if pad_n else emb)
        return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
