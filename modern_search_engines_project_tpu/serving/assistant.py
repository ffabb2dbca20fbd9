"""Search assistant: LLM-style summary over the top result windows.

Reference C9 (``search_assistant/main.py``) is a FastAPI sidecar calling
the external Cerebras API (qwen-3-235b) with the top <= 10 windows truncated
to 4000 chars each.  Here the assistant is an in-process component with a
pluggable backend:

  * ``ExtractiveSummarizer`` (default) — deterministic, fully offline:
    ranks sentences from the windows by query-term overlap and stitches a
    short grounded summary.  No network, no model weights.
  * ``HttpLlmClient`` — POSTs the reference's exact request schema
    ``{most_relevant_windows, query}`` to any compatible endpoint
    (search_assistant/main.py:35-76), for deployments that do run an
    external LLM.  Strips a leading ``</think>`` reasoning prefix like the
    reference (main.py:69-71).
  * ``GenerativeSummarizer`` — an ON-TPU causal decoder
    (``models/decoder.py``) trained on mined (window -> summary head)
    pairs from the real corpus: abstractive summaries with zero external
    dependencies (VERDICT r4 #10).  Load with ``from_checkpoint`` and
    pass as the service's summarizer (serving CLI ``--summarizer-ckpt``).
"""

from __future__ import annotations

import re
from typing import List, Optional, Protocol, Sequence

MAX_WINDOWS = 10  # config.py:22
WINDOW_CHARS = 4000  # search_assistant/main.py:47


class Summarizer(Protocol):
    def generate_summary(self, query: str, windows: Sequence[str]) -> str: ...


_SENT_RE = re.compile(r"(?<=[.!?])\s+")
_WORD_RE = re.compile(r"[a-zA-Zäöüß]+")


class ExtractiveSummarizer:
    """Query-focused extractive summary (offline default backend)."""

    def __init__(self, max_sentences: int = 4, max_chars: int = 700):
        self.max_sentences = max_sentences
        self.max_chars = max_chars

    def generate_summary(self, query: str, windows: Sequence[str]) -> str:
        windows = [w[:WINDOW_CHARS] for w in windows[:MAX_WINDOWS] if w]
        if not windows:
            return ""
        q_terms = {w.lower() for w in _WORD_RE.findall(query) if len(w) > 2}
        scored = []
        seen = set()
        for wi, window in enumerate(windows):
            for sent in _SENT_RE.split(window):
                sent = sent.strip()
                if len(sent) < 30 or len(sent) > 400:
                    continue
                key = sent.lower()[:80]
                if key in seen:
                    continue
                seen.add(key)
                words = {w.lower() for w in _WORD_RE.findall(sent)}
                overlap = len(words & q_terms)
                # earlier windows come from higher-ranked documents
                scored.append((overlap - 0.1 * wi, sent, words))
        scored.sort(key=lambda x: -x[0])
        # greedy pick with a redundancy gate: overlapping windows repeat
        # near-identical sentences under different prefixes, which the
        # exact-key dedup above cannot catch
        picked, picked_words = [], []
        for score, sent, words in scored:
            if score <= 0 and picked:
                break
            if any(
                len(words & pw) > 0.7 * max(1, min(len(words), len(pw)))
                for pw in picked_words
            ):
                continue
            picked.append(sent)
            picked_words.append(words)
            if len(picked) >= self.max_sentences:
                break
        if not picked and scored:
            picked = [scored[0][1]]
        out = " ".join(picked)
        return out[: self.max_chars]


class GenerativeSummarizer:
    """On-device abstractive summary: greedy decode from the trained
    summary LM, prompted with the query and the top window texts.

    The prompt mirrors training rows (tools/real_summarizer.py):
    ``[BOS] query-words <sep> window-words... <sep>`` and the model
    emits summary words until EOS.  Falls back to the extractive
    backend when the decode comes back empty/degenerate, so the serving
    contract (non-empty ``llm_response`` whenever windows exist) holds
    from the first checkpoint onward."""

    def __init__(self, model, params, cfg, vocab, max_new: int = 48):
        from modern_search_engines_project_tpu.models.decoder import (
            GreedyGenerator,
        )

        self.gen = GreedyGenerator(model, params, cfg)
        self.vocab = vocab
        self.cfg = cfg
        self.max_new = max_new
        self._fallback = ExtractiveSummarizer()

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "GenerativeSummarizer":
        from modern_search_engines_project_tpu.models.decoder import (
            load_decoder,
        )

        model, params, cfg, vocab = load_decoder(path)
        if vocab is None:
            raise ValueError(f"{path} has no vocab.json (generation vocab)")
        return cls(model, params, cfg, vocab, **kw)

    def generate_summary(self, query: str, windows: Sequence[str]) -> str:
        from modern_search_engines_project_tpu.models.word_vocab import (
            BOS_ID,
            SEP_ID,
        )

        windows = [w[:WINDOW_CHARS] for w in windows[:MAX_WINDOWS] if w]
        if not windows:
            return ""
        budget = self.cfg.max_len - self.max_new - 3
        q_ids = self.vocab.encode(query)[:24]
        ids = [BOS_ID] + q_ids + [SEP_ID]
        for w in windows:
            if len(ids) >= budget:
                break
            ids += self.vocab.encode(w)[: budget - len(ids)]
        ids = ids[:budget] + [SEP_ID]
        toks = self.gen.generate([ids], max_new=self.max_new)[0]
        text = self.vocab.decode(toks).strip()
        # degenerate decodes fall back to the extractive backend: too
        # short, low vocabulary, or greedy bigram looping ("a file to a
        # file") — a small greedy LM's classic failure mode on inputs
        # far from its training distribution
        words = text.split()
        bigrams = list(zip(words, words[1:]))
        looping = bigrams and len(set(bigrams)) <= 0.75 * len(bigrams)
        if (
            len(words) < 4
            or len(set(words)) < max(2, len(words) // 4)
            or looping
        ):
            return self._fallback.generate_summary(query, windows)
        return text


class HttpLlmClient:
    """Client for a reference-compatible /generate_summary endpoint."""

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url
        self.timeout = timeout

    def generate_summary(self, query: str, windows: Sequence[str]) -> str:
        import httpx

        payload = {
            "most_relevant_windows": [
                w[:WINDOW_CHARS] for w in windows[:MAX_WINDOWS]
            ],
            "query": query,
        }
        resp = httpx.post(self.url, json=payload, timeout=self.timeout)
        resp.raise_for_status()
        text = resp.json().get("response", "")
        # strip reasoning prefix (search_assistant/main.py:69-71)
        if "</think>" in text:
            text = text.split("</think>", 1)[1].strip()
        return text
