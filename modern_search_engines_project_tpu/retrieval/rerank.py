"""Host-side rerank finishing: domain diversification over ranked candidates.

The device engine (``retrieval/engine.py``) produces the fused+positionally
adjusted candidate ranking entirely on TPU; diversification is a greedy
sequential pass over at most ``top_k_retrieval`` rows, so it stays on host
(SURVEY.md §7 "hard parts" — greedy logic over top-k only).

Behavior parity with reference ``reranker/reranker_api.py``:
  * ``apply_domain_cap``         — reranker_api.py:178-194
  * ``hybrid_diversification``   — reranker_api.py:196-236 (0.8 relevance
    split, domain promotion into the high group, 1-per-domain cap in both
    groups, monotone-decreasing backfill of dropped docs)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple


@dataclasses.dataclass
class RankedDoc:
    """One reranked candidate (DocumentScore analog, reranker_api.py:150-158)."""

    doc_id: int  # external id
    url: str
    title: str
    similarity_score: float  # fused + positional score
    original_similarity: float  # normalized BM25 score (old_similarity)
    window_index: int  # global chunk index of the most relevant window
    window_text: str = ""
    domain: str = ""


def apply_domain_cap(
    results: List[RankedDoc], max_per_domain: int
) -> Tuple[List[RankedDoc], List[RankedDoc]]:
    """Keep at most N docs per domain; input must be sorted desc by score."""
    domain_counts: Dict[str, int] = {}
    kept: List[RankedDoc] = []
    dropped: List[RankedDoc] = []
    for doc in results:
        if domain_counts.get(doc.domain, 0) < max_per_domain:
            kept.append(doc)
            domain_counts[doc.domain] = domain_counts.get(doc.domain, 0) + 1
        else:
            dropped.append(doc)
    return kept, dropped


def hybrid_diversification(
    results: List[RankedDoc],
    relevance_threshold: float = 0.8,
    top_k: int = 100,
) -> List[RankedDoc]:
    """Two-tier domain diversification (reranker_api.py:196-236).

    High tier = docs scoring >= threshold OR sharing a domain with one that
    does; medium tier = the rest.  Each tier is capped at 1 doc/domain; the
    medium tier fills remaining slots.  If still short, dropped docs backfill
    with scores shifted down so the final list is monotone decreasing.
    """
    high_domains = {
        d.domain for d in results if d.similarity_score >= relevance_threshold
    }
    medium_domains = {
        d.domain for d in results if d.similarity_score < relevance_threshold
    } - high_domains

    high_rel = [
        d
        for d in results
        if d.similarity_score >= relevance_threshold or d.domain in high_domains
    ]
    medium_rel = [
        d
        for d in results
        if d.similarity_score < relevance_threshold and d.domain in medium_domains
    ]
    high_rel.sort(key=lambda x: x.similarity_score, reverse=True)
    medium_rel.sort(key=lambda x: x.similarity_score, reverse=True)

    diversified_high, dropped_high = apply_domain_cap(high_rel, max_per_domain=1)
    remaining = top_k - len(diversified_high)
    diversified_medium, dropped_medium = apply_domain_cap(
        medium_rel, max_per_domain=1
    )

    final = sorted(
        diversified_high + diversified_medium[:remaining],
        key=lambda x: x.similarity_score,
        reverse=True,
    )
    rest = sorted(
        dropped_high + dropped_medium,
        key=lambda x: x.similarity_score,
        reverse=True,
    )
    if len(final) < top_k and rest:
        need = top_k - len(final)
        additional = rest[:need]
        eps = 1e-4
        delta = additional[0].similarity_score - final[-1].similarity_score + eps
        additional = [
            dataclasses.replace(
                d, similarity_score=max(0.0, d.similarity_score - delta)
            )
            for d in additional
        ]
        final.extend(additional)

    return sorted(final, key=lambda x: x.similarity_score, reverse=True)[:top_k]


def dedup_by_base_url(results: List[RankedDoc]) -> List[RankedDoc]:
    """Collapse candidates sharing a query-param-stripped URL, keeping the
    best-ranked one (the reference dedups inside the reranker SQL by
    GROUP BY on url-minus-query, reranker_api.py:33-47; input must be
    sorted desc so "best-ranked" is the kept row)."""
    seen = set()
    out: List[RankedDoc] = []
    for doc in results:
        base = doc.url.split("?", 1)[0]
        if base in seen:
            continue
        seen.add(base)
        out.append(doc)
    return out


def positional_adjustment(position: int, total_chunks: int) -> float:
    """Additive adjustment for the best chunk (reranker_api.py:299-334).

    +max_boost when the best chunk is the document's first window, linearly
    down to -max_decay when it is the last; 0 for single-chunk documents.
    """
    if total_chunks <= 1:
        return 0.0
    ratio = position / (total_chunks - 1)
    return 0.10 - (0.10 + 0.05) * ratio
