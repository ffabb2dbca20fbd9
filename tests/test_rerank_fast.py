"""Array-native finishing (finish_positions) vs the dataclass oracle.

The serving hot path finishes candidate pools with integer-array dedup +
diversification (retrieval/rerank.py finish_positions); the original
dataclass pipeline (dedup_by_base_url + hybrid_diversification) stays as
the oracle — these fuzz tests assert the two orders and scores agree on
randomized pools covering every branch (backfill, negative remaining,
single-domain floods, ties, duplicate base urls).
"""

import numpy as np
import pytest

from modern_search_engines_project_tpu.retrieval.rerank import (
    RankedDoc,
    dedup_by_base_url,
    diversify_positions,
    factorize,
    finish_positions,
    hybrid_diversification,
)


def _make_pool(rng, n, n_domains, n_bases, tie_prob=0.3):
    scores = rng.uniform(0.0, 1.0, n)
    # inject exact ties to exercise stable ordering
    for i in range(1, n):
        if rng.uniform() < tie_prob:
            scores[i] = scores[rng.integers(0, i)]
    scores = np.sort(scores)[::-1].astype(np.float64)
    domains = [f"dom{rng.integers(0, n_domains)}" for _ in range(n)]
    bases = [f"https://x{rng.integers(0, n_bases)}.de/p" for _ in range(n)]
    return scores, domains, bases


def _oracle(scores, domains, bases, top_k, thr, diversification):
    docs = [
        RankedDoc(
            doc_id=i,
            url=bases[i] + ("?q=1" if i % 3 == 0 else ""),
            title=f"t{i}",
            similarity_score=float(scores[i]),
            original_similarity=0.0,
            window_index=i,
            domain=domains[i],
        )
        for i in range(len(scores))
    ]
    docs = dedup_by_base_url(docs)
    if diversification:
        docs = hybrid_diversification(
            docs, relevance_threshold=thr, top_k=top_k
        )
    else:
        docs = docs[:top_k]
    return [(d.doc_id, d.similarity_score) for d in docs]


def _fast(scores, domains, bases, top_k, thr, diversification):
    dom_codes = factorize(domains)
    base_codes = factorize(bases)
    pos, out = finish_positions(
        scores,
        dom_codes,
        base_codes,
        top_k,
        relevance_threshold=thr,
        diversification=diversification,
    )
    return [(int(p), float(s)) for p, s in zip(pos, out)]


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    n_domains = int(rng.integers(1, 30))
    n_bases = int(rng.integers(1, max(2, n)))
    top_k = int(rng.integers(1, 150))
    thr = float(rng.uniform(0.0, 1.0))
    diversification = bool(rng.integers(0, 2))
    scores, domains, bases = _make_pool(rng, n, n_domains, n_bases)
    want = _oracle(scores, domains, bases, top_k, thr, diversification)
    got = _fast(scores, domains, bases, top_k, thr, diversification)
    assert [i for i, _ in got] == [i for i, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=0, atol=1e-12
    )


def test_backfill_branch():
    """Few domains force the backfill path: dropped docs re-enter with
    monotone-decreasing shifted scores (reranker_api.py:219-233)."""
    scores = np.array([0.95, 0.9, 0.85, 0.5, 0.4], np.float64)
    domains = ["a", "a", "a", "a", "a"]
    bases = [f"u{i}" for i in range(5)]
    want = _oracle(scores, domains, bases, 4, 0.8, True)
    got = _fast(scores, domains, bases, 4, 0.8, True)
    assert got == [
        (i, pytest.approx(s, abs=1e-12)) for i, s in want
    ]
    out_scores = [s for _, s in got]
    assert all(
        out_scores[i] >= out_scores[i + 1] for i in range(len(out_scores) - 1)
    )
    assert len(got) == 4  # backfill filled past the 1-per-domain cap


def test_negative_remaining():
    """More capped high-tier domains than top_k (remaining < 0) must keep
    python list-slice semantics."""
    n = 30
    scores = np.linspace(0.99, 0.81, n).astype(np.float64)
    domains = [f"d{i}" for i in range(n)]  # all distinct, all high tier
    bases = [f"u{i}" for i in range(n)]
    for top_k in (5, 1):
        want = _oracle(scores, domains, bases, top_k, 0.8, True)
        got = _fast(scores, domains, bases, top_k, 0.8, True)
        assert [i for i, _ in got] == [i for i, _ in want]


def test_empty_pool():
    pos, out = diversify_positions(
        np.empty(0, np.float64), np.empty(0, np.int64), 10, 0.8
    )
    assert pos.size == 0 and out.size == 0
