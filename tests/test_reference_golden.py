"""Cross-implementation golden tests (VERDICT r1 #3).

The expected values below were produced OUTSIDE this repo's code: an
independent line-by-line trace of the reference implementation —
``/root/reference/indexer/bm25_indexer.py:383-514`` (the search scoring
loop over 4-table stats) and ``/root/reference/reranker/reranker_api.py``
(:273-287 batched cosine, :289-296 min-max, :362 fusion, :299-334
positional weighting, :370-372 per-doc idxmax, :178-236 hybrid
diversification with mutating backfill) — executed on the fixed corpus
below and FROZEN as literals.  The engine and its numpy oracle never touch
these numbers, so a shared bug between them cannot hide.

Fixture construction notes:
  * corpus words are stable under both spaCy lemmatization (base-form
    nouns) and the repo analyzer, so both pipelines tokenize to
    ``text.split()`` — asserted below;
  * embeddings come from a deterministic text -> unit-vector function
    (seeded by FNV-1a of the text) shared between the trace and this test;
  * all score ties were designed out, so ordering is unambiguous.
"""

import math

import numpy as np
import pytest

from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index import Document, IndexBuilder
from modern_search_engines_project_tpu.retrieval import SearchEngine
from modern_search_engines_project_tpu.text.analyzer import Analyzer

DIM = 16

CFG = Config(
    embedding_dim=DIM,
    window_size=8,
    step_size=6,
    top_k_retrieval=8,
    top_k_reranking=6,
    max_query_terms=8,
    smoothing=0.15,
    diversification=True,
    diversification_threshold=0.8,
)

DOCS = [
    (1, "https://uni.de/castle", "castle museum river castle tower bridge market castle garden cinema"),
    (2, "https://uni.de/river", "river bridge river neckar river tower harbor"),
    (3, "https://town.de/museum", "museum castle museum chocolate festival museum garden theater library harbor market cinema"),
    (4, "https://town.de/market", "market festival market chocolate garden"),
    (5, "https://blog.de/tower", "tower bridge tower river tower castle neckar harbor garden theater cinema library market festival"),
    (6, "https://blog.de/punt", "punt river punt neckar harbor punt bridge garden"),
    (7, "https://news.de/festival", "festival chocolate festival market festival theater garden"),
    (8, "https://news.de/cinema", "cinema theater cinema library garden cinema market"),
    (9, "https://wiki.de/neckar", "neckar river neckar bridge neckar castle harbor tower"),
    (10, "https://wiki.de/garden", "garden library garden theater harbor garden market"),
    (11, "https://shop.de/chocolate", "chocolate market chocolate festival chocolate garden library"),
    (12, "https://shop.de/library", "library theater library cinema library garden harbor"),
    (13, "https://uni.de/harbor", "harbor punt harbor river harbor bridge neckar castle museum tower garden theater"),
    (14, "https://town.de/theater", "theater cinema theater library theater festival garden market"),
]

# ---- frozen reference-trace outputs (generated 2026-08-16; see module
# docstring for provenance) --------------------------------------------------
GOLDEN = {
    "castle museum": {
        "bm25": [(3, 2.185529), (1, 1.937047), (13, 1.485839),
                 (9, 0.56002), (5, 0.432151)],
        "final": [
            (13, 1.0, "harbor punt harbor river harbor bridge neckar castle"),
            (3, 0.577591, "museum castle museum chocolate festival museum garden theater"),
            (5, 0.530475, "tower bridge tower river tower castle neckar harbor"),
            (9, 0.398199, "neckar river neckar bridge neckar castle harbor tower"),
            (1, 0.398099, "castle museum river castle tower bridge market castle"),
        ],
    },
    "river bridge tower": {
        "bm25": [(2, 1.316333), (5, 1.178502), (9, 1.109778),
                 (1, 1.010147), (13, 0.926931), (6, 0.549757)],
        "final": [
            (2, 1.0, "river bridge river neckar river tower harbor"),
            (5, 0.765363, "tower bridge tower river tower castle neckar harbor"),
            (9, 0.116455, "neckar river neckar bridge neckar castle harbor tower"),
            (1, 0.116355, "castle museum river castle tower bridge market castle"),
            (13, 0.075326, "harbor punt harbor river harbor bridge neckar castle"),
            (6, 0.0, "punt river punt neckar harbor punt bridge garden"),
        ],
    },
    "castle castle neckar": {
        "bm25": [(9, 1.989859), (1, 1.65512), (13, 1.403254), (5, 1.296453),
                 (3, 0.935503), (2, 0.58907), (6, 0.56002)],
        "final": [
            (13, 1.0, "harbor punt harbor river harbor bridge neckar castle"),
            (3, 0.621424, "festival museum garden theater library harbor market cinema"),
            (6, 0.500223, "punt river punt neckar harbor punt bridge garden"),
            (9, 0.172146, "neckar river neckar bridge neckar castle harbor tower"),
            (2, 0.172046, "river bridge river neckar river tower harbor"),
            (1, 0.120371, "castle museum river castle tower bridge market castle"),
        ],
    },
}

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def _fnv1a(data: bytes) -> int:
    h = _FNV_OFFSET
    for byte in data:
        h ^= byte
        h = (h * _FNV_PRIME) & _MASK64
    return h


class FixedEncoder:
    """Deterministic text -> unit vector (shared with the golden trace)."""

    dim = DIM

    def encode_batch(self, texts):
        out = np.zeros((len(texts), DIM), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(_fnv1a(t.encode()) & 0xFFFFFFFF)
            v = rng.standard_normal(DIM)
            out[i] = (v / np.linalg.norm(v)).astype(np.float32)
        return out

    def describe(self):
        return {"kind": "fixed-test", "dim": DIM}


def _docs():
    return [Document(d, u, "", t) for d, u, t in DOCS]


@pytest.fixture(scope="module", params=["xla", "pallas"])
def engine(request):
    art = IndexBuilder(FixedEncoder(), CFG).build(_docs())
    return SearchEngine(
        art,
        FixedEncoder(),
        CFG,
        bank_dtype=np.float32,
        use_pallas=request.param == "pallas",
    )


class TestTokenizationAssumption:
    def test_corpus_words_stable_under_analyzer(self):
        an = Analyzer(use_native=False)
        for _, _, text in DOCS:
            assert an.tokens(text) == text.split(), text
        for q in GOLDEN:
            assert an.tokens(q) == q.split(), q


class TestReferenceGoldenBM25:
    @pytest.mark.parametrize("query", list(GOLDEN))
    def test_stage1_matches_reference_trace(self, engine, query):
        got = engine.bm25_search(query, top_k=8, augment=False)
        want = GOLDEN[query]["bm25"]
        assert [r["doc_id"] for r in got] == [d for d, _ in want]
        np.testing.assert_allclose(
            [r["score"] for r in got], [s for _, s in want], atol=1e-4
        )


class TestReferenceGoldenHybrid:
    @pytest.mark.parametrize("query", list(GOLDEN))
    def test_final_ranking_matches_reference_trace(self, engine, query):
        got = engine.search_batch([query], top_k=6, augment=False)[0]
        want = GOLDEN[query]["final"]
        assert [r.doc_id for r in got] == [d for d, _, _ in want]
        np.testing.assert_allclose(
            [r.similarity_score for r in got],
            [s for _, s, _ in want],
            atol=1e-4,
        )
        assert [r.window_text for r in got] == [w for _, _, w in want]
