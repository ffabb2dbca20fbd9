"""Native C++ analyzer: parity with the Python specification + speed."""

import random
import time

import pytest

from corpus_util import make_corpus
from modern_search_engines_project_tpu.text.analyzer import Analyzer

try:
    from modern_search_engines_project_tpu.native import native_analyzer

    NATIVE = native_analyzer.load()
except Exception as e:  # pragma: no cover
    NATIVE = None
    NATIVE_ERR = e

pytestmark = pytest.mark.skipif(
    NATIVE is None, reason="native analyzer unavailable"
)

PY = Analyzer(use_native=False)

SAMPLES = [
    "The University of Tübingen is one of Germany's oldest universities.",
    "Students were walking through Tubingen's old town near the Neckar.",
    "Tuebingen TÜBINGEN tübinger Tübingens",
    "running walked cities studies leaves children better",
    "CAFÉ naïve façade — émigré!",
    "a b c xy 42 k9 --- ??? !!!",
    "",
    "castles punting boats raced past the Stocherkahn bridges",
    "hölderlinturm überquert die neckarbrücke",
    "ChocolART festival: chocolate-makers & handmade sweets (December).",
]


class TestNativeParity:
    @pytest.mark.parametrize("text", SAMPLES)
    def test_matches_python(self, text):
        assert NATIVE.analyze(text) == PY.tokens(text)

    def test_matches_on_corpus(self):
        docs = make_corpus(n_docs=12, seed=17, min_len=50, max_len=200)
        for d in docs:
            full = f"{d.title} {d.text}"
            assert NATIVE.analyze(full) == PY.tokens(full)

    def test_random_ascii_noise(self):
        rng = random.Random(0)
        chars = "abcdefghijklmnopqrstuvwxyz ÄÖÜäöüß .,-!?0123456789"
        for _ in range(20):
            text = "".join(rng.choice(chars) for _ in range(500))
            assert NATIVE.analyze(text) == PY.tokens(text)

    def test_analyzer_uses_native_when_available(self):
        an = Analyzer(use_native=True)
        assert an._native is not None
        text = "The students were running through Tübingen yesterday."
        assert an.tokens(text) == PY.tokens(text)

    def test_unicode_whitespace_parity(self):
        # Full \s parity (ADVICE r1): EM SPACE, THIN SPACE, LINE/PARA
        # separators, NEL, file/group/record/unit separators, IDEOGRAPHIC
        # SPACE must split words without emitting phantom symbol tokens.
        cases = [
            "a b",
            "Tübingen City",
            "x y",
            "p q",
            "nelline",
            "sep\x1ca\x1db\x1ec\x1fd",
            "wide　space",
            "ogham mark",
            "nnbsp x mmsp y",
        ]
        for text in cases:
            assert NATIVE.analyze(text) == PY.tokens(text), text

    def test_truncation_counts_codepoints(self):
        # Python spec truncates at 1M CHARACTERS; multibyte docs must not be
        # cut earlier by a byte-length clamp (ADVICE r1).
        big = ("münchen tübingen " * 70000)  # ~1.19M chars, ~1.3M bytes
        assert NATIVE.analyze(big) == PY.tokens(big)

    def test_native_faster(self):
        text = "the castle overlooks the river and students walk daily " * 2000
        t0 = time.time()
        for _ in range(5):
            PY.tokens(text)
        t_py = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            NATIVE.analyze(text)
        t_nat = time.time() - t0
        assert t_nat < t_py, (t_nat, t_py)


class TestNativeHashTokenize:
    def test_parity_with_python(self):
        from modern_search_engines_project_tpu.text.hash_tokenizer import (
            HashTokenizer,
        )

        py = HashTokenizer(1000, use_native=False)
        cc = HashTokenizer(1000, use_native=True)
        assert cc._native is not None
        import random

        rng = random.Random(5)
        chars = (
            "abcdefghij ÄÖÜäöüß ÉÀ .,!?()[]#@0123456789éàçñ\n\tx "
            "     　   "
            "\x1c\x1d\x1e\x1f"
        )
        cases = SAMPLES + [
            "".join(rng.choice(chars) for _ in range(200)) for _ in range(15)
        ]
        for text in cases:
            a_ids, a_off = py.encode_with_offsets(text)
            b_ids, b_off = cc.encode_with_offsets(text)
            assert list(a_ids) == [int(x) for x in b_ids], text[:40]
            assert [tuple(o) for o in a_off] == [
                tuple(map(int, o)) for o in b_off
            ], text[:40]

    def test_windows_from_native_offsets(self):
        from modern_search_engines_project_tpu.text.chunker import window_texts
        from modern_search_engines_project_tpu.text.hash_tokenizer import (
            HashTokenizer,
        )

        cc = HashTokenizer(1000, use_native=True)
        text = " ".join(f"tok{i}" for i in range(100))
        ids, offs = cc.encode_with_offsets(text)
        wt = window_texts(text, offs, window_size=20, step_size=15)
        assert wt[0].startswith("tok0") and wt[1].startswith("tok15")


class TestNativeAnalyzeCounts:
    @pytest.mark.parametrize("text", SAMPLES)
    def test_counts_match_python(self, text):
        assert NATIVE.analyze_counts(text) == PY.count(text)

    def test_counts_on_corpus_and_noise(self):
        docs = make_corpus(n_docs=12, seed=23, min_len=50, max_len=200)
        for d in docs:
            full = f"{d.title} {d.text}"
            assert NATIVE.analyze_counts(full) == PY.count(full)
        rng = random.Random(5)
        chars = "abcdefghijklmnopqrstuvwxyz ÄÖÜäöüß .,-!?0123456789 "
        for _ in range(20):
            text = "".join(rng.choice(chars) for _ in range(500))
            assert NATIVE.analyze_counts(text) == PY.count(text)

    def test_analyzer_count_routes_to_native(self):
        an = Analyzer(use_native=True)
        assert getattr(an._native, "has_counts", False)
        text = "students were running running running through Tübingen"
        assert an.count(text) == PY.count(text)
