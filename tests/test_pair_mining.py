"""Pair mining (tools/make_real_corpus.iter_pairs): the default mode must
stay byte-identical to the round-3 flagship's training file construction,
and --rich must add the four scale-up constructions (VERDICT r3 #4)
without disturbing or duplicating the base pairs."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

from make_real_corpus import iter_pairs  # noqa: E402

# a self-contained module tree with docstrings shaped like real ones
_SRC = '''
"""Widget assembly helpers for the flexible pipeline architecture.

The assembly layer joins upstream widget streams into batches and hands
them to the downstream sink without copying.  Each widget carries its own
provenance record, which the sink validates before accepting the batch.

Provenance validation is strict by default. A widget whose record fails
the checksum is dropped and logged; the batch continues without it. This
keeps a single corrupted widget from poisoning the whole batch pipeline.
"""


def assemble_widgets(streams, sink):
    """Join upstream widget streams into batches for the downstream sink.

    The join is zero-copy: each batch holds references into the stream
    buffers, so the sink must consume a batch before the next poll cycle
    reuses the underlying memory region of the stream buffer pool.
    """


class BatchValidator:
    """Validate provenance records for every widget inside one batch.

    Validation walks the record chain from the widget back to its origin
    stream and recomputes the checksum at every hop of the chain. A chain
    longer than sixteen hops is rejected outright as malformed input.
    """
'''


def _write_tree(tmp_path):
    pkg = tmp_path / "fakepkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text('"""Fake package for mining tests."""')
    (pkg / "assembly.py").write_text(_SRC)
    return str(tmp_path)


class TestPairMining:
    def test_default_mode_yields_summary_and_ict_only(self, tmp_path):
        root = _write_tree(tmp_path)
        pairs = list(iter_pairs(roots=[root]))
        assert pairs, "no pairs mined from the fixture tree"
        # base mode: every query is either a docstring head (ends without
        # template prefixes) or an ICT leading sentence — no rich-mode
        # question/title/keyword constructions
        for q, p in pairs:
            assert not q.startswith(("how do I use ", "what does ",
                                     "how does "))
            assert not q.endswith(" example usage")
            assert "fakepkg.assembly" not in q

    def test_rich_superset_and_new_types(self, tmp_path):
        root = _write_tree(tmp_path)
        base = list(iter_pairs(roots=[root]))
        rich = list(iter_pairs(roots=[root], rich=True))
        assert set(base).issubset(set(rich))
        assert len(rich) > len(base)
        extra_qs = {q for q, _ in set(rich) - set(base)}
        # question-style name queries present
        assert any(
            q.startswith(("how do I use ", "what does ", "how does "))
            or q.endswith(" example usage")
            for q in extra_qs
        )
        # title -> body pairs present
        assert any("fakepkg.assembly" in q for q in extra_qs)
        # keyword queries: lowercase identifier triples
        assert any(
            len(q.split()) == 3 and q == q.lower() and " " in q
            and not q.startswith(("how ", "what "))
            for q in extra_qs
        )

    def test_rich_no_duplicates(self, tmp_path):
        root = _write_tree(tmp_path)
        rich = list(iter_pairs(roots=[root], rich=True))
        assert len(rich) == len(set(rich))

    def test_deterministic(self, tmp_path):
        root = _write_tree(tmp_path)
        assert list(iter_pairs(roots=[root], rich=True)) == list(
            iter_pairs(roots=[root], rich=True)
        )
