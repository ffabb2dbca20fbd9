"""The U-dedup dispatch gate must agree with the committed measurements.

``bench_kernels.py gate_fit`` measures every (B, U) cell the gate chooses
between (plain slot kernel vs the two U-dedup variants) on the real v5e
and the matrices are committed under docs/gate_fit_*.json (VERDICT r2
#10: fit across corpus shapes, not one).  This test recomputes the gate's
pick for every committed cell and asserts it lands within 10% of the
measured per-cell winner — so a future edit to ``udedup_plan`` cannot
silently disagree with the measurements that justified it.
"""

import json
from pathlib import Path

import pytest

from modern_search_engines_project_tpu.retrieval import bm25_pallas

DOCS = Path(__file__).resolve().parents[1] / "docs"
FIT_FILES = sorted(DOCS.glob("gate_fit_*.json"))

# measurement noise margin: the refit commit's claim is "every pick
# within ~10% of the measured per-cell winner"
TOL = 1.10


def _cells(path):
    d = json.loads(path.read_text())
    out = []
    for B in (16, 64):
        plain = d.get(f"plain_b{B}")
        for U in (128, 256, 512, 1024):
            acc = d.get(f"ud_acc_b{B}_U{U}")
            mm = d.get(f"ud_matmul_b{B}_U{U}")
            if None in (plain, acc, mm):
                continue
            out.append((B, U, {"plain": plain, "acc": acc, "matmul": mm}))
    return d["nnz"], out


@pytest.mark.parametrize("path", FIT_FILES, ids=[p.stem for p in FIT_FILES])
def test_gate_matches_measured_winner(path):
    nnz, cells = _cells(path)
    assert cells, f"no measured cells in {path.name}"
    bad = []
    for B, U, meas in cells:
        pick = bm25_pallas.udedup_plan(U, B, nnz=nnz) or "plain"
        best = min(meas.values())
        if meas[pick] > TOL * best:
            bad.append((B, U, pick, meas))
    assert not bad, f"gate picks off-winner cells in {path.name}: {bad}"


def test_small_batch_stays_plain():
    """B < 8 must always take the plain per-query kernel (its cost is
    ~linear in B; both U-dedup variants carry a base cost that one or two
    queries never amortize — measured at both committed shapes)."""
    for B in (1, 2, 4, 7):
        for U in (64, 128, 512, 1024):
            for nnz in (None, 1_500_000, 8_000_000):
                assert bm25_pallas.udedup_plan(U, B, nnz=nnz) is None


def test_shape_term_only_flips_the_measured_cell():
    """The nnz term exists for exactly one boundary: small corpus,
    8 <= B < 32, U <= 128 prefers the accumulator variant.  Everywhere
    else the pick must be independent of nnz (so callers without a
    posting count lose nothing but that one cell)."""
    assert bm25_pallas.udedup_plan(128, 16, nnz=1_575_319) == "acc"
    assert bm25_pallas.udedup_plan(128, 16, nnz=7_974_936) == "matmul"
    assert bm25_pallas.udedup_plan(128, 16) == "matmul"
    for B in (32, 64, 128):
        for U in (128, 256, 512, 1024):
            picks = {
                bm25_pallas.udedup_plan(U, B, nnz=n)
                for n in (None, 1_500_000, 8_000_000)
            }
            assert len(picks) == 1
