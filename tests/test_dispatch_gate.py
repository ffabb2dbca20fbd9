"""The U-dedup dispatch gate must agree with the committed measurements.

``bench_kernels.py gate_fit`` measures every (B, U) cell the gate chooses
between (plain slot kernel vs the U-dedup kernel variants) on the real
v5e, FLOOR-CORRECTED (a trivial-kernel row per B absorbs the tunnel-RTT /
n_scan dispatch floor that skewed the round-2/3 fits), and the matrices
are committed under docs/gate_fit_*.json.  This test recomputes the
gate's pick for every committed cell and asserts it lands within 10%
(+50us absolute slack for sub-ms cells) of the measured per-cell winner —
so a future edit to ``udedup_plan`` cannot silently disagree with the
measurements that justified it.
"""

import json
from pathlib import Path

import pytest

from modern_search_engines_project_tpu.retrieval import bm25_pallas

DOCS = Path(__file__).resolve().parents[1] / "docs"
FIT_FILES = sorted(DOCS.glob("gate_fit_*.json"))

# measurement noise margin: the refit commit's claim is "every pick
# within ~10% of the measured per-cell winner" (+ absolute slack for
# sub-ms cells where 10% is below dispatch jitter)
TOL = 1.10
SLACK_MS = 0.05

VARIANTS = ("plain", "acc", "sublane", "i8", "wide_i8")


def _cells(path):
    d = json.loads(path.read_text())
    out = []
    for key, cell in d.get("gate_fit", {}).items():
        B, U = (int(x[1:]) for x in key.split("_"))
        meas = {v: cell[v] for v in VARIANTS if cell.get(v) is not None}
        if len(meas) >= 3:
            out.append((B, U, meas))
    return d["nnz"], out


@pytest.mark.parametrize("path", FIT_FILES, ids=[p.stem for p in FIT_FILES])
def test_gate_matches_measured_winner(path):
    nnz, cells = _cells(path)
    assert cells, f"no measured cells in {path.name}"
    bad = []
    for B, U, meas in cells:
        pick = bm25_pallas.udedup_plan(U, B, nnz=nnz) or "plain"
        best = min(meas.values())
        if meas.get(pick, 1e9) > TOL * best + SLACK_MS:
            bad.append((B, U, pick, meas))
    assert not bad, f"gate picks off-winner cells in {path.name}: {bad}"


def test_small_batch_stays_plain():
    """B < 8 must always take the plain per-query kernel (its cost is
    ~linear in B; the U-dedup variants carry a base cost that one or two
    queries never amortize — measured at both committed shapes)."""
    for B in (1, 2, 4, 7):
        for U in (64, 128, 512, 1024):
            for nnz in (None, 1_500_000, 8_000_000):
                assert bm25_pallas.udedup_plan(U, B, nnz=nnz) is None


def test_plan_returns_valid_variants():
    """Every non-None pick must name a registered kernel variant, and the
    pick must be independent of nnz (the shape term no longer flips any
    cell after the round-4 floor-corrected refit)."""
    for B in (8, 16, 32, 64, 128):
        for U in (128, 256, 512, 1024):
            picks = {
                bm25_pallas.udedup_plan(U, B, nnz=n)
                for n in (None, 1_500_000, 8_000_000)
            }
            assert len(picks) == 1
            (pick,) = picks
            if pick is not None:
                assert pick in bm25_pallas._UDEDUP_KERNELS


def test_big_batch_boundaries():
    """B >= 32: sublane at U <= 128, int8 above (post derived-presence
    refit: the halved weight matrix un-MXU-bound the bf16 sublane variant,
    and int8 only edges ahead once the recovery matmul grows with U)."""
    for B in (32, 64, 128):
        assert bm25_pallas.udedup_plan(128, B) == "sublane"
        for U in (256, 512, 1024):
            assert bm25_pallas.udedup_plan(U, B) == "i8"
