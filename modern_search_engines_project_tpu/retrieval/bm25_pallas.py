"""Pallas TPU kernels: BM25 scoring over two posting layouts.

Why a kernel: the XLA gather/scatter formulation of BM25
(ops.bm25_score_batch) serializes ~posting_cap random accesses per query on
TPU — measured 3.3 s for a 64-query batch over 8M postings, i.e. 99% of the
whole hybrid pipeline (see bench history).  Both kernels re-state BM25 as
regular, MXU/VPU-shaped work with NO gathers or scatters.

**Doc-slot layout** (the default; _kernel_slots / _kernel_slots_udedup):
column ``d % 512`` of group ``d // 512`` holds doc d's postings stacked
vertically (device_index.build_slot_postings), so the per-doc reduction is
a straight sum over rows — no local-id operand, no one-hot matmul, exact
f32 accumulation.  Docs are pre-sorted by posting count inside each chunk
bucket so the per-group row stride (and therefore padding, measured 1.07x
at the 100k bench shape) stays small; groups are classed by quantized
stride into <= 16 rectangular streams.  Measured v5e (100k docs, 8M
postings): batch-1 1.55 ms (blocked: 4.66), batch-64 U-dedup U=128
5.2 ms / U=512 9.3 ms (blocked U=128: 10.1), batch-64 plain 16.7 ms.

**Doc-major blocked layout** (_kernel / _kernel_udedup, kept under
cfg.bm25_layout="blocked"): blocks of 128 docs padded to a common posting
chunk; per-doc reduction via a one-hot ``[pc/8, 128]`` bf16x2 matmul —
"scatter as matmul" (~2*2B*128*2 MXU flops per posting, which the slot
layout eliminates).  Wins only the plain batch-64 case (13.7 vs 16.7 ms),
which the engine's measured U-dedup gate makes rare.

Shared contract: postings stream HBM->VMEM once per query *batch*; the
match loop compares each posting's term id against the query's <= T term
ids (plain) or the batch's <= U distinct ids + one weight-recovery matmul
(U-dedup).  Matched-ness is accumulated alongside scores because the
reference admits matched docs whose score is exactly 0 (min_score=0.0
with >=, bm25_indexer.py:383).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DOC_BLOCK = 128
SUB = 8  # sublane tiling factor for streamed posting operands


def _kernel(tids_ref, qtf_ref, terms_ref, impact_ref, localt_ref, out_ref):
    """One (doc_block, posting_chunk) grid step.

    refs: tids/qtf [B, T]; terms/impact [1, 1, 8, pcL]; localT [1, 1, pcL, 8];
    out [2B, 128] f32 — rows [0, B) scores, rows [B, 2B) match counts.
    """
    j = pl.program_id(1)
    B, T = tids_ref.shape
    pcL = terms_ref.shape[3]

    # remap query pad ids -1 -> -2 ONCE so they can never collide with the
    # posting pad id (-1); the hot loop then needs no (tid >= 0) mask —
    # one fewer VPU op per (term, sublane) pass
    tids_all = jnp.where(tids_ref[:] < 0, -2, tids_ref[:])  # (B, T)

    acc = jnp.zeros((2 * B, DOC_BLOCK), jnp.float32)
    for s in range(SUB):
        terms_s = terms_ref[0, 0, s : s + 1, :]  # (1, pcL) int32, pad -1
        impact_s = impact_ref[0, 0, s : s + 1, :]  # (1, pcL)
        local_s = localt_ref[0, 0, :, s : s + 1]  # (pcL, 1)

        m = jnp.zeros((B, pcL), jnp.float32)
        for t in range(T):
            tid = tids_all[:, t : t + 1]  # (B, 1)
            q = qtf_ref[:, t : t + 1]
            m = m + jnp.where(terms_s == tid, q, 0.0)
        # qtf >= 1 for every real query term, so m > 0 <=> posting matched —
        # the match channel needs no per-term accumulation
        cnt = (m > 0.0).astype(jnp.float32)

        v = m * impact_s
        onehot = (
            local_s
            == jax.lax.broadcasted_iota(jnp.int32, (pcL, DOC_BLOCK), 1)
        ).astype(jnp.bfloat16)  # 0/1: EXACT in bf16
        stacked = jnp.concatenate([v, cnt], axis=0)  # (2B, pcL)
        # Error-compensated bf16x2 dot (2 MXU passes) instead of
        # Precision.HIGHEST (6): the one-hot side is exactly representable
        # in bf16, so only the value side needs splitting.  Residual error
        # is ~|v| * 2^-16 per posting (vs 2^-8 for plain bf16, which round 1
        # measured at 4e-3 relative — enough to reorder near-ties).
        hi = stacked.astype(jnp.bfloat16)
        lo = (stacked - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = (
            acc
            + jnp.dot(hi, onehot, preferred_element_type=jnp.float32)
            + jnp.dot(lo, onehot, preferred_element_type=jnp.float32)
        )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def _kernel_udedup(w_ref, uids_ref, terms_ref, impact_ref, localt_ref, out_ref):
    """U-dedup variant of one grid step: postings are matched against the
    batch's DISTINCT query terms once (U compares instead of B*T), then
    per-query weights are recovered with an MXU matmul.

    refs: w [2B, U] f32 (rows [0,B) qtf weights, rows [B,2B) presence 0/1);
    uids [U, 1] int32 column (pad -2); terms/impact [1, 1, 8, pcL];
    localT [1, 1, pcL, 8]; out [2B, 128] f32.

    Exactness: mu is 0/1 (exact in bf16); qtf weights are small integers
    (exact in bf16); the f32-accumulated matmuls are therefore exact, and
    the doc reduction uses the same bf16x2 compensated dot as the base
    kernel.  The match count channel uses the presence matrix directly, so
    admissibility semantics (matched docs with score 0) are preserved.
    uids ships as a column vector so the match matrix is ONE broadcast
    compare and the weight recovery ONE dot — no in-kernel concat or
    transpose (Mosaic rejects cross-tile shape casts).
    """
    j = pl.program_id(1)
    B2, U = w_ref.shape
    pcL = terms_ref.shape[3]

    acc = jnp.zeros((B2, DOC_BLOCK), jnp.float32)
    for s in range(SUB):
        terms_s = terms_ref[0, 0, s : s + 1, :]  # (1, pcL)
        impact_s = impact_ref[0, 0, s : s + 1, :]  # (1, pcL)
        local_s = localt_ref[0, 0, :, s : s + 1]  # (pcL, 1)

        # distinct-term match matrix: U compares on the VPU
        mu = (uids_ref[:] == terms_s).astype(jnp.bfloat16)  # (U, pcL)

        # per-query (weight, presence) via one MXU matmul: (2B,U)@(U,pcL)
        mw = jnp.dot(
            w_ref[:].astype(jnp.bfloat16),
            mu,
            preferred_element_type=jnp.float32,
        )  # rows [0,B): m = sum qtf over matched; rows [B,2B): match count
        m = mw[: B2 // 2]
        cnt = (mw[B2 // 2 :] > 0.0).astype(jnp.float32)

        v = m * impact_s
        onehot = (
            local_s
            == jax.lax.broadcasted_iota(jnp.int32, (pcL, DOC_BLOCK), 1)
        ).astype(jnp.bfloat16)
        stacked = jnp.concatenate([v, cnt], axis=0)
        hi = stacked.astype(jnp.bfloat16)
        lo = (stacked - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = (
            acc
            + jnp.dot(hi, onehot, preferred_element_type=jnp.float32)
            + jnp.dot(lo, onehot, preferred_element_type=jnp.float32)
        )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def _accum_keyed(j, contrib, out_ref, acc_ref):
    """Shared slot-kernel tail: accumulate the per-step (scores; counts)
    contribution [2B, COLS] in VMEM scratch across the row-chunk grid
    steps, and on the LAST step emit the KEYED scores [B, COLS] — matched
    docs with score >= 0 keep their score, everything else keys to -1
    (the admissibility contract of bm25_score_blocked / _slots_key).

    Doing the keying here (a) halves the kernel's HBM output (one [B, D]
    write instead of the [2B, D] accumulator) and (b) removes the separate
    XLA keying pass over [2B, D] that followed every kernel call."""

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += contrib
    B = out_ref.shape[0]

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        s = acc_ref[:B]
        c = acc_ref[B:]
        out_ref[:] = jnp.where((c > 0.0) & (s >= 0.0), s, -1.0)


def _kernel_slots(tids_ref, qtf_ref, terms_ref, impact_ref, out_ref, acc_ref):
    """One (group, row_chunk) grid step over the doc-slot layout.

    refs: tids/qtf [B, T]; terms/impact [1, RC, COLS] (column d%COLS of the
    group = doc d's postings stacked vertically); out [B, COLS] f32 keyed
    scores (emitted at the last row chunk; scratch acc [2B, COLS] carries
    scores rows [0, B) / match counts rows [B, 2B) between chunks).

    The slot layout makes the per-doc reduction a straight sum over rows:
    no one-hot matmul (the blocked kernel spent ~2*2B*128*2 MXU flops per
    posting on "scatter as matmul"), no local-id operand, no bf16 rounding
    anywhere — scores accumulate in f32 exactly.
    """
    j = pl.program_id(1)
    B, T = tids_ref.shape
    RC, COLS = terms_ref.shape[1], terms_ref.shape[2]

    tids_all = jnp.where(tids_ref[:] < 0, -2, tids_ref[:])  # pad -1 -> -2
    qtf_all = qtf_ref[:]

    def tile(i, carry):
        # accumulators stay (B, SUB, COLS): per-sublane partial sums, NO
        # cross-sublane reduction inside the loop (two per-tile axis=1
        # reductions measured +35% kernel time at B=64) — one reduction
        # after the loop instead
        acc_s3, acc_c3 = carry
        tr = terms_ref[0, pl.ds(i * SUB, SUB), :]  # (8, COLS) int32
        ir = impact_ref[0, pl.ds(i * SUB, SUB), :]  # (8, COLS) f32
        m = jnp.zeros((B, SUB, COLS), jnp.float32)
        for t in range(T):
            tid = tids_all[:, t][:, None, None]  # (B, 1, 1)
            q = qtf_all[:, t][:, None, None]
            m = m + jnp.where(tr[None, :, :] == tid, q, 0.0)
        acc_s3 = acc_s3 + m * ir[None, :, :]
        acc_c3 = acc_c3 + (m > 0.0).astype(jnp.float32)
        return acc_s3, acc_c3

    acc_s3, acc_c3 = jax.lax.fori_loop(
        0,
        RC // SUB,
        tile,
        (
            jnp.zeros((B, SUB, COLS), jnp.float32),
            jnp.zeros((B, SUB, COLS), jnp.float32),
        ),
    )
    acc_s = jnp.sum(acc_s3, axis=1)
    acc_c = jnp.sum(acc_c3, axis=1)
    _accum_keyed(j, jnp.concatenate([acc_s, acc_c], axis=0), out_ref, acc_ref)


def _kernel_slots_udedup(
    w_ref, uids_ref, terms_ref, impact_ref, out_ref, acc_ref
):
    """U-dedup slot-kernel step: postings match against the batch's DISTINCT
    query terms (U compares per posting row, shared across queries), then
    per-query weights are recovered with one (2B,U)@(U,COLS) MXU matmul per
    sublane row — the ONLY matmul left (the blocked U-dedup kernel paid an
    additional one-hot doc reduction).  Exact: w entries are small integers
    and mu is 0/1, both bf16-exact, accumulated in f32.

    refs: w [2B, U] f32; uids [U, 1] int32 (pad -2); terms/impact
    [1, RC, COLS]; out [B, COLS] keyed f32 (scratch acc [2B, COLS]).
    """
    j = pl.program_id(1)
    B2, U = w_ref.shape
    B = B2 // 2
    RC, COLS = terms_ref.shape[1], terms_ref.shape[2]
    # HALF the weight matrix: every real query term has qtf >= 1, so the
    # qtf-weighted match count mw > 0 iff ANY query term matched — the
    # presence channel is derived, not matmul'd (halves the MXU work; the
    # w rows [B, 2B) stay in the operand contract for the other variants)
    w_bf = w_ref[:B].astype(jnp.bfloat16)
    uids = uids_ref[:]

    def tile(i, acc):
        tr = terms_ref[0, pl.ds(i * SUB, SUB), :]  # (8, COLS)
        ir = impact_ref[0, pl.ds(i * SUB, SUB), :]
        for s in range(SUB):
            mu = (uids == tr[s : s + 1, :]).astype(jnp.bfloat16)  # (U, COLS)
            mw = jnp.dot(
                w_bf, mu, preferred_element_type=jnp.float32
            )  # (B, COLS) qtf-weighted match counts
            contrib = jnp.concatenate(
                [
                    mw * ir[s : s + 1, :],
                    (mw > 0.0).astype(jnp.float32),
                ],
                axis=0,
            )
            acc = acc + contrib
        return acc

    acc = jax.lax.fori_loop(
        0, RC // SUB, tile, jnp.zeros((B2, COLS), jnp.float32)
    )
    _accum_keyed(j, acc, out_ref, acc_ref)


def _kernel_slots_udedup_i8(
    w_ref, uids_ref, terms_ref, impact_ref, out_ref, acc_ref
):
    """int8 twin of _kernel_slots_udedup: the match matrix is 0/1 and the
    weight rows are small integers (qtf <= T, presence 0/1), so the
    weight-recovery matmul runs s8 x s8 -> s32 on the MXU — 2x the bf16
    rate on v5e — and stays EXACT (integer arithmetic, f32 conversion of
    magnitudes << 2^24)."""
    j = pl.program_id(1)
    B2, U = w_ref.shape
    B = B2 // 2
    RC, COLS = terms_ref.shape[1], terms_ref.shape[2]
    # half weight matrix; presence derived from mw > 0 (see sublane kernel)
    w_i8 = w_ref[:B].astype(jnp.int8)
    uids = uids_ref[:]

    def tile(i, acc):
        tr = terms_ref[0, pl.ds(i * SUB, SUB), :]  # (8, COLS)
        ir = impact_ref[0, pl.ds(i * SUB, SUB), :]
        for s in range(SUB):
            mu = (uids == tr[s : s + 1, :]).astype(jnp.int8)  # (U, COLS)
            mw = jnp.dot(w_i8, mu, preferred_element_type=jnp.int32)
            contrib = jnp.concatenate(
                [
                    mw.astype(jnp.float32) * ir[s : s + 1, :],
                    (mw > 0).astype(jnp.float32),
                ],
                axis=0,
            )
            acc = acc + contrib
        return acc

    acc = jax.lax.fori_loop(
        0, RC // SUB, tile, jnp.zeros((B2, COLS), jnp.float32)
    )
    _accum_keyed(j, acc, out_ref, acc_ref)


def _kernel_slots_udedup_wide(
    w_ref, uids_ref, terms_ref, impact_ref, out_ref, acc_ref, *, i8: bool
):
    """Column-concatenated variant: the 8 per-sublane (2B,U)@(U,COLS)
    matmuls of one tile fuse into ONE (2B,U)@(U,8*COLS) matmul — same
    FLOPs, 8x larger N dimension for MXU utilization.  The presence
    channel sums raw match counts across sublanes (>=0; the consumer only
    tests > 0, so summing counts instead of per-sublane booleans is
    equivalent).  i8=True additionally runs the matmul s8 x s8 -> s32
    (exact, see _kernel_slots_udedup_i8)."""
    j = pl.program_id(1)
    B2, U = w_ref.shape
    B = B2 // 2
    RC, COLS = terms_ref.shape[1], terms_ref.shape[2]
    dt = jnp.int8 if i8 else jnp.bfloat16
    pt = jnp.int32 if i8 else jnp.float32
    # half weight matrix; presence derived from mw > 0 (see sublane kernel)
    w_c = w_ref[:B].astype(dt)
    uids = uids_ref[:]

    def tile(i, carry):
        sc, pc = carry
        tr = terms_ref[0, pl.ds(i * SUB, SUB), :]  # (8, COLS)
        ir = impact_ref[0, pl.ds(i * SUB, SUB), :]
        MU = jnp.concatenate(
            [(uids == tr[s : s + 1, :]).astype(dt) for s in range(SUB)],
            axis=1,
        )  # (U, 8*COLS)
        mw = jnp.dot(w_c, MU, preferred_element_type=pt)  # (B, 8*COLS)
        for s in range(SUB):
            blk = mw[:, s * COLS : (s + 1) * COLS]
            sc = sc + blk.astype(jnp.float32) * ir[s : s + 1, :]
            pc = pc + (blk > 0).astype(jnp.float32)
        return sc, pc

    sc, pc = jax.lax.fori_loop(
        0,
        RC // SUB,
        tile,
        (
            jnp.zeros((B, COLS), jnp.float32),
            jnp.zeros((B, COLS), jnp.float32),
        ),
    )

    _accum_keyed(
        j,
        jnp.concatenate([sc, (pc > 0).astype(jnp.float32)], axis=0),
        out_ref,
        acc_ref,
    )


def _kernel_slots_udedup_acc(
    w_ref, uids_ref, terms_ref, impact_ref, out_ref, acc_ref
):
    """Traffic-restructured U-dedup slot step: instead of a per-sublane
    (2B,U)@(U,COLS) matmul + elementwise chain (whose VMEM read-modify-
    writes dominate, ~12 MB/tile measured via the 5.2 ms kernel time),
    accumulate a weighted match matrix X[u, col] = impact of term u in doc
    col (and presence P) over ALL rows of the grid step, then recover
    per-query scores with matmuls ONCE per step:

        S = wq @ X      (score rows; X split bf16-hi/lo, f32 accumulate)
        C = wp @ P      (presence rows; 0/1 entries, bf16-exact)

    Each (term, doc) pair appears at most once in a doc's posting column,
    so X entries are single impacts (not sums) — the hi/lo split gives the
    same exactness as the per-sublane variant.  Per-tile traffic collapses
    to the X/P carry update (~1 MB vs ~12 MB).

    refs: w [2B, U] f32; uids [U, 1] int32 (pad -2); terms/impact
    [1, RC, COLS]; out [B, COLS] keyed f32 (scratch acc [2B, COLS]).
    """
    j = pl.program_id(1)
    B2, U = w_ref.shape
    B = B2 // 2
    RC, COLS = terms_ref.shape[1], terms_ref.shape[2]
    uids = uids_ref[:]  # (U, 1)

    def tile(i, carry):
        X, P = carry
        tr = terms_ref[0, pl.ds(i * SUB, SUB), :]  # (8, COLS) int32
        ir = impact_ref[0, pl.ds(i * SUB, SUB), :]  # (8, COLS) f32
        # 8 compare/selects feeding one add tree -> a single X/P update
        x = jnp.zeros((U, COLS), jnp.float32)
        p = jnp.zeros((U, COLS), jnp.float32)
        for s in range(SUB):
            m = uids == tr[s : s + 1, :]  # (U, COLS)
            x = x + jnp.where(m, ir[s : s + 1, :], 0.0)
            p = p + m.astype(jnp.float32)
        return X + x, P + p

    X, P = jax.lax.fori_loop(
        0,
        RC // SUB,
        tile,
        (
            jnp.zeros((U, COLS), jnp.float32),
            jnp.zeros((U, COLS), jnp.float32),
        ),
    )
    wq = w_ref[:B].astype(jnp.bfloat16)
    wp = w_ref[B:].astype(jnp.bfloat16)
    # 3-way bf16 split of X (~24 mantissa bits ~= f32): the per-sublane
    # variant is f32-exact, so the restructured one must be too.  qtf /
    # presence weights are small integers — bf16-exact on the left side.
    x1 = X.astype(jnp.bfloat16)
    r1 = X - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    S = (
        jnp.dot(wq, x1, preferred_element_type=jnp.float32)
        + jnp.dot(wq, x2, preferred_element_type=jnp.float32)
        + jnp.dot(wq, x3, preferred_element_type=jnp.float32)
    )
    C = jnp.dot(
        wp, P.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    _accum_keyed(j, jnp.concatenate([S, C], axis=0), out_ref, acc_ref)


# Mosaic's default scoped-vmem limit is 16 MB; the kernel's per-sublane
# intermediates (one-hot, match matrix, hi/lo splits) scale with the posting
# chunk and blew it at pc=16384 (measured 16.46 MB, B=16, 20k docs).  Raise
# the limit (v5e has 128 MB VMEM) and ALSO cap the auto chunk so the
# estimate stays well inside it.
_VMEM_LIMIT = 64 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _auto_posting_chunk(p_blk: int) -> int:
    """Largest p_blk divisor whose kernel working set stays well under the
    scoped-vmem limit — fewer grid steps means less per-step overhead
    (measured 13-19% on v5e at 8M postings).  Scoped usage is ~1 KB per
    posting slot (calibrated from a measured 16.46 MB at pc=16384), so cap
    the chunk at limit/2 / 1 KB."""
    budget = (_VMEM_LIMIT // 2) // 1030
    best = SUB * 128
    for cand in range(SUB * 128, min(p_blk, budget) + 1, SUB * 128):
        if p_blk % cand == 0:
            best = cand
    return best


def udedup_plan(u_pad: int, B: int, nnz=None):
    """Measured v5e dispatch gate, refit round 4 with FLOOR-CORRECTED
    cells (``bench_kernels.py gate_fit``: every cell at n_scan=32 with a
    trivial-kernel floor row subtracted — the round-2/3 fits ran n_scan=16
    uncorrected, so ~2.2 ms of tunnel RTT sat in every cell and produced
    the acc-at-small-shapes artifact, now retired).

    Fresh true times after the derived-presence rework — the weight
    matrix halved to B rows (presence = qtf-weighted match count > 0),
    which un-MXU-bound the bf16 sublane variant (tools/micro_kernel.py +
    gate_fit matrices in docs/gate_fit_*.json):

        100k/8M  b64: sublane 1.67@U128 2.77@256 4.06@512 7.09@1024
                      i8      1.88@U128 2.56@256 4.06@512 6.87@1024
        20k/1.6M b64: same ordering, all cells < 1.7 ms

    Decision boundaries (every pick within ~10%+0.05ms of the measured
    per-cell winner — enforced by tests/test_dispatch_gate.py):
      * B >= 32: "sublane" at U <= 128 (clear winner), "i8" above —
        the s8 x s8 -> s32 variant edges ahead once the match-recovery
        matmul grows with U (exact: integer arithmetic);
      * 8 <= B < 32: "sublane" up to U=512 — stream-bound, sublane
        measured fastest at every cell;
      * B < 8: None (plain per-query kernel; neither U-dedup variant's
        base cost is worth one or two queries).
    ``nnz`` (the CHIP-LOCAL posting count) no longer changes any pick but
    stays in the signature for callers that pass it.

    Returns a bm25_score_slots_udedup ``variant`` name or None (plain).
    """
    if B >= 32 and u_pad <= 1024:
        return "sublane" if u_pad <= 128 else "i8"
    if B >= 8 and u_pad <= 512:
        return "sublane"
    return None


def udedup_wins(u_pad: int, B: int, nnz=None) -> bool:
    return udedup_plan(u_pad, B, nnz) is not None


def u_pad_for(n_distinct: int, u_buckets=(128, 256, 512, 1024)) -> int:
    """Smallest compiled U bucket holding ``n_distinct`` terms (callers
    gate on this BEFORE building the weight matrix)."""
    for u in u_buckets:
        if n_distinct <= u:
            return u
    return int(-(-n_distinct // 128) * 128)


def dedup_query_terms(term_ids, qtf):
    """Host-side prep for the U-dedup kernel: distinct batch term ids and a
    per-query weight/presence matrix.

    Returns (uids [U_pad] int32 pad -2, w [2B, U_pad] f32) with U_pad from
    ``u_pad_for`` (bounded compiled shapes).  Fully vectorized.
    """
    import numpy as np

    tids = np.asarray(term_ids)
    qw = np.asarray(qtf, np.float32)
    B, T = tids.shape
    valid = tids >= 0
    uniq = np.unique(tids[valid])
    U_pad = u_pad_for(uniq.size)
    uids = np.full(U_pad, -2, np.int32)
    uids[: uniq.size] = uniq
    w = np.zeros((2 * B, U_pad), np.float32)
    if uniq.size:
        rows, slots = np.nonzero(valid)
        cols = np.searchsorted(uniq, tids[rows, slots])
        np.add.at(w, (rows, cols), qw[rows, slots])
        w[B + rows, cols] = 1.0
    return uids, w


@functools.partial(
    jax.jit, static_argnames=("n_docs_pad", "posting_chunk", "interpret")
)
def bm25_score_blocked_udedup(
    blk_terms: jnp.ndarray,
    blk_impact: jnp.ndarray,
    blk_local: jnp.ndarray,
    uids: jnp.ndarray,  # [U_pad] int32 (pad -2)
    w: jnp.ndarray,  # [2B, U_pad] f32 (weights; presence)
    *,
    n_docs_pad: int,
    posting_chunk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """U-dedup BM25 scoring: same contract as bm25_score_blocked.

    Wins when batch queries share terms (VPU match work is O(U) per posting
    row instead of O(B*T)); exact — every matmul input is bf16-exact."""
    B2, U = w.shape
    B = B2 // 2
    n_blocks, p_blk = blk_terms.shape
    if posting_chunk <= 0:
        posting_chunk = _auto_posting_chunk(p_blk)
    pc = min(posting_chunk, p_blk)
    assert p_blk % pc == 0 and pc % (SUB * 128) == 0
    assert U % SUB == 0
    n_chunks = p_blk // pc
    assert n_blocks * DOC_BLOCK == n_docs_pad
    pcL = pc // SUB

    def tile(x):
        return x.reshape(n_blocks, n_chunks, SUB, pcL)

    stream_spec = pl.BlockSpec(
        (1, 1, SUB, pcL), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    localt_spec = pl.BlockSpec(
        (1, 1, pcL, SUB), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel_udedup,
        grid=(n_blocks, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (B2, U), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (U, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            stream_spec,
            stream_spec,
            localt_spec,
        ],
        out_specs=pl.BlockSpec(
            (B2, DOC_BLOCK), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B2, n_docs_pad), jnp.float32),
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(
        w,
        uids.reshape(U, 1),
        tile(blk_terms),
        tile(blk_impact),
        tile(blk_local).swapaxes(2, 3),
    )

    scores, matched = out[:B], out[B:] > 0.0
    keyed = jnp.where(matched & (scores >= 0.0), scores, -1.0)
    return jnp.concatenate(
        [keyed, jnp.full((B, 1), -1.0, jnp.float32)], axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("n_docs_pad", "posting_chunk", "interpret")
)
def bm25_score_blocked(
    blk_terms: jnp.ndarray,  # [n_blocks, p_blk] (tiled 4D internally)
    blk_impact: jnp.ndarray,
    blk_local: jnp.ndarray,
    term_ids: jnp.ndarray,  # [B, T]
    qtf: jnp.ndarray,  # [B, T]
    *,
    n_docs_pad: int,
    posting_chunk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Keyed BM25 scores [B, n_docs_pad + 1] (same contract as
    ops.bm25_score_batch): admissible candidates keep their score,
    everything else is -1.0; last column is a dead sentinel.

    posting_chunk=0 (default) auto-selects the largest p_blk divisor whose
    streamed operands fit comfortably in VMEM — fewer grid steps means less
    per-step overhead (measured 13-19% on v5e at 8M postings).
    """
    B, T = term_ids.shape
    n_blocks, p_blk = blk_terms.shape
    if posting_chunk <= 0:
        posting_chunk = _auto_posting_chunk(p_blk)
    pc = min(posting_chunk, p_blk)
    assert p_blk % pc == 0 and pc % (SUB * 128) == 0
    n_chunks = p_blk // pc
    assert n_blocks * DOC_BLOCK == n_docs_pad
    pcL = pc // SUB

    def tile(x):
        return x.reshape(n_blocks, n_chunks, SUB, pcL)

    stream_spec = pl.BlockSpec(
        (1, 1, SUB, pcL), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    localt_spec = pl.BlockSpec(
        (1, 1, pcL, SUB), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        grid=(n_blocks, n_chunks),
        in_specs=[
            pl.BlockSpec((B, T), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            stream_spec,
            stream_spec,
            localt_spec,
        ],
        out_specs=pl.BlockSpec(
            (2 * B, DOC_BLOCK), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * B, n_docs_pad), jnp.float32),
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(
        term_ids,
        qtf,
        tile(blk_terms),
        tile(blk_impact),
        tile(blk_local).swapaxes(2, 3),
    )

    scores, matched = out[:B], out[B:] > 0.0
    keyed = jnp.where(matched & (scores >= 0.0), scores, -1.0)
    return jnp.concatenate(
        [keyed, jnp.full((B, 1), -1.0, jnp.float32)], axis=1
    )


# ---- doc-slot layout entry points ------------------------------------------

SLOT_ROW_CHUNK = 512  # rows per grid step (streamed operands ~2 MB at 512)


def _slots_call(kernel, front, slot_terms, slot_impact, B2, interpret):
    """Run ``kernel`` over every stride class and concatenate the per-class
    ``[B2 // 2, n_g * COLS]`` KEYED outputs along the column axis
    (class-major column order; callers un-permute with
    DeviceIndex.col_unperm).  The [2B, COLS] (scores; counts) accumulator
    lives in VMEM scratch; only the keyed scores reach HBM."""
    f0, f1 = front
    B = B2 // 2
    parts = []
    for terms, impact in zip(slot_terms, slot_impact):
        n_g, S, COLS = terms.shape
        RC = min(S, SLOT_ROW_CHUNK)
        assert S % RC == 0  # strides <= 512 or multiples of 512
        stream = pl.BlockSpec(
            (1, RC, COLS), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_g, S // RC),
            in_specs=[
                pl.BlockSpec(
                    f0.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    f1.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
                ),
                stream,
                stream,
            ],
            out_specs=pl.BlockSpec(
                (B, COLS), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, n_g * COLS), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B2, COLS), jnp.float32)],
            compiler_params=None if interpret else _COMPILER_PARAMS,
            interpret=interpret,
        )(f0, f1, terms, impact)
        parts.append(out)
    return jnp.concatenate(parts, axis=1)


def _slots_key(keyed, col_unperm, B):
    """Kernel-keyed scores (slot column order) -> dense doc order
    (same admissibility contract as bm25_score_blocked).

    The slot layout only REORDERS WHOLE GROUPS (build_slot_postings:
    ``col_unperm[d] = group_pos[d // cols] * cols + d % cols`` — within a
    group the 512 doc columns stay consecutive), so the un-permutation is
    a contiguous block gather along the ~D/512 group axis instead of an
    elementwise [B, D] take (measured 0.25 ms/batch-64 at 100k docs for
    the elementwise form; the block form is ~free)."""
    from modern_search_engines_project_tpu.retrieval.device_index import (
        SLOT_COLS,
    )

    n_dense = col_unperm.shape[0]
    if keyed.shape[1] % SLOT_COLS == 0 and n_dense >= SLOT_COLS:
        n_groups_dense = -(-n_dense // SLOT_COLS)
        group_perm = col_unperm[::SLOT_COLS] // SLOT_COLS
        k3 = keyed.reshape(B, keyed.shape[1] // SLOT_COLS, SLOT_COLS)
        keyed = jnp.take(k3, group_perm, axis=1).reshape(
            B, n_groups_dense * SLOT_COLS
        )[:, :n_dense]
    else:  # tiny corpora (< one group): plain elementwise take
        keyed = jnp.take(keyed, col_unperm, axis=1)
    return jnp.concatenate(
        [keyed, jnp.full((B, 1), -1.0, jnp.float32)], axis=1
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def bm25_score_slots(
    slot_terms: tuple,
    slot_impact: tuple,
    col_unperm: jnp.ndarray,  # int32 [n_docs_pad]
    term_ids: jnp.ndarray,  # [B, T]
    qtf: jnp.ndarray,  # [B, T]
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Keyed BM25 scores [B, n_docs_pad + 1] via the doc-slot layout: the
    per-doc reduction is a sum over slot rows, so the kernel has no one-hot
    matmul, no local-id operand, and exact f32 accumulation."""
    B = term_ids.shape[0]
    full = _slots_call(
        _kernel_slots, (term_ids, qtf), slot_terms, slot_impact, 2 * B,
        interpret,
    )
    return _slots_key(full, col_unperm, B)


_UDEDUP_KERNELS = {
    "sublane": _kernel_slots_udedup,
    "acc": _kernel_slots_udedup_acc,
    "i8": _kernel_slots_udedup_i8,
    "wide": functools.partial(_kernel_slots_udedup_wide, i8=False),
    "wide_i8": functools.partial(_kernel_slots_udedup_wide, i8=True),
}


@functools.partial(jax.jit, static_argnames=("interpret", "acc", "variant"))
def bm25_score_slots_udedup(
    slot_terms: tuple,
    slot_impact: tuple,
    col_unperm: jnp.ndarray,
    uids: jnp.ndarray,  # [U] int32 (pad -2)
    w: jnp.ndarray,  # [2B, U] f32
    *,
    interpret: bool = False,
    acc: bool = True,
    variant: str = None,
) -> jnp.ndarray:
    """U-dedup variant of bm25_score_slots (same contract): postings match
    the batch's distinct terms once; per-query weights are recovered by
    matmul.  ``variant`` picks the kernel (_UDEDUP_KERNELS); when None the
    legacy ``acc`` flag maps True->"acc", False->"sublane".  All variants
    are EXACT (f32 or integer accumulation; see each kernel's docstring)."""
    B = w.shape[0] // 2
    U = uids.shape[0]
    if variant is None:
        variant = "acc" if acc else "sublane"
    full = _slots_call(
        _UDEDUP_KERNELS[variant],
        (w, uids.reshape(U, 1)),
        slot_terms,
        slot_impact,
        2 * B,
        interpret,
    )
    return _slots_key(full, col_unperm, B)


def dedup_query_terms_device(term_ids, qtf, u_pad: int):
    """Jittable twin of ``dedup_query_terms`` with a STATIC distinct-term
    budget: distinct ids beyond ``u_pad`` would be silently dropped, so
    callers must size u_pad >= the batch's true distinct count (the host
    twin measures it; bench.py asserts it before timing).  Lets scan-style
    device benchmarks and fully-fused pipelines take the U-dedup path."""
    B, T = term_ids.shape
    SENT = jnp.int32(2**31 - 1)
    flat = jnp.where(term_ids.reshape(-1) < 0, SENT, term_ids.reshape(-1))
    uniq = jnp.unique(flat, size=u_pad, fill_value=SENT)
    uids = jnp.where(uniq == SENT, jnp.int32(-2), uniq.astype(jnp.int32))
    pos = jnp.searchsorted(uniq, jnp.clip(term_ids, 0, None)).astype(
        jnp.int32
    )
    valid = term_ids >= 0
    cols = jnp.where(valid, pos, u_pad)  # invalid -> dropped column
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    w = jnp.zeros((2 * B, u_pad + 1), jnp.float32)
    w = w.at[rows, cols].add(jnp.where(valid, qtf, 0.0))
    w = w.at[B + rows, cols].max(jnp.where(valid, 1.0, 0.0))
    return uids, w[:, :u_pad]
