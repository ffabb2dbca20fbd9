"""A/B bench: doc-slot vs doc-major-blocked BM25 Pallas kernels.

Measures kernel device time with the scan-in-one-dispatch methodology
(queries generated on-device, N iterations under one lax.scan, one end
sync) at configurable corpus size.  Not part of the driver bench —
a tool for kernel work; results recorded in NOTES.md / docs/METRICS.md.

    python bench_kernels.py [n_docs] [which]
      which: all | slots | blocked | slots_ud | blocked_ud (default all)
"""

import functools
import json
import sys
import time

import numpy as np

from bench import make_synthetic_index

T = 16
DIM = 768


def main():
    import jax
    import jax.numpy as jnp

    from modern_search_engines_project_tpu.retrieval import bm25_pallas as bp

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    interpret = jax.default_backend() == "cpu"
    n_terms = max(50_000, n_docs // 2)

    # the blocked layout is host-construction-heavy; only build it for the
    # modes that A/B it (gate_fit and the slots sweeps never touch it)
    need_blocked = which in ("all", "blocked", "blocked_ud")
    t0 = time.time()
    didx_s, cfg, dfs = make_synthetic_index(
        n_docs, n_terms, 3.0, DIM, 80 * n_docs, bm25_layout="slots",
        build_unused_layout=need_blocked,
    )
    print(f"index built in {time.time()-t0:.1f}s nnz={didx_s.nnz} "
          f"slot_classes={[t.shape for t in didx_s.slot_terms]}",
          file=sys.stderr)
    slot_pad = sum(int(np.prod(t.shape)) for t in didx_s.slot_terms)
    pad_msg = f"padding: slots {slot_pad/didx_s.nnz:.2f}x"
    if need_blocked:
        blk_pad = int(np.prod(np.asarray(didx_s.blk_terms).shape))
        pad_msg += f" blocked {blk_pad/didx_s.nnz:.2f}x"
    print(pad_msg + " of nnz", file=sys.stderr)

    logits = jnp.log(jnp.asarray(dfs, jnp.float32))

    def scan_kernel(runner_args, fn, B, n_scan, label, udedup=False):
        """n_scan kernel calls under ONE lax.scan; queries device-generated."""

        @jax.jit
        def loop(args, seed0):
            def one(carry, seed):
                key = jax.random.fold_in(jax.random.key(7), seed)
                tid = jax.random.categorical(
                    key, logits, shape=(B, T)
                ).astype(jnp.int32)
                qw = jnp.ones((B, T), jnp.float32)
                if udedup:
                    # device-side dedup prep is host logic; approximate the
                    # U-dedup steady state with a FIXED uids set + per-seed
                    # weights (same kernel work as production batches).
                    # Integer-valued weights: production w rows are qtf
                    # counts / 0-1 presence, and the i8 kernels rely on it.
                    U = udedup if isinstance(udedup, int) else 128
                    uids = jnp.arange(U, dtype=jnp.int32)  # common terms
                    w = jnp.floor(
                        3.0
                        * jnp.abs(
                            jax.random.normal(key, (2 * B, U), jnp.float32)
                        )
                    ) + 1.0
                    o = fn(*args, uids, w)
                else:
                    o = fn(*args, tid, qw)
                return carry + jnp.sum(o[:, 0]), None

            acc, _ = jax.lax.scan(
                one, jnp.zeros((), jnp.float32), seed0 + jnp.arange(n_scan)
            )
            return acc

        t0 = time.time()
        _ = float(np.asarray(loop(runner_args, jnp.int32(0))))
        comp = time.time() - t0
        t0 = time.time()
        _ = float(np.asarray(loop(runner_args, jnp.int32(n_scan))))
        ms = (time.time() - t0) / n_scan * 1e3
        print(f"{label}: {ms:.3f} ms/call (B={B}; compile {comp:.0f}s)",
              file=sys.stderr)
        return ms

    results = {}
    slots_args = (didx_s.slot_terms, didx_s.slot_impact, didx_s.col_unperm)
    blk_args = None
    if need_blocked:
        blk_args = (
            jnp.asarray(np.asarray(didx_s.blk_terms)),
            jnp.asarray(np.asarray(didx_s.blk_impact)),
            jnp.asarray(np.asarray(didx_s.blk_local)),
        )

    def slots_fn(st, si, cu, tid, qw):
        return bp.bm25_score_slots(st, si, cu, tid, qw, interpret=interpret)

    def blocked_fn(bt, bi, bl, tid, qw):
        return bp.bm25_score_blocked(
            bt, bi, bl, tid, qw, n_docs_pad=didx_s.n_docs_pad,
            interpret=interpret,
        )

    def slots_ud_fn(st, si, cu, uids, w):
        return bp.bm25_score_slots_udedup(
            st, si, cu, uids, w, interpret=interpret, acc=False
        )

    def slots_ud_acc_fn(st, si, cu, uids, w):
        return bp.bm25_score_slots_udedup(
            st, si, cu, uids, w, interpret=interpret, acc=True
        )

    def mk_ud_variant(v):
        def fn(st, si, cu, uids, w):
            return bp.bm25_score_slots_udedup(
                st, si, cu, uids, w, interpret=interpret, variant=v
            )

        return fn

    def floor_fn(*a):
        # scan-dispatch floor at this (B, n_scan): the tunnel RTT divided
        # by n_scan lands in EVERY cell; gate decisions use corrected values
        import jax.numpy as _j

        return _j.zeros((1, 2), _j.float32)

    def blocked_ud_fn(bt, bi, bl, uids, w):
        return bp.bm25_score_blocked_udedup(
            bt, bi, bl, uids, w, n_docs_pad=didx_s.n_docs_pad,
            interpret=interpret,
        )

    plan = []
    if which in ("all", "slots"):
        plan += [("slots_b64", slots_args, slots_fn, 64, 16, False),
                 ("slots_b1", slots_args, slots_fn, 1, 64, False)]
    if which in ("all", "blocked"):
        plan += [("blocked_b64", blk_args, blocked_fn, 64, 16, False),
                 ("blocked_b1", blk_args, blocked_fn, 1, 64, False)]
    if which in ("all", "slots_ud"):
        plan += [("slots_udedup_b64", slots_args, slots_ud_fn, 64, 16, True)]
    if which in ("all", "slots_ud_acc"):
        plan += [("slots_udedup_acc_b64", slots_args, slots_ud_acc_fn, 64,
                  16, True),
                 ("slots_udedup_acc_b1", slots_args, slots_ud_acc_fn, 1,
                  64, 16)]
    if which == "slots_ud_sweep":
        plan += [(f"slots_udedup_b64_U{u}", slots_args, slots_ud_fn, 64, 16,
                  u) for u in (512, 1024)]
    if which == "slots_ud_acc_sweep":
        plan += [(f"slots_udedup_acc_b64_U{u}", slots_args, slots_ud_acc_fn,
                  64, 16, u) for u in (512, 1024)]
    if which == "slots_ud_256":
        plan += [("slots_udedup_b64_U256", slots_args, slots_ud_fn, 64, 16,
                  256),
                 ("slots_udedup_acc_b64_U256", slots_args, slots_ud_acc_fn,
                  64, 16, 256)]
    if which in ("all", "blocked_ud"):
        plan += [("blocked_udedup_b64", blk_args, blocked_ud_fn, 64, 16,
                  True)]
    if which == "gate_fit":
        # VERDICT r2 #10 / r3 refresh: measure every (B, U) cell the
        # dispatch gate chooses between at THIS corpus size, then report
        # whether udedup_plan picks the measured winner per cell.  All
        # cells run n_scan=32 and a floor row (trivial kernel) is measured
        # per B so decisions use FLOOR-CORRECTED times — the round-2/3
        # fits ran n_scan=16 uncorrected, so ~2.2 ms of tunnel RTT sat in
        # every cell and skewed the small-shape boundaries.
        NS = 32
        for B in (1, 16, 64):
            plan += [(f"floor_b{B}", slots_args, floor_fn, B, NS, False),
                     (f"plain_b{B}", slots_args, slots_fn, B, NS, False)]
        for U in (128, 256, 512, 1024):
            for B in (16, 64):
                plan += [
                    (f"ud_matmul_b{B}_U{U}", slots_args, slots_ud_fn, B,
                     NS, U),
                    (f"ud_acc_b{B}_U{U}", slots_args, slots_ud_acc_fn, B,
                     NS, U),
                    (f"ud_i8_b{B}_U{U}", slots_args, mk_ud_variant("i8"),
                     B, NS, U),
                    (f"ud_wide_i8_b{B}_U{U}", slots_args,
                     mk_ud_variant("wide_i8"), B, NS, U),
                ]
    for label, args, fn, B, n, ud in plan:
        try:
            results[label] = round(
                scan_kernel(args, fn, B, n, label, udedup=ud), 3
            )
        except Exception as exc:
            print(f"{label} failed: {exc}", file=sys.stderr)
            results[label] = None
    if which == "gate_fit":
        gate = {}
        for B in (16, 64):
            plain = results.get(f"plain_b{B}")
            floor = results.get(f"floor_b{B}") or 0.0
            for U in (128, 256, 512, 1024):
                meas = {"plain": plain}
                for v, key in (("acc", "acc"), ("sublane", "matmul"),
                               ("i8", "i8"), ("wide_i8", "wide_i8")):
                    meas[v] = results.get(f"ud_{key}_b{B}_U{U}")
                if any(m is None for m in meas.values()):
                    continue
                meas = {k: round(m - floor, 3) for k, m in meas.items()}
                measured_winner = min(meas, key=meas.get)
                gate_pick = bp.udedup_plan(U, B, nnz=didx_s.nnz) or "plain"
                # within-10% ties count as agreement (measurement noise)
                agree = (
                    meas[gate_pick] <= 1.10 * meas[measured_winner] + 0.05
                )
                gate[f"B{B}_U{U}"] = {
                    **meas,
                    "floor": floor,
                    "measured_winner": measured_winner,
                    "gate_pick": gate_pick,
                    "agree": agree,
                }
        results["gate_fit"] = gate
        n_cells = len(gate)
        n_ok = sum(1 for v in gate.values() if v["agree"])
        print(f"gate agreement: {n_ok}/{n_cells} cells (>=95% of winner)",
              file=sys.stderr)
    print(json.dumps({"n_docs": n_docs, "nnz": didx_s.nnz, **results}))


if __name__ == "__main__":
    main()
