"""Benchmark: hybrid query throughput + latency on the real device.

Prints ONE JSON line:
  {"metric": "hybrid_qps", "value": N, "unit": "queries/sec",
   "vs_baseline": N / 0.0333}

Baseline: the reference serves a hybrid query in "< 30 seconds"
(reference README.md:290) => ~0.0333 q/s.  BASELINE.md's north-star target
is >= 10,000 q/s on a v5e-8 at p50 < 5 ms; this bench runs on however many
devices are visible (one chip on the dev box) and also reports p50 batch-1
latency plus stage timings on stderr.

The HEADLINE value is the device-only lax.scan throughput at batch 64 —
n batches generated and scored in ONE dispatch, so neither the dev-box
tunnel nor host Python is in the measured region.  Tunnel-inclusive and
pipelined-dispatch numbers are in extras.

SELF-VALIDATION (round-2 post-mortem: an unattended capture once recorded
a 20x-off number and nothing caught it).  Every timed section now:
  * repeats >=3 times and reports min + spread,
  * cross-checks the min against an analytic roofline lower bound for the
    exact index shape (HBM stream bytes / MXU flops / VPU compare ops vs
    v5e peaks) — a measurement below the bound is physically impossible
    (caching bug), one far above it is chip/tunnel contention,
  * compares against the best previous run persisted in
    ~/.cache/msetpu/bench_history.json,
  * re-measures automatically while any check fails (bounded retries) and
    emits a per-section status + the full validation record in extras.

The index is synthetic but realistically shaped (Zipf document frequencies,
~3 chunks/doc, 768-d bf16 bank) so the measured path is exactly the
production one: ops.hybrid_rank_slots — slot-layout Pallas BM25, full-bank
matmul, segment top-2, fusion, final top-k.

Multi-chip projections carry an ANALYTIC ICI term (documented in
README.md): the per-step all-gather of per-shard top-k candidates moves
B*k*8 bytes/shard over the ring; its cost is added to the per-shard device
time instead of being assumed zero.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: the tunnel's remote compiles are slow (and
# high-variance); cache them across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

HISTORY_PATH = os.path.expanduser("~/.cache/msetpu/bench_history.json")

# TPU v5e (v5 lite) public peaks (jax-ml.github.io/scaling-book: HBM
# 8.1e11 B/s, 1.97e14 bf16 FLOP/s, 3.94e14 int8, ICI 4.5e10 B/s per link
# one-way).  VPU peak is ~4 int-vector-ops/cycle x 8x128 lanes @ 940 MHz.
V5E = {
    "hbm_Bps": 8.1e11,
    "bf16_flops": 1.97e14,
    "int8_flops": 3.94e14,
    "vpu_ops": 3.9e12,
    "ici_Bps_link": 4.5e10,
}


def make_synthetic_index(
    n_docs: int,
    n_terms: int,
    avg_chunks: float,
    dim: int,
    nnz_target: int,
    seed: int = 0,
    bank_dtype=None,
    bm25_layout: str = "slots",
    build_unused_layout: bool = False,
):
    import jax.numpy as jnp

    from modern_search_engines_project_tpu.retrieval.device_index import (
        DeviceIndex,
    )

    rng = np.random.default_rng(seed)
    # Zipf-ish dfs normalized to hit nnz_target
    ranks = np.arange(1, n_terms + 1)
    dfs = (1.0 / ranks) ** 0.7
    dfs = np.maximum((dfs / dfs.sum() * nnz_target).astype(np.int64), 1)
    dfs = np.minimum(dfs, n_docs)
    nnz = int(dfs.sum())
    indptr = np.zeros(n_terms + 1, np.int64)
    np.cumsum(dfs, out=indptr[1:])
    post_docs = rng.integers(0, n_docs, size=nnz, dtype=np.int32)
    post_impact = rng.gamma(2.0, 1.5, size=nnz).astype(np.float32)

    # builder invariant: every doc has 1..max_chunks_per_doc chunks
    extra = rng.poisson(avg_chunks - 1.0, size=n_docs)
    doc_n = np.minimum(1 + extra, 10).astype(np.int32)
    n_chunks = int(doc_n.sum())
    chunk_doc = np.repeat(np.arange(n_docs, dtype=np.int32), doc_n)
    doc_start = np.zeros(n_docs, np.int32)
    np.cumsum(doc_n[:-1], out=doc_start[1:])
    # Gaussian bank via base-resample: true ziggurat sampling is ~30 s per
    # 600k chunks on the single-core dev host; drawing a 64k-row Gaussian
    # base and gathering random rows keeps the score distribution (dense
    # matmul timing is data-independent; approx-recall statistics only see
    # CLT-Gaussian score sums) at ~10x less host time.  Row-normalize with
    # einsum — np.linalg.norm is ~50x slower at this shape on this host.
    n_base = min(n_chunks, 65536)
    base = rng.standard_normal((n_base, dim), dtype=np.float32)
    base /= np.sqrt(np.einsum("ij,ij->i", base, base))[:, None]
    # gather as f16: fresh-page writes run ~130 MB/s on this single-core
    # host, so the multi-GB bank copy dominates index gen — halving the
    # bytes halves it (device converts to the bank dtype anyway; the f16
    # round of a unit-normalized Gaussian is score-equivalent here).
    # NOTE: rows are unit-norm only to f16 precision (~1e-3) — fine for
    # this synthetic bench where engine and oracle share the bank, but it
    # does not meet IndexArtifacts.chunk_emb's exact-L2 contract (ADVICE
    # r3; relevant only if a future parity check asserts exact unit norms)
    bank = base.astype(np.float16)[rng.integers(0, n_base, size=n_chunks)]
    del base

    class _Art:
        pass

    art = _Art()
    art.indptr = indptr.astype(np.int32)
    art.post_docs = post_docs
    art.post_impact = post_impact
    art.chunk_emb = bank
    art.chunk_doc = chunk_doc
    art.doc_chunk_start = doc_start
    art.doc_n_chunks = doc_n
    art.n_docs = n_docs
    art.n_chunks = n_chunks
    art.n_terms = n_terms

    from modern_search_engines_project_tpu.config import Config

    cfg = Config(embedding_dim=dim)
    dtype = bank_dtype if bank_dtype is not None else jnp.bfloat16
    # packed bank + CSR stay host-side: the bench drives the bucketed
    # Pallas path only, and the duplicate bank OOMs HBM at 1M docs
    didx = DeviceIndex.from_artifacts(
        art, cfg, bank_dtype=dtype, packed_device=False,
        bm25_layout=bm25_layout,
        build_unused_layout=build_unused_layout,
    )
    return didx, cfg, dfs


def sample_queries(rng, n_terms, dfs, B, T, dim):
    # realistic query model: 2-6 terms per query (reference queries.txt
    # queries are 2-4 words plus the "tübingen" augmentation,
    # search_api.py:155-166), drawn from the df distribution so common
    # terms repeat across the batch like real traffic.  Unique term ids
    # with qtf counts (engine.prepare_queries semantics).
    probs = dfs / dfs.sum()
    term_ids = np.full((B, T), -1, np.int32)
    qtf = np.zeros((B, T), np.float32)
    for b in range(B):
        # every query shares the anchor term (the reference appends
        # "tübingen" to EVERY query, search_api.py:163-164) + 1-5 drawn
        # terms — this also sets the realistic distinct-term count the
        # U-dedup gate sees per batch
        n_q = rng.integers(1, 6)
        draws = np.concatenate(
            [[0], rng.choice(n_terms, size=n_q, p=probs)]
        )
        uniq, counts = np.unique(draws, return_counts=True)
        term_ids[b, : len(uniq)] = uniq
        qtf[b, : len(uniq)] = counts
    qvec = rng.standard_normal((B, dim)).astype(np.float32)
    qvec /= np.linalg.norm(qvec, axis=1, keepdims=True)
    return term_ids, qtf, qvec


# ---- self-validation machinery --------------------------------------------


def load_history() -> dict:
    try:
        with open(HISTORY_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def save_history(hist: dict) -> None:
    try:
        os.makedirs(os.path.dirname(HISTORY_PATH), exist_ok=True)
        with open(HISTORY_PATH, "w") as f:
            json.dump(hist, f, indent=1, sort_keys=True)
    except Exception as exc:  # never fail the bench over bookkeeping
        print(f"history save failed: {exc}", file=sys.stderr)


def roofline_bound(didx, B, T, dim, int8: bool) -> dict:
    """Analytic per-batch lower bound (ms) for hybrid_rank_slots at this
    exact index shape: max over the HBM-stream, MXU and VPU terms.

    Streamed bytes/batch: the full slot posting stream (terms + impacts),
    the full chunk bank, and the [B, n_docs_pad] score accumulator
    (written by the kernel, re-read by top_k).  MXU: the dense q x bank
    matmul.  VPU: the match loop compares every posting slot against T
    query-term slots per query.
    """
    import jax

    def leaf_bytes(x):
        return int(np.prod(x.shape)) * x.dtype.itemsize

    slot_leaves = jax.tree_util.tree_leaves(
        (didx.slot_terms, didx.slot_impact)
    )
    bank_leaves = jax.tree_util.tree_leaves(didx.bucket_emb)
    stream_bytes = sum(leaf_bytes(x) for x in slot_leaves)
    bank_bytes = sum(leaf_bytes(x) for x in bank_leaves)
    slots_pad = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(didx.slot_terms)
    )
    score_bytes = 2 * B * didx.n_docs_pad * 4
    n_chunks = getattr(didx, "n_chunks_pad", None) or sum(
        int(x.shape[0]) for x in bank_leaves
    )
    dense_flops = 2.0 * B * dim * n_chunks
    vpu_ops = 1.0 * B * slots_pad * max(T, 1)

    t_hbm = (stream_bytes + bank_bytes + score_bytes) / V5E["hbm_Bps"]
    t_mxu = dense_flops / (V5E["int8_flops"] if int8 else V5E["bf16_flops"])
    t_vpu = vpu_ops / V5E["vpu_ops"]
    bound_ms = max(t_hbm, t_mxu, t_vpu) * 1e3

    # ---- component roofline (VERDICT r3 #1: the max() bound above models
    # the pipeline as ONE perfectly-overlapped machine, but XLA:TPU runs
    # the stages SEQUENTIALLY — the honest floor is the SUM of per-stage
    # bounds).  Stage models, each grounded in profile measurements
    # (docs/profile_pipeline_100000.json, round 4):
    #   * BM25 kernel: max(posting stream, U-dedup match-recovery MXU s8
    #     matmul 2·B·U·slots flops / COLS-tiling, VPU uid-vs-slot compares
    #     U·slots) — U from the serving gate's typical bucket;
    #   * stage-1 exact top-k: TPU sorts run at a measured element rate
    #     (full variadic sort of [64,100k] = 6.6 ms true => ~1 ns/elem/
    #     batch-row-pair); blockmax sorts ~N/G + k·G elements;
    #   * dense stats: max(bank stream, q x bank MXU);
    #   * final ranking: 2 (B,k) gathers at the measured TPU gather rate
    #     (~7 ns/gathered elem) + one (B,k) 5-operand sort.
    # These rate constants are HARDWARE behavior measured on this chip
    # generation, not algorithmic slack — but a better ALGORITHM (fewer
    # sorted/gathered elements) can beat this bound, so it feeds the
    # efficiency story (pipeline_efficiency), never the below_roofline
    # impossibility check.
    u_pad = 256  # the gate bucket real 64-query batches land in
    sort_s_per_elem = 6.6e-3 / (64 * 100736)  # measured full-sort rate
    gather_s_per_elem = 0.93e-3 / (2 * 64 * 1000)  # measured 2-take rate
    k = min(1000, didx.n_docs_pad)
    g = 16 if (didx.n_docs_pad + 15) // 16 <= 8192 * 16 else 4
    t_kernel = max(
        stream_bytes / V5E["hbm_Bps"],
        2.0 * B * u_pad * slots_pad / V5E["int8_flops"],
        1.0 * u_pad * slots_pad / V5E["vpu_ops"],
    )
    t_topk = sort_s_per_elem * B * (didx.n_docs_pad / g + k * g)
    t_stats = max(bank_bytes / V5E["hbm_Bps"], t_mxu)
    t_final = gather_s_per_elem * 2 * B * k + sort_s_per_elem * B * k
    component_ms = (t_kernel + t_topk + t_stats + t_final) * 1e3
    return {
        "bound_ms": bound_ms,
        "component_bound_ms": component_ms,
        "hbm_bytes": stream_bytes + bank_bytes + score_bytes,
        "dense_flops": dense_flops,
        "t_hbm_ms": t_hbm * 1e3,
        "t_mxu_ms": t_mxu * 1e3,
        "t_vpu_ms": t_vpu * 1e3,
        "t_kernel_ms": t_kernel * 1e3,
        "t_topk_ms": t_topk * 1e3,
        "t_stats_ms": t_stats * 1e3,
        "t_final_ms": t_final * 1e3,
    }


def ici_merge_ms(B: int, k: int, n_shards: int) -> float:
    """Analytic cost of the sharded backend's result merge (README
    "projection formula"): each step all-gathers per-shard top-k
    candidate (score f32, doc id i32) pairs — B*k*8 bytes per shard —
    around the ICI ring (bidirectional, 2 links), then re-top-ks on
    every chip (HBM-trivial: B*S*k*8 bytes).  Per-hop latency ~1 us."""
    if n_shards <= 1:
        return 0.0
    payload = B * k * 8
    total = payload * n_shards
    t = total * (n_shards - 1) / n_shards / (2 * V5E["ici_Bps_link"])
    t += (n_shards - 1) * 1e-6  # hop latency
    t += total / V5E["hbm_Bps"]  # re-top-k read of the gathered pool
    return t * 1e3


class Validated:
    """Record of one repeated, cross-checked measurement."""

    def __init__(self, label, times_ms, bound_ms, hist_best, retries):
        self.label = label
        self.times = times_ms
        self.best = min(times_ms)
        self.spread = max(times_ms) / self.best if self.best > 0 else 1.0
        self.bound_ms = bound_ms
        self.hist_best = hist_best
        self.retries = retries
        self.status = self.classify(self.best)

    # fixed per-batch cost outside the streamed/flop terms (dispatch,
    # exact top_k's sort passes, tail reductions): the contention check
    # adds this floor so small per-shard shapes — where measured/bound is
    # legitimately ~40x — don't false-positive (their absolute ms is tiny)
    DISPATCH_FLOOR_MS = 0.5

    def classify(self, ms):
        if self.bound_ms and ms < 0.9 * self.bound_ms:
            return "below_roofline"  # physically impossible => bad timing
        if self.bound_ms and ms > 30 * (
            self.bound_ms + self.DISPATCH_FLOOR_MS
        ):
            return "contention"
        if self.hist_best and ms > 3 * self.hist_best:
            return "regression_vs_history"
        return "ok"

    def record(self):
        return {
            "ms": round(self.best, 3),
            "spread": round(self.spread, 3),
            "n_runs": len(self.times),
            "retries": self.retries,
            "roofline_bound_ms": round(self.bound_ms, 4)
            if self.bound_ms
            else None,
            "history_best_ms": round(self.hist_best, 3)
            if self.hist_best
            else None,
            "status": self.status,
        }


def measure_validated(
    once, label, bound_ms, history, hist_key, repeats=3, max_extra=4
):
    """Run ``once()`` (returns ms) ``repeats`` times; while the min fails
    the roofline/history checks, keep re-measuring up to ``max_extra``
    more times.  Persists the new best to the history file."""
    hist_best = history.get(hist_key)
    times = [once(i) for i in range(repeats)]
    retries = 0
    while retries < max_extra:
        v = Validated(label, times, bound_ms, hist_best, retries)
        if v.status == "ok":
            break
        print(
            f"{label}: min {v.best:.3f} ms flagged {v.status} "
            f"(bound {bound_ms:.3f}, history "
            f"{hist_best if hist_best else '-'}) — re-measuring",
            file=sys.stderr,
        )
        retries += 1
        times.append(once(repeats + retries))
    v = Validated(label, times, bound_ms, hist_best, retries)
    if v.status != "below_roofline":
        history[hist_key] = (
            min(hist_best, v.best) if hist_best else v.best
        )
    return v


def main():
    import jax

    if os.environ.get("MSETPU_FORCE_CPU"):
        # the dev box force-registers the TPU tunnel platform ("axon"),
        # which ignores JAX_PLATFORMS; only jax.config reliably overrides
        # it (same trick as tests/conftest.py).  CPU smoke runs only.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from modern_search_engines_project_tpu.retrieval import ops

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    # optional argv[2]: chunk-bank dtype ("bf16" default | "int8" — the
    # HBM-capacity lever, e.g. 2M docs on one v5e chip)
    bank_arg = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    int8 = bank_arg == "int8"
    B = 64
    T = 8  # term-axis bucket for 2-6-term queries (engine.prepare_queries)
    dim = 768
    k_ret = 1000

    history = load_history()
    validation = {}
    backend = None  # set after jax import below; prefixes history keys
    # MSETPU_BENCH_FAST=1: correctness smoke (tiny iteration counts) —
    # for CPU CI runs; never use its numbers
    fast = bool(os.environ.get("MSETPU_BENCH_FAST"))
    repeats = 1 if fast else 3

    print(
        f"devices={jax.devices()} n_docs={n_docs}", file=sys.stderr
    )
    # Pallas kernels need interpret mode off-TPU (CPU smoke runs)
    interpret = jax.default_backend() == "cpu"
    on_tpu = not interpret
    backend = jax.default_backend()
    t0 = time.time()
    didx, cfg, dfs = make_synthetic_index(
        n_docs=n_docs,
        n_terms=max(50_000, n_docs // 2),
        avg_chunks=3.0,
        dim=dim,
        nnz_target=80 * n_docs,  # ~80 postings/doc (realistic analyzed page)
        bank_dtype="int8" if int8 else None,
    )
    print(
        f"index built in {time.time() - t0:.1f}s: nnz={didx.nnz} "
        f"chunks={didx.n_chunks_pad} posting_cap={didx.posting_cap}",
        file=sys.stderr,
    )
    # quality-gated candidate selection: same "auto" gate the engine uses
    # (config.resolve_approx) — no manual flags at 1M docs (VERDICT r2 #6)
    from modern_search_engines_project_tpu.config import resolve_approx

    approx = resolve_approx(cfg, didx.n_docs_pad)
    print(f"approx_candidates: {approx} (auto gate at "
          f"{cfg.approx_auto_min_docs} docs)", file=sys.stderr)

    rng = np.random.default_rng(1)
    n_terms_eff = max(50_000, n_docs // 2)
    k_ret = min(k_ret, didx.n_docs_pad)

    def run(term_ids, qtf, qvec):
        # mirrors engine._device_rank's slots dispatch (plain front end; the
        # scan section below additionally exercises the U-dedup gate)
        return ops.hybrid_rank_slots(
            didx.slot_terms,
            didx.slot_impact,
            didx.col_unperm,
            didx.bucket_emb,
            didx.bucket_valid,
            didx.bucket_start,
            jnp.asarray(term_ids),
            jnp.asarray(qtf),
            jnp.asarray(qvec),
            n_docs_pad=didx.n_docs_pad,
            k_ret=k_ret,
            smoothing=cfg.smoothing,
            buckets=didx.buckets,
            interpret=interpret,
            approx=approx,
        )

    # warmup / compile
    args = sample_queries(rng, n_terms_eff, dfs, B, T, dim)
    t0 = time.time()
    out = run(*args)
    _ = np.asarray(out[0])
    print(f"compile+first batch: {time.time() - t0:.1f}s", file=sys.stderr)

    # approx-candidates quality guardrail (measured, not assumed): when
    # the auto gate enabled approx_max_k, compare one batch against the
    # exact path — candidate recall@k and final top-10 overlap
    approx_quality = {}
    if approx:
        def run_exact(term_ids, qtf, qvec):
            return ops.hybrid_rank_slots(
                didx.slot_terms, didx.slot_impact, didx.col_unperm,
                didx.bucket_emb, didx.bucket_valid, didx.bucket_start,
                jnp.asarray(term_ids), jnp.asarray(qtf), jnp.asarray(qvec),
                n_docs_pad=didx.n_docs_pad, k_ret=k_ret,
                smoothing=cfg.smoothing, buckets=didx.buckets,
                interpret=interpret, approx=False,
            )

        oa = [np.asarray(x) for x in run(*args)]
        oe = [np.asarray(x) for x in run_exact(*args)]
        rec = []
        top10 = []
        for b in range(B):
            ia = set(oa[0][b].tolist())
            ie = set(oe[0][b].tolist())
            rec.append(len(ia & ie) / max(len(ie), 1))
            top10.append(
                len(set(oa[0][b][:10].tolist())
                    & set(oe[0][b][:10].tolist())) / 10.0
            )
        approx_quality = {
            "approx_candidate_recall": round(float(np.mean(rec)), 4),
            "approx_top10_overlap": round(float(np.mean(top10)), 4),
        }
        print(f"approx quality: {approx_quality}", file=sys.stderr)

    # roofline for the b64 whole-corpus shape (the validation yardstick;
    # only meaningful on the real chip)
    roof = roofline_bound(didx, B, T, dim, int8) if on_tpu else None
    if roof:
        print(
            f"roofline bound: {roof['bound_ms']:.3f} ms/batch-{B} "
            f"(hbm {roof['t_hbm_ms']:.3f} / mxu {roof['t_mxu_ms']:.3f} / "
            f"vpu {roof['t_vpu_ms']:.3f})",
            file=sys.stderr,
        )

    # tunnel-inclusive throughput: fresh DISTINCT batches (defeats any
    # result caching in the device tunnel), pipelined submission, host
    # materialization as the final sync point.  On a tunneled dev box this
    # is a conservative lower bound on device throughput — reported in
    # extras, NOT the headline.
    n_iters = 2 if fast else 16

    def tunnel_once(seed):
        r = np.random.default_rng(1000 + seed)
        batches = [
            sample_queries(r, n_terms_eff, dfs, B, T, dim)
            for _ in range(n_iters)
        ]
        t0 = time.time()
        for b in batches:
            out = run(*b)
        _ = np.asarray(out[0])
        return (time.time() - t0) / n_iters * 1e3

    v_tunnel = measure_validated(
        tunnel_once,
        "tunnel-inclusive",
        roof["bound_ms"] if roof else 0.0,
        history,
        f"{backend}:tunnel:{n_docs}:{bank_arg}",
        repeats=repeats,
    )
    validation["tunnel_inclusive"] = v_tunnel.record()
    qps = B / v_tunnel.best * 1e3
    print(
        f"tunnel-inclusive throughput: {qps:.1f} q/s "
        f"({v_tunnel.best:.2f} ms/batch of {B}, spread "
        f"{v_tunnel.spread:.2f}x, {v_tunnel.status})",
        file=sys.stderr,
    )

    # ---- device-input timing ----------------------------------------------
    # The tunnel adds ~40 ms RTT per *synchronous* round trip and a
    # per-batch host->device input transfer.  Here: pre-generate
    # DEVICE-RESIDENT query batches with a tiny jitted generator, then
    # pipeline n dispatches of the ALREADY-compiled kernel with no host
    # input transfer, syncing once at the end.  Device execution on one
    # chip is in-order, so materializing the final output bounds the whole
    # pipeline's completion.
    dfs_logits = jnp.log(jnp.asarray(dfs, jnp.float32))

    def _device_input_bench(batch, n_iters_d, runner):
        @jax.jit
        def gen(seed):
            key = jax.random.fold_in(jax.random.key(7), seed)
            k1, k2, k3 = jax.random.split(key, 3)
            term_ids = jax.random.categorical(
                k1, dfs_logits, shape=(batch, T)
            ).astype(jnp.int32)
            # shared anchor term + 1-5 drawn terms (see sample_queries)
            term_ids = term_ids.at[:, 0].set(0)
            n_q = jax.random.randint(k3, (batch, 1), 2, 7)
            valid = jnp.arange(T)[None, :] < n_q
            term_ids = jnp.where(valid, term_ids, -1)
            qtf = valid.astype(jnp.float32)
            qvec = jax.random.normal(k2, (batch, dim), jnp.float32)
            qvec = qvec / jnp.linalg.norm(qvec, axis=1, keepdims=True)
            return term_ids, qtf, qvec

        if fast:
            n_iters_d = min(n_iters_d, 4)
        dev_batches = [gen(jnp.int32(i)) for i in range(n_iters_d)]
        # force input materialization BEFORE timing (host sync via a tiny
        # readback; block_until_ready is unreliable over the tunnel)
        _ = np.asarray(dev_batches[-1][0][0, :1])
        # warmup the kernel at this batch size
        out = runner(*dev_batches[0])
        _ = np.asarray(out[0][:, :1])
        t0 = time.time()
        for b in dev_batches:
            out = runner(*b)
        _ = np.asarray(out[0][:, :1])
        dt = time.time() - t0
        return dt / n_iters_d * 1e3

    dev_ms_b64 = _device_input_bench(B, 64, run)
    dev_qps = B / (dev_ms_b64 / 1e3)
    print(
        f"device-input pipelined: {dev_ms_b64:.3f} ms/batch of {B} "
        f"({dev_qps:.0f} q/s, no per-batch host transfer)",
        file=sys.stderr,
    )
    dev_ms_b1 = _device_input_bench(1, 128, run)
    print(
        f"device-input pipelined batch-1: {dev_ms_b1:.3f} ms/query",
        file=sys.stderr,
    )

    # batch-1 latency p50 (per-request round trip incl. host transfer)
    args1 = sample_queries(rng, n_terms_eff, dfs, 1, T, dim)
    out = run(*args1)
    _ = np.asarray(out[0])
    lats = []
    for _ in range(3 if fast else 20):
        a = sample_queries(rng, n_terms_eff, dfs, 1, T, dim)
        t0 = time.time()
        out = run(*a)
        _ = np.asarray(out[0])
        lats.append(time.time() - t0)
    p50 = float(np.median(lats)) * 1e3
    print(f"batch-1 p50 latency: {p50:.2f} ms", file=sys.stderr)

    # real-builder throughput (BASELINE.md tracks index build time; the
    # reference gives no number). Small corpus, full pipeline: analyze
    # (C++ fast path) + chunk + embed + CSR/impact build.
    from modern_search_engines_project_tpu.config import Config as _C
    from modern_search_engines_project_tpu.index import Document, IndexBuilder
    from modern_search_engines_project_tpu.models import HashingEncoder

    bcfg = _C(embedding_dim=128)
    docs = [
        Document(i, f"https://s{i % 7}.de/p{i}", f"title {i}",
                 " ".join(f"word{(i * 31 + j) % 997}" for j in range(300)))
        for i in range(500)
    ]
    # warmed + min-of-3 (VERDICT r4 #7): the 500-doc build is ~100 ms, so
    # a one-shot measurement let one-time costs (hash-GEMM compile, native
    # lib load, a host-device sync under contention) land as a silent 32%
    # "regression".  The warm run pays them; the min is the build rate.
    benc = HashingEncoder(dim=128)
    IndexBuilder(benc, bcfg).build(docs)  # warm: compiles + lib loads
    build_times = []
    for _ in range(3):
        t0 = time.time()
        IndexBuilder(benc, bcfg).build(docs)
        build_times.append(time.time() - t0)
    build_rate = len(docs) / min(build_times)
    build_hist_key = f"{backend}:build_docs_per_s"
    build_hist = history.get(build_hist_key)
    build_status = "ok"
    if build_hist and build_rate < 0.75 * build_hist:
        build_status = "regression_vs_history"
    else:
        history[build_hist_key] = max(build_hist or 0.0, build_rate)
    validation["index_build"] = {
        "docs_per_s": round(build_rate, 1),
        "spread": round(max(build_times) / min(build_times), 3),
        "n_runs": len(build_times),
        "history_best_docs_per_s": round(build_hist, 1)
        if build_hist
        else None,
        "status": build_status,
    }
    print(
        f"index build: {build_rate:.1f} docs/s ({build_status})",
        file=sys.stderr,
    )

    # ---- strongest device-time claim: n batches under ONE lax.scan in ONE
    # dispatch.  All index arrays are passed as jit ARGUMENTS — closure
    # capture would bake them into the HLO as constants and the resulting
    # giant upload kills the remote-compile tunnel (HTTP 413 / broken
    # pipe).  Guarded: if the compile service still rejects it, the bench
    # reports the pipelined numbers only.  LAST device work before the JSON
    # so a wedged tunnel cannot lose earlier results.
    import functools

    def scan_measure(idx_, cfg_, dfs_, batch, n_scan, label, bound_key=None):
        approx_ = resolve_approx(cfg_, idx_.n_docs_pad)
        """True device time: n_scan batches under ONE lax.scan dispatch,
        min over repeated dispatches, validated against the roofline bound
        for idx_'s shape and the persisted history.

        Mirrors the engine's BM25 front-end gate: batches whose distinct
        query-term count fits the measured U-dedup crossover take the
        U-dedup slot kernel (device-side prep); otherwise the plain slot
        kernel.  The distinct count of every generated batch is verified
        host-side BEFORE timing (dedup_query_terms_device silently drops
        terms past its static budget, which would fake the workload)."""
        from modern_search_engines_project_tpu.retrieval.bm25_pallas import (
            dedup_query_terms_device,
            u_pad_for,
            udedup_plan,
        )

        k_eff = min(1000, idx_.n_docs_pad)
        logits = jnp.log(jnp.asarray(dfs_, jnp.float32))

        def gen(seed):
            key = jax.random.fold_in(jax.random.key(7), seed)
            k1, k2, k3 = jax.random.split(key, 3)
            tid = jax.random.categorical(
                k1, logits, shape=(batch, T)
            ).astype(jnp.int32)
            # shared anchor term + 1-5 drawn terms (see sample_queries)
            tid = tid.at[:, 0].set(0)
            n_q = jax.random.randint(k3, (batch, 1), 2, 7)
            valid = jnp.arange(T)[None, :] < n_q
            tid = jnp.where(valid, tid, -1)
            qw = valid.astype(jnp.float32)
            qv = jax.random.normal(k2, (batch, dim), jnp.float32)
            qv = qv / jnp.linalg.norm(qv, axis=1, keepdims=True)
            return tid, qw, qv

        # engine gate (measured crossover, engine._device_rank): pick the
        # front end from the ACTUAL distinct-term counts of the scan batches
        gen_all = jax.jit(jax.vmap(gen))  # one dispatch for all batches
        TID_all, QW_all, QV_all = gen_all(
            jnp.arange(2 * n_scan, dtype=jnp.int32)
        )
        TID_np = np.asarray(TID_all)
        max_distinct = max(
            int(np.unique(TID_np[i]).size) for i in range(2 * n_scan)
        )
        u_pad = u_pad_for(max_distinct)
        plan = udedup_plan(u_pad, batch, nnz=idx_.nnz)
        use_udedup = plan is not None

        # pre-generated query batches as scan xs: the in-scan generator
        # (jax.random.categorical over the df logits) measured ~0.8 ms/batch
        # of non-pipeline work inside the old timed loop
        TIDs = TID_all[:n_scan]
        QWs = QW_all[:n_scan]
        QVs = QV_all[:n_scan]

        @functools.partial(jax.jit, static_argnames=("buckets",))
        def scan_loop(st, si, cu, bemb, bval, bstart, TIDs, QWs, QVs, salt,
                      *, buckets):
            def one(carry, x):
                tid, qw, qv = x
                qv = qv + salt * 1e-12
                if use_udedup:
                    uids, w = dedup_query_terms_device(tid, qw, u_pad)
                    o = ops.hybrid_rank_slots_udedup(
                        st, si, cu, bemb, bval, bstart, uids, w, qv,
                        n_docs_pad=idx_.n_docs_pad, k_ret=k_eff,
                        smoothing=cfg_.smoothing, buckets=buckets,
                        interpret=interpret, variant=plan,
                        approx=approx_,
                    )
                else:
                    o = ops.hybrid_rank_slots(
                        st, si, cu, bemb, bval, bstart, tid, qw, qv,
                        n_docs_pad=idx_.n_docs_pad, k_ret=k_eff,
                        smoothing=cfg_.smoothing, buckets=buckets,
                        interpret=interpret, approx=approx_,
                    )
                return carry + jnp.sum(o[0][:, 0]), None

            acc, _ = jax.lax.scan(
                one, jnp.zeros((), jnp.int32), (TIDs, QWs, QVs)
            )
            return acc

        sargs = (
            idx_.slot_terms, idx_.slot_impact, idx_.col_unperm,
            idx_.bucket_emb, idx_.bucket_valid, idx_.bucket_start,
        )
        t0 = time.time()
        _ = int(np.asarray(scan_loop(
            *sargs, TIDs, QWs, QVs, jnp.float32(0.0), buckets=idx_.buckets
        )))
        comp = time.time() - t0

        def once(seed):
            t0 = time.time()
            _ = int(
                np.asarray(
                    scan_loop(
                        *sargs, TIDs, QWs, QVs,
                        jnp.float32(seed + 1),
                        buckets=idx_.buckets,
                    )
                )
            )
            return (time.time() - t0) / n_scan * 1e3

        r = roofline_bound(idx_, batch, T, dim, int8) if on_tpu else None
        v = measure_validated(
            once,
            label,
            r["bound_ms"] if r else 0.0,
            history,
            bound_key or f"{backend}:{label}:{n_docs}:{bank_arg}",
            repeats=repeats,
        )
        validation[label] = v.record()
        if r:
            validation[label]["component_bound_ms"] = round(
                r["component_bound_ms"], 3
            )
            validation[label]["pipeline_efficiency_pct"] = round(
                100 * r["component_bound_ms"] / v.best, 1
            )
            validation[label]["achieved_hbm_GBps"] = round(
                r["hbm_bytes"] / (v.best / 1e3) / 1e9, 1
            )
            validation[label]["dense_mfu_pct"] = round(
                100
                * r["dense_flops"]
                / (v.best / 1e3)
                / (V5E["int8_flops"] if int8 else V5E["bf16_flops"]),
                2,
            )
        front = f"udedup-{plan} U={u_pad}" if use_udedup else "plain"
        print(
            f"{label}: {v.best:.3f} ms/batch of {batch} "
            f"({batch / v.best * 1e3:.0f} q/s on-device; {front}; spread "
            f"{v.spread:.2f}x; {v.status}; compile {comp:.0f}s)",
            file=sys.stderr,
        )
        return v.best

    scan_ms = None
    shard_b1_ms = None
    shard_b64_ms = None
    half_b1_ms = None
    half_b64_ms = None
    try:
        n_scan = 2 if fast else 48  # floor = tunnel RTT / n_scan
        scan_ms = scan_measure(
            didx, cfg, dfs, B, n_scan, "device-only (lax.scan)"
        )
        # v5e-8 extrapolation: a doc-sharded mesh gives each chip 1/8 of
        # the corpus; measure THAT workload's device time on the one real
        # chip and ADD the analytic ICI merge term (ici_merge_ms).
        didx8, cfg8, dfs8 = make_synthetic_index(
            n_docs=max(n_docs // 8, 1024),
            n_terms=max(50_000, n_docs // 2),
            avg_chunks=3.0,
            dim=dim,
            nnz_target=80 * n_docs // 8,
            bank_dtype="int8" if int8 else None,
        )
        shard_b64_ms = scan_measure(
            didx8, cfg8, dfs8, B, n_scan, "per-shard (1/8 corpus) batch-64"
        )
        shard_b1_ms = scan_measure(
            didx8, cfg8, dfs8, 1, 4 * n_scan, "per-shard (1/8 corpus) batch-1"
        )
        # the BOTH-targets deployment shape: 2-way doc shard x 4-way
        # replica on a v5e-8 — each chip holds HALF the corpus; p50 is the
        # per-shard batch-1 time + the ICI merge, throughput is 4 replica
        # groups x (B / (per-shard batch time + merge))
        didx2, cfg2, dfs2 = make_synthetic_index(
            n_docs=max(n_docs // 2, 1024),
            n_terms=max(50_000, n_docs // 2),
            avg_chunks=3.0,
            dim=dim,
            nnz_target=80 * n_docs // 2,
            bank_dtype="int8" if int8 else None,
        )
        half_b1_ms = scan_measure(
            didx2, cfg2, dfs2, 1, 4 * n_scan, "per-shard-of-2 (deployment) batch-1"
        )
        half_b64_ms = scan_measure(
            didx2, cfg2, dfs2, B, n_scan, "per-shard-of-2 (deployment) batch-64"
        )
    except Exception as exc:  # tunnel/compile-service variance
        print(f"scan device bench unavailable: {exc}", file=sys.stderr)

    # ---- trained-encoder query forward (VERDICT r3 #3): the promoted
    # serving config embeds the index with runs/encoder-real, so every
    # query pays a 12L/768d forward BEFORE ranking.  Measure it under
    # lax.scan (device-only, same protocol as the sections above) and
    # fold it into *_trained projections — reference parity: its
    # embedding forward is inside the measured path
    # (reranker_api.py:355).
    enc_b64_ms = None
    enc_b1_ms = None
    enc_b8_ms = None
    enc_b32_ms = None
    enc_b64_len128_ms = None
    ckpt_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "runs", "encoder-real"
    )
    if on_tpu and os.path.isdir(ckpt_dir) and dim == 768:
        try:
            from modern_search_engines_project_tpu.models.encoder import (
                JaxEncoder,
            )

            enc = JaxEncoder.from_checkpoint(
                ckpt_dir, batch_size=B, max_len=128
            )
            model, params = enc.model, enc.params
            n_enc = 2 if fast else 32
            # real queries are 2-6 terms (+augmentation) => <=9 tokens
            # with CLS/SEP framing; JaxEncoder's length bucketing routes
            # them to the len-16 compiled shape (VERDICT r4 #2), so the
            # production encoder cost is the len-16 forward, NOT len-128
            Q_LEN = enc.bucket_len([[0] * 7])  # 7 ids + CLS/SEP -> 16

            n_params = sum(
                x.size for x in jax.tree_util.tree_leaves(params)
            )

            def enc_measure(batch, label, seq_len=Q_LEN):
                # analytic MXU bound: a transformer forward is ~2 FLOPs
                # per param per token; v5e bf16 peak ~197 TFLOP/s
                enc_bound_ms = (
                    2.0 * n_params * batch * seq_len / 197e12 * 1e3
                )
                @jax.jit
                def enc_scan(params, seed0):
                    def one(carry, seed):
                        key = jax.random.fold_in(jax.random.key(3), seed)
                        ids = jax.random.randint(
                            key, (batch, seq_len), 1, 30000
                        )
                        mask = jnp.ones((batch, seq_len), jnp.int32)
                        e = model.apply({"params": params}, ids, mask)
                        return carry + jnp.sum(e[:, 0]), None

                    acc, _ = jax.lax.scan(
                        one, jnp.zeros(()), seed0 + jnp.arange(n_enc)
                    )
                    return acc

                t0 = time.time()
                _ = float(np.asarray(enc_scan(params, jnp.int32(0))))
                comp = time.time() - t0

                def once(seed):
                    t0 = time.time()
                    _ = float(
                        np.asarray(enc_scan(params, jnp.int32(100 * seed)))
                    )
                    return (time.time() - t0) / n_enc * 1e3

                v = measure_validated(
                    once, label, enc_bound_ms, history,
                    f"{backend}:{label}", repeats=repeats,
                )
                validation[label] = v.record()
                print(
                    f"{label}: {v.best:.3f} ms/forward (compile {comp:.0f}s)",
                    file=sys.stderr,
                )
                return v.best

            enc_b64_ms = enc_measure(
                B, f"trained-encoder forward batch-64 (len-{Q_LEN})"
            )
            enc_b1_ms = enc_measure(
                1, f"trained-encoder forward batch-1 (len-{Q_LEN})"
            )
            # dp-split shapes: ShardedQueryEncoder (parallel/sharding.py)
            # splits the batch over the index mesh, so an 8-shard group
            # encodes B/8 per chip and a 2-shard group B/2
            enc_b8_ms = enc_measure(
                max(1, B // 8),
                f"trained-encoder forward batch-8 (dp/8, len-{Q_LEN})",
            )
            enc_b32_ms = enc_measure(
                max(1, B // 2),
                f"trained-encoder forward batch-32 (dp/2, len-{Q_LEN})",
            )
            # the pre-bucketing cost for comparison (chunk-length texts
            # still pay this shape at BUILD time)
            enc_b64_len128_ms = enc_measure(
                B, "trained-encoder forward batch-64 (len-128)", seq_len=128
            )
        except Exception as exc:
            print(f"trained-encoder bench unavailable: {exc}", file=sys.stderr)

    save_history(history)

    baseline_qps = 1.0 / 30.0  # reference: "<30 s for typical queries"
    extras_scan = {}
    if scan_ms is not None:
        extras_scan["device_scan_ms_per_batch64"] = round(scan_ms, 3)
        extras_scan["device_scan_qps"] = round(B / scan_ms * 1e3, 1)
    if shard_b64_ms is not None:
        # v5e-8 projection: whole-corpus batch latency ~= per-shard time +
        # ICI merge (analytic, README "projection formula"); throughput ~=
        # B / that total
        m8_b64 = ici_merge_ms(B, min(1000, k_ret), 8)
        extras_scan["v5e8_per_shard_ms_b64"] = round(shard_b64_ms, 3)
        extras_scan["v5e8_ici_merge_ms_b64"] = round(m8_b64, 4)
        extras_scan["v5e8_projected_qps"] = round(
            B / (shard_b64_ms + m8_b64) * 1e3, 1
        )
    if shard_b1_ms is not None:
        m8_b1 = ici_merge_ms(1, min(1000, k_ret), 8)
        extras_scan["v5e8_per_shard_ms_b1"] = round(shard_b1_ms, 3)
        extras_scan["v5e8_projected_p50_ms"] = round(shard_b1_ms + m8_b1, 3)
    if half_b1_ms is not None and half_b64_ms is not None:
        # 2-shard x 4-replica v5e-8: p50 and throughput targets together
        m2_b1 = ici_merge_ms(1, min(1000, k_ret), 2)
        m2_b64 = ici_merge_ms(B, min(1000, k_ret), 2)
        extras_scan["v5e8_2x4_p50_ms"] = round(half_b1_ms + m2_b1, 3)
        extras_scan["v5e8_2x4_ici_merge_ms_b64"] = round(m2_b64, 4)
        extras_scan["v5e8_2x4_qps"] = round(
            4 * B / (half_b64_ms + m2_b64) * 1e3, 1
        )
    if enc_b64_ms is not None:
        # promoted serving config (trained flagship encoder): multi-chip
        # projections model the IMPLEMENTED data-parallel encode
        # (parallel/sharding.ShardedQueryEncoder — each chip in an n-shard
        # group forwards B/n queries, then all_gathers the (B, dim)
        # embeddings over ICI), so the per-batch encoder term is
        # fwd(B/n) + allgather, not fwd(B).  The single-chip scan keeps
        # the full forward.  Batch-1 (p50) paths can't split a single
        # sequence — they keep fwd(1) + the embedding broadcast.
        def enc_ag_ms(nb: int, n: int) -> float:
            if n <= 1:
                return 0.0
            total = nb * dim * 4
            t = total * (n - 1) / n / (2 * V5E["ici_Bps_link"])
            t += (n - 1) * 1e-6
            t += total / V5E["hbm_Bps"]
            return t * 1e3

        extras_scan["encoder_fwd_ms_b64"] = round(enc_b64_ms, 3)
        extras_scan["encoder_fwd_ms_b1"] = round(enc_b1_ms, 3)
        if enc_b64_len128_ms is not None:
            extras_scan["encoder_fwd_ms_b64_len128"] = round(
                enc_b64_len128_ms, 3
            )
        if enc_b8_ms is not None:
            extras_scan["encoder_fwd_ms_b8"] = round(enc_b8_ms, 3)
        if enc_b32_ms is not None:
            extras_scan["encoder_fwd_ms_b32"] = round(enc_b32_ms, 3)
        if scan_ms is not None:
            t = scan_ms + enc_b64_ms
            extras_scan["device_scan_ms_per_batch64_trained"] = round(t, 3)
            extras_scan["device_scan_qps_trained"] = round(B / t * 1e3, 1)
        if shard_b64_ms is not None and enc_b8_ms is not None:
            t = (
                shard_b64_ms
                + ici_merge_ms(B, min(1000, k_ret), 8)
                + enc_b8_ms
                + enc_ag_ms(B, 8)
            )
            extras_scan["v5e8_projected_qps_trained"] = round(
                B / t * 1e3, 1
            )
        if shard_b1_ms is not None:
            extras_scan["v5e8_projected_p50_ms_trained"] = round(
                shard_b1_ms + ici_merge_ms(1, min(1000, k_ret), 8)
                + enc_b1_ms + enc_ag_ms(1, 8), 3,
            )
        if half_b1_ms is not None and half_b64_ms is not None:
            extras_scan["v5e8_2x4_p50_ms_trained"] = round(
                half_b1_ms + m2_b1 + enc_b1_ms + enc_ag_ms(1, 2), 3
            )
            enc2 = (
                enc_b32_ms if enc_b32_ms is not None else enc_b64_ms
            )
            extras_scan["v5e8_2x4_qps_trained"] = round(
                4 * B / (half_b64_ms + m2_b64 + enc2 + enc_ag_ms(B, 2))
                * 1e3, 1,
            )

    # headline: device-only scan throughput at b64 (the production number —
    # serving does not run through a dev tunnel); falls back to the
    # tunnel-inclusive loop if the scan path was unavailable.
    headline = (
        B / scan_ms * 1e3 if scan_ms is not None else qps
    )
    print(
        json.dumps(
            {
                "metric": "hybrid_qps",
                "value": round(headline, 1),
                "unit": "queries/sec",
                "vs_baseline": round(headline / baseline_qps, 1),
                "extras": {
                    **extras_scan,
                    "tunnel_inclusive_qps": round(qps, 1),
                    "p50_ms_batch1": round(p50, 2),
                    # device-input numbers: device-resident query batches,
                    # pipelined dispatch, single end sync — excludes
                    # per-batch host->device transfer and per-batch RTT
                    "device_ms_per_batch64": round(dev_ms_b64, 3),
                    "device_qps": round(dev_qps, 1),
                    "device_ms_batch1": round(dev_ms_b1, 3),
                    "n_docs": n_docs,
                    "batch": B,
                    "k_ret": k_ret,
                    "build_docs_per_s": round(build_rate, 1),
                    "approx_candidates": approx,
                    **approx_quality,
                    "validation": validation,
                    "roofline": {
                        k: round(v, 4) if isinstance(v, float) else v
                        for k, v in (roof or {}).items()
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
