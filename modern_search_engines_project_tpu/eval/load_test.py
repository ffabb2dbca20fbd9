"""HTTP serving load test: concurrent /api/search over an in-process server.

Measures the end-to-end online-serving throughput the reference never had
(its Flask app handles one request per worker; search_api.py:69-152) —
C concurrent clients fire R total requests at the aiohttp app; the
QueryBatcher coalesces them into device batches.  Reports q/s, latency
percentiles, and coalescing stats.

Usage (synthetic corpus; runs on whatever jax backend is active):

    python -m modern_search_engines_project_tpu.eval.load_test \
        [--docs 20000] [--requests 512] [--concurrency 64] [--summarize]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import time


def build_service(n_docs: int, summarize: bool = True, seed: int = 7):
    import sys
    from pathlib import Path

    # tests/corpus_util.py owns the synthetic-corpus generator
    sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tests"))
    from corpus_util import make_corpus, make_vocab

    from modern_search_engines_project_tpu.config import Config
    from modern_search_engines_project_tpu.index import IndexBuilder
    from modern_search_engines_project_tpu.models import HashingEncoder
    from modern_search_engines_project_tpu.retrieval import SearchEngine
    from modern_search_engines_project_tpu.serving.api import SearchService

    cfg = Config(embedding_dim=64, window_size=32, step_size=28)
    enc = HashingEncoder(dim=cfg.embedding_dim)
    docs = make_corpus(n_docs=n_docs, seed=seed, n_domains=max(16, n_docs // 50))
    art = IndexBuilder(enc, cfg).build(docs)
    engine = SearchEngine(art, enc, cfg)
    service = SearchService(engine)
    if not summarize:
        class _Null:
            def generate_summary(self, q, w):
                return ""

        service.summarizer = _Null()
    return service, make_vocab(400)


def stub_device(engine, queries, latency_ms: float = 0.0) -> None:
    """Replace engine._device_rank with per-batch-shape cached outputs.

    Measures the serving HOST ceiling (batcher + finishing + summarizer +
    JSON) with the device call free — the honest complement to the
    device-only scan numbers in bench.py, since a tunnel-attached TPU adds
    ~40-200 ms of dispatch/transfer per call that a locally attached chip
    does not.
    """
    import numpy as np

    cache = {}
    b = 1
    while b <= 64:
        term_ids, qtf, processed = engine.prepare_queries(queries[:b])
        qvec = engine.encode_queries(processed)
        out = engine._device_rank(term_ids, qtf, qvec)
        cache[b] = tuple(np.asarray(x) for x in out)
        b *= 2

    def ranked(t, q, v):
        if latency_ms > 0.0:  # emulate a locally attached chip's batch time
            time.sleep(latency_ms / 1e3)
        return cache[t.shape[0]]

    engine._device_rank = ranked


async def run_load(
    service, vocab, n_requests: int, concurrency: int
) -> dict:
    from aiohttp.test_utils import TestClient, TestServer

    rng = random.Random(11)
    queries = [
        " ".join(rng.sample(vocab[:120], rng.randint(1, 3)))
        for _ in range(n_requests)
    ]
    client = TestClient(TestServer(service.build_app()))
    await client.start_server()
    try:
        # warm every power-of-two batch shape the batcher can emit so
        # compile time is excluded from the timed section (partial flushes
        # under ramp-up produce intermediate sizes)
        loop = asyncio.get_running_loop()
        b = 1
        while b <= service.batcher.max_batch:
            await loop.run_in_executor(
                None,
                lambda n=b: service.engine.search_batch(queries[:n], top_k=100),
            )
            b *= 2
        await client.post("/api/search", json={"query": queries[0]})
        sem = asyncio.Semaphore(concurrency)
        lat: list = []

        async def one(q):
            async with sem:
                t0 = time.perf_counter()
                resp = await client.post("/api/search", json={"query": q})
                body = await resp.json()
                lat.append(time.perf_counter() - t0)
                assert resp.status == 200, body

        t0 = time.perf_counter()
        await asyncio.gather(*(one(q) for q in queries))
        wall = time.perf_counter() - t0
    finally:
        await client.close()
    lat.sort()
    return {
        "requests": n_requests,
        "concurrency": concurrency,
        "wall_s": round(wall, 3),
        "qps": round(n_requests / wall, 1),
        "p50_ms": round(lat[len(lat) // 2] * 1e3, 2),
        "p95_ms": round(lat[int(len(lat) * 0.95)] * 1e3, 2),
        "batcher": service.batcher.stats(),
        "engine_stages": (
            service.engine.times.report() if service.engine.times else {}
        ),
    }


def run_native(args) -> dict:
    """Load-test the C++ data plane (native/http_server.cpp).

    Modes: ``stub`` ranks inside C++ (pure host-path ceiling), ``pycb``
    ranks via a canned Python callback (adds the ctypes boundary), and
    ``engine`` runs the real device path.  The epoll load generator runs
    in a separate PROCESS so client and server don't share an interpreter.
    """
    import subprocess
    import sys as _sys
    import time as _time

    from modern_search_engines_project_tpu.serving.fastpath import (
        attach_engine,
        attach_stub,
        build_fragments,
        make_server,
    )

    service, vocab = build_service(args.docs, summarize=False)
    engine = service.engine
    srv = make_server(args.port, n_threads=args.server_threads,
                      default_top_k=args.top_k,
                      pipeline=args.pipeline)
    frags = build_fragments(engine.art)
    srv.load_fragments(frags)
    if args.native == "stub":
        attach_stub(srv, len(frags), k=args.top_k)
    elif args.native == "pycb":
        canned = [
            [(i, 1.0 - i / 1000.0) for i in range(args.top_k)]
        ]

        def rank(queries, top_k):
            return canned * len(queries)

        srv.set_rank_fn(rank)
    bodies = None
    if args.native == "engine":
        attach_engine(srv, engine)
        # compile EVERY power-of-two batch bucket up front — ramp-up
        # coalesces intermediate sizes, and a mid-measurement XLA compile
        # (tens of seconds on a cold TPU) would wreck the numbers
        engine.warmup(batch_sizes=(1, 2, 4, 8, 16, 32, 64))
        # varied queries: distinct queries per coalesced batch drive the
        # batcher + U-dedup shapes honestly (a single repeated query
        # makes every device batch degenerate to one distinct term set)
        rng = random.Random(17)
        bodies = [
            json.dumps(
                {
                    "query": " ".join(rng.sample(vocab[:120],
                                                 rng.randint(1, 3))),
                    "top_k": args.top_k,
                }
            )
            for _ in range(256)
        ]
        # warm the exact U-dedup buckets THIS query distribution lands in
        # (warmup() covers the extremes; the pool's intermediate
        # distinct-term counts are separate compiles)
        pool = [json.loads(b)["query"] for b in bodies]
        for b in (1, 2, 4, 8, 16, 32, 64):
            engine.search_batch_indices(pool[:b], top_k=args.top_k)
    srv.start()
    _time.sleep(0.2)
    body = json.dumps({"query": "law research tübingen", "top_k": args.top_k})
    code = (
        "import sys, json; sys.path.insert(0, %r); "
        "from modern_search_engines_project_tpu.native.native_http "
        "import client_bench; "
        "print(json.dumps(client_bench(%d, n_conns=%d, total_requests=%d, "
        "body=%r, timeout_s=%d, bodies=%r)))"
        % (
            str(__import__("pathlib").Path(__file__).resolve().parents[2]),
            args.port, args.concurrency, args.requests, body, 300, bodies,
        )
    )
    out = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True
    )
    try:
        client = json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        raise SystemExit(
            f"client bench failed: {out.stdout[-400:]} {out.stderr[-400:]}"
        )
    stats = srv.stats()
    srv.stop()
    return {
        "mode": f"native-{args.native}",
        "docs": args.docs,
        "top_k": args.top_k,
        "pipeline": args.pipeline,
        "client": client,
        "server": stats,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=20000)
    p.add_argument("--requests", type=int, default=512)
    p.add_argument("--concurrency", type=int, default=64)
    p.add_argument("--no-summarize", action="store_true")
    p.add_argument("--native", choices=["stub", "pycb", "engine"],
                   default=None,
                   help="load-test the C++ data plane instead of the "
                        "aiohttp app (see run_native)")
    p.add_argument("--port", type=int, default=5177)
    p.add_argument("--top-k", type=int, default=100)
    p.add_argument("--server-threads", type=int, default=1)
    p.add_argument("--pipeline", type=int, default=1,
                   help="native modes: concurrent dispatcher threads — "
                        "depth D keeps D device batches in flight, hiding "
                        "the device round trip behind the next batch's "
                        "prep+dispatch (VERDICT r3 #6)")
    p.add_argument("--stub-device", action="store_true",
                   help="measure the host-path ceiling: device outputs are "
                        "cached per batch shape and returned instantly")
    p.add_argument("--stub-device-ms", type=float, default=0.0,
                   help="like --stub-device but each device call sleeps "
                        "this long — emulates a LOCALLY attached chip's "
                        "measured batch latency (e.g. 15 for v5e batch-64 "
                        "at 100k docs), so the device/finishing overlap is "
                        "measurable without tunnel RTT noise")
    args = p.parse_args(argv)

    import os

    if os.environ.get("MSETPU_FORCE_CPU"):
        # the dev box force-registers a TPU tunnel platform that ignores
        # JAX_PLATFORMS; only jax.config reliably overrides it
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.native:
        out = run_native(args)
        print(json.dumps(out))
        return out

    service, vocab = build_service(args.docs, summarize=not args.no_summarize)
    if args.stub_device or args.stub_device_ms > 0:
        rng = random.Random(3)
        qs = [" ".join(rng.sample(vocab[:120], 2)) for _ in range(64)]
        stub_device(service.engine, qs, latency_ms=args.stub_device_ms)
    out = asyncio.run(
        run_load(service, vocab, args.requests, args.concurrency)
    )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
