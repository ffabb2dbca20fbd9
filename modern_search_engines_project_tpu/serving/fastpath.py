"""Native fast-path serving: the C++ HTTP data plane wired to a SearchEngine.

The aiohttp app (serving/api.py) is the full-featured control plane (16
routes, batch eval, reload, profiling, UI).  This module runs the C++
epoll server (native/http_server.cpp) for the hot path — POST /api/search
and GET /api/health — with the ranking delivered either by

  * the real engine (``attach_engine``): the C++ batcher coalesces
    concurrent requests and calls ``engine.search_batch_indices`` once per
    batch through a ctypes trampoline (one jitted device dispatch per
    batch, like serving/batcher.py), or
  * a canned stub (``attach_stub``): host-path ceiling measurement with
    the device out of the loop (eval/load_test.py --native).

Response bodies match serving/api.py's /api/search schema: per-result
url/title/snippet/domain/doc_id come from pre-escaped JSON fragments built
once per index load — one fragment per chunk, so each result's snippet is
its query-specific most-relevant window (reference most_relevant_window
semantics, reranker_api.py:370-412).

Run both planes side by side:
    python -m modern_search_engines_project_tpu.serving --port 5000 \\
        --fastpath-port 5001
"""

from __future__ import annotations

import json
import logging
from typing import Optional

from modern_search_engines_project_tpu.native.native_http import (
    FastHttpServer,
)
from modern_search_engines_project_tpu.serving.api import extract_domain_topic

log = logging.getLogger("serving.fastpath")


def build_fragments(art) -> list:
    """Per-chunk pre-escaped inner-JSON fragments for the C++ doc table.

    fragment[w] covers the chunk at global window index w:
      "url": ..., "title": ..., "snippet": <window text, 200 chars>,
      "domain": ..., "doc_id": ...
    (the same static fields serving/api.py caches per (doc, window))."""
    frags = []
    chunk_doc = art.chunk_doc
    for w, text in enumerate(art.window_texts):
        d = int(chunk_doc[w])
        url = art.urls[d]
        snippet = (text[:200] + "...") if len(text) > 200 else text
        inner = json.dumps(
            {
                "url": url,
                "title": art.titles[d] or "No Title",
                "snippet": snippet or "No content available",
                "domain": extract_domain_topic(url),
                "doc_id": str(art.doc_ids[d]),
            },
            ensure_ascii=False,
        )[1:-1]
        frags.append(inner.encode("utf-8"))
    return frags


def make_server(
    port: int,
    *,
    n_threads: int = 1,
    max_batch: int = 64,
    batch_window_us: int = 200,
    default_top_k: int = 100,
    pipeline: int = 1,
) -> FastHttpServer:
    return FastHttpServer(
        port,
        n_threads=n_threads,
        max_batch=max_batch,
        batch_window_us=batch_window_us,
        default_top_k=default_top_k,
        pipeline=pipeline,
    )


def attach_engine(server: FastHttpServer, engine) -> None:
    """Wire the real ranking path: fragments from the engine's artifacts +
    a batch rank callback (runs on the C++ dispatcher thread; ctypes takes
    the GIL for the Python half, and the single dispatcher serializes
    device dispatch like the aiohttp app's one-worker executor)."""
    server.load_fragments(build_fragments(engine.art))

    def rank(queries, top_k):
        return engine.search_batch_indices(queries, top_k=top_k)

    server.set_rank_fn(rank)


def attach_stub(
    server: FastHttpServer, n_chunks: int, k: int = 100
) -> None:
    """Canned ranking (host-ceiling load tests): top-k = the first k
    chunks with descending scores."""
    k = min(k, n_chunks)
    server.set_stub(
        list(range(k)), [1.0 - i / (k + 1) for i in range(k)]
    )


def serve_fastpath(
    engine,
    port: int,
    *,
    n_threads: int = 1,
    max_batch: Optional[int] = None,
    pipeline: int = 2,
) -> FastHttpServer:
    """Start (and return) the native data plane for ``engine``.

    ``pipeline`` dispatcher threads keep that many device batches in
    flight (see FastHttpServer); 2 hides one full device round trip."""
    srv = make_server(
        port,
        n_threads=n_threads,
        max_batch=max_batch
        or getattr(engine.cfg, "query_batch_size", 64),
        default_top_k=engine.cfg.top_k_reranking,
        pipeline=pipeline,
    )
    attach_engine(srv, engine)
    srv.start()
    log.info("native fast path serving on 127.0.0.1:%d", port)
    return srv
