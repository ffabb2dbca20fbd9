"""ctypes bridge to the C++ fast-path HTTP server (native/http_server.cpp).

Builds ``libmse_http.so`` with g++ on first use (cached beside the source;
rebuilt when the source is newer) — same pattern as native_analyzer.py.

``FastHttpServer`` wraps the C ABI: create -> load_fragments ->
(set_stub | set_rank_callback) -> start -> ... -> stop.  The rank callback
crosses into Python holding the GIL (ctypes CFUNCTYPE acquires it), so a
single registered callback serializes device dispatch exactly like the
aiohttp app's single-worker executor — by construction, not by lock.

``client_bench`` is the epoll load generator (run it from a separate
process: on a one-core box the client and server otherwise time-slice one
interpreter... except neither needs the interpreter — both sides release
the GIL, but process isolation keeps the measurement honest).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading
from typing import Callable, List, Optional, Sequence

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "http_server.cpp")
_SO = os.path.join(_DIR, "libmse_http.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False

RANK_CB = ctypes.CFUNCTYPE(
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_char_p),  # queries
    ctypes.c_int,  # n
    ctypes.c_int,  # top_k
    ctypes.POINTER(ctypes.c_int32),  # out_idx [n*top_k]
    ctypes.POINTER(ctypes.c_float),  # out_scores [n*top_k]
    ctypes.POINTER(ctypes.c_int32),  # out_counts [n]
    ctypes.c_void_p,  # user
)


def _build() -> None:
    subprocess.run(
        [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
            "-o", _SO, _SRC,
        ],
        check=True,
        capture_output=True,
    )


def load_lib() -> ctypes.CDLL:
    global _lib, _failed
    with _lock:
        if _lib is not None:
            return _lib
        if _failed:
            raise RuntimeError("native http build previously failed")
        try:
            if not os.path.exists(_SO) or os.path.getmtime(
                _SO
            ) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.msetpu_http_create.argtypes = [ctypes.c_int] * 5
            lib.msetpu_http_create.restype = ctypes.c_void_p
            lib.msetpu_http_set_rank_callback.argtypes = [
                ctypes.c_void_p, RANK_CB, ctypes.c_void_p,
            ]
            lib.msetpu_http_set_pipeline.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
            ]
            lib.msetpu_http_set_stub.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.msetpu_http_load_fragments.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
            ]
            lib.msetpu_http_start.argtypes = [ctypes.c_void_p]
            lib.msetpu_http_start.restype = ctypes.c_int
            lib.msetpu_http_stop.argtypes = [ctypes.c_void_p]
            lib.msetpu_http_destroy.argtypes = [ctypes.c_void_p]
            lib.msetpu_http_stats_json.argtypes = [ctypes.c_void_p]
            lib.msetpu_http_stats_json.restype = ctypes.c_void_p
            lib.msetpu_http_free.argtypes = [ctypes.c_void_p]
            lib.msetpu_http_client_bench.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_long,
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.msetpu_http_client_bench.restype = ctypes.c_void_p
            lib.msetpu_http_client_bench_multi.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_long,
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int,
            ]
            lib.msetpu_http_client_bench_multi.restype = ctypes.c_void_p
            _lib = lib
            return lib
        except Exception:
            _failed = True
            raise


def _take_json(lib, ptr) -> dict:
    if not ptr:
        return {}
    try:
        raw = ctypes.cast(ptr, ctypes.c_char_p).value or b"{}"
    finally:
        lib.msetpu_http_free(ptr)
    return json.loads(raw.decode("utf-8", "replace"))


class FastHttpServer:
    """C++ epoll server for POST /api/search + GET /api/health."""

    def __init__(
        self,
        port: int,
        n_threads: int = 1,
        max_batch: int = 64,
        batch_window_us: int = 200,
        default_top_k: int = 100,
        pipeline: int = 1,
    ):
        """``pipeline`` = concurrent dispatcher threads; >1 keeps that many
        device batches in flight (the rank callback's device wait releases
        the GIL, so the next batch preps/dispatches during the wait —
        VERDICT r3 #6: overlap the device round trip instead of blocking)."""
        self._lib = load_lib()
        self._h = self._lib.msetpu_http_create(
            port, n_threads, max_batch, batch_window_us, default_top_k
        )
        if pipeline and pipeline > 1:
            self._lib.msetpu_http_set_pipeline(self._h, int(pipeline))
        self.port = port
        self._cb_ref = None  # keep the CFUNCTYPE object alive
        self._frag_buf = None

    def load_fragments(self, fragments: Sequence[bytes]) -> None:
        """fragments[chunk_idx] = pre-escaped inner JSON bytes
        (b'\"url\": ..., \"title\": ..., ..., \"doc_id\": \"7\"')."""
        arr = (ctypes.c_char_p * len(fragments))(*fragments)
        self._frag_buf = arr  # C++ copies, but keep until the call returns
        self._lib.msetpu_http_load_fragments(
            self._h, arr, len(fragments)
        )

    def set_stub(self, idx: Sequence[int], scores: Sequence[float]) -> None:
        k = len(idx)
        ia = (ctypes.c_int32 * k)(*idx)
        sa = (ctypes.c_float * k)(*scores)
        self._lib.msetpu_http_set_stub(self._h, ia, sa, k)

    def set_rank_fn(
        self, fn: Callable[[List[str], int], List[List[tuple]]]
    ) -> None:
        """fn(queries, top_k) -> per-query list of (chunk_idx, score)."""

        def cb(qptr, n, top_k, out_idx, out_scores, out_counts, _user):
            try:
                queries = [
                    qptr[i].decode("utf-8", "replace") for i in range(n)
                ]
                results = fn(queries, top_k)
                for i, rows in enumerate(results):
                    c = min(len(rows), top_k)
                    base = i * top_k
                    for j in range(c):
                        ci, sc = rows[j]
                        out_idx[base + j] = int(ci)
                        out_scores[base + j] = float(sc)
                    out_counts[i] = c
                return 0
            except Exception:
                import traceback

                traceback.print_exc()
                return 1

        # keep EVERY installed trampoline alive: set_rank_fn may be called
        # again at runtime (index reload) while a dispatcher batch is still
        # executing the previous callback — freeing it mid-call would be
        # use-after-free.  One closure per reload is a negligible leak.
        ref = RANK_CB(cb)
        self._cb_refs = getattr(self, "_cb_refs", [])
        self._cb_refs.append(ref)
        self._lib.msetpu_http_set_rank_callback(self._h, ref, None)

    def start(self) -> None:
        rc = self._lib.msetpu_http_start(self._h)
        if rc != 0:
            raise OSError(f"msetpu_http_start failed: {rc}")

    def stats(self) -> dict:
        return _take_json(self._lib, self._lib.msetpu_http_stats_json(self._h))

    def stop(self) -> None:
        if self._h:
            self._lib.msetpu_http_destroy(self._h)
            self._h = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


def client_bench(
    port: int,
    n_conns: int = 64,
    total_requests: int = 10000,
    body: Optional[str] = None,
    timeout_s: int = 120,
    bodies: Optional[Sequence[str]] = None,
) -> dict:
    """Epoll load generator against 127.0.0.1:port (GIL released for the
    duration — run in a separate process for honest numbers).

    ``bodies`` rotates requests over a pool of payloads (realistic
    varied-query workloads — distinct queries per device batch drive the
    batcher and U-dedup shapes honestly); ``body`` sends one payload."""
    lib = load_lib()
    if bodies:
        enc = [b.encode("utf-8") for b in bodies]
        arr = (ctypes.c_char_p * len(enc))(*enc)
        ptr = lib.msetpu_http_client_bench_multi(
            port, n_conns, total_requests, arr, len(enc), timeout_s
        )
    else:
        ptr = lib.msetpu_http_client_bench(
            port,
            n_conns,
            total_requests,
            (body or '{"query": "bench query tübingen"}').encode("utf-8"),
            timeout_s,
        )
    return _take_json(lib, ptr)
