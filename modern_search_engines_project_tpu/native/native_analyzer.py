"""ctypes bridge to the C++ analyzer (native/analyzer.cpp).

Builds ``libmse_analyzer.so`` with g++ on first use (cached beside the
source; rebuilt when the source is newer).  ``load()`` returns a
NativeAnalyzer or raises — callers (text/analyzer.py) fall back to the pure
Python pipeline, which is the behavioral specification.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "analyzer.cpp")
_SO = os.path.join(_DIR, "libmse_analyzer.so")
_lock = threading.Lock()
_cached: Optional["NativeAnalyzer"] = None
_failed = False


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


class NativeAnalyzer:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.msetpu_analyze.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.msetpu_analyze.restype = ctypes.c_void_p
        lib.msetpu_free.argtypes = [ctypes.c_void_p]
        lib.msetpu_free.restype = None
        lib.msetpu_hash_tokenize.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_longlong,
        ]
        lib.msetpu_hash_tokenize.restype = ctypes.POINTER(ctypes.c_longlong)
        try:  # older .so without the counts symbol: degrade gracefully
            lib.msetpu_analyze_counts.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib.msetpu_analyze_counts.restype = ctypes.c_void_p
            self.has_counts = True
        except AttributeError:
            self.has_counts = False

    def analyze(self, text: str) -> List[str]:
        data = text.encode("utf-8")
        ptr = self._lib.msetpu_analyze(data, len(data))
        if not ptr:
            return []
        try:
            raw = ctypes.cast(ptr, ctypes.c_char_p).value or b""
        finally:
            self._lib.msetpu_free(ptr)
        out = raw.decode("utf-8")
        return out.split("\n")[:-1] if out else []

    def analyze_counts(self, text: str) -> dict:
        """term -> count aggregated in C ("term\\tcount" lines): the BM25
        build only needs counts, and ~100 distinct pairs ship across the
        boundary instead of every token occurrence."""
        data = text.encode("utf-8")
        ptr = self._lib.msetpu_analyze_counts(data, len(data))
        if not ptr:
            return {}
        try:
            raw = ctypes.cast(ptr, ctypes.c_char_p).value or b""
        finally:
            self._lib.msetpu_free(ptr)
        out = {}
        for line in raw.decode("utf-8").splitlines():
            term, _, cnt = line.rpartition("\t")
            out[term] = int(cnt)
        return out

    def hash_tokenize(self, text: str, vocab_size: int):
        """(ids, offsets[(start_cp, end_cp)]) — encoder tokenization fast
        path (text/hash_tokenizer.py is the behavioral spec).  Returns numpy
        arrays (ids [n] int64, offsets [n, 2] int64) — zero-copy view of the
        C buffer, copied out before free."""
        import numpy as np

        data = text.encode("utf-8")
        ptr = self._lib.msetpu_hash_tokenize(data, len(data), vocab_size)
        try:
            n = int(ptr[0])
            flat = np.ctypeslib.as_array(ptr, shape=(1 + 3 * n,))
            rows = flat[1:].reshape(n, 3).copy()
        finally:
            self._lib.msetpu_free(ptr)
        return rows[:, 0], rows[:, 1:]


def load() -> NativeAnalyzer:
    global _cached, _failed
    with _lock:
        if _cached is not None:
            return _cached
        if _failed:
            raise RuntimeError("native analyzer build previously failed")
        try:
            if not os.path.exists(_SO) or os.path.getmtime(
                _SO
            ) < os.path.getmtime(_SRC):
                _build()
            _cached = NativeAnalyzer(ctypes.CDLL(_SO))
            return _cached
        except Exception:
            _failed = True
            raise
