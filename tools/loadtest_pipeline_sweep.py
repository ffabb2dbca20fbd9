"""Real-TPU load test of the pipelined native dispatch (VERDICT r4 #8).

Round 4 proved the N-deep dispatcher overlap with sleep-stubs only
(native/http_server.cpp msetpu_http_set_pipeline; test: 6 sleep-120ms
batches < 2.5 rounds at depth 3).  This runs the REAL device path
(`--native engine`) at pipeline depths 1/2/4 on the attached chip and
records q/s + latency per depth, so the overlap claim has a measured
number behind it.  On a tunnel-attached dev box the absolute q/s is
tunnel-RTT-bound (~170 ms/dispatch, README); the depth RATIO is the
signal — each extra in-flight dispatch hides one RTT.

Usage: python tools/loadtest_pipeline_sweep.py [--docs 20000]
       [--requests 2048] [--concurrency 128] [--depths 1,2,4]
Writes docs/loadtest_pipeline_sweep.json.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from modern_search_engines_project_tpu.eval import load_test  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--requests", type=int, default=2048)
    ap.add_argument("--concurrency", type=int, default=128)
    ap.add_argument("--depths", default="1,2,4")
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument("--port", type=int, default=5199)
    args = ap.parse_args()

    rows = []
    for i, depth in enumerate(int(d) for d in args.depths.split(",")):
        ns = argparse.Namespace(
            docs=args.docs,
            requests=args.requests,
            concurrency=args.concurrency,
            native="engine",
            port=args.port + i,  # fresh port per run (TIME_WAIT)
            top_k=args.top_k,
            server_threads=1,
            pipeline=depth,
        )
        out = load_test.run_native(ns)
        row = {
            "pipeline": depth,
            "qps": out["client"].get("qps"),
            "p50_ms": out["client"].get("p50_ms"),
            "p95_ms": out["client"].get("p95_ms"),
            "errors": out["client"].get("errors"),
            "server": out["server"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    rec = {
        "docs": args.docs,
        "requests": args.requests,
        "concurrency": args.concurrency,
        "rows": rows,
    }
    path = REPO / "docs" / "loadtest_pipeline_sweep.json"
    path.write_text(json.dumps(rec, indent=1))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
