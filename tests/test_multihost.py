"""Multi-host (multi-process) sharded serving: two real OS processes form
one global jax.distributed mesh (4 virtual CPU devices each); cross-process
collectives ride gloo — the CPU stand-in for DCN (SURVEY §5.8: ICI within
a slice, DCN across hosts).  Asserts every process computes the identical
global ranking, and that it matches an unsharded single-process oracle."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


class TestMultihost:
    def test_two_process_mesh_matches_single_process_oracle(self):
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["PYTHONPATH"] = str(REPO)
        env["JAX_PLATFORMS"] = "cpu"
        procs = [
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "modern_search_engines_project_tpu.parallel.multihost",
                    "--coordinator",
                    "localhost:29531",
                    "--num-processes",
                    "2",
                    "--process-id",
                    str(pid),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                env=env,
                text=True,
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=420)
            assert p.returncode == 0, err[-3000:]
            outs.append(json.loads(out.strip().splitlines()[-1]))

        assert outs[0]["process_count"] == 2
        assert outs[0]["global_devices"] == 8
        assert outs[0]["local_devices"] == 4
        # the ranking is a GLOBAL result: identical on every process
        assert outs[0]["results"] == outs[1]["results"]

        # unsharded oracle over the same deterministic corpus
        from modern_search_engines_project_tpu.config import Config
        from modern_search_engines_project_tpu.index import IndexBuilder
        from modern_search_engines_project_tpu.models import HashingEncoder
        from modern_search_engines_project_tpu.parallel.multihost import (
            QUERIES,
            demo_corpus,
        )
        from modern_search_engines_project_tpu.retrieval import SearchEngine

        cfg = Config(
            embedding_dim=32,
            window_size=32,
            step_size=25,
            top_k_retrieval=32,
            top_k_reranking=8,
            max_query_terms=8,
        )
        enc = HashingEncoder(dim=32)
        art = IndexBuilder(enc, cfg).build(demo_corpus(64))
        single = SearchEngine(art, enc, cfg)
        for ranked, got in zip(
            single.search_batch(QUERIES, top_k=5), outs[0]["results"]
        ):
            want = [[d.doc_id, round(d.similarity_score, 4)] for d in ranked]
            w_scores = np.array([s for _, s in want])
            g_scores = np.array([s for _, s in got])
            assert np.allclose(w_scores, g_scores, atol=2e-4)
            # doc ids must agree except across score-ties
            for (wd, ws), (gd, gs) in zip(want, got):
                assert wd == gd or abs(ws - gs) < 2e-4
