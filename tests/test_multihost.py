"""Multi-host (multi-process) sharded serving: N real OS processes form
one global jax.distributed mesh (K virtual CPU devices each); cross-process
collectives ride gloo — the CPU stand-in for DCN (SURVEY §5.8: ICI within
a slice, DCN across hosts).  Asserts every process computes the identical
global ranking, and that it matches an unsharded single-process oracle.

Parametrized over process counts (VERDICT r3 #8: the round-3 demo only
ever ran 2 processes): 2x4, 4x2 and 8x1 all exercise the same SPMD
program over an 8-device global mesh with progressively more of the
collective path crossing process boundaries.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _run_cluster(n_proc, devs_per_proc, port, hierarchical=False):
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
                f"localhost:{port}",
                "--num-processes",
                str(n_proc),
                "--process-id",
                str(pid),
                "--devices-per-process",
                str(devs_per_proc),
            ]
            + (["--hierarchical"] if hierarchical else []),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(n_proc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def _oracle_results():
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
    return [
        [[d.doc_id, round(d.similarity_score, 4)] for d in ranked]
        for ranked in single.search_batch(QUERIES, top_k=5)
    ]


class TestMultihost:
    @pytest.mark.parametrize(
        "n_proc,devs,port",
        [(2, 4, 29531), (4, 2, 29532), (8, 1, 29533)],
        ids=["2x4", "4x2", "8x1"],
    )
    def test_process_mesh_matches_single_process_oracle(
        self, n_proc, devs, port
    ):
        outs = _run_cluster(n_proc, devs, port)

        assert outs[0]["process_count"] == n_proc
        assert outs[0]["global_devices"] == n_proc * devs
        assert outs[0]["local_devices"] == devs
        assert outs[0]["rank_ms_per_batch"] > 0
        # the ranking is a GLOBAL result: identical on every process
        for o in outs[1:]:
            assert o["results"] == outs[0]["results"]

        # unsharded oracle over the same deterministic corpus
        for want, got in zip(_oracle_results(), outs[0]["results"]):
            w_scores = np.array([s for _, s in want])
            g_scores = np.array([s for _, s in got])
            assert np.allclose(w_scores, g_scores, atol=2e-4)
            # doc ids must agree except across score-ties
            for (wd, ws), (gd, gs) in zip(want, got):
                assert wd == gd or abs(ws - gs) < 2e-4

    @pytest.mark.parametrize(
        "n_proc,devs,port",
        [(2, 4, 29534), (4, 2, 29535)],
        ids=["2x4", "4x2"],
    )
    def test_hierarchical_merge_matches_oracle(self, n_proc, devs, port):
        """VERDICT r4 #9: the 2-level ("host", "shard") mesh — intra-host
        merge over ICI, one reduced cross-host exchange over DCN — must
        produce the identical global ranking."""
        outs = _run_cluster(n_proc, devs, port, hierarchical=True)
        assert outs[0]["hierarchical"] is True
        for o in outs[1:]:
            assert o["results"] == outs[0]["results"]
        for want, got in zip(_oracle_results(), outs[0]["results"]):
            w_scores = np.array([s for _, s in want])
            g_scores = np.array([s for _, s in got])
            assert np.allclose(w_scores, g_scores, atol=2e-4)
            for (wd, ws), (gd, gs) in zip(want, got):
                assert wd == gd or abs(ws - gs) < 2e-4
