"""The real-text end-to-end pipeline (tools/real_run.py) as a CI check:
site render -> real crawl over sockets -> merge -> build -> HTTP serve ->
batch eval -> oracle comparison, at small scale on CPU.  The full-scale
TPU record lives in docs/REAL_RUN.md."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


class TestRealPipeline:
    def test_end_to_end_small(self, tmp_path):
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["PYTHONPATH"] = str(REPO)
        env["MSETPU_FORCE_CPU"] = "1"
        report = tmp_path / "REAL_RUN.md"
        record = tmp_path / "record.json"
        out = subprocess.run(
            [
                sys.executable, str(REPO / "tools" / "real_run.py"),
                "--workdir", str(tmp_path / "work"),
                "--max-docs", "150", "--dim", "64",
                "--report", str(report), "--record", str(record),
            ],
            capture_output=True, text=True, timeout=540, env=env,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        rec = json.loads(record.read_text())
        # the crawl stored real pages and respected robots
        assert rec["crawl"]["pages_stored"] > 50
        assert rec["crawl"]["robots_disallowed_fetched"] == 0
        # the index was built from them
        assert rec["build"]["n_docs"] == rec["merge"]["kept"]
        # the HTTP batch endpoint produced the course-format results
        assert rec["serve"]["total_queries"] == 15
        assert rec["serve"]["total_results"] > 0
        # engine vs the numpy oracle on real text
        assert rec["eval"]["engine_vs_oracle_recall@10"] >= 0.8
        assert report.exists()

    def test_section_granularity_full_reachability(self, tmp_path):
        """Section granularity (one page per documented API object — the
        layout of the 100k+-doc scale run, docs/REAL_RUN_100K.md): the
        paginated /archive index must keep EVERY public page within the
        crawler's depth limit, and a rerun with --reuse-store must skip
        the crawl and still produce a full report."""
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["PYTHONPATH"] = str(REPO)
        env["MSETPU_FORCE_CPU"] = "1"
        report = tmp_path / "REAL_RUN.md"
        record = tmp_path / "record.json"
        argv = [
            sys.executable, str(REPO / "tools" / "real_run.py"),
            "--workdir", str(tmp_path / "work"),
            "--max-docs", "400", "--dim", "64",
            "--granularity", "section", "--hosts", "4",
            "--report", str(report), "--record", str(record),
        ]
        out = subprocess.run(
            argv, capture_output=True, text=True, timeout=540, env=env
        )
        assert out.returncode == 0, out.stderr[-3000:]
        rec = json.loads(record.read_text())
        assert rec["site"]["granularity"] == "section"
        assert rec["site"]["n_archive_pages"] >= 2
        # full reachability: every public content page + archive pages +
        # the root index were stored; nothing disallowed was fetched
        expect = (
            rec["site"]["n_pages"] - rec["site"]["n_private_pages"]
            + rec["site"]["n_archive_pages"] + 1
        )
        assert rec["crawl"]["pages_stored"] == expect
        assert rec["crawl"]["robots_disallowed_fetched"] == 0
        assert rec["eval"]["engine_vs_oracle_recall@10"] >= 0.8

        out2 = subprocess.run(
            argv + ["--reuse-store"],
            capture_output=True, text=True, timeout=540, env=env,
        )
        assert out2.returncode == 0, out2.stderr[-3000:]
        rec2 = json.loads(record.read_text())
        assert rec2["reused_store"]
        assert rec2["crawl"] == rec["crawl"]  # stats carried, not re-run
        assert rec2["build"]["n_docs"] == rec["build"]["n_docs"]
        assert report.exists()

    def test_encoder_rerun_reports_overlap(self, tmp_path):
        """--reuse-store --encoder rerun: embeds the same crawl with a
        trained checkpoint, labels the previous run's encoder kind from
        results_meta.json, and reports Jaccard ranking overlap over the
        common queries (the full-scale records: REAL_RUN_TRAINED.md)."""
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["PYTHONPATH"] = str(REPO)
        env["MSETPU_FORCE_CPU"] = "1"
        report = tmp_path / "REAL_RUN.md"
        record = tmp_path / "record.json"
        argv = [
            sys.executable, str(REPO / "tools" / "real_run.py"),
            "--workdir", str(tmp_path / "work"),
            "--max-docs", "120", "--dim", "64",
            "--report", str(report), "--record", str(record),
        ]
        out = subprocess.run(
            argv, capture_output=True, text=True, timeout=540, env=env
        )
        assert out.returncode == 0, out.stderr[-3000:]
        meta = json.loads(
            (tmp_path / "work" / "results_meta.json").read_text()
        )
        assert meta["encoder"]["kind"] == "hashing"

        out2 = subprocess.run(
            argv + ["--reuse-store",
                    "--encoder", str(REPO / "runs" / "encoder-demo")],
            capture_output=True, text=True, timeout=540, env=env,
        )
        assert out2.returncode == 0, out2.stderr[-3000:]
        rec2 = json.loads(record.read_text())
        assert rec2["encoder"]["kind"] == "jax_biencoder"
        ob = rec2["encoder_vs_baseline"]
        assert ob["baseline"].endswith("(encoder: hashing)")
        # tiny corpora can drop a no-hit query from one run's results
        assert ob["queries_compared"] >= 10
        assert 0.0 <= ob["overlap@10"] <= 1.0
        assert "ranking overlap" in report.read_text()
        meta2 = json.loads(
            (tmp_path / "work" / "results_meta.json").read_text()
        )
        assert meta2["encoder"]["kind"] == "jax_biencoder"
