"""Serving CLI booted as a REAL process: flag parsing, demo-index build,
2-D mesh deployment, warmup, and the HTTP surface — the path a deployment
actually runs (`python -m modern_search_engines_project_tpu.serving`)."""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _wait_health(port, proc, timeout=120):
    deadline = time.time() + timeout
    url = f"http://127.0.0.1:{port}/api/health"
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")[-3000:]
            raise AssertionError(f"server exited rc={proc.returncode}: {out}")
        try:
            with urllib.request.urlopen(url, timeout=2) as r:
                return json.loads(r.read())
        except Exception:
            time.sleep(0.5)
    raise AssertionError("server never became healthy")


class TestServingCli:
    def test_mesh_deployment_boot_and_search(self, tmp_path):
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["PYTHONPATH"] = str(REPO)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        port = _free_port()
        proc = subprocess.Popen(
            [
                sys.executable,
                "-m",
                "modern_search_engines_project_tpu.serving",
                "--port",
                str(port),
                "--mesh",
                "2,4",
                "--query-cache",
                "16",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=str(tmp_path),
        )
        try:
            health = _wait_health(port, proc)
            assert health["search_engine_ready"] is True

            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/search",
                data=json.dumps(
                    {"query": "castle neckar", "top_k": 3}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                data = json.loads(r.read())
            assert data["documents"], data
            assert data["documents"][0]["rank"] == 1

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/stats", timeout=30
            ) as r:
                stats = json.loads(r.read())
            assert stats["total_documents"] > 0
        finally:
            proc.terminate()
            proc.wait(timeout=15)


class TestFastpathCli:
    def test_dual_plane_boot(self):
        """--fastpath-port runs the C++ data plane beside the aiohttp
        control plane; both must answer, and the data plane's ranking
        must come from the same engine."""
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["PYTHONPATH"] = str(REPO)
        env["JAX_PLATFORMS"] = "cpu"
        port = _free_port()
        fast_port = _free_port()
        proc = subprocess.Popen(
            [
                sys.executable, "-m",
                "modern_search_engines_project_tpu.serving",
                "--port", str(port),
                "--fastpath-port", str(fast_port),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        try:
            _wait_health(port, proc)
            with urllib.request.urlopen(
                f"http://127.0.0.1:{fast_port}/api/health", timeout=10
            ) as r:
                assert json.loads(r.read())["status"] == "healthy"
            req = urllib.request.Request(
                f"http://127.0.0.1:{fast_port}/api/search",
                data=json.dumps(
                    {"query": "castle neckar", "top_k": 3}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                fast = json.loads(r.read())
            assert fast["documents"] and fast["documents"][0]["rank"] == 1
            # same engine, same ranking through the Python plane
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/search",
                data=json.dumps(
                    {"query": "castle neckar", "top_k": 3}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                slow = json.loads(r.read())
            assert [d["url"] for d in fast["documents"]] == [
                d["url"] for d in slow["documents"]
            ]
        finally:
            proc.terminate()
            proc.wait(timeout=15)
