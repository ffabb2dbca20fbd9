"""The golden-trace generator must reproduce the frozen fixture literals
(VERDICT r2 #7: the generator now lives in-repo and is auditable)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


class TestTraceGenerator:
    def test_regenerates_frozen_golden(self):
        out = subprocess.run(
            [sys.executable, str(REPO / "tools" / "trace_reference.py"),
             "--check"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        assert "OK — regeneration reproduces the frozen literals" in out.stdout

    def test_generator_is_package_independent(self):
        """The trace must not import the package it cross-checks."""
        src = (REPO / "tools" / "trace_reference.py").read_text()
        head = src.split('if "--check"')[0]
        assert "import modern_search_engines_project_tpu" not in head
        assert "from modern_search_engines_project_tpu" not in head
