"""Readiness gate: `python -m benchmarks.setup --check` must dry-run
green on a machine with no habitat/scenes/weights (VERDICT r4 item 8 --
the command the first habitat-equipped machine runs unattended;
reference run path objnav_benchmark.py:1233-1327)."""

import os
import subprocess
import sys


def test_readiness_check_green_offline():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "benchmarks.setup", "--check"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "READY" in proc.stdout
    assert "mocked episode end-to-end" in proc.stdout
