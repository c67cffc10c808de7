"""Hermetic CLI tests for tools/targeted_probe.py — the guard paths that
must fail fast WITHOUT starting a SparkSession (an unknown query name
burning a 20 s session spin-up before erroring would make the probe
annoying exactly when it is needed: mid-incident, on a stormy host)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "targeted_probe.py")


def test_unknown_query_fails_fast_without_spark():
    proc = subprocess.run(
        [sys.executable, TOOL, "no_such_query"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "no_such_query" in proc.stderr
    # the guard runs before get_spark(): no JVM banner, no Spark log lines
    assert "SparkSession" not in proc.stderr.replace("no_such_query", "")
    assert "Spark" not in proc.stdout


def test_no_queries_is_a_usage_error():
    proc = subprocess.run(
        [sys.executable, TOOL],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2  # argparse usage error
    assert "usage" in proc.stderr.lower()


def test_zero_trials_is_a_usage_error():
    """ADVICE r15: --trials 0 used to skip the timing loop and crash on
    an unbound `n` in the report f-string (after a full Spark spin-up and
    warm pass).  It must be an argparse usage error, pre-Spark."""
    proc = subprocess.run(
        [sys.executable, TOOL, "--trials", "0", "dedup_lines"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2
    assert "--trials must be >= 1" in proc.stderr
    assert "Spark" not in proc.stdout
