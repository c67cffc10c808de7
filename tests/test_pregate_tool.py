"""Hermetic tests for tools/pregate_window.py — the guard paths that must
fail fast WITHOUT starting a SparkSession, plus the upfront oracle check
(ADVICE r19 item 1: a window name with a query but no oracle must be the
same ERROR/exit-2 shape as a bad window name, not a mid-run KeyError
counted as a row FAIL)."""

from __future__ import annotations

import os
import subprocess
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "pregate_window.py")


def test_unknown_window_fails_fast_without_spark():
    proc = subprocess.run(
        [sys.executable, TOOL, "_NO_SUCH_WINDOW"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2
    assert "_NO_SUCH_WINDOW" in proc.stderr
    assert "ERROR" in proc.stderr
    # the guard runs before get_spark(): no Spark log lines on stdout
    assert "Spark" not in proc.stdout


def test_no_window_is_a_usage_error():
    proc = subprocess.run(
        [sys.executable, TOOL],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2  # argparse usage error
    assert "usage" in proc.stderr.lower()


def test_query_without_oracle_is_upfront_error(monkeypatch, capsys):
    """ADVICE r19 item 1, exercised in-process with a fake entry module
    (unreachable via the real entry because test_oracle_parity pins
    queries() == oracle_sql(), but the tool is meant to be standalone)."""
    fake = types.ModuleType("__spark_entry__")
    fake._FAKE_WINDOW = ["has_query_no_oracle"]
    fake.queries = lambda: {"has_query_no_oracle": lambda spark, sf: None}
    fake.oracle_sql = lambda: {}
    monkeypatch.setitem(sys.modules, "__spark_entry__", fake)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import pregate_window
    finally:
        sys.path.pop(0)
    rc = pregate_window.main(["_FAKE_WINDOW"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "not in oracle_sql()" in err
    assert "has_query_no_oracle" in err
