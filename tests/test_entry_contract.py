"""Driver-contract invariants for __spark_entry__: every query has an oracle
twin, keys match exactly, and the module imports cleanly (the driver's first
action each round)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_oracle():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q == o, f"drift: queries-only={q - o}, oracles-only={o - q}"


def test_oracles_are_nonempty_sql():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_are_callables():
    for name, fn in entry.queries().items():
        assert callable(fn), name


def test_verification_windows_are_valid_rotations():
    """The driver hashes the FIRST 50 queries() entries each round, so the
    active window must be hoisted to the front, and the prepared next-round
    window must name only real queries (a typo'd name would silently shrink
    the next rotation)."""
    names = list(entry.queries())
    assert names[:50] == entry._R10_WINDOW  # active round's hoist
    for window in (entry._R9_WINDOW, entry._R10_WINDOW, entry._R11_WINDOW):
        assert len(window) == 50 and len(set(window)) == 50
        missing = set(window) - set(names)
        assert not missing, f"window names not in queries(): {missing}"
    # r10 leads with the rows whose serve/setup paths r9's advisor fixes
    # touched, so their hashes postdate those diffs first thing this round
    assert entry._R10_WINDOW[:3] == [
        "sim_ivf_pq_topk", "sim_ivf_pq_recall", "streaming_dedup",
    ]
    # r11 leads with the complete r7 cohort (the oldest post-r10 hashes):
    # the recall-diagnostic family + the dedup graph pair, contiguous
    # because they share memoized builds
    assert entry._R11_WINDOW[:10] == [
        "sim_pq_recall", "sim_pq_trained_recall", "sim_pq_opq_recall",
        "sim_lsh_recall", "sim_lsh_multiprobe_recall", "sim_ivf_recall",
        "sim_ivf_trained_recall", "sim_matryoshka_recall", "dedup_groups",
        "dedup_cluster_stats",
    ]


def test_oracle_sql_compiles_in_duckdb():
    """Each oracle must at least parse/bind against empty tables of the
    driver's schemas — catches typos without running Spark."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name, sql in entry.oracle_sql().items():
        con.execute(f"SELECT * FROM ({sql}) LIMIT 0")


def test_staleness_tool_validates_prepared_window():
    """tools/staleness_ledger.py is the mechanical check behind the
    rotation plan: the prepared window must verify against the recorded
    correctness files plus the active (pending) window."""
    import subprocess
    import sys as _sys
    import os as _os

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, _os.path.join(repo, "tools", "staleness_ledger.py"),
         "--pending", "_R10_WINDOW", "--check", "_R11_WINDOW"],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "_R11_WINDOW: OK" in proc.stdout, proc.stdout


def test_staleness_tool_skips_landed_pending_bump():
    """ADVICE r9: once a pending window's own CORRECTNESS file lands (its
    rows all carry the max recorded round), --pending must not bump them
    to a phantom next round — the printed distribution should top out at
    the max recorded round."""
    import glob
    import os as _os
    import re as _re
    import subprocess
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    top = max(
        int(_re.search(r"r0*(\d+)", _os.path.basename(p)).group(1))
        for p in glob.glob(_os.path.join(repo, "CORRECTNESS_r*.json"))
    )
    # _R9_WINDOW's driver run is recorded (CORRECTNESS_r09.json holds its
    # rows), so pending it must be a no-op on the distribution
    proc = subprocess.run(
        [_sys.executable, _os.path.join(repo, "tools", "staleness_ledger.py"),
         "--pending", "_R9_WINDOW"],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rounds = [int(m) for m in _re.findall(r"^  r(\d+): ", proc.stdout, _re.M)]
    assert rounds and max(rounds) <= top, proc.stdout


def test_staleness_tool_empty_correctness_clean_error(tmp_path):
    """ADVICE r9: with no CORRECTNESS_r*.json present the tool must exit
    with a clear message, not a ValueError traceback."""
    import os as _os
    import shutil
    import subprocess
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    (tmp_path / "tools").mkdir()
    shutil.copy(
        _os.path.join(repo, "tools", "staleness_ledger.py"),
        tmp_path / "tools" / "staleness_ledger.py",
    )
    (tmp_path / "__spark_entry__.py").write_text(
        '_R1_WINDOW = [\n    "a",\n]\n'
    )
    proc = subprocess.run(
        [_sys.executable, str(tmp_path / "tools" / "staleness_ledger.py")],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert "no CORRECTNESS" in proc.stdout, proc.stdout + proc.stderr
    assert "Traceback" not in proc.stderr, proc.stderr
