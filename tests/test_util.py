"""util.spread: the partition-floor guard for explode-heavy operators."""

from __future__ import annotations

from remote_tsdb_clickhouse_spark.util import _bytes_conf, spread


def test_spread_repartitions_single_file_scan(spark, tmp_path):
    path = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    out = spread(df)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_spread_many_tiny_files_still_repartitions(spark, tmp_path):
    """Spark bin-packs small files into FilePartitions (maxPartitionBytes /
    openCostInBytes), so n_files >= target does NOT imply enough scan
    partitions — 12 tiny files can scan as one.  spread() must fall through
    to the real partition probe, not short-circuit on file count."""
    target = spark.sparkContext.defaultParallelism
    n_files = max(12, target + 4)
    path = str(tmp_path / "tiny")
    spark.range(n_files).repartition(n_files).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= target  # the trap: many files...
    out = spread(df)
    assert out.rdd.getNumPartitions() >= target  # ...still spread correctly


def test_spread_noop_on_already_parallel_frame(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target * 2)
    assert spread(df) is df


def test_bytes_conf_parses_suffixes(spark):
    spark.conf.set("graft.test.bytes.plain", "1048576")
    spark.conf.set("graft.test.bytes.mb", "64m")
    spark.conf.set("graft.test.bytes.suffixed", "128MB")
    spark.conf.set("graft.test.bytes.kb", "4k")
    assert _bytes_conf(spark, "graft.test.bytes.plain", 0) == 1 << 20
    assert _bytes_conf(spark, "graft.test.bytes.mb", 0) == 64 << 20
    assert _bytes_conf(spark, "graft.test.bytes.suffixed", 0) == 128 << 20
    assert _bytes_conf(spark, "graft.test.bytes.kb", 0) == 4 << 10
    assert _bytes_conf(spark, "graft.test.bytes.absent", 42) == 42


def test_bench_calibration_job_pinned(spark):
    """The bench's host-speed calibration job must stay byte-for-byte the
    same workload across rounds (its published time is the cross-round
    host-speed normalizer): run the module's own CALIB_SQL at a reduced
    row count scaled from the same expression and pin the full-size
    constant via the module fields."""
    import bench

    assert bench.CALIB_N == 4_000_000_000
    assert bench.CALIB_EXPECTED == 2_000_015_793_174_243
    # the expression itself is deterministic: check a cheap 1e7-row prefix
    # against a locally computed reference of the same arithmetic
    n = 10_000_000
    got = spark.range(n).selectExpr(bench.CALIB_SQL).collect()[0]["s"]
    want = sum(i % 1000003 * (i % 999983) % 1000003 for i in range(n))
    assert got == want


def test_bench_calibration_mismatch_flagged(spark, capsys):
    """ADVICE r9: a calibration-sum mismatch must surface machine-readably
    (ok=False -> main() nulls host_calib_sec and publishes
    host_calib_ok=false), not just as a stderr warning.  A reduced row
    count computes a sum != the pinned full-size constant, exercising
    exactly the drift path."""
    import bench

    trials, ok = bench.measure_calibration(spark, n=1000)
    assert ok is False
    assert len(trials) == 3 and all(t >= 0 for t in trials)
    assert "not comparable" in capsys.readouterr().err
    # and the published-figure contract: ok=False nulls the headline field
    assert (min(trials) if ok else None) is None


def test_bench_stdout_json_fits_driver_capture_window():
    """The driver tail-captures ~2.2 KB of bench stdout; an 84-entry
    queries map once pushed the JSON's opening brace outside it (r1/r2
    "parsed": null — see the comment above bench.py's BENCH_DETAIL
    split).  Pin the contract: the stdout summary line, assembled exactly
    as main() does but with worst-case field widths — the 10 LONGEST real
    query names from the live entry module, maximal plausible timing
    widths, and the host_calib_trials array added in r13 — must leave
    comfortable headroom under the window."""
    import json

    import __spark_entry__ as entrymod

    names = sorted(entrymod.queries().keys(), key=len, reverse=True)[:10]
    line = json.dumps(
        {
            "metric": "total_query_sec",
            "value": 99999.999,
            "unit": "sec",
            "queries": {n: 9999.999 for n in names},
            "n_queries": 160,
            "sf": 0.001,
            "host_calib_sec": 99.999,
            "host_calib_trials": [99.999, 99.999, 99.999],
            "host_calib_ok": True,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1200, f"bench stdout line {len(line)}B nears the ~2.2KB window"


def test_expr_memo_bounded_fifo_eviction():
    """r21 verdict item 3: the expression memos must not grow without
    bound — the /read server path builds one filter per distinct
    remote-read request, so an uncapped dict is a slow driver-memory
    leak.  ExprMemo evicts oldest-inserted past maxsize."""
    from remote_tsdb_clickhouse_spark.util import ExprMemo

    m = ExprMemo(maxsize=8)
    for i in range(100):
        m.get(("k", i), lambda i=i: f"v{i}")
    assert len(m) == 8
    # oldest evicted, newest retained (a re-get of a retained key is a hit)
    calls = []
    assert m.get(("k", 99), lambda: calls.append(1) or "rebuilt") == "v99"
    assert not calls
    assert m.get(("k", 0), lambda: "rebuilt-0") == "rebuilt-0"


def test_expr_memo_typeerror_fallback():
    """ADVICE r21: an unhashable key component (e.g. a Column slipping
    into series_window's extra_order) must fall back to direct
    construction, not raise — tsfuncs' r21 memo lacked this."""
    from remote_tsdb_clickhouse_spark.util import ExprMemo

    m = ExprMemo(maxsize=8)
    built = []
    for _ in range(3):
        m.get(("k", ["unhashable"]), lambda: built.append(1) or "v")
    assert len(built) == 3  # built every time, never cached
    assert len(m) == 0


def test_expr_memo_clears_on_context_change():
    """ADVICE r21: cached Columns wrap py4j JavaObjects; a relaunched
    JVM gateway (new SparkContext) would leave stale references.  The
    memo tracks the active SparkContext and self-clears on change."""
    from remote_tsdb_clickhouse_spark.util import ExprMemo

    m = ExprMemo(maxsize=8)
    m.get(("k",), lambda: "v1")
    assert len(m) == 1
    m._ctx = object()  # simulate: entries were cached under another context
    built = []
    assert m.get(("k",), lambda: built.append(1) or "v2") == "v2"
    assert built  # rebuilt: the old entry was dropped, not served stale


def test_read_filter_memo_bounded_under_distinct_queries(spark):
    """r21 verdict item 3 'Done' shape: N distinct ReadQueries (the
    dashboard/server traffic pattern) leave the read-path memo bounded."""
    from remote_tsdb_clickhouse_spark.plans import read_plan as rp

    for i in range(600):
        rp.read_filter(rp.ReadQuery(start_ms=i * 1000, end_ms=i * 1000 + 500))
    assert len(rp._EXPR_MEMO) <= 256


def test_read_filter_memo_ignores_hint_only_differences(spark):
    """ADVICE r21: the built filter depends only on the time bounds,
    matchers and ignore_label — queries differing only in step/range
    hints (the common dashboard pattern) must share one cached filter."""
    from remote_tsdb_clickhouse_spark.plans import read_plan as rp

    q1 = rp.ReadQuery(start_ms=1000, end_ms=2000, hints=rp.ReadHints(step_ms=0))
    q2 = rp.ReadQuery(start_ms=1000, end_ms=2000, hints=rp.ReadHints(step_ms=60000))
    assert rp.read_filter(q1) is rp.read_filter(q2)
