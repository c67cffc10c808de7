#!/usr/bin/env python3
"""Capture ``explain("formatted")`` for entry queries into a directory.

Optimization-round instrument (guide §1.1/§7.2): writes one
``<query>.txt`` per declared query plus a one-line-per-query summary of
plan shape — Exchange count, join strategies, Python-eval nodes,
WholeStageCodegen span count — so before/after plan diffs are reviewable
without running Spark.

Usage:
    python tools/capture_plans.py plans/r21/before [--warm] [query ...]

``--warm`` runs the entry's ``family_warmup`` for each captured query's
family first (bench conditions): plans that probe a family's shared
persisted frames then show the ``InMemoryTableScan`` the bench actually
executes, which is the shape an optimization that introduces a shared
serving frame changes.  Without it, captures are cold single-query plans.

With no query names, captures all of ``queries()``.  Streaming queries
(``streaming_*``) execute a real micro-batch run inside the query
function and return a memory-sink table whose plan is a trivial
LocalTableScan; they are captured but flagged in the summary.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def plan_summary(text: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", text))
    n_reused_ex = len(re.findall(r"ReusedExchange", text))
    n_aqe = len(re.findall(r"AQEShuffleRead", text))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        text,
    )
    py = re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|"
                    r"MapInPandas|FlatMapGroupsInPandas)\b", text)
    n_wsc = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))
    n_scan = len(re.findall(r"Scan parquet", text))
    n_cache = len(re.findall(r"InMemoryTableScan|TableCacheQueryStage", text))
    from collections import Counter

    def fmt(c):
        return ",".join(f"{k}x{v}" for k, v in sorted(Counter(c).items())) or "-"

    return (
        f"ex={n_ex}(reused={n_reused_ex},aqe={n_aqe}) joins={fmt(joins)} "
        f"py={fmt(py)} wsc={n_wsc} scans={n_scan} cached={n_cache}"
    )


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    outdir = argv[0]
    rest = argv[1:]
    warm = "--warm" in rest
    only = {a for a in rest if a != "--warm"}
    os.makedirs(outdir, exist_ok=True)
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod
    from remote_tsdb_clickhouse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    lines = []
    warmed: set[str] = set()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        fam = name.split("_", 1)[0]
        if warm and fam not in warmed:
            try:
                entrymod.family_warmup(spark, sf_dir, fam)
            except Exception as exc:
                print(f"# family_warmup({fam}) error: {exc}", file=sys.stderr)
            warmed.add(fam)
        try:
            df = fn(spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture everything; one failure is a finding
            text = f"ERROR: {exc}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(text)
        flag = " [streaming: post-run memory-sink plan]" if name.startswith("streaming_") else ""
        summ = plan_summary(text) + flag
        lines.append(f"{name}: {summ}")
        print(f"{name}: {summ}", flush=True)
    with open(os.path.join(outdir, "SUMMARY.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
