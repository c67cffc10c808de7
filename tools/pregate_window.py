#!/usr/bin/env python3
"""Pre-gate a verification window with the driver-exact oracle compare.

Each round's hoisted ``_R{N}_WINDOW`` is pre-gated at sf0.01 before the
driver runs it (the builder habit since r15, previously a per-round /tmp
script).  This reuses ``tests/test_oracle_parity.py``'s normalization
helpers so the compare is bit-identical to the local replica of the
driver gate: column names, row count, and the row-value multiset.

Usage:
    python tools/pregate_window.py _R20_WINDOW
    python tools/pregate_window.py _R20_WINDOW --sf /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description="Run every query in a _R{N}_WINDOW list against its "
                    "DuckDB oracle with the driver-exact compare.")
    parser.add_argument("window", metavar="_RN_WINDOW",
                        help="window list name in __spark_entry__.py")
    parser.add_argument("--sf", default="/root/testdata/sf0.01",
                        help="scale-factor dir (default: the driver's "
                             "correctness gate, sf0.01)")
    ns = parser.parse_args(argv)

    os.environ["ORACLE_SF_DIR"] = ns.sf
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import __spark_entry__ as entrymod
    from test_oracle_parity import _duck_df, _row_multiset
    from remote_tsdb_clickhouse_spark.session import get_spark

    names = getattr(entrymod, ns.window, None)
    if names is None:
        print(f"ERROR: no window named {ns.window} in __spark_entry__.py",
              file=sys.stderr)
        return 2
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    missing = [n for n in names if n not in queries]
    if missing:
        print(f"ERROR: window names not in queries(): {missing}",
              file=sys.stderr)
        return 2
    # ADVICE r19 item 1: also validate against oracle_sql() upfront — the
    # tool is standalone, so a query with no oracle must be the same
    # ERROR/exit-2 shape, not a mid-run KeyError counted as a row FAIL.
    no_oracle = [n for n in names if n not in oracles]
    if no_oracle:
        print(f"ERROR: window names not in oracle_sql(): {no_oracle}",
              file=sys.stderr)
        return 2

    spark = get_spark(f"pregate-{ns.window}")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    t0 = time.time()
    # ADVICE r19 item 2: stop the session explicitly so main() is safe to
    # reuse in-process and shutdown is clean, not left to process exit.
    try:
        for i, name in enumerate(names, 1):
            try:
                spark_df = queries[name](spark, ns.sf).toPandas()
                oracle_df = _duck_df(oracles[name])
                assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
                    f"columns {sorted(spark_df.columns)} "
                    f"vs {sorted(oracle_df.columns)}")
                assert len(spark_df) == len(oracle_df), (
                    f"rows {len(spark_df)} vs {len(oracle_df)}")
                ours, theirs = _row_multiset(spark_df), _row_multiset(oracle_df)
                assert ours == theirs, (
                    f"values ours-only={[r for r in ours if r not in theirs][:3]}"
                    f" oracle-only={[r for r in theirs if r not in ours][:3]}")
                print(f"[{i:2d}/{len(names)}] {name}: OK "
                      f"({len(spark_df)} rows)", flush=True)
            except Exception as exc:  # noqa: BLE001 — report every row
                failures.append((name, str(exc)[:500]))
                print(f"[{i:2d}/{len(names)}] {name}: FAIL {exc}", flush=True)
    finally:
        spark.stop()

    ok = len(names) - len(failures)
    print(f"\n{ok}/{len(names)} green in {time.time() - t0:.0f}s")
    if failures:
        for name, msg in failures:
            print(f"FAIL {name}: {msg}", file=sys.stderr)
        return 1
    print(f"PREGATE {ns.window}: ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
