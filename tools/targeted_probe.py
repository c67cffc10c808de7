#!/usr/bin/env python3
"""Bracketed-calibration targeted probe for bench watch queries.

The driver bench's min-of-3 host calibration samples ONE instant, but
this shared host's vCPU preemption storms are bursty — a quiet
calibration instant next to a stormy suite (or vice versa) has produced
every "slowest point on record" so far (see BENCH_NOTES.md, r12-r14).
When a round's verdict flags individual queries as watch items, the
settle-it protocol (first used to clear ``streaming_dedup`` in r9 and
``streaming_stateful_rate`` in r12/r13) is:

1. bench-identical warmup (``bench.warm_suite`` — the exact block the
   suite runs, shared by import rather than hand-copied),
2. a PRE calibration bracket (the pinned ``bench.measure_calibration``
   job, 3 trials),
3. N back-to-back timed trials of each watch query, run inside its
   bench family context (``spark.catalog.clearCache()`` + the entry's
   ``family_warmup``, exactly like the suite's family boundary),
4. a POST calibration bracket.

Agreeing, historically-normal PRE/POST brackets around steady trials =
a genuinely clean delivery window; the steady-state median is the
query's clean point.  Disagreeing or slow brackets = the window itself
was stormy and the probe must be re-run.  One JSON line per run goes to
stdout for the BENCH_NOTES.md ledger.

Usage:
    python tools/targeted_probe.py dedup_lines dedup_simhash streaming_dedup
    python tools/targeted_probe.py --trials 5 streaming_dedup
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+", help="queries() names to probe")
    ap.add_argument("--trials", type=int, default=5)
    # ADVICE r15: --trials 0 used to skip the inner loop and hit an
    # unbound `n` in the report line; refuse it up front instead.
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    if args.trials < 1:
        ap.error(f"--trials must be >= 1 (got {args.trials})")

    import bench
    import __spark_entry__ as entrymod
    from remote_tsdb_clickhouse_spark.session import get_spark

    qs = entrymod.queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("targeted_probe")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_suite(spark, args.sf_dir)

    pre, pre_ok = bench.measure_calibration(spark)
    print(f"# calib PRE {pre} ok={pre_ok}", flush=True)

    fam_warm = getattr(entrymod, "family_warmup", None)
    results: dict[str, list[float]] = {}
    fam_done: str | None = None
    for name in args.queries:
        fam = name.split("_", 1)[0]
        if fam != fam_done:
            # bench family boundary: clear cross-family cache state, then
            # rebuild this family's shared persisted frames untimed
            spark.catalog.clearCache()
            if fam_warm is not None:
                try:
                    fam_warm(spark, args.sf_dir, fam)
                except Exception as exc:
                    print(f"# family_warmup({fam}) error: {exc}", file=sys.stderr)
            fam_done = fam
        trials = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            n = len(qs[name](spark, args.sf_dir).collect())
            trials.append(round(time.perf_counter() - t0, 3))
        results[name] = trials
        print(f"# {name} trials={trials} rows={n}", flush=True)

    post, post_ok = bench.measure_calibration(spark)
    print(f"# calib POST {post} ok={post_ok}", flush=True)

    print(json.dumps({
        "probe": results,
        "calib_pre": pre, "calib_post": post,
        "calib_ok": pre_ok and post_ok,
        "sf_dir": args.sf_dir,
    }))


if __name__ == "__main__":
    main()
