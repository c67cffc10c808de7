"""As-of (backward temporal) join — a custom operator Spark lacks.

For each left row, attach the most recent right row with the same key whose
timestamp is <= (inclusive) the left row's timestamp.  The classic use:
"for this trade, the prevailing quote"; here: "for this purchase event, the
last click by the same user".

The naive formulation is a range join (``l.ts >= r.ts`` inequality) which
Spark executes as a broadcast-nested-loop or a full cross-per-key — O(n·m)
per key and catastrophic at scale.  This implementation is the scalable
union-and-scan shape:

1. tag both sides and union them into one frame (no join at all),
2. one shuffle: window partitioned by the key, ordered by
   ``(ts, side)`` with the right side ordered *before* left rows at equal
   timestamps (inclusive semantics),
3. ``last(right_payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` carries the prevailing
   right row forward to every left row,
4. keep left rows, unpack.

Cost: exactly one shuffle on the key (same as any keyed window), sort
within partitions, zero row amplification.  Skewed keys behave like any
windowed aggregation (AQE/salting apply).  Compare DuckDB's native
``ASOF JOIN`` — the oracle twin used in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    tolerance_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join (left join semantics: unmatched left rows keep
    NULL right columns).  ``direction="backward"`` (default) attaches the
    most recent right row with ``right_ts <= left_ts``;
    ``direction="forward"`` the earliest with ``right_ts >= left_ts``
    (time-to-next-event / conversion-latency shape) — same single-shuffle
    union-and-scan, with the carry running from the other frame end.

    ``right`` must be unique per ``(on..., right_ts)`` — pre-aggregate it
    otherwise, or the carried "most recent" row among equal timestamps is
    nondeterministic.

    ``tolerance_s``: if set, matches further than this many seconds from
    the left timestamp are nulled out (pandas ``merge_asof`` tolerance).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        payload.alias("__rv"),
    )
    rv_type = r2.schema["__rv"].dataType
    left_cols = [c for c in left.columns]
    l2 = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(rv_type).alias("__rv"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__lrow"),
    )
    r2 = r2.withColumn("__lrow", F.lit(None).cast(l2.schema["__lrow"].dataType))

    u = l2.unionByName(r2)
    # right rows sort toward the carry origin at equal timestamps ->
    # inclusive semantics in either direction
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = u.withColumn("__match", F.last("__rv", ignorenulls=True).over(w))
        gap = F.col("__t").cast("double") - F.col("__match.__rts").cast("double")
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__is_right").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = u.withColumn("__match", F.first("__rv", ignorenulls=True).over(w))
        gap = F.col("__match.__rts").cast("double") - F.col("__t").cast("double")
    out = carried.where(F.col("__is_right") == 0)
    if tolerance_s is not None:
        out = out.withColumn(
            "__match", F.when(gap <= F.lit(float(tolerance_s)), F.col("__match"))
        )
    sel = [F.col(f"__lrow.{c}").alias(c) for c in left_cols]
    sel.append(F.col("__match.__rts").alias(f"{left_ts}{suffix}"))
    sel.extend(F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return out.select(*sel)
