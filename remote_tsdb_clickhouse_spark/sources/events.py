"""Adapter: the driver's ``events`` table -> canonical samples DataFrame.

The synthetic ``events`` table (``event_id, ts, user_id, event_type, value,
props``) doubles as the time-series fixture (FIXTURES.md §3): ``event_type``
plays ``metric_name``, ``ts`` is truncated to whole seconds (DateTime
parity, reference ``write.go:49``), and a labelset is derived from
``props``/``user_id`` as sorted ``"name=value"`` strings (``write.go:37-44``
encoding).  The derived labels include a conditional ``tier=gold`` entry so
the missing-label matcher semantics (F9/F11) are exercised on real data.

The identical derivation exists as ANSI SQL in ``__spark_entry__.py``'s
oracle strings so DuckDB computes the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Shared DuckDB/ANSI CTE computing the same samples derivation; every
#: TSDB oracle query in __spark_entry__.py starts from this.
SAMPLES_ORACLE_CTE = """
samples AS (
    SELECT
        date_trunc('second', ts) AS ts,
        event_type AS metric_name,
        list_sort(list_concat(
            ['k=' || regexp_extract(props, '"k": ([0-9]+)', 1),
             'user=' || CAST(user_id AS VARCHAR)],
            CASE WHEN user_id % 3 = 0 THEN ['tier=gold'] ELSE [] END
        )) AS labels,
        value
    FROM events
)
"""


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read ``events.parquet`` with its ``ts`` column normalized to the
    session-zone TIMESTAMP type, whatever the parquet writer emitted.

    - TIMESTAMP(NANOS): with ``spark.sql.legacy.parquet.nanosAsLong`` the
      column arrives as INT64 nanos, floor-divided to microseconds — the
      same truncation DuckDB applies coercing ns -> us (DuckDB truncates,
      never rounds; verified empirically).
    - ``timestamp[us]`` with ``isAdjustedToUTC=false`` arrives as
      TIMESTAMP_NTZ, which Spark refuses to cast to epoch longs
      (``CAST_WITHOUT_SUGGESTION``); cast to TIMESTAMP interprets the naive
      value in the session zone — pinned UTC (session.py), so the wall-clock
      values are unchanged and epoch math works downstream.
    """
    from pyspark.sql import types as T

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = ev.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def samples_from_events(ev: DataFrame) -> DataFrame:
    """Shape a normalized events frame into the samples model.

    Split out from :func:`events_to_samples` so callers can control the
    partitioning of ``ev`` BEFORE the label derivation runs: the regexp
    extraction + array build is the family's first map stage, and when the
    input is a single parquet row group (one scan partition) it would
    otherwise execute on one core.  At cluster scale the events table has
    many files/row groups and no repartition is needed — ``spread()`` is a
    no-op there (util.py file-count short-circuit).
    """
    base = F.array(
        F.concat(F.lit("k="), F.regexp_extract("props", r'"k": ([0-9]+)', 1)),
        F.concat(F.lit("user="), F.col("user_id").cast("string")),
    )
    extra = F.when(F.col("user_id") % 3 == 0, F.array(F.lit("tier=gold"))).otherwise(
        F.array().cast("array<string>")
    )
    return ev.select(
        F.date_trunc("second", "ts").alias("ts"),
        F.col("event_type").alias("metric_name"),
        F.array_sort(F.concat(base, extra)).alias("labels"),
        F.col("value").alias("value"),
    )


def events_to_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events.parquet`` and shape it into the samples model."""
    return samples_from_events(read_events(spark, sf_dir))
