"""Physical-layout utilities for 100 TB joins: bucketing and skew salting.

Two standard levers the engine's big joins rely on, packaged and
plan-verified (tests assert the exchanges actually disappear / the skew
actually spreads):

- **Bucketed co-located joins** (:func:`write_bucketed`, the Spark analog of
  pre-partitioned MergeTree tables): both join sides hash-bucketed into the
  same number of buckets on the join key at *write* time; Spark's scan
  reports the bucketing as the output partitioning, so the join plans with
  **zero Exchange operators** — at 100 TB this turns the fact-fact join's
  dominant cost (two full shuffles) into none.

- **Salted aggregation/join** (:func:`salt`, :func:`unsalt_agg`): a hot key
  (one metric with 100x the samples, one stop-shingle) caps scalability at
  the size of its single reducer.  Salting splits each key into
  ``n_salts`` sub-keys for a partial aggregate, then a tiny final aggregate
  over the sub-results restores exact semantics — the classic two-phase
  rewrite AQE's skew-join handling cannot apply to aggregations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Joins and aggregations on ``bucket_cols`` between tables bucketed with
    the same ``n_buckets`` plan without a shuffle; in-bucket sorting also
    removes the sort of a sort-merge join.  ``path`` makes the table
    external at that location (bucketing metadata still lives in the
    catalog, which is what the scan's output-partitioning report needs);
    default is a managed table under the session warehouse dir.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salt(df: DataFrame, key_cols: Sequence[str], n_salts: int = 16) -> DataFrame:
    """Append a salt column spreading each key's rows over ``n_salts``
    sub-keys.

    The salt is derived from the **non-key** columns (plus
    ``spark_partition_id`` as a tiebreaker when rows are identical or every
    column is a key column), so rows of one hot key decorrelate by their
    payload rather than incidentally.  Run-to-run determinism is NOT
    guaranteed: ``spark_partition_id`` depends on the input partitioning —
    the contract is only that each key's rows spread ~uniformly, which is
    all two-phase aggregation needs (the final combine restores exact
    semantics regardless of which sub-key a row landed in).
    """
    keys = set(key_cols)
    non_key = [F.col(c) for c in df.columns if c not in keys]
    spread_expr = F.pmod(
        F.hash(*non_key, F.spark_partition_id()) if non_key
        else F.hash(F.spark_partition_id()),
        F.lit(n_salts),
    )
    return df.withColumn("__salt", spread_expr)


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Exact two-phase aggregation under key skew.

    ``agg_exprs`` maps column -> one of ``sum``/``count``/``min``/``max``
    (the decomposable aggregates: partials combine losslessly).  Phase 1
    aggregates on (key, salt) — the hot key's rows spread over ``n_salts``
    reducers; phase 2 combines the ≤``n_salts`` partials per key.
    """
    combiner = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_aggs = []
    for col, how in agg_exprs.items():
        if how == "count":
            phase1_aggs.append(F.count(col).alias(f"__p_{col}"))
        else:
            phase1_aggs.append(getattr(F, how)(col).alias(f"__p_{col}"))
    salted = salt(df, key_cols, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(*phase1_aggs)
    final_aggs = [
        combiner[how](f"__p_{col}").alias(f"{how}_{col}")
        for col, how in agg_exprs.items()
    ]
    return partial.groupBy(*key_cols).agg(*final_aggs)
