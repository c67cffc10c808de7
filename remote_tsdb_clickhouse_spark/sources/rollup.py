"""Hierarchical time rollups — the continuous-aggregate / hypertable-rollup
pattern for the samples store.

The reference serves downsampled reads by re-aggregating raw rows on every
query (``toStartOfInterval`` + ``max``, reference ``read.go:54,57``).  At
100 TB that re-scan is the dominant cost: a dashboard asking for 1-hour
buckets over a year still reads every raw sample.  The standard TSDB answer
(TimescaleDB continuous aggregates, ClickHouse materialized rollup tables,
Prometheus recording rules) is to precompute coarser resolutions and serve
each query from the coarsest table that can answer it exactly.

Because the read path's only aggregate is ``max`` (A1/A2), rollups are
**exact**, not approximate: ``max`` over n-second buckets recomposes to
``max`` over any multiple of n, so a query whose downsample interval is a
multiple of a built rollup's interval returns bit-identical results while
scanning ``interval_ratio``× less data.  Queries that don't match any
rollup (raw reads, non-divisible intervals) fall through to the base store
unchanged.

Layout mirrors the base store: parquet partitioned by ``ts_date`` (time
pruning works identically), rows ``(ts, metric_name, labels, value)`` where
``ts`` is the bucket start and ``value`` the bucket max — so every existing
read-plan operator runs on a rollup unmodified.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.model import PARTITION_COLUMN
from remote_tsdb_clickhouse_spark.plans.read_plan import (
    ReadQuery,
    downsample_interval_seconds,
    read_query_grouped,
)
from remote_tsdb_clickhouse_spark.sources.samples_store import SamplesStore


class RollupStore:
    """Manages rollup resolutions beside a base :class:`SamplesStore`."""

    def __init__(self, spark: SparkSession, base: SamplesStore, path: str):
        self.spark = spark
        self.base = base
        self.path = path

    def _res_path(self, interval_s: int) -> str:
        return f"{self.path}/res={int(interval_s)}"

    def build(self, interval_s: int, source_interval_s: int | None = None) -> None:
        """(Re)build one resolution.

        ``source_interval_s`` lets coarse resolutions build from a finer
        rollup instead of raw data (1h from 1min reads 60x less) — exact,
        since max composes.
        """
        if interval_s <= 1:
            raise ValueError("rollup interval must exceed 1 second")
        if source_interval_s is not None and interval_s % source_interval_s != 0:
            raise ValueError("coarse interval must be a multiple of the source's")
        src = (
            self.read(source_interval_s)
            if source_interval_s is not None
            else self.base.read(with_partition_col=False)
        )
        epoch = F.col("ts").cast("long")
        bucket = F.timestamp_seconds(epoch - epoch % interval_s)
        rolled = (
            src.groupBy(
                "metric_name",
                F.array_sort("labels").alias("labels"),
                bucket.alias("ts"),
            )
            .agg(F.max("value").alias("value"))
            .select("ts", "metric_name", "labels", "value")
            .withColumn(PARTITION_COLUMN, F.to_date("ts"))
        )
        (
            rolled.sortWithinPartitions("metric_name", "labels", "ts")
            .write.partitionBy(PARTITION_COLUMN)
            .mode("overwrite")
            .parquet(self._res_path(interval_s))
        )

    def resolutions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            if name.startswith("res="):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def read(self, interval_s: int) -> DataFrame:
        return self.spark.read.parquet(self._res_path(interval_s))

    # -- query routing -------------------------------------------------------

    def route(self, q: ReadQuery, *, ignore_hints: bool = False) -> tuple[DataFrame, int | None]:
        """Pick the coarsest resolution that answers ``q`` exactly.

        Exactness condition: the query is downsampling with interval d, and
        a built resolution r divides d (bucket boundaries of r nest inside
        d's) — then max-of-rollup == max-of-raw for every output bucket.
        Raw / non-divisible queries return the base table.
        """
        d = downsample_interval_seconds(q.hints, ignore_hints=ignore_hints)
        if d is None:
            return self.base.read(), None
        fits = [r for r in self.resolutions() if d % r == 0 and r <= d]
        if not fits:
            return self.base.read(), None
        return self.read(max(fits)), max(fits)

    def read_query_grouped(self, q: ReadQuery, **kwargs) -> DataFrame:
        """Drop-in for :func:`read_plan.read_query_grouped`, rollup-routed."""
        samples, _res = self.route(q, ignore_hints=kwargs.get("ignore_hints", False))
        return read_query_grouped(samples, q, **kwargs)
