"""WriteRequest -> canonical samples rows (SURVEY §2.1 S5).

The reference's flatten+insert writer (``write.go:11-63``): per TimeSeries,
split ``__name__`` out (``write.go:39-42``), join remaining labels to
``"name=value"`` strings preserving remote-write sorted order
(``write.go:37-44``), then one row per Sample with the ms timestamp
truncated to DateTime seconds (``write.go:49``); one atomic batch per
request (``write.go:14-22,60``).

Here the flatten runs driver-side over the decoded request (requests are
bounded — 32 MiB wire cap — so this is not a scale risk), producing one
Arrow-backed DataFrame appended atomically via the parquet commit protocol.
The ingest *volume* path is Structured Streaming over many requests
(``streaming/ingest.py``), where the same row shape arrives via staged
batches.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from remote_tsdb_clickhouse_spark import prompb
from remote_tsdb_clickhouse_spark.model import NAME_LABEL, SAMPLES_SCHEMA
from remote_tsdb_clickhouse_spark.sources.samples_store import SamplesStore


def write_request_rows(req: prompb.WriteRequest) -> list[tuple]:
    """Flatten a WriteRequest into canonical-schema row tuples.

    Returns ``(ts, metric_name, labels, value)`` tuples; ms -> seconds
    truncation and ``__name__`` extraction per the reference semantics.
    """
    rows: list[tuple] = []
    for ts_msg in req.timeseries:
        name = ""
        labels: list[str] = []
        for lb in ts_msg.labels:
            if lb.name == NAME_LABEL:
                name = lb.value
                continue
            labels.append(f"{lb.name}={lb.value}")
        for s in ts_msg.samples:
            # ms -> whole seconds (DateTime parity, write.go:49); tz-naive
            # UTC to match the engine's UTC session zone
            ts = datetime.fromtimestamp(s.timestamp // 1000, tz=timezone.utc).replace(tzinfo=None)
            rows.append((ts, name, labels, float(s.value)))
    return rows


def write_request_df(spark: SparkSession, req: prompb.WriteRequest) -> DataFrame:
    return spark.createDataFrame(write_request_rows(req), SAMPLES_SCHEMA)


class TimeseriesWriter:
    """S5 writer bound to a store; returns the written-sample count (the
    reference's ``samples_written_total`` increment, A3)."""

    def __init__(self, store: SamplesStore):
        self.store = store

    def write(self, req: prompb.WriteRequest) -> int:
        rows = write_request_rows(req)
        if not rows:
            return 0
        df = self.store.spark.createDataFrame(rows, SAMPLES_SCHEMA)
        self.store.append(df)
        return len(rows)
