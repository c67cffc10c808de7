"""Request-level service: prompb requests -> engine plans -> prompb responses.

The Spark re-expression of the reference's per-query loop
(``read.go:15-101``): each ``prompb.Query`` becomes one DataFrame plan
(filters + optional downsample bucket + grouped max + declarative series
assembly), and the collected per-series rows are re-expanded into
``prompb.TimeSeries`` — labels split at the first ``=`` with ``__name__``
prepended (``read.go:84-89``, P3) and timestamps re-expanded to ms
(``read.go:92``).
"""

from __future__ import annotations

from datetime import timezone

from pyspark.sql import DataFrame

from remote_tsdb_clickhouse_spark import prompb
from remote_tsdb_clickhouse_spark.model import DEFAULT_READ_IGNORE_LABEL, NAME_LABEL
from remote_tsdb_clickhouse_spark.plans.read_plan import read_query_df


def row_to_timeseries(row) -> prompb.TimeSeries:
    """One assembled series row -> prompb.TimeSeries (P3 re-expansion)."""
    labels = [prompb.Label(NAME_LABEL, row["metric_name"])]
    for joined in row["slb"]:
        name, _, value = joined.partition("=")  # first '=' is structural
        labels.append(prompb.Label(name, value))
    samples = [
        # collected timestamps are tz-naive in the UTC session zone; pin UTC
        # before epoch math (naive .timestamp() would use the host zone)
        prompb.Sample(
            value=s["v"],
            timestamp=int(s["t"].replace(tzinfo=timezone.utc).timestamp() * 1000),
        )
        for s in row["samples"]
    ]
    return prompb.TimeSeries(labels=labels, samples=samples)


def handle_read_request(
    samples: DataFrame,
    req: prompb.ReadRequest,
    *,
    ignore_label: str | None = DEFAULT_READ_IGNORE_LABEL,
    ignore_hints: bool = False,
) -> prompb.ReadResponse:
    """Run every query in the request against the samples DataFrame.

    ``collect()`` is bounded by the remote-read response contract (the
    reference also materializes the full response before snappy-encoding
    it); hint-driven downsampling is the response-size control.
    """
    resp = prompb.ReadResponse()
    for q in req.queries:
        result = prompb.QueryResult()
        df = read_query_df(samples, q, ignore_label=ignore_label, ignore_hints=ignore_hints)
        # collect(), not toLocalIterator(): the response contract fully
        # materializes every series driver-side anyway (the prompb objects
        # below; the reference holds the same, capped at 32 MiB wire
        # bytes), so streaming partition-at-a-time saved no memory while
        # paying one sequential fetch round-trip per output partition —
        # measured +0.2 s per request on a sorted 1.4k-row response
        # (interleaved A/B, r21; guide §5: the driver does one bounded
        # pull, in one job)
        rows = df.orderBy("metric_name", "slb").collect()
        result.timeseries = [row_to_timeseries(r) for r in rows]
        resp.results.append(result)
    return resp
