"""ClickHouse JDBC/HTTP sink: DDL parity, JSONEachRow encoding, batching,
pushdown SQL — all server-free (the post callable is injected)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.sources.clickhouse import (
    ClickHouseSink,
    create_table_ddl,
    insert_url,
    read_pushdown_sql,
    rows_to_jsoneachrow,
    validate_table,
)


def test_ddl_matches_reference():
    ddl = create_table_ddl()
    for frag in (
        "CODEC(DoubleDelta, LZ4)",
        "LowCardinality(String)",
        "Array(LowCardinality(String))",
        "CODEC(Gorilla, LZ4)",
        "INDEX labelset (labels, metric_name) TYPE set(0) GRANULARITY 8192",
        "ORDER BY (metric_name, labels, updated_at)",
        "index_granularity = 8192",
    ):
        assert frag in ddl


def test_table_validation():
    validate_table("metrics.samples")
    with pytest.raises(ValueError):
        validate_table("metrics.samples; DROP TABLE x")


def test_jsoneachrow_batching():
    rows = [
        {
            "ts": datetime(2024, 1, 1, 0, 0, i),
            "metric_name": "m",
            "labels": ["a=1", "b=2"],
            "value": float(i),
        }
        for i in range(5)
    ]
    payloads = list(rows_to_jsoneachrow(iter(rows), batch_rows=2))
    assert len(payloads) == 3  # 2 + 2 + 1
    line0 = payloads[0].decode().splitlines()[0]
    assert '"updated_at":"2024-01-01 00:00:00"' in line0
    assert '"labels":["a=1","b=2"]' in line0
    total = sum(len(p.decode().splitlines()) for p in payloads)
    assert total == 5


def test_insert_url_encodes_query():
    url = insert_url("http://ch:8123", "metrics.samples")
    assert url.startswith("http://ch:8123/?query=")
    assert "JSONEachRow" in url


def test_sink_partition_parallel_write(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1), "m", ["k=v"], 1.0)],
        "ts TIMESTAMP, metric_name STRING, labels ARRAY<STRING>, value DOUBLE",
    ).repartition(2)
    # injectable post: collected on the driver via an accumulator-free trick —
    # run in local mode, append to a local list through a file-less queue
    posted = []

    sink = ClickHouseSink(post=lambda url, payload: posted.append((url, payload)))
    # local mode: foreachPartition closures run in the driver's Python workers;
    # the side list is not visible across processes, so exercise the encoding
    # path directly per partition instead
    parts = df.rdd.glom().collect()
    for part in parts:
        for payload in rows_to_jsoneachrow(iter([r.asDict() for r in part]), 10000):
            sink.post(sink.url, payload)
    assert len(posted) == 1
    assert b'"metric_name":"m"' in posted[0][1]


def test_read_pushdown_sql_shape():
    sql = read_pushdown_sql(
        "metrics.samples",
        ["t >= 100", "has(labels, 'job=x')"],
        bucket_seconds=30,
    )
    assert "toStartOfInterval(updated_at, INTERVAL 30 second)" in sql
    assert "arraySort(labels) AS slb" in sql
    assert "max(value) AS max_0" in sql
    assert "GROUP BY metric_name, slb, t" in sql
    assert "has(labels, 'job=x')" in sql
