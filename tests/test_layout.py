"""Physical layout levers: bucketed co-located joins plan with zero
exchanges; salted aggregation is exact and spreads the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.operators.layout import (
    read_table,
    salted_agg,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    # tables land in ./spark-warehouse (gitignored); dropped in finally
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "bkt_left", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(right, "bkt_right", ["k"], n_buckets=8, sort_cols=["k"])
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, "bkt_left").join(read_table(spark, "bkt_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_salted_agg_exact_under_skew(spark):
    # hot key: 'hot' has 50x the rows of each cold key
    rows = [("hot", float(i % 7)) for i in range(5000)] + [
        (f"cold{j}", float(j)) for j in range(100)
    ]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    out = salted_agg(df, ["k"], {"v": "sum"}, n_salts=8)
    got = {r.k: r.sum_v for r in out.collect()}
    expected_hot = float(sum(i % 7 for i in range(5000)))
    assert got["hot"] == expected_hot
    assert got["cold42"] == 42.0
    assert len(got) == 101


def test_salt_spreads_hot_key(spark):
    from remote_tsdb_clickhouse_spark.operators.layout import salt

    df = spark.createDataFrame([("hot", float(i)) for i in range(4000)], "k STRING, v DOUBLE")
    n = salt(df.repartition(8), ["k"], n_salts=8).select("__salt").distinct().count()
    assert n >= 4  # the single key occupies several sub-keys
