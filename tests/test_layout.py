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


def test_salted_agg_randomized_equivalence(spark):
    """Seeded randomized equivalence: salted two-phase aggregation must
    match a plain groupBy for all four decomposable aggregates on a
    Zipf-ish skewed key distribution, across three salt counts (including
    n_salts larger than some groups' row counts).  Integer-valued doubles
    keep the reordered sums exact."""
    import random

    from remote_tsdb_clickhouse_spark.operators.layout import salted_agg

    rng = random.Random(47)
    keys = ["hot"] * 60 + [f"warm{i}" for i in range(1, 10) for _ in range(6)] + [
        f"cold{i}" for i in range(30)
    ]
    rows = [(rng.choice(keys), float(rng.randint(-50, 50))) for _ in range(4000)]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    want = {
        r.k: (r.s, r.c, r.mn, r.mx)
        for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("c"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    for n_salts in (2, 16, 64):
        out = salted_agg(
            df, ["k"], {"v": "sum"}, n_salts=n_salts
        ).join(
            salted_agg(df, ["k"], {"v": "count"}, n_salts=n_salts), "k"
        ).join(
            salted_agg(df, ["k"], {"v": "min"}, n_salts=n_salts), "k"
        ).join(
            salted_agg(df, ["k"], {"v": "max"}, n_salts=n_salts), "k"
        )
        got = {r.k: (r.sum_v, r.count_v, r.min_v, r.max_v) for r in out.collect()}
        assert got == want, n_salts


def test_bucketed_join_randomized_content_equivalence(spark):
    """Seeded randomized content check for the zero-exchange bucketed
    join: both sides carry duplicate and partially-overlapping keys, so
    the join multiplies rows — the result multiset must equal a Python
    inner join exactly, and the plan must still contain no Exchange (the
    correctness of the co-located path is bucket-alignment, not luck)."""
    import random
    from collections import Counter

    rng = random.Random(2203)
    left_rows = [(rng.randrange(50), rng.randrange(1000)) for _ in range(400)]
    right_rows = [(rng.randrange(80), rng.randrange(1000)) for _ in range(300)]

    want = Counter()
    by_key = {}
    for k, b in right_rows:
        by_key.setdefault(k, []).append(b)
    for k, a in left_rows:
        for b in by_key.get(k, []):
            want[(k, a, b)] += 1

    left = spark.createDataFrame(left_rows, "k LONG, a LONG")
    right = spark.createDataFrame(right_rows, "k LONG, b LONG")
    write_bucketed(left, "bkt_rand_left", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(right, "bkt_rand_right", ["k"], n_buckets=8, sort_cols=["k"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, "bkt_rand_left").join(
            read_table(spark, "bkt_rand_right"), "k"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = Counter((r.k, r.a, r.b) for r in j.collect())
        assert got == want
        assert sum(want.values()) > 400  # keys overlap enough to multiply
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_rand_left")
        spark.sql("DROP TABLE IF EXISTS bkt_rand_right")
