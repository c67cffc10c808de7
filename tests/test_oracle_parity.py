"""Local replica of the driver's correctness gate: every ``queries()`` entry
runs in Spark AND its ``oracle_sql()`` twin runs in DuckDB on the same
parquet; row count, column names, and the row-value multiset must match.

Runs at sf0.001 for speed; set ``ORACLE_SF_DIR=/root/testdata/sf0.01`` to
reproduce the driver's exact gate.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

QUERY_NAMES = sorted(entrymod.queries().keys())


def _duck_df(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _norm_cell(v):
    if v is None:
        return "null"
    if isinstance(v, float):
        if math.isnan(v):
            return "null"
        # RAW-BIT compare (repr is the shortest round-trip form): the
        # driver's value-hash may not round, and transcendentals differ by
        # 1 ulp across engines — queries must quantize those themselves.
        # -0.0 normalizes to 0.0 (equal values, different reprs).
        return repr(v + 0.0 if v == 0.0 else v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return str(v)


def _row_multiset(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return sorted(rows)


def test_oracle_keys_subset():
    q = set(entrymod.queries().keys())
    o = set(entrymod.oracle_sql().keys())
    assert o <= q, f"oracle entries without queries: {o - q}"
    # round-1 goal: every query oracled
    assert q == o, f"queries missing oracles: {q - o}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    spark_df = entrymod.queries()[name](spark, SF_DIR).toPandas()
    oracle_df = _duck_df(entrymod.oracle_sql()[name])
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs oracle {len(oracle_df)}"
    )
    ours, theirs = _row_multiset(spark_df), _row_multiset(oracle_df)
    if ours != theirs:
        diff_a = [r for r in ours if r not in theirs][:5]
        diff_b = [r for r in theirs if r not in ours][:5]
        pytest.fail(f"{name}: value mismatch\n ours-only={diff_a}\n oracle-only={diff_b}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"metric_name", "slb", "samples"}
