"""Driver-contract invariants for __spark_entry__: every query has an oracle
twin, keys match exactly, and the module imports cleanly (the driver's first
action each round)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_oracle():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q == o, f"drift: queries-only={q - o}, oracles-only={o - q}"


def test_oracles_are_nonempty_sql():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_are_callables():
    for name, fn in entry.queries().items():
        assert callable(fn), name


def test_oracle_sql_compiles_in_duckdb():
    """Each oracle must at least parse/bind against empty tables of the
    driver's schemas — catches typos without running Spark."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name, sql in entry.oracle_sql().items():
        con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
