"""Direct clause tests for entry-level query semantics (screen batch 15).

The entry queries are pinned end-to-end by the DuckDB oracle parity gate,
but — exactly like the events adapter before batch 13 — several BOUNDARY
clauses only fire when the data lands precisely on the boundary, which
the synthetic sf tables cannot be relied on to do: an exactly-1800 s
session gap, a click exactly 24 h after signup, a split hash landing on
bucket 80, a basket pair with support exactly 2, a series going stale at
exactly end-24h.  These tests plant parquet fixtures that sit ON each
boundary and assert the query output directly, so mutants M77-M86 have
deterministic killers independent of corpus luck.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import __spark_entry__ as entry

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, sf_dir, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/events.parquet")


def test_sessionize_gap_boundary_exactly_1800s(spark, tmp_path):
    """Mutant M77: a gap of EXACTLY 1800 s continues the session (the
    break condition is strictly ``gap > 1800``); 1801 s starts a new one."""
    t0 = datetime(2024, 1, 2, 0, 0, 0)
    _write_events(spark, str(tmp_path), [
        (1, t0, 1, "click", 1.0, '{"k": 1}'),
        (2, t0 + timedelta(seconds=1800), 1, "click", 1.0, '{"k": 1}'),
        (3, t0, 2, "click", 1.0, '{"k": 1}'),
        (4, t0 + timedelta(seconds=1801), 2, "click", 1.0, '{"k": 1}'),
    ])
    out = entry.q_events_sessionize(spark, str(tmp_path)).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [2], per_user  # boundary gap: one session
    assert sorted(per_user[2]) == [1, 1], per_user  # 1801 s: split


def test_funnel_stage_window_boundaries(spark, tmp_path):
    """Mutants M78/M79: a click at EXACTLY the signup instant qualifies
    (``ts >= t_signup``) and a click EXACTLY 24 h after signup qualifies
    (``<= day``); 24 h + 1 s does not.  A purchase at exactly the click
    instant keeps the third stage non-vacuous."""
    t0 = datetime(2024, 1, 2, 0, 0, 0)
    day = timedelta(seconds=86400)
    _write_events(spark, str(tmp_path), [
        # u1: click at the signup instant; purchase at the click instant
        (1, t0, 1, "signup", 1.0, '{"k": 1}'),
        (2, t0, 1, "click", 1.0, '{"k": 1}'),
        (3, t0, 1, "purchase", 1.0, '{"k": 1}'),
        # u2: click exactly 24 h after signup (inclusive boundary)
        (4, t0, 2, "signup", 1.0, '{"k": 1}'),
        (5, t0 + day, 2, "click", 1.0, '{"k": 1}'),
        # u3: click 24 h + 1 s after signup (outside, both spellings)
        (6, t0, 3, "signup", 1.0, '{"k": 1}'),
        (7, t0 + day + timedelta(seconds=1), 3, "click", 1.0, '{"k": 1}'),
    ])
    row = entry.q_events_funnel(spark, str(tmp_path)).collect()[0]
    assert (row["n_signup"], row["n_click_after"], row["n_purchase_after"]) == (
        3, 2, 1,
    ), row


def test_dataset_split_hash_bucket_boundaries(spark, tmp_path):
    """Mutant M80: the 80/10/10 split boundaries are ``h < 80`` and
    ``h < 90`` — ids whose md5-prefix bucket lands EXACTLY on 80 / 90 go
    to val / test.  doc_ids 69/204/19/25 hash to buckets 79/80/89/90
    (computed offline; md5 is stable)."""
    rows = [(i, "t", "en", "src", 1) for i in (69, 204, 19, 25)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["split"]: r["n_docs"]
        for r in entry.q_dataset_split(spark, str(tmp_path)).collect()
    }
    assert got == {"train": 1, "val": 2, "test": 1}, got


def test_market_basket_support_boundary_and_no_self_pairs(spark, tmp_path):
    """Mutants M81/M82: a pair co-occurring in EXACTLY 2 orders survives
    the ``support >= 2`` floor, and the pair expansion (``slice`` from
    ``i + 2``) never emits self-pairs — a basket of {10,20} in two orders
    must produce exactly one output row, (10, 20, 2)."""
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30),
            (4, 40), (4, 40), (4, 50)]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = [
        (r["part_a"], r["part_b"], r["support"])
        for r in entry.q_orders_market_basket(spark, str(tmp_path)).collect()
    ]
    assert got == [(10, 20, 2)], got


def test_matryoshka_prefix_is_the_leading_16_dims(spark, tmp_path):
    """Mutant M83: the Matryoshka prefix is dims 1..16 — the MRL property
    only holds for the LEADING prefix.  vec 10 matches the query in dim 1
    (inside the window), vec 11 only in dim 17 (outside): the top
    neighbor must be 10.  A shifted window (dims 2..17) inverts the
    ranking.  All vectors carry a tiny dim-16 component (inside both
    windows) so no slice has zero norm."""
    def v(d1=0.0, d17=0.0):
        vec = [0.0] * 64
        vec[0] = d1
        vec[15] = 0.001
        vec[16] = d17
        return vec

    rows = [(0, v(d1=1.0, d17=1.0), 0), (10, v(d1=1.0), 0), (11, v(d17=1.0), 0)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = (
        entry.q_sim_matryoshka_topk(spark, str(tmp_path))
        .orderBy("rnk")
        .collect()
    )
    assert [r["neighbor_id"] for r in out] == [10, 11], out


def test_stale_series_boundary_exactly_24h(spark, tmp_path):
    """Mutant M86: a series whose newest sample sits EXACTLY at
    end - 24 h is NOT stale (the cut is strictly ``last_t < end - 86400``);
    one second older is.  T20 = 2024-01-20 00:00:00 UTC."""
    edge = datetime(2024, 1, 19, 0, 0, 0)  # T20 - 24h exactly
    _write_events(spark, str(tmp_path), [
        (1, datetime(2024, 1, 5), 1, "click", 1.0, '{"k": 1}'),
        (2, edge, 1, "click", 1.0, '{"k": 1}'),          # on the boundary
        (3, datetime(2024, 1, 10), 2, "view", 1.0, '{"k": 1}'),   # stale
        (4, datetime(2024, 1, 19, 12), 3, "purchase", 1.0, '{"k": 1}'),
    ])
    out = entry.q_tsdb_stale_series(spark, str(tmp_path)).collect()
    assert {r["metric_name"] for r in out} == {"view"}, out
