"""The events -> samples adapter (sources/events.py) underlies every
tsdb_* driver row, but until round 15 it was pinned only through those
rows' DuckDB oracles.  These tests pin its clauses directly: timestamps
truncate to the second (the write-path S5 parity rule the oracles
mirror), the label array is the sorted union of the derived base labels
and the conditional tier label, and the k= label comes from the props
JSON fragment."""

from __future__ import annotations

from datetime import datetime, timezone


def _utc(*a):
    return datetime(*a, tzinfo=timezone.utc).replace(tzinfo=None)


def test_samples_from_events_clauses(spark):
    """Mutation screen M72-M74: second truncation, the user_id % 3 == 0
    tier rule, and the sorted label array, on a fixture with sub-second
    timestamps and user ids covering all three residues."""
    from remote_tsdb_clickhouse_spark.sources.events import samples_from_events

    rows = [
        # (ts with sub-second junk, event_type, user_id, props, value)
        (datetime(2024, 1, 1, 0, 0, 1, 750000), "click", 3, '{"k": 7}', 1.5),
        (datetime(2024, 1, 1, 0, 0, 2, 1), "view", 4, '{"k": 12}', 2.5),
        (datetime(2024, 1, 1, 0, 0, 3), "click", 5, '{"k": 0}', 3.5),
    ]
    ev = spark.createDataFrame(
        rows, "ts TIMESTAMP, event_type STRING, user_id LONG, props STRING, value DOUBLE"
    )
    got = [tuple(r) for r in samples_from_events(ev).orderBy("value").collect()]
    assert got == [
        # user 3: % 3 == 0 -> tier=gold present; labels sorted; ts floored
        (_utc(2024, 1, 1, 0, 0, 1), "click", ["k=7", "tier=gold", "user=3"], 1.5),
        (_utc(2024, 1, 1, 0, 0, 2), "view", ["k=12", "user=4"], 2.5),
        (_utc(2024, 1, 1, 0, 0, 3), "click", ["k=0", "user=5"], 3.5),
    ]
