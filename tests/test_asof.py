"""As-of join operator: backward-inclusive semantics, tolerance, left-join
NULLs — the union-and-scan implementation (operators/asof.py) against
hand-computed expectations."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.operators.asof import asof_join


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(100), "a"), (1, _ts(205), "b"), (2, _ts(50), "c"), (3, _ts(10), "d")],
        "k INT, ts TIMESTAMP, tag STRING",
    )
    right = spark.createDataFrame(
        [(1, _ts(100), 1.0), (1, _ts(200), 2.0), (1, _ts(300), 3.0), (2, _ts(40), 9.0)],
        "k INT, ts TIMESTAMP, v DOUBLE",
    )
    return left, right


def test_backward_inclusive(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], right_cols=["v"])
    got = {r.tag: r.v_right for r in out.collect()}
    # tag a: right row at exactly ts=100 matches (inclusive)
    # tag b: most recent <= 205 is ts=200
    # tag c: right ts=40 <= 50
    # tag d: key 3 has no right rows -> NULL
    assert got == {"a": 1.0, "b": 2.0, "c": 9.0, "d": None}


def test_matched_ts_exposed(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], right_cols=["v"])
    got = {r.tag: r.ts_right for r in out.collect()}
    assert got["b"] == _ts(200)
    assert got["d"] is None


def test_tolerance(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], right_cols=["v"], tolerance_s=5.0)
    got = {r.tag: r.v_right for r in out.collect()}
    # b's match (205-200=5s) is within tolerance; c's (50-40=10s) is not
    assert got == {"a": 1.0, "b": 2.0, "c": None, "d": None}


def test_no_row_amplification(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], right_cols=["v"])
    assert out.count() == left.count()


def test_connected_components_chain():
    """Min-label propagation: a diameter-3 chain converges to one group;
    disjoint pairs stay separate (operators/dedup.py)."""
    from remote_tsdb_clickhouse_spark.operators.dedup import connected_components
    from remote_tsdb_clickhouse_spark.session import get_spark

    spark = get_spark()
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a LONG, doc_b LONG"
    )
    got = {(r.doc_id, r.group_id) for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_single_shuffle_plan(frames):
    """The plan must contain exactly one exchange (the keyed window) — the
    whole point versus a range join."""
    left, right = frames
    out = asof_join(left, right, on=["k"], right_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_forward_direction(spark):
    """Forward as-of: earliest right row at-or-after the left timestamp;
    inclusive at equality; tolerance nulls out matches too far ahead."""
    from remote_tsdb_clickhouse_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u", 10.0, "p1"), ("u", 25.0, "p2"), ("u", 100.0, "p3")],
        "k STRING, ts DOUBLE, tag STRING",
    )
    right = spark.createDataFrame(
        [("u", 10.0, 1.0), ("u", 30.0, 2.0)], "k STRING, ts DOUBLE, v DOUBLE"
    )
    out = {
        r.tag: r
        for r in asof_join(left, right, on=["k"], direction="forward").collect()
    }
    assert out["p1"].ts_right == 10.0  # inclusive at equality
    assert out["p2"].ts_right == 30.0
    assert out["p3"].ts_right is None  # nothing after
    tol = {
        r.tag: r
        for r in asof_join(
            left, right, on=["k"], direction="forward", tolerance_s=4
        ).collect()
    }
    assert tol["p1"].ts_right == 10.0
    assert tol["p2"].ts_right is None  # 30 - 25 = 5 > 4


def test_differential_vs_pandas_merge_asof(spark):
    """Second, independently-implemented oracle: pandas ``merge_asof`` —
    the published semantics asof_join's docstring cites for tolerance
    (operators/asof.py:58-59).  Unlike the brute-force sweep below (which
    re-states OUR documented semantics in Python), pandas implements
    backward/forward inclusive-nearest matching and tolerance nulling
    independently, so agreement across both directions and tolerances on
    the same randomized scenarios is cross-implementation evidence, not
    self-agreement.  Right sides are unique per (key, ts) — asof_join's
    documented precondition, and merge_asof's tie rule (last duplicate
    wins) would otherwise differ legitimately."""
    import random

    import pandas as pd

    rng = random.Random(7)
    left_rows, right_rows = [], []
    for k in range(120):
        for i in range(rng.randint(0, 5)):
            left_rows.append((k, rng.randint(0, 30), f"L{k}_{i}"))
        for t in rng.sample(range(0, 31), rng.randint(0, 5)):
            # v = 1000*k + t: injective, so the matched right timestamp is
            # recoverable from the value merge_asof reports (it only
            # carries the LEFT 'on' column through)
            right_rows.append((k, t, float(1000 * k + t)))
    left = spark.createDataFrame(left_rows, "k INT, t LONG, tag STRING")
    right = spark.createDataFrame(right_rows, "k INT, t LONG, v DOUBLE")
    lpd = pd.DataFrame(left_rows, columns=["k", "t", "tag"]).sort_values("t", kind="stable")
    rpd = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values("t", kind="stable")

    for direction in ("backward", "forward"):
        for tol in (None, 3):
            got = {
                r.tag: (r.t_right, r.v_right)
                for r in asof_join(
                    left, right, on=["k"], left_ts="t", right_ts="t",
                    right_cols=["v"], tolerance_s=tol, direction=direction,
                ).collect()
            }
            ref = pd.merge_asof(
                lpd, rpd, on="t", by="k", direction=direction,
                tolerance=tol, suffixes=("", "_right"),
            )
            assert len(got) == len(left_rows) == len(ref)
            for row in ref.itertuples():
                if pd.isna(row.v):
                    want = (None, None)
                else:
                    want = (int(row.v) - 1000 * row.k, row.v)
                assert got[row.tag] == want, (
                    f"{direction} tol={tol} {row.tag}: spark={got[row.tag]} pandas={want}"
                )


def test_randomized_sweep_vs_reference(spark):
    """Seeded 200-key randomized sweep against an independent brute-force
    reference of the documented semantics (inclusive nearest, tolerance
    nulling, left-join NULLs).  Keys are independent partitions, so one
    asof_join call evaluates 200 generated scenarios at once — duplicate
    left timestamps, empty sides, exact-tie matches, out-of-tolerance
    gaps — per direction/tolerance combination."""
    import random

    rng = random.Random(0)
    left_rows, right_rows = [], []
    for k in range(200):
        for i in range(rng.randint(0, 5)):
            left_rows.append((k, rng.randint(0, 30), f"L{k}_{i}"))
        for t in rng.sample(range(0, 31), rng.randint(0, 5)):
            right_rows.append((k, t, float(rng.randint(1, 999))))
    left = spark.createDataFrame(left_rows, "k INT, t INT, tag STRING")
    right = spark.createDataFrame(right_rows, "k INT, t INT, v DOUBLE")
    rmap = {}
    for k, t, v in right_rows:
        rmap.setdefault(k, []).append((t, v))

    def brute(k, lt, direction, tol):
        if direction == "backward":
            cand = [(t, v) for t, v in rmap.get(k, []) if t <= lt]
            match = max(cand) if cand else None
        else:
            cand = [(t, v) for t, v in rmap.get(k, []) if t >= lt]
            match = min(cand) if cand else None
        if match is not None and tol is not None and abs(match[0] - lt) > tol:
            match = None
        return match

    for direction in ("backward", "forward"):
        for tol in (None, 3):
            out = asof_join(
                left, right, on=["k"], left_ts="t", right_ts="t",
                right_cols=["v"], tolerance_s=tol, direction=direction,
            ).collect()
            assert len(out) == len(left_rows)
            for r in out:
                want = brute(r.k, r.t, direction, tol)
                got = None if r.t_right is None else (r.t_right, r.v_right)
                assert got == want, (
                    f"{direction} tol={tol} k={r.k} t={r.t}: got {got}, want {want}"
                )
