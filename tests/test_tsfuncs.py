"""Operator-level edge cases for the PromQL-style function family (SURVEY §5
style: hand-built adversarial series, independent expected values).

Input shape is the grouped read result (metric_name, slb, t, max_0).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.functions.tsfuncs import (
    delta,
    increase,
    irate,
    range_aggregate,
    resets_changes,
)


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc)


@pytest.fixture(scope="module")
def grouped(spark):
    # series A: counter with one reset (5 -> 2); series B: single sample;
    # series C: constant (no changes)
    rows = [
        ("m", ["job=a"], _ts(10), 1.0),
        ("m", ["job=a"], _ts(20), 5.0),
        ("m", ["job=a"], _ts(30), 2.0),  # reset
        ("m", ["job=a"], _ts(40), 7.0),
        ("m", ["job=b"], _ts(10), 3.0),
        ("m", ["job=c"], _ts(10), 4.0),
        ("m", ["job=c"], _ts(25), 4.0),
    ]
    return spark.createDataFrame(rows, "metric_name string, slb array<string>, t timestamp, max_0 double")


def _by_series(df, value_cols):
    out = {}
    for r in df.collect():
        out[r["slb"][0]] = tuple(r[c] for c in value_cols)
    return out


def test_delta_last_minus_first(grouped):
    got = _by_series(delta(grouped), ["delta", "range_s", "n_samples"])
    assert got["job=a"] == (6.0, 30, 4)  # 7 - 1, ignores the interior reset
    assert got["job=b"] == (0.0, 0, 1)
    assert got["job=c"] == (0.0, 15, 2)


def test_increase_reset_adds_new_value(grouped):
    got = _by_series(increase(grouped), ["increase"])
    # 4 (1->5) + 2 (reset: counts the post-reset value) + 5 (2->7)
    assert got["job=a"] == (11.0,)
    assert got["job=b"] == (0.0,)  # single sample: no adjacency, defined 0
    assert got["job=c"] == (0.0,)


def test_resets_and_changes(grouped):
    got = _by_series(resets_changes(grouped), ["resets", "changes"])
    assert got["job=a"] == (1, 3)
    assert got["job=b"] == (0, 0)
    assert got["job=c"] == (0, 0)  # constant: adjacency exists, no change


def test_irate_uses_last_two_samples(grouped):
    got = {r["slb"][0]: r["irate"] for r in irate(grouped).collect()}
    assert got["job=a"] == pytest.approx((7.0 - 2.0) / 10)
    assert "job=b" not in got  # single sample: no rate
    assert got["job=c"] == pytest.approx(0.0)


def test_range_aggregate_floor_alignment(grouped):
    out = range_aggregate(grouped, 30).where(F.col("slb")[0] == "job=a").collect()
    buckets = {r["bucket_t"]: (r["avg_v"], r["min_v"], r["max_v"], r["n"]) for r in out}
    # t=10,20 -> bucket 0; t=30,40 -> bucket 30 (floor-aligned, not centered)
    assert buckets[0] == (3.0, 1.0, 5.0, 2)
    assert buckets[30] == (4.5, 2.0, 7.0, 2)


def test_label_replace_sets_capture_group(spark):
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import label_replace

    rows = [
        ("m", ["job=web", "user=42"], _ts(10), 1.0),   # match -> shard=4
        ("m", ["job=web", "user=7"], _ts(10), 1.0),    # match -> shard=7
        ("m", ["job=db"], _ts(10), 1.0),               # src absent -> unchanged
        ("m", ["shard=9", "user=31"], _ts(10), 1.0),   # existing dst replaced
    ]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    out = [
        sorted(r["slb"])
        for r in label_replace(df, "shard", "user", "([0-9])[0-9]*").collect()
    ]
    assert ["job=web", "shard=4", "user=42"] in out
    assert ["job=web", "shard=7", "user=7"] in out
    assert ["job=db"] in out  # untouched: no src label
    assert ["shard=3", "user=31"] in out  # dst overwritten, old shard=9 gone


def test_label_replace_no_match_unchanged(spark):
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import label_replace

    rows = [("m", ["user=abc"], _ts(10), 1.0)]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    out = label_replace(df, "shard", "user", "([0-9])[0-9]*").collect()
    assert out[0]["slb"] == ["user=abc"]  # anchored regex doesn't match


def test_label_replace_absent_src_matches_empty(spark):
    # Prometheus rule: an absent src label is the empty string, so a pattern
    # matching "" fires on series without the label
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import label_replace

    rows = [
        ("m", ["job=db"], _ts(10), 1.0),              # no user -> "" matches (d*)
        ("m", ["job=web", "user=42"], _ts(10), 1.0),  # user=42 matches -> 42
    ]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    out = {tuple(r["slb"]) for r in label_replace(df, "shard", "user", "([0-9]*)").collect()}
    # "" capture on the absent-src series -> empty expansion -> NO dst label
    assert ("job=db",) in out
    assert ("job=web", "shard=42", "user=42") in out


def test_label_replace_empty_expansion_drops_dst(spark):
    # Prometheus rule: an empty replacement value REMOVES dst (never a
    # dangling "dst=" entry)
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import label_replace

    rows = [("m", ["shard=9", "user=abc42"], _ts(10), 1.0)]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    # group 1 matches zero digits at the start of "abc42": empty expansion
    out = label_replace(df, "shard", "user", "([0-9]*)[a-z0-9]*").collect()
    assert out[0]["slb"] == ["user=abc42"]  # old shard=9 removed, none added


def test_quantile_over_time_discrete_indexing(spark):
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import quantile_over_time

    # 5 values: sorted [1,2,3,4,100]; p50 -> idx floor(4*0.5)=2 -> 3.0;
    # p95 -> floor(4*0.95)=3 -> 4.0 (discrete: an actual sample, not 80.8)
    rows = [("m", ["job=a"], _ts(10 * i), v) for i, v in enumerate([4.0, 1.0, 100.0, 3.0, 2.0])]
    rows += [("m", ["job=b"], _ts(10), 7.0)]  # single sample: both quantiles = it
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    got = {r["slb"][0]: r for r in quantile_over_time(df, [0.5, 0.95]).collect()}
    assert (got["job=a"]["p50"], got["job=a"]["p95"]) == (3.0, 4.0)
    assert got["job=a"]["n_samples"] == 5
    assert (got["job=b"]["p50"], got["job=b"]["p95"]) == (7.0, 7.0)


def test_label_join_fuses_sources(spark):
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import label_join

    rows = [
        ("m", ["tier=gold", "user=42"], _ts(10), 1.0),
        ("m", ["user=7"], _ts(10), 1.0),        # missing tier -> empty string
        ("m", ["ut=old", "user=1"], _ts(10), 1.0),  # existing dst replaced
    ]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    out = [sorted(r["slb"]) for r in label_join(df, "ut", "|", ["user", "tier"]).collect()]
    assert ["tier=gold", "user=42", "ut=42|gold"] in out
    assert ["user=7", "ut=7|"] in out
    assert ["user=1", "ut=1|"] in out  # ut=old gone


def test_count_values_inverts_value_to_key(spark):
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import count_values

    rows = [
        ("m", ["job=a"], _ts(10), 5.0),
        ("m", ["job=a"], _ts(20), 5.0),
        ("m", ["job=b"], _ts(10), 5.0),
        ("m", ["job=b"], _ts(20), 9.0),
    ]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    got = {r["value"]: (r["n_samples"], r["n_series"]) for r in count_values(df).collect()}
    assert got == {5.0: (3, 2), 9.0: (1, 1)}


def test_deriv_exact_on_a_line(spark):
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import deriv, predict_linear

    # y = 2 + 3*t_h (micro-exact): slope must be exactly 3e6 mu/hour and
    # the t=10h extrapolation exactly 32e6
    t0 = 1_000_000
    rows = [("m", ["job=a"], _ts(t0 + 3600 * k), 2.0 + 3.0 * k) for k in range(3)]
    rows += [("m", ["job=b"], _ts(t0), 1.0)]  # single sample: NULL slope
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    d = {r["slb"][0]: r for r in deriv(df, t0).collect()}
    assert d["job=a"]["slope_mu"] == 3_000_000.0
    assert d["job=b"]["slope_mu"] is None
    p = {r["slb"][0]: r for r in predict_linear(df, t0, 10).collect()}
    assert p["job=a"]["predicted_mu"] == 32_000_000.0
    assert p["job=b"]["predicted_mu"] is None


def test_histogram_quantile_prometheus_rules(spark):
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import (
        histogram_buckets,
        histogram_quantile,
    )

    # values 1,2,5,20 with bounds [4,16]: cum = [2,3], total 4
    rows = [("m", ["job=a"], _ts(10 * i), v) for i, v in enumerate([1.0, 2.0, 5.0, 20.0])]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    buckets = {
        r["le"]: r["cum"] for r in histogram_buckets(df, [4, 16]).collect()
    }
    assert buckets == {4.0: 2, 16.0: 3, float("inf"): 4}
    # q=1/2: rank lands exactly at the first bucket's upper edge -> 4.0
    q50 = histogram_quantile(df, 1, 2, [4, 16]).collect()[0]
    assert q50["q_mu"] == 4_000_000
    # q=3/4: rank 3 is the last sample of the (4,16] bucket -> 16.0
    q75 = histogram_quantile(df, 3, 4, [4, 16]).collect()[0]
    assert q75["q_mu"] == 16_000_000
    # q=1: rank lands in the +Inf bucket -> highest finite bound
    q100 = histogram_quantile(df, 1, 1, [4, 16]).collect()[0]
    assert q100["q_mu"] == 16_000_000
    # first-bucket interpolation starts from lower bound 0: q=1/4 -> rank 1
    # of 2 first-bucket samples -> 4 * (1/2) = 2.0
    q25 = histogram_quantile(df, 1, 4, [4, 16]).collect()[0]
    assert q25["q_mu"] == 2_000_000


def test_exp_smooth_constant_series_identity(spark):
    """Weights sum to exactly 1: a constant series' scaled level equals
    value_micro << 20 bit-exactly, at every history length (including
    shorter than the window)."""
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import exp_smooth

    rows = []
    for n, val in [(3, 2.5), (21, 0.125), (40, 7.0)]:
        rows += [(f"m{n}", ["k=v"], float(t), val) for t in range(n)]
    grouped = spark.createDataFrame(
        rows, "metric_name STRING, slb ARRAY<STRING>, t DOUBLE, max_0 DOUBLE"
    )
    out = {r.metric_name: r for r in exp_smooth(grouped, window_n=21).collect()}
    assert out["m3"].n_used == 3 and out["m21"].n_used == 21 and out["m40"].n_used == 21
    for n, val in [(3, 2.5), (21, 0.125), (40, 7.0)]:
        assert out[f"m{n}"].smooth_scaled == (int(val * 1_000_000) << 20), n


def test_stddev_over_time_exactness(spark):
    """Hand-checkable bucket: values {1, 3} -> mean 2, variance 1,
    stddev_micro exactly 1_000_000; last_v is the latest value."""
    from remote_tsdb_clickhouse_spark.functions.tsfuncs import stddev_over_time

    grouped = spark.createDataFrame(
        [("m", ["k=v"], 10.0, 1.0), ("m", ["k=v"], 20.0, 3.0)],
        "metric_name STRING, slb ARRAY<STRING>, t DOUBLE, max_0 DOUBLE",
    )
    (r,) = stddev_over_time(grouped, 3600).collect()
    assert r.n == 2 and r.sum_micro == 4_000_000
    assert r.stddev_micro == 1_000_000
    assert r.last_v == 3.0


def test_randomized_sweep_vs_reference(spark):
    """Seeded 150-series randomized sweep: delta / increase /
    resets_changes against independently written Python references of the
    PromQL semantics.  Series are independent groups, so one call per
    operator covers every generated scenario (single samples, monotone
    counters, multiple resets, constants).  Integer-valued doubles keep
    the decimal-exact aggregation comparison bit-exact."""
    import random

    rng = random.Random(7)
    rows = []
    series = {}
    for s in range(150):
        slb = [f"case={s}"]
        ts = sorted(rng.sample(range(0, 3600, 10), rng.randint(1, 8)))
        vals = []
        v = float(rng.randint(0, 50))
        for _ in ts:
            if vals and rng.random() < 0.25:  # counter reset
                v = float(rng.randint(0, 5))
            else:
                v += float(rng.randint(0, 20))
            vals.append(v)
        series[s] = list(zip(ts, vals))
        rows += [("m", slb, _ts(t), val) for t, val in series[s]]
    g = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )

    def ref(pts):
        ts = [t for t, _ in pts]
        vs = [v for _, v in pts]
        dv = [b - a for a, b in zip(vs, vs[1:])]
        return {
            "delta": (vs[-1] - vs[0], max(ts) - min(ts), len(pts)),
            "increase": sum(v2 if d < 0 else d for d, (_, v2) in zip(dv, pts[1:])),
            "resets": sum(1 for d in dv if d < 0),
            "changes": sum(1 for d in dv if d != 0),
        }

    want = {s: ref(pts) for s, pts in series.items()}

    got_d = {int(r.slb[0][5:]): (r.delta, r.range_s, r.n_samples)
             for r in delta(g).collect()}
    got_i = {int(r.slb[0][5:]): r.increase for r in increase(g).collect()}
    got_rc = {int(r.slb[0][5:]): (r.resets, r.changes)
              for r in resets_changes(g).collect()}
    assert set(got_d) == set(want)
    for s, w in want.items():
        assert got_d[s] == w["delta"], (s, got_d[s], w["delta"])
        assert got_i[s] == w["increase"], (s, got_i[s], w["increase"])
        assert got_rc[s] == (w["resets"], w["changes"]), (s, got_rc[s], w)


def test_histogram_quantile_randomized_sweep(spark):
    """Seeded 150-series sweep of histogram_quantile across five quantiles
    vs a forward-scan Python reference of the Prometheus rules (first
    bucket whose cumulative count reaches the rank; first-bucket
    interpolation from 0; +Inf rank returns the highest finite bound) —
    the Spark side is a reversed CASE chain over wide cum columns, so the
    two walk the buckets in opposite orders and share no code."""
    import random

    from remote_tsdb_clickhouse_spark.functions.tsfuncs import histogram_quantile

    rng = random.Random(11)
    bounds = [4, 16, 32]
    rows, series = [], {}
    for s in range(150):
        vals = [float(rng.randint(0, 40)) for _ in range(rng.randint(1, 12))]
        series[s] = vals
        rows += [("m", [f"case={s}"], _ts(10 * i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )

    def ref(vals, q_num, q_den):
        total = len(vals)
        cums = [sum(1 for v in vals if v <= b) for b in bounds]
        rank = q_num * total
        cum_lo, lo = 0, 0
        for i, cum in enumerate(cums):
            if rank <= q_den * cum:
                hi = bounds[i]
                n = cum - cum_lo
                return lo * 10**6 + ((hi - lo) * 10**6 * (rank - q_den * cum_lo)) // (
                    q_den * n
                )
            cum_lo, lo = cum, bounds[i]
        return bounds[-1] * 10**6

    for q_num, q_den in [(1, 4), (1, 2), (3, 4), (9, 10), (1, 1)]:
        got = {
            int(r.slb[0][5:]): r.q_mu
            for r in histogram_quantile(df, q_num, q_den, bounds).collect()
        }
        for s, vals in series.items():
            assert got[s] == ref(vals, q_num, q_den), (
                f"q={q_num}/{q_den} case={s} vals={vals}: "
                f"got {got[s]}, want {ref(vals, q_num, q_den)}"
            )


def test_quantile_over_time_randomized_sweep(spark):
    """Seeded 150-series sweep of the discrete (type-1) quantiles vs a
    sorted-list index reference, including q=0.0/1.0 edges, heavy ties,
    and single-sample series — both sides use IEEE doubles for the
    floor((n-1)*q) index so the comparison is bit-exact."""
    import math
    import random

    from remote_tsdb_clickhouse_spark.functions.tsfuncs import quantile_over_time

    rng = random.Random(13)
    qs = [0.0, 0.25, 0.5, 0.9, 0.95, 1.0]
    rows, series = [], {}
    for s in range(150):
        vals = [float(rng.randint(0, 9)) for _ in range(rng.randint(1, 15))]
        series[s] = vals
        rows += [("m", [f"case={s}"], _ts(10 * i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )
    out = quantile_over_time(df, qs).collect()
    assert len(out) == len(series)
    names = [f"p{str(q).replace('0.', '').ljust(2, '0')}" for q in qs]
    for r in out:
        vals = sorted(series[int(r.slb[0][5:])])
        assert r.n_samples == len(vals)
        for q, name in zip(qs, names):
            want = vals[math.floor((len(vals) - 1) * q)]
            assert r[name] == want, (r.slb, q, r[name], want, vals)


def test_rate_and_range_aggregate_randomized_sweep(spark):
    """Seeded 150-series sweep: per_second_rate (adjacent pairs, resets to
    NULL, first sample dropped), irate (last pair only), and
    range_aggregate (floor-aligned buckets, decimal-exact avg) against
    plain Python references.  Integer values and timestamps keep every
    compared double exact."""
    import random

    from remote_tsdb_clickhouse_spark.functions.tsfuncs import (
        per_second_rate as psr,
    )

    rng = random.Random(17)
    rows, series = [], {}
    for s in range(150):
        ts = sorted(rng.sample(range(0, 600, 5), rng.randint(1, 10)))
        vals = [float(rng.randint(0, 100)) for _ in ts]
        series[s] = list(zip(ts, vals))
        rows += [("m", [f"case={s}"], _ts(t), v) for t, v in series[s]]
    g = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )

    def pair_rates(pts):
        return {
            t2: (None if v2 - v1 < 0 else (v2 - v1) / (t2 - t1))
            for (t1, v1), (t2, v2) in zip(pts, pts[1:])
        }

    got_rate = {}
    for r in psr(g).withColumn("te", F.col("t").cast("long")).collect():
        got_rate.setdefault(int(r.slb[0][5:]), {})[r.te] = r.rate
    for s, pts in series.items():
        assert got_rate.get(s, {}) == pair_rates(pts), (s, pts)

    got_irate = {int(r.slb[0][5:]): r.irate for r in irate(g).collect()}
    for s, pts in series.items():
        want = pair_rates(pts)
        if want:
            assert got_irate[s] == want[pts[-1][0]], (s, pts)
        else:
            assert s not in got_irate  # single sample: no irate row

    out = range_aggregate(g, 60).collect()
    got_ra = {(int(r.slb[0][5:]), int(r.bucket_t)): r for r in out}
    want_ra = {}
    for s, pts in series.items():
        buckets = {}
        for t, v in pts:
            buckets.setdefault(t - t % 60, []).append(v)
        for b, vs in buckets.items():
            want_ra[(s, b)] = (sum(vs) / len(vs), min(vs), max(vs), len(vs))
    assert set(got_ra) == set(want_ra)
    for k, w in want_ra.items():
        r = got_ra[k]
        assert (r.avg_v, r.min_v, r.max_v, r.n) == w, (k, r, w)


def test_mad_over_time_randomized_sweep(spark):
    """Seeded 150-series sweep of the two-stage discrete median (median of
    values, then median of absolute deviations) vs a sorted-list index
    reference — integer values keep the single IEEE subtraction exact, so
    the comparison is bit-exact including even/odd lengths and ties."""
    import random

    from remote_tsdb_clickhouse_spark.functions.tsfuncs import mad_over_time

    rng = random.Random(29)
    rows, series = [], {}
    for s in range(150):
        vals = [float(rng.randint(0, 20)) for _ in range(rng.randint(1, 13))]
        series[s] = vals
        rows += [("m", [f"case={s}"], _ts(10 * i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "metric_name string, slb array<string>, t timestamp, max_0 double"
    )

    def disc_median(vs):
        vs = sorted(vs)
        return vs[(len(vs) - 1) // 2]

    out = mad_over_time(df).collect()
    assert len(out) == len(series)
    for r in out:
        vals = series[int(r.slb[0][5:])]
        med = disc_median(vals)
        mad = disc_median([abs(v - med) for v in vals])
        assert (r.n_samples, r.median_v, r.mad_v) == (len(vals), med, mad), (
            r.slb, vals, med, mad, r)


def test_label_replace_randomized_sweep(spark):
    """Seeded 150-labelset sweep of label_replace across five patterns vs
    a Python re.fullmatch reference of the Prometheus rules: anchored
    match on src (absent src = empty string), dst set to capture group 1
    replacing any existing dst, empty expansion removes dst, no match
    passes the series through unchanged, labelset stays sorted."""
    import random
    import re as pyre

    from remote_tsdb_clickhouse_spark.functions.tsfuncs import label_replace

    rng = random.Random(31)
    values = ["", "42", "7", "abc", "abc42", "9x", "x=y", "00", "z"]
    cases = []
    for s in range(150):
        labels = [f"case={s}"]
        if rng.random() < 0.8:
            labels.append(f"user={rng.choice(values)}")
        if rng.random() < 0.4:
            labels.append(f"shard={rng.choice(values)}")
        if rng.random() < 0.3:
            labels.append(f"job={rng.choice(['web', 'db'])}")
        cases.append(sorted(labels))
    df = spark.createDataFrame(
        [("m", lb, _ts(1), 1.0) for lb in cases],
        "metric_name string, slb array<string>, t timestamp, max_0 double",
    )

    def ref(labels, dst, src, pattern):
        sv = next((x[len(src) + 1:] for x in labels if x.startswith(src + "=")), "")
        m = pyre.fullmatch(f"(?:{pattern})", sv)
        if not m:
            return list(labels)
        cap = m.group(1) or ""
        out = [x for x in labels if not x.startswith(dst + "=")]
        if cap:
            out = sorted(out + [f"{dst}={cap}"])
        return out

    for pattern in ["([0-9])[0-9]*", "([0-9]*)", "([a-z]+)[0-9]*",
                    "(x|y)z?.*", "(.*)"]:
        got = {r.case_key: list(r.slb) for r in
               label_replace(df, "shard", "user", pattern)
               .withColumn("case_key", F.filter("slb", lambda x: x.like("case=%"))[0])
               .select("case_key", "slb").collect()}
        for lb in cases:
            key = lb[0] if lb[0].startswith("case=") else next(
                x for x in lb if x.startswith("case="))
            assert got[key] == ref(lb, "shard", "user", pattern), (
                pattern, lb, got[key], ref(lb, "shard", "user", pattern))


def test_regression_family_randomized_sweep(spark):
    """Seeded randomized sweep of deriv / predict_linear / exp_smooth /
    stddev_over_time against Python references built from the documented
    semantics (integer micro-unit quantization, exact int sufficient
    statistics, the same fixed IEEE expression trees).  Series include
    single samples and zero-time-variance cases (NULL slope), histories
    shorter and longer than the smoothing window, and multi-bucket spans.
    Python ints are arbitrary-precision, so the references are exact where
    the implementations use DECIMAL — agreement checks the quantization
    and the expression-tree shape, bit for bit."""
    import math
    import random

    from remote_tsdb_clickhouse_spark.functions.tsfuncs import (
        deriv,
        exp_smooth,
        predict_linear,
        stddev_over_time,
    )

    rng = random.Random(1511)
    t0, unit, window_n, bucket_s, tp = 1_704_067_200, 60, 5, 600, 100
    series = {}
    for s in range(60):
        kind = rng.random()
        if kind < 0.1:
            ts = [t0 + rng.randrange(3 * 3600)]  # single sample -> NULL slope
        elif kind < 0.2:
            # all samples inside one time unit -> den == 0 -> NULL slope
            base = t0 + rng.randrange(50) * unit
            ts = sorted(rng.sample(range(base, base + unit), rng.randint(2, 5)))
        else:
            ts = sorted(rng.sample(range(t0, t0 + 3 * 3600), rng.randint(2, 12)))
        series[s] = [(t, round(rng.uniform(0, 1000), 3)) for t in ts]

    rows = [
        ("m", [f"case={s}"], float(t), v)
        for s, pts in series.items()
        for t, v in pts
    ]
    g = spark.createDataFrame(
        rows, "metric_name STRING, slb ARRAY<STRING>, t DOUBLE, max_0 DOUBLE"
    )

    def stats(pts):
        tt = [int((t - t0) / unit) for t, _ in pts]
        yy = [math.floor(v * 1_000_000) for _, v in pts]
        n = len(pts)
        st, sy = sum(tt), sum(yy)
        sty = sum(a * b for a, b in zip(tt, yy))
        stt = sum(a * a for a in tt)
        return n, st, sy, sty, stt

    got = {int(r.slb[0][5:]): r.slope_mu for r in deriv(g, t0, unit).collect()}
    gotp = {int(r.slb[0][5:]): r.predicted_mu
            for r in predict_linear(g, t0, tp, unit).collect()}
    for s, pts in series.items():
        n, st, sy, sty, stt = stats(pts)
        num, den = n * sty - st * sy, n * stt - st * st
        if den > 0:
            slope = float(num) / float(den)
            pred = float(sy) / float(n) + slope * (float(tp) - float(st) / float(n))
            assert got[s] == slope, s
            assert gotp[s] == pred, s
        else:
            assert got[s] is None and gotp[s] is None, s

    S = window_n - 1
    gote = {int(r.slb[0][5:]): (r.n_used, r.smooth_scaled)
            for r in exp_smooth(g, window_n=window_n).collect()}
    for s, pts in series.items():
        recent = sorted(pts, key=lambda p: -p[0])[:window_n]
        k = len(recent)
        total = 0
        for rn, (_, v) in enumerate(recent, start=1):
            iv = math.floor(v * 1_000_000)
            total += iv << (S - rn if rn < k else window_n - k)
        assert gote[s] == (k, total), s

    gots = {}
    for r in stddev_over_time(g, bucket_s).collect():
        gots[(int(r.slb[0][5:]), r.bucket_t)] = (
            r.n, r.sum_micro, r.stddev_micro, r.last_v
        )
    want = {}
    for s, pts in series.items():
        buckets = {}
        for t, v in pts:
            buckets.setdefault(t - t % bucket_s, []).append((t, v))
        for b, bp in buckets.items():
            iv = [math.floor(v * 1_000_000) for _, v in bp]
            n, sm, q = len(iv), sum(iv), sum(x * x for x in iv)
            var = (float(q) - float(sm) * float(sm) / float(n)) / float(n)
            want[(s, b)] = (
                n, sm, math.floor(math.sqrt(max(var, 0.0))),
                max(bp)[1],
            )
    assert gots == want


def test_label_join_count_values_buckets_randomized_sweep(spark):
    """Seeded randomized sweep for label_join, count_values, and the
    cumulative histogram builders vs Python references of the PromQL
    semantics.  label_join cases include missing sources (empty-string
    contribution), dst already present (replaced), dst being one of the
    sources, and separators that appear inside label values; the labelset
    must stay sorted.  count_values checks the value-to-key inversion
    with exact double equality; histogram_buckets checks cumulative
    counts per le bound including the +Inf row."""
    import random

    from remote_tsdb_clickhouse_spark.functions.tsfuncs import (
        count_values,
        histogram_buckets,
        label_join,
    )

    rng = random.Random(1607)
    keys = ["a", "b", "c", "dst"]
    vals = ["x", "y-z", "p-q-r", "", "m"]
    rows, labelsets = [], []
    for s in range(40):
        labs = sorted(
            f"{k}={rng.choice(vals)}" for k in rng.sample(keys, rng.randint(0, 4))
        )
        labelsets.append(labs)
        for _ in range(rng.randint(1, 4)):
            # small value pool -> plenty of exact-double collisions
            rows.append(("m", labs, float(rng.randrange(300)), float(rng.choice([0.5, 1.5, 2.5, 7.25]))))
    g = spark.createDataFrame(
        rows, "metric_name STRING, slb ARRAY<STRING>, t DOUBLE, max_0 DOUBLE"
    )

    def py_label_value(labs, name):
        for kv in labs:
            k, _, v = kv.partition("=")
            if k == name:
                return v
        return None

    srcs, sep, dst = ["a", "dst", "b"], "-", "dst"
    got = {tuple(r.orig): tuple(r.slb) for r in
           label_join(g.withColumn("orig", F.col("slb")), dst, sep, srcs).collect()}
    for labs in labelsets:
        joined = sep.join(py_label_value(labs, s) or "" for s in srcs)
        want = tuple(sorted([kv for kv in labs if not kv.startswith("dst=")]
                            + [f"dst={joined}"]))
        assert got[tuple(labs)] == want, labs

    got_cv = {(r.metric_name, r.value): (r.n_samples, r.n_series)
              for r in count_values(g).collect()}
    want_cv = {}
    for name, labs, _, v in rows:
        ns, sset = want_cv.setdefault((name, v), [0, set()])
        want_cv[(name, v)][0] += 1
        sset.add(tuple(labs))
    assert got_cv == {k: (n, len(ss)) for k, (n, ss) in want_cv.items()}

    bounds = [1, 2, 5]
    got_hb = {}
    for r in histogram_buckets(g, bounds).collect():
        got_hb[(tuple(r.slb), r.le)] = r.cum
    for labs in set(tuple(ls) for ls in labelsets):
        vs = [v for _, ls, _, v in rows if tuple(ls) == labs]
        if not vs:
            continue
        for le in [1.0, 2.0, 5.0, float("inf")]:
            assert got_hb[(labs, le)] == sum(1 for v in vs if v <= le), (labs, le)
