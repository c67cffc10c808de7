"""Read path: downsampling policy (A2), grouped max (A1), series assembly (O2)."""

from __future__ import annotations

from datetime import datetime

from remote_tsdb_clickhouse_spark.plans.matchers import LabelMatcher, MatcherType
from remote_tsdb_clickhouse_spark.plans.read_plan import (
    ReadHints,
    ReadQuery,
    downsample_interval_seconds,
    read_query_df,
    read_query_grouped,
)

EQ = MatcherType.EQ
START = int(datetime(2024, 1, 1).timestamp() * 1000)  # tz-naive ok: UTC session


def ms(h=0, mi=0, s=0):
    return START + ((h * 60 + mi) * 60 + s) * 1000


def test_downsample_policy_exact():
    # threshold: strictly greater than 2000 ms
    assert downsample_interval_seconds(ReadHints(step_ms=0)) is None
    assert downsample_interval_seconds(ReadHints(step_ms=2000)) is None
    # 2001 -> half=1000ms -> 1s
    assert downsample_interval_seconds(ReadHints(step_ms=2001)) == 1
    # 60000 -> 30000 -> 30s
    assert downsample_interval_seconds(ReadHints(step_ms=60000)) == 30
    # range smaller than step wins: min(60000, 10000)/2/1000 = 5
    assert downsample_interval_seconds(ReadHints(step_ms=60000, range_ms=10000)) == 5
    # range = 0 ignored; range >= step ignored
    assert downsample_interval_seconds(ReadHints(step_ms=60000, range_ms=0)) == 30
    assert downsample_interval_seconds(ReadHints(step_ms=60000, range_ms=70000)) == 30
    # floor at 1s: step 2400 -> 1200ms -> 1s
    assert downsample_interval_seconds(ReadHints(step_ms=2400)) == 1
    # ignore_hints kills it
    assert downsample_interval_seconds(ReadHints(step_ms=60000), ignore_hints=True) is None


def test_grouped_max_dedup(spark, samples_df):
    # duplicate (series, ts) rows collapse under max (A1)
    q = ReadQuery(start_ms=0, matchers=(LabelMatcher(EQ, "__name__", "go_goroutines"),))
    rows = read_query_grouped(samples_df, q).collect()
    node = [r for r in rows if "job=node" in r["slb"]]
    by_t = {r["t"]: r["max_0"] for r in node}
    assert by_t[datetime(2024, 1, 1, 0, 0, 15)] == 13.0  # max(11, 13)
    assert len(node) == 2  # two distinct timestamps


def test_time_bounds_inclusive(spark, samples_df):
    q = ReadQuery(
        start_ms=ms(s=15),
        end_ms=ms(s=30),
        matchers=(LabelMatcher(EQ, "__name__", "go_goroutines"),),
    )
    rows = read_query_grouped(samples_df, q).collect()
    ts_seen = sorted({r["t"] for r in rows})
    assert ts_seen == [datetime(2024, 1, 1, 0, 0, 15), datetime(2024, 1, 1, 0, 0, 30)]


def test_end_ms_zero_means_unbounded(spark, samples_df):
    q = ReadQuery(start_ms=0, end_ms=0, matchers=())
    assert read_query_grouped(samples_df, q).count() > 0


def test_series_assembly_sorted(spark, samples_df):
    # out-of-order http_requests_total series comes back time-ascending
    q = ReadQuery(start_ms=0, matchers=(LabelMatcher(EQ, "job", "api"),))
    rows = read_query_df(samples_df, q).collect()
    assert len(rows) == 1
    samples = rows[0]["samples"]
    ts_list = [s["t"] for s in samples]
    assert ts_list == sorted(ts_list)
    assert [s["v"] for s in samples] == [5.0, 7.0]
    assert rows[0]["slb"] == ["job=api", "le=0.5"]


def test_labels_resorted_on_read(spark, samples_df):
    # 'up' was written with unsorted labels; read canonicalizes (P2)
    q = ReadQuery(start_ms=0, matchers=(LabelMatcher(EQ, "__name__", "up"),))
    rows = read_query_df(samples_df, q).collect()
    assert rows[0]["slb"] == ["instance=10.0.0.1:9100", "job=omada"]


def test_downsampled_bucket_max(spark, samples_df):
    # 60s step -> 30s buckets: go_goroutines omada {0,15}->bucket 0, {30}->bucket 30
    q = ReadQuery(
        start_ms=0,
        matchers=(LabelMatcher(EQ, "job", "omada"), LabelMatcher(EQ, "__name__", "go_goroutines")),
        hints=ReadHints(step_ms=60000),
    )
    rows = read_query_grouped(samples_df, q).collect()
    by_t = {r["t"]: r["max_0"] for r in rows}
    assert by_t == {
        datetime(2024, 1, 1, 0, 0, 0): 36.0,  # max(35@0s, 36@15s)
        datetime(2024, 1, 1, 0, 0, 30): 37.0,
    }
