"""End-to-end protocol test: remote-write -> store -> remote-read over real
HTTP (S1-S5 + read path + S9 metrics), mirroring a Prometheus client."""

from __future__ import annotations

import urllib.error
import urllib.request

import pytest

from remote_tsdb_clickhouse_spark import codec, prompb
from remote_tsdb_clickhouse_spark.plans.matchers import LabelMatcher, MatcherType
from remote_tsdb_clickhouse_spark.plans.read_plan import ReadHints, ReadQuery
from remote_tsdb_clickhouse_spark.server.http import AdapterApp, AdapterServer
from remote_tsdb_clickhouse_spark.sources.samples_store import SamplesStore
from remote_tsdb_clickhouse_spark.sources.writer import TimeseriesWriter


@pytest.fixture()
def server(spark, tmp_path):
    store = SamplesStore(spark, str(tmp_path / "samples"))
    app = AdapterApp(TimeseriesWriter(store), store.read)
    srv = AdapterServer(app).start()
    yield srv, app
    srv.stop()


def _post(port: int, path: str, body: bytes):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=body, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _get(port: int, path: str):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_write_read_roundtrip_over_http(server):
    srv, app = server
    write_req = prompb.WriteRequest(
        timeseries=[
            prompb.TimeSeries(
                labels=[
                    prompb.Label("__name__", "go_goroutines"),
                    prompb.Label("instance", "10.0.0.1:9100"),
                    prompb.Label("job", "omada"),
                ],
                samples=[
                    prompb.Sample(35.0, 1704067200500),
                    prompb.Sample(36.0, 1704067215000),
                ],
            )
        ]
    )
    status, _ = _post(srv.port, "/write", codec.encode_write_request(write_req))
    assert status == 200

    read_req = prompb.ReadRequest(
        queries=[
            ReadQuery(
                start_ms=1704067200000,
                end_ms=1704070800000,
                matchers=(
                    LabelMatcher(MatcherType.EQ, "__name__", "go_goroutines"),
                    LabelMatcher(MatcherType.EQ, "job", "omada"),
                    # routing label: silently ignored (F8)
                    LabelMatcher(MatcherType.EQ, "remote", "clickhouse"),
                ),
                hints=ReadHints(),
            )
        ]
    )
    status, body = _post(srv.port, "/read", codec.encode_read_request(read_req))
    assert status == 200
    resp = prompb.decode_read_response(codec.snappy_decompress(body))
    assert len(resp.results) == 1
    [series] = resp.results[0].timeseries
    assert series.labels[0] == prompb.Label("__name__", "go_goroutines")
    assert prompb.Label("job", "omada") in series.labels
    # ms truncated to whole seconds and re-expanded (write.go:49, read.go:92)
    assert [(s.value, s.timestamp) for s in series.samples] == [
        (35.0, 1704067200000),
        (36.0, 1704067215000),
    ]


def test_metrics_and_404(server):
    srv, app = server
    status, body = _get(srv.port, "/metrics")
    assert status == 200
    assert b"samples_written_total" in body
    status, body = _get(srv.port, "/nope")
    assert status == 404


def test_write_error_counted(server):
    srv, app = server
    status, _ = _post(srv.port, "/write", b"not snappy at all")
    assert status == 500
    assert app.metrics.write_errors_total.value == 1


def test_canceled_read_not_counted_as_error(spark, tmp_path):
    """context.Canceled parity (main.go:147-152): a client that disconnects
    mid-query is swallowed — no read-error increment, no 500."""
    from remote_tsdb_clickhouse_spark.plans.matchers import LabelMatcher, MatcherType
    from remote_tsdb_clickhouse_spark.plans.read_plan import ReadQuery

    def gone_provider():
        raise ConnectionResetError("client went away")

    store = SamplesStore(spark, str(tmp_path / "samples"))
    app = AdapterApp(TimeseriesWriter(store), gone_provider)
    rr = prompb.ReadRequest(
        queries=[ReadQuery(start_ms=0, matchers=(LabelMatcher(MatcherType.EQ, "__name__", "x"),))]
    )
    status, body = app.handle_read(codec.encode_read_request(rr))
    assert status == 499
    assert app.metrics.read_requests_total.value == 1
    assert app.metrics.read_errors_total.value == 0
    # a genuine failure still counts
    def broken_provider():
        raise RuntimeError("boom")

    app2 = AdapterApp(TimeseriesWriter(store), broken_provider)
    status, _ = app2.handle_read(codec.encode_read_request(rr))
    assert status == 500
    assert app2.metrics.read_errors_total.value == 1


def test_concurrent_writes_then_read(server):
    """Prometheus runs parallel remote-write shards; the threaded server
    submits Spark jobs from multiple handler threads.  All samples from
    concurrent writers must land, none double-counted."""
    import concurrent.futures

    srv, app = server

    def write_shard(shard: int):
        req = prompb.WriteRequest(
            timeseries=[
                prompb.TimeSeries(
                    labels=[
                        prompb.Label("__name__", "shard_metric"),
                        prompb.Label("shard", str(shard)),
                    ],
                    samples=[
                        prompb.Sample(float(k), 1704067200000 + k * 1000)
                        for k in range(5)
                    ],
                )
            ]
        )
        return _post(srv.port, "/write", codec.encode_write_request(req))

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(write_shard, range(4)))
    assert all(status == 200 for status, _ in results)
    assert app.metrics.samples_written_total.value == 20

    read_req = prompb.ReadRequest(
        queries=[
            ReadQuery(
                start_ms=1704067200000,
                matchers=(LabelMatcher(MatcherType.EQ, "__name__", "shard_metric"),),
            )
        ]
    )
    status, body = _post(srv.port, "/read", codec.encode_read_request(read_req))
    assert status == 200
    resp = prompb.decode_read_response(codec.snappy_decompress(body))
    series = resp.results[0].timeseries
    assert len(series) == 4  # one per shard
    assert all(len(ts.samples) == 5 for ts in series)
