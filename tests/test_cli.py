"""CLI daemon entrypoint (reference ``main.go:82-95``): flag surface,
``:port`` normalization, fail-fast store check, and an end-to-end
write/read over the server it builds.

The server is built in-process against the session SparkSession (a
subprocess would pay a second ~20 s JVM spin-up for no extra coverage —
``build_server`` is exactly what ``main()`` runs after arg parsing)."""

from __future__ import annotations

import pytest

from remote_tsdb_clickhouse_spark import codec, prompb
from remote_tsdb_clickhouse_spark.server.__main__ import build_server, parse_args


def test_port_normalization():
    assert parse_args(["--store", "/tmp/x", "--http", "9131"]).http == ":9131"
    assert parse_args(["--store", "/tmp/x", "--http", "0.0.0.0:9131"]).http == "0.0.0.0:9131"


def test_flag_surface_defaults():
    args = parse_args(["--store", "/tmp/x"])
    assert args.read_ignore_label == "remote=clickhouse"  # main.go:88 default
    assert args.read_ignore_hints is False


def test_fail_fast_on_missing_store(spark, tmp_path):
    args = parse_args(["--store", str(tmp_path / "nope"), "--http", "127.0.0.1:0"])
    with pytest.raises(SystemExit, match="does not exist"):
        build_server(args, spark=spark)


def test_cli_server_write_read_roundtrip(spark, tmp_path):
    import urllib.request

    args = parse_args(
        [
            "--store",
            str(tmp_path / "samples"),
            "--http",
            "127.0.0.1:0",  # ephemeral port
            "--create-if-missing",
            "--read.ignore-hints",
        ]
    )
    srv = build_server(args, spark=spark).start()
    try:
        wr = prompb.WriteRequest(
            timeseries=[
                prompb.TimeSeries(
                    labels=[
                        prompb.Label("__name__", "up"),
                        prompb.Label("job", "cli"),
                    ],
                    samples=[prompb.Sample(1.0, 1704067200000)],
                )
            ]
        )
        url = f"http://127.0.0.1:{srv.port}"
        req = urllib.request.Request(
            f"{url}/write", data=codec.encode_write_request(wr), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        from remote_tsdb_clickhouse_spark.plans.matchers import LabelMatcher, MatcherType
        from remote_tsdb_clickhouse_spark.plans.read_plan import ReadQuery

        rr = prompb.ReadRequest(
            queries=[
                ReadQuery(
                    start_ms=1704067200000,
                    end_ms=1704070800000,
                    matchers=(LabelMatcher(MatcherType.EQ, "__name__", "up"),),
                )
            ]
        )
        req = urllib.request.Request(
            f"{url}/read", data=codec.encode_read_request(rr), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            resp = prompb.decode_read_response(codec.snappy_decompress(r.read()))
        series = resp.results[0].timeseries
        assert len(series) == 1
        assert ("job", "cli") in [(lb.name, lb.value) for lb in series[0].labels]
        assert series[0].samples[0].value == 1.0
    finally:
        srv.stop()
