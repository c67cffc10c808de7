"""CLI daemon entrypoint — the reference's front door (``main.go:76-121``).

``python -m remote_tsdb_clickhouse_spark.server --http 9131 --store /data/samples``
starts the Prometheus remote-storage adapter as a process: flag surface,
``:port`` address normalization (``main.go:93-95``), fail-fast storage check
(the ``db.Ping()`` analog, ``conn.go:62-64``), then serve forever.

Two storage legs, matching the reference's flag surface (``main.go:82-90``):

- ``--store PATH`` — the Spark-native parquet samples store (engine and
  storage both Spark; ``-table``'s role is the path).
- ``--db ADDR`` (+ ``--db.database/--db.username/--db.password``,
  ``--table``) — the reference's exact deployment shape: Spark is the
  engine, ClickHouse is the storage.  ``ADDR`` is the ClickHouse **HTTP
  interface** (default port 8123) because the writer ships JSONEachRow over
  HTTP (``sources/clickhouse.py``), not clickhouse-go's native TCP.

``--read.*`` flags are kept verbatim; ``--debug`` maps to Spark INFO logs
(zap debug analog, ``main.go:91``).
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="remote-tsdb-clickhouse-spark",
        description="Prometheus remote-storage adapter backed by Spark",
    )
    p.add_argument(
        "--http",
        default="9131",
        help="listen on this [address:]port (main.go:84)",
    )
    p.add_argument(
        "--store",
        default=None,
        help="parquet samples table path (Spark-native storage leg)",
    )
    p.add_argument(
        "--db",
        default=None,
        help="ClickHouse storage leg: HTTP interface at this address[:port] "
        "(main.go:85; port defaults to 8123)",
    )
    p.add_argument(
        "--db.database",
        dest="db_database",
        default="default",
        help="ClickHouse database (main.go:86)",
    )
    p.add_argument(
        "--db.username",
        dest="db_username",
        default="default",
        help="ClickHouse username (main.go:87)",
    )
    p.add_argument(
        "--db.password",
        dest="db_password",
        default="",
        help="ClickHouse password (main.go:88)",
    )
    p.add_argument(
        "--table",
        default="metrics.samples",
        help="write to this database.tablename (main.go:89)",
    )
    p.add_argument(
        "--read.ignore-label",
        dest="read_ignore_label",
        default="remote=clickhouse",
        help="ignore this label in read requests (main.go:90); empty disables",
    )
    p.add_argument(
        "--read.ignore-hints",
        dest="read_ignore_hints",
        action="store_true",
        help="ignore step/range hints in read requests (main.go:91)",
    )
    p.add_argument(
        "--debug",
        action="store_true",
        help="verbose engine logs (main.go:92)",
    )
    p.add_argument(
        "--create-if-missing",
        action="store_true",
        help="allow an empty/nonexistent store path instead of failing fast",
    )
    args = p.parse_args(argv)
    if (args.store is None) == (args.db is None):
        p.error("exactly one of --store (parquet) or --db (ClickHouse) is required")
    # ':port' normalization (main.go:93-95)
    if ":" not in args.http:
        args.http = ":" + args.http
    return args


def _store_exists(spark, path: str) -> bool:
    """Probe the store path through the Hadoop FileSystem API so non-local
    URIs (s3a://, hdfs://) that Spark can serve are accepted — a plain
    ``os.path.isdir`` would spuriously reject them."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def build_server(args: argparse.Namespace, spark=None, http=None):
    """Construct (but don't start) the AdapterServer — separable for tests.

    ``http`` (optional) is injected into the ClickHouse leg so tests can run
    against a fake transport."""
    from remote_tsdb_clickhouse_spark.server.http import AdapterApp, AdapterServer
    from remote_tsdb_clickhouse_spark.session import get_spark

    spark = spark or get_spark("remote-tsdb-clickhouse-spark")
    if args.debug:
        spark.sparkContext.setLogLevel("INFO")

    if args.db is not None:
        from remote_tsdb_clickhouse_spark.sources.clickhouse import (
            ClickHouseRequestWriter,
            ClickHouseStore,
        )

        addr = args.db if ":" in args.db else f"{args.db}:8123"
        store = ClickHouseStore(
            spark,
            base_url=f"http://{addr}",
            table=args.table,
            database=args.db_database,
            username=args.db_username,
            password=args.db_password,
            http=http,
        )
        # immediately try to connect with the provided credentials, fail
        # fast (conn.go:62-64)
        try:
            store.ping()
        except ConnectionError as e:
            raise SystemExit(str(e)) from e
        writer = ClickHouseRequestWriter(store)
        # executor-side range-split scan, not the driver-side bring-up fetch
        provider = store.read_parallel
        from remote_tsdb_clickhouse_spark.sources.clickhouse import pushdown_read_request

        # the reference's serving loop: /read ships matcher+downsample SQL
        # to ClickHouse and run-length assembles the ordered rows
        # (read.go:15-101); Spark keeps ingest/analytics
        def read_handler(req):
            return pushdown_read_request(
                store,
                req,
                ignore_label=args.read_ignore_label or None,
                ignore_hints=args.read_ignore_hints,
            )
    else:
        from remote_tsdb_clickhouse_spark.sources.samples_store import SamplesStore
        from remote_tsdb_clickhouse_spark.sources.writer import TimeseriesWriter

        store = SamplesStore(spark, args.store)
        # fail-fast storage check, the db.Ping() analog: an unreadable or
        # absent table is a config error surfaced at startup, not on the
        # first request
        if not args.create_if_missing and not _store_exists(spark, args.store):
            raise SystemExit(
                f"store path {args.store!r} does not exist (use --create-if-missing)"
            )
        writer = TimeseriesWriter(store)
        provider = store.read
        read_handler = None

    app = AdapterApp(
        writer,
        provider,
        ignore_label=args.read_ignore_label or None,
        ignore_hints=args.read_ignore_hints,
        read_request_handler=read_handler,
    )
    host, _, port = args.http.rpartition(":")
    return AdapterServer(app, host=host or "0.0.0.0", port=int(port))


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv)
    server = build_server(args)
    # the zap "listening" line (main.go:155-160)
    backend = f"db={args.db} table={args.table}" if args.db else f"store={args.store}"
    print(f"listening addr={args.http} {backend}", file=sys.stderr, flush=True)
    server.start()
    try:
        server.join()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
