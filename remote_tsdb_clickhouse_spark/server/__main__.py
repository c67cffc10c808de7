"""CLI daemon entrypoint — the reference's front door (``main.go:82-95``).

``python -m remote_tsdb_clickhouse_spark.server --http 9131 --store /data/samples``
starts the Prometheus remote-storage adapter as a process: flag surface,
``:port`` address normalization (``main.go:93-95``), fail-fast storage check
(the ``db.Ping()`` analog, ``conn.go:62-64``), then serve forever.

Flag mapping vs the reference: ``-db/-db.*`` configured the ClickHouse
connection; here the storage backend is the parquet samples store, so
``--store`` takes the table path (``-table``'s role).  ``--read.*`` flags
are kept verbatim.
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
        required=True,
        help="samples table path (the -table analog)",
    )
    p.add_argument(
        "--read.ignore-label",
        dest="read_ignore_label",
        default="remote=clickhouse",
        help="ignore this label in read requests (main.go:88); empty disables",
    )
    p.add_argument(
        "--read.ignore-hints",
        dest="read_ignore_hints",
        action="store_true",
        help="ignore step/range hints in read requests (main.go:89)",
    )
    p.add_argument(
        "--create-if-missing",
        action="store_true",
        help="allow an empty/nonexistent store path instead of failing fast",
    )
    args = p.parse_args(argv)
    # ':port' normalization (main.go:93-95)
    if ":" not in args.http:
        args.http = ":" + args.http
    return args


def build_server(args: argparse.Namespace, spark=None):
    """Construct (but don't start) the AdapterServer — separable for tests."""
    from remote_tsdb_clickhouse_spark.server.http import AdapterApp, AdapterServer
    from remote_tsdb_clickhouse_spark.session import get_spark
    from remote_tsdb_clickhouse_spark.sources.samples_store import SamplesStore
    from remote_tsdb_clickhouse_spark.sources.writer import TimeseriesWriter

    spark = spark or get_spark("remote-tsdb-clickhouse-spark")
    store = SamplesStore(spark, args.store)
    # fail-fast storage check, the db.Ping() analog (conn.go:62-64): an
    # unreadable/absent table is a config error surfaced at startup, not on
    # the first request
    import os

    if not args.create_if_missing and not os.path.isdir(args.store):
        raise SystemExit(f"store path {args.store!r} does not exist (use --create-if-missing)")
    app = AdapterApp(
        TimeseriesWriter(store),
        store.read,
        ignore_label=args.read_ignore_label or None,
        ignore_hints=args.read_ignore_hints,
    )
    host, _, port = args.http.rpartition(":")
    return AdapterServer(app, host=host or "0.0.0.0", port=int(port))


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv)
    server = build_server(args)
    # the zap "listening" line (main.go:155-160)
    print(f"listening addr={args.http} store={args.store}", file=sys.stderr, flush=True)
    server.start()
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
