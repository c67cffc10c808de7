"""SparkSession construction with scale-appropriate defaults."""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import SparkSession

#: Sessions already configured by :func:`ensure_query_confs`.  Every query
#: entrypoint (and several shared helpers they call) invokes the ensure —
#: 68 call sites, several per query call — and each invocation used to pay
#: ~6 py4j conf round-trips re-setting values that cannot change between
#: calls (nothing in the engine mutates them).  Weak-keyed so entries die
#: with their session (r22, guide §5 driver latency).
_CONFS_ENSURED: WeakKeyDictionary = WeakKeyDictionary()


def ensure_query_confs(spark: SparkSession) -> SparkSession:
    """Runtime confs every engine query assumes; safe on a live session.

    UTC session time zone makes epoch math deterministic regardless of host
    zone (and matches DuckDB's naive-timestamp interpretation in the oracle
    comparisons); AQE re-plans shuffles at runtime (skew joins, coalesced
    partitions) — essential at 100 TB, harmless locally.
    """
    if _CONFS_ENSURED.get(spark):
        return spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # InferFiltersFromGenerate synthesizes `size(arr)>0 AND isnotnull(arr)`
    # above every explode, and predicate pushdown then drags that filter
    # through exchanges down to the scan — re-inlining the full array
    # expression (tokenize+shingle HOF chains here) into an interpreted
    # filter that recomputes it per row BEFORE the stage that computes it
    # for real (measured: the exploded shingle index builds 3.5x slower).
    # Every generator input in this engine is an array computed in the same
    # stage as its explode, so the inferred filter can never prune work —
    # excluding the rule changes plans, never results.
    _EXCLUDE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    try:
        existing = spark.conf.get("spark.sql.optimizer.excludedRules") or ""
    except Exception:
        existing = ""
    if _EXCLUDE not in existing:
        merged = f"{existing},{_EXCLUDE}" if existing else _EXCLUDE
        spark.conf.set("spark.sql.optimizer.excludedRules", merged)
    # Spark rejects parquet TIMESTAMP(NANOS) outright; read as long nanos and
    # normalize in the source adapters (sources/events.py floors ns -> us,
    # byte-matching DuckDB's coercion).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _CONFS_ENSURED[spark] = True
    return spark


def get_spark(app_name: str = "remote-tsdb-clickhouse-spark") -> SparkSession:
    """Local-mode session mirroring the target cluster's per-executor shape.

    ``local[N]`` with N from ``SPARK_GRAFT_CPUS`` (default all cores).  On a
    real cluster these confs move to spark-submit; the engine code itself
    never assumes local mode.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # Workers must import this package (worker-side decoders/kernels) and
    # the preloading daemon module below; `python -m` covers it when the
    # JVM's cwd is the repo, PYTHONPATH covers it everywhere else.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Preload numpy/pandas/pyarrow in the worker daemon BEFORE forking:
        # worker spawn drops from ~1 s (import chain) to fork-cost, which
        # removes the import storm when the elastic pool re-expands after
        # idle culls (see pydaemon module docstring for the measurements)
        .config(
            "spark.python.daemon.module", "remote_tsdb_clickhouse_spark.pydaemon"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return ensure_query_confs(builder.getOrCreate())
