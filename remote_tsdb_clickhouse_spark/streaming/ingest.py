"""Structured Streaming ingest (SURVEY §2.8).

The reference's write path is already a streaming sink in disguise: each
HTTP request is one atomic micro-batch (``write.go:14-22,60``), failures
surface as 500s so Prometheus retries (at-least-once), and read-time
``max(value)`` dedup makes redelivery harmless.  The Spark-native shape:

    HTTP frontends decode prompb -> append canonical-schema parquet files
    to a staging drop-zone  ->  Structured Streaming file source  ->
    foreachBatch -> SamplesStore.append (atomic per micro-batch)

Properties preserved:
- **at-least-once + idempotent-at-read**: redelivered staging batches insert
  duplicate (series, ts) rows; A1's ``max(value)`` collapses them.
- **no watermarks / late-data state**: samples carry their own event time
  and land in their date partition wherever they fall — out-of-order and
  late data are trivially accepted (ordering is restored at read, O1/O2).
- **checkpointed exactly-once batch tracking** on the streaming side: the
  file source + checkpoint dir give recovery without reprocessing.

Also provided: ``rate_demo_stream`` — a self-contained synthetic ingest
(rate source -> samples schema) used by tests and as the watermarked
windowed-aggregation example (the *extension* beyond reference behavior:
continuous per-series 1-minute max, the streaming analog of A2's bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from remote_tsdb_clickhouse_spark.model import SAMPLES_SCHEMA
from remote_tsdb_clickhouse_spark.sources.samples_store import SamplesStore


class StreamingIngest:
    """File-drop-zone streaming ingest into a :class:`SamplesStore`."""

    def __init__(self, spark: SparkSession, staging_dir: str, store: SamplesStore,
                 checkpoint_dir: str):
        self.spark = spark
        self.staging_dir = staging_dir
        self.store = store
        self.checkpoint_dir = checkpoint_dir

    def source(self) -> DataFrame:
        return (
            self.spark.readStream.schema(SAMPLES_SCHEMA)
            .option("maxFilesPerTrigger", 64)
            .parquet(self.staging_dir)
        )

    def start(self, *, available_now: bool = False, interval: str = "10 seconds") -> StreamingQuery:
        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            # one atomic append per micro-batch — the per-request transaction
            # analog; batch_id is recorded in the checkpoint for recovery
            self.store.append(batch_df)

        writer = self.source().writeStream.foreachBatch(write_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=interval)
        return writer.start()


def windowed_max_stream(
    samples_stream: DataFrame,
    *,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Streaming extension: continuous per-series tumbling-window max.

    The streaming analog of the A2 downsample bucket: event-time tumbling
    windows with a watermark bounding late-data state.  (The reference has
    no streaming aggregation — this is the documented extension surface,
    SURVEY §2.8.)
    """
    return (
        samples_stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            "metric_name",
            F.array_sort("labels").alias("slb"),
        )
        .agg(F.max("value").alias("max_0"))
        .select("metric_name", "slb", F.col("w.start").alias("t"), "max_0")
    )


#: Output schema of :func:`stateful_rate_stream`.
RATE_OUTPUT_SCHEMA = (
    "metric_name STRING, labels_str STRING, t TIMESTAMP, rate DOUBLE"
)
#: Per-series state: timestamp + value of the last sample seen.
RATE_STATE_SCHEMA = "last_t DOUBLE, last_v DOUBLE"


def stateful_rate_stream(samples_stream: DataFrame, *, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful streaming operator: continuous per-series counter
    rate with reset detection (``applyInPandasWithState``).

    The batch X4 pattern (reference ``README.md:125-140``: ``if(
    runningDifference(max_0) < 0, nan, runningDifference(...))``) needs the
    *previous* sample of each series — trivially a ``lag`` window in batch,
    but in a stream that previous sample may be many micro-batches old.
    This is exactly the per-group mutable state Structured Streaming's
    ``applyInPandasWithState`` exists for (no built-in operator expresses
    cross-batch lag):

    - group key: the series identity ``(metric_name, sorted-labels-string)``
      — same shuffle key as every other series-keyed stage;
    - state: ``(last_t, last_v)`` — 16 bytes per live series, bounded by
      series cardinality, not throughput;
    - per batch: sort the group's new samples by time, emit
      ``(v - prev_v) / (t - prev_t)`` per step, NULL on counter reset
      (value decreased — same convention as the batch ``per_second_rate``),
      skip exact-duplicate timestamps; samples at or
      before the state's ``last_t`` are late arrivals and are dropped
      (the watermark bounds how long Spark retries ordering for us);
    - state update: the newest ``(t, v)`` of the group.

    Arrow-batched per group; Python is justified here because the operator
    is genuinely stateful across micro-batches.
    """
    import pandas as pd

    def update(key, pdfs, state) -> "pd.DataFrame":
        name, labels_str = key
        if state.exists:
            last_t, last_v = state.get
        else:
            last_t, last_v = None, None
        out_t, out_r = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, v in zip(pdf["ts"], pdf["value"]):
                t = ts.timestamp()
                if last_t is not None and t <= last_t:
                    continue  # late or duplicate-timestamp sample
                if last_t is not None:
                    out_t.append(ts)
                    # None -> NULL (pandas NaN maps to NULL via Arrow
                    # anyway; match the batch per_second_rate convention)
                    out_r.append(None if v < last_v else (v - last_v) / (t - last_t))
                last_t, last_v = t, float(v)
        if last_t is not None:
            state.update((last_t, last_v))
        yield pd.DataFrame(
            {
                "metric_name": [name] * len(out_t),
                "labels_str": [labels_str] * len(out_t),
                "t": out_t,
                "rate": out_r,
            }
        )

    keyed = (
        samples_stream.withWatermark("ts", watermark)
        .withColumn("labels_str", F.array_join(F.array_sort("labels"), ","))
        .groupBy("metric_name", "labels_str")
    )
    return keyed.applyInPandasWithState(
        update,
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def rate_demo_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic samples stream off the rate source (tests / demos)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.concat(F.lit("metric_"), (F.col("value") % 5).cast("string")).alias("metric_name"),
            F.array(
                F.concat(F.lit("instance="), (F.col("value") % 3).cast("string"))
            ).alias("labels"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
        .withColumn("ts", F.date_trunc("second", "ts"))
    )


#: Output schema of :func:`stateful_dedup_stream`.
DEDUP_OUTPUT_SCHEMA = (
    "content_hash STRING, doc_id BIGINT, n_seen_before BIGINT, is_first BOOLEAN"
)
#: Per-content-hash state: how many copies have been seen so far.
DEDUP_STATE_SCHEMA = "n_seen BIGINT"


def stateful_dedup_stream(doc_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: dedup-on-ingest
    (``applyInPandasWithState``) — the streaming half of
    ``operators/dedup.exact_dedup``.

    A training-data pipeline ingesting a document firehose wants each
    document tagged *as it arrives* with whether its content was already
    seen — batch dedup would mean re-scanning the accumulated corpus every
    cycle.  The state is the minimal sufficient statistic:

    - group key: the content identity (md5 of the normalized token stream
      — same key as the batch ``exact_dedup``);
    - state: ``n_seen`` — 8 bytes per distinct content, bounded by corpus
      cardinality, not throughput;
    - per batch: the group's new docs in ``doc_id`` order get their
      global duplicate index ``n_seen_before`` (state count + rank within
      the batch); ``is_first`` marks the keeper;
    - state update: the new count.

    Emitted flags are deterministic when micro-batches arrive in ascending
    ``doc_id`` ranges (the staging writer pins file order via mtime) —
    then ``n_seen_before`` equals the batch ``row_number() - 1`` over the
    full history, which is exactly what the oracle checks.

    Scale shape (100 TB): state VALUE is 8 bytes, but state CARDINALITY
    is the corpus's distinct-content count — billions of entries at
    corpus scale, ~40-50 bytes each with the 32-hex-char key and
    store overhead.  The deployment assumptions, stated the way the
    dedup/ANN operators state theirs: (1) state is hash-partitioned by
    content_hash across ``spark.sql.shuffle.partitions`` stateful
    partitions — size that knob so per-partition state fits the
    executor's budget (1B keys / 2000 partitions ≈ 25 MB each; the
    content hash is uniform, so no skew salting is needed); (2) the
    default HDFS-backed state store keeps every entry on-heap and is the
    wrong provider past ~10M keys per executor — a continuous deployment
    sets ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider, which spills to local disk and checkpoints incrementally,
    making state bounded by disk, not heap; (3) each micro-batch's state
    I/O is proportional to the BATCH's distinct hashes, not the
    accumulated corpus — the whole point vs re-scanning the corpus per
    cycle.  Local tests exercise the identical operator/plan on the
    default provider; only the provider config changes at scale.
    """
    import pandas as pd

    def update(key, pdfs, state) -> "pd.DataFrame":
        (h,) = key
        n = int(state.get[0]) if state.exists else 0
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()
        state.update((n + len(ids),))
        yield pd.DataFrame(
            {
                "content_hash": [h] * len(ids),
                "doc_id": ids,
                "n_seen_before": [n + i for i in range(len(ids))],
                "is_first": [n + i == 0 for i in range(len(ids))],
            }
        )

    return doc_stream.groupBy("content_hash").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def sessionized_stream(
    samples_stream: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization via the BUILT-IN session window: per-series
    dynamic-gap windows that merge while events arrive within ``gap`` of
    the session end (Spark's native stateful session operator — no custom
    state function needed; contrast ``stateful_rate_stream``, which exists
    precisely because no built-in expresses cross-batch lag).  Session end
    is last-event + gap, the engine's own convention.  The watermark
    bounds session state in a continuous deployment; the batch-equivalence
    oracle runs under ``complete`` mode where it is not load-bearing.
    """
    return (
        samples_stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("w"),
            "metric_name",
            F.array_join(F.array_sort("labels"), ",").alias("labels_str"),
        )
        .agg(F.count("*").alias("n_samples"), F.max("value").alias("max_v"))
        .select(
            "metric_name",
            "labels_str",
            F.col("w.start").cast("long").alias("s_start"),
            F.col("w.end").cast("long").alias("s_end"),
            "n_samples",
            "max_v",
        )
    )
