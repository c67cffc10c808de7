"""Structured Streaming ingest (SURVEY §2.8): drop-zone -> store, and the
watermarked windowed-max extension."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.model import SAMPLES_SCHEMA
from remote_tsdb_clickhouse_spark.sources.samples_store import SamplesStore
from remote_tsdb_clickhouse_spark.streaming.ingest import (
    StreamingIngest,
    rate_demo_stream,
    stateful_rate_stream,
    windowed_max_stream,
)


def _stage_batch(spark, staging_dir: str, rows):
    spark.createDataFrame(rows, SAMPLES_SCHEMA).coalesce(1).write.mode("append").parquet(
        staging_dir
    )


def test_streaming_ingest_available_now(spark, tmp_path):
    staging = str(tmp_path / "staging")
    store = SamplesStore(spark, str(tmp_path / "samples"))
    ingest = StreamingIngest(spark, staging, store, str(tmp_path / "ckpt"))

    _stage_batch(
        spark,
        staging,
        [
            (datetime(2024, 1, 1, 0, 0, 0), "up", ["job=a"], 1.0),
            (datetime(2024, 1, 2, 0, 0, 15), "up", ["job=a"], 0.0),
        ],
    )
    q = ingest.start(available_now=True)
    q.awaitTermination(120)
    assert store.read().count() == 2

    # second batch: checkpoint resumes without re-ingesting the first
    _stage_batch(spark, staging, [(datetime(2024, 1, 3, 0, 0, 0), "up", ["job=a"], 1.0)])
    q = ingest.start(available_now=True)
    q.awaitTermination(120)
    assert store.read().count() == 3  # exactly-once per staged file


def test_windowed_max_stream(spark, tmp_path):
    staging = str(tmp_path / "staging2")
    _stage_batch(
        spark,
        staging,
        [
            (datetime(2024, 1, 1, 0, 0, 5), "m", ["i=1"], 1.0),
            (datetime(2024, 1, 1, 0, 0, 50), "m", ["i=1"], 3.0),
            (datetime(2024, 1, 1, 0, 1, 10), "m", ["i=1"], 2.0),
        ],
    )
    src = spark.readStream.schema(SAMPLES_SCHEMA).parquet(staging)
    agg = windowed_max_stream(src, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wmax")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["t"]: r["max_0"] for r in spark.sql("SELECT * FROM wmax").collect()}
    assert rows == {
        datetime(2024, 1, 1, 0, 0, 0): 3.0,
        datetime(2024, 1, 1, 0, 1, 0): 2.0,
    }


def test_stateful_rate_across_restarts(spark, tmp_path):
    """The applyInPandasWithState rate operator carries (last_t, last_v)
    per series through the state store: a sample arriving in a later run
    rates against the previous run's final sample."""
    staging = str(tmp_path / "staging3")
    ckpt = str(tmp_path / "ckpt3")
    out_dir = str(tmp_path / "rates_out")

    def run_and_fetch(_name):
        src = spark.readStream.schema(SAMPLES_SCHEMA).parquet(staging)
        q = (
            stateful_rate_stream(src)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir).collect()

    _stage_batch(
        spark,
        staging,
        [
            (datetime(2024, 1, 1, 0, 0, 0), "reqs", ["job=a"], 100.0),
            (datetime(2024, 1, 1, 0, 0, 10), "reqs", ["job=a"], 150.0),
        ],
    )
    rows = run_and_fetch("rates1")
    assert [(r.t, r.rate) for r in rows] == [(datetime(2024, 1, 1, 0, 0, 10), 5.0)]

    # restart with new data: first new sample rates against carried state;
    # the value drop is a counter reset -> NaN
    _stage_batch(
        spark,
        staging,
        [
            (datetime(2024, 1, 1, 0, 0, 30), "reqs", ["job=a"], 250.0),
            (datetime(2024, 1, 1, 0, 0, 40), "reqs", ["job=a"], 10.0),
            # late sample, at/before carried last_t: dropped
            (datetime(2024, 1, 1, 0, 0, 10), "reqs", ["job=a"], 999.0),
        ],
    )
    all_rows = run_and_fetch("rates2")
    assert len(all_rows) == 3  # run1's row + two new; the late sample emitted nothing
    rows = {r.t: r.rate for r in all_rows}
    assert rows[datetime(2024, 1, 1, 0, 0, 30)] == 5.0  # (250-150)/(30-10)
    assert rows[datetime(2024, 1, 1, 0, 0, 40)] is None  # counter reset -> NULL
    assert rows[datetime(2024, 1, 1, 0, 0, 10)] == 5.0  # run1's, not the late 999


def test_stateful_dedup_stream_cross_batch(spark, tmp_path):
    """Cross-batch dedup state: a content hash seen in batch 1 must mark
    batch-2 arrivals as duplicates with the continued global count."""
    from remote_tsdb_clickhouse_spark.streaming.ingest import stateful_dedup_stream

    staging = str(tmp_path / "dedup_staging")
    ckpt = str(tmp_path / "dedup_ckpt")
    out_dir = str(tmp_path / "dedup_out")
    schema = "doc_id BIGINT, content_hash STRING"

    def run():
        # parquet sink (memory sink cannot resume from a checkpoint)
        stream = spark.readStream.schema(schema).parquet(staging)
        q = (
            stateful_dedup_stream(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}

    spark.createDataFrame([(1, "h1"), (2, "h1"), (3, "h2")], schema).coalesce(
        1
    ).write.mode("append").parquet(staging)
    out1 = run()
    assert out1[1].is_first and out1[1].n_seen_before == 0
    assert not out1[2].is_first and out1[2].n_seen_before == 1
    assert out1[3].is_first

    spark.createDataFrame([(4, "h1"), (5, "h3")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    out2 = run()
    assert len(out2) == 5  # checkpoint: batch 1 emitted once, not reprocessed
    assert not out2[4].is_first and out2[4].n_seen_before == 2  # state crossed batches
    assert out2[5].is_first and out2[5].n_seen_before == 0


def test_sessionized_stream_randomized_vs_reference(spark, tmp_path):
    """Seeded sweep of the built-in session-window sessionization vs a
    Python merge reference: per-series event streams with inter-event
    gaps clustered strictly below and strictly above the session gap
    (never exactly at the boundary), split across 3 micro-batches via
    maxFilesPerTrigger=1 so sessions must merge across batches.  Session
    start is the first event, end is last event + gap, with per-session
    count and max checked key-for-key.  The watermark is wider than the
    whole event span: rows are shuffled across batches, and Spark drops
    input rows behind the advanced watermark even in complete mode, so a
    narrow watermark would silently shrink sessions."""
    import random
    from datetime import datetime, timedelta, timezone

    from remote_tsdb_clickhouse_spark.streaming.ingest import sessionized_stream

    rng = random.Random(307)
    base = datetime(2024, 1, 1)
    gap_s = 300
    rows, expect = [], {}
    for key_i in range(6):
        metric = f"m{key_i % 3}"
        labels = [f"job=j{key_i}"]
        t, events = 0, []
        for _ in range(rng.randint(5, 25)):
            t += rng.choice([rng.randint(1, 200), rng.randint(301, 900)])
            events.append((t, round(rng.uniform(0, 100), 3)))
        for ts, v in events:
            rows.append((base + timedelta(seconds=ts), metric, labels, v))
        sessions, cur = [], None
        for ts, v in events:  # ascending by construction
            if cur is None or ts >= cur[1]:
                if cur is not None:
                    sessions.append(cur)
                cur = [ts, ts + gap_s, 0, float("-inf")]
            cur[1] = ts + gap_s
            cur[2] += 1
            cur[3] = max(cur[3], v)
        if cur is not None:
            sessions.append(cur)
        base_epoch = int(base.replace(tzinfo=timezone.utc).timestamp())
        expect[(metric, labels[0])] = sorted(
            (base_epoch + s, base_epoch + e, n, mx) for s, e, n, mx in sessions
        )

    staging = str(tmp_path / "sess_staging")
    rng.shuffle(rows)
    third = (len(rows) + 2) // 3
    for i in range(3):  # 3 files -> 3 micro-batches
        _stage_batch(spark, staging, rows[i * third:(i + 1) * third])

    src = (
        spark.readStream.schema(SAMPLES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    agg = sessionized_stream(src, gap="5 minutes", watermark="24 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_sweep")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {}
    for r in spark.sql("SELECT * FROM sess_sweep").collect():
        got.setdefault((r.metric_name, r.labels_str), []).append(
            (r.s_start, r.s_end, r.n_samples, r.max_v)
        )
    for k in got:
        got[k].sort()
    assert got == expect


def test_stateful_dedup_randomized_cross_batch_sweep(spark, tmp_path):
    """Seeded randomized sweep of the dedup-on-ingest state machine: 60
    docs with content hashes drawn from a small pool (heavy duplication,
    some singletons), arriving as 3 checkpoint-resumed availableNow runs
    over contiguous ascending doc_id ranges — duplicate chains cross both
    batch boundaries.  Every doc's (is_first, n_seen_before) must equal
    the global order statistic: the count of same-hash docs with a
    smaller doc_id.  Randomized within-batch write order checks that the
    operator's own sort (not arrival luck) restores doc_id order."""
    import random

    from remote_tsdb_clickhouse_spark.streaming.ingest import stateful_dedup_stream

    rng = random.Random(1409)
    staging = str(tmp_path / "dedup_staging")
    ckpt = str(tmp_path / "dedup_ckpt")
    out_dir = str(tmp_path / "dedup_out")
    schema = "doc_id BIGINT, content_hash STRING"

    pool = [f"h{k}" for k in range(8)]
    docs = []
    for did in range(60):
        h = pool[rng.randrange(len(pool))] if rng.random() < 0.8 else f"uniq{did}"
        docs.append((did, h))

    want = {}
    seen = {}
    for did, h in docs:  # docs is doc_id-ascending by construction
        n = seen.get(h, 0)
        want[did] = (n == 0, n)
        seen[h] = n + 1

    def run():
        stream = spark.readStream.schema(schema).parquet(staging)
        q = (
            stateful_dedup_stream(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    splits = sorted(rng.sample(range(5, 55), 2))
    lo = 0
    for hi in [*splits, 60]:
        batch = docs[lo:hi]
        rng.shuffle(batch)  # within-batch arrival order is adversarial
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(
            staging
        )
        run()
        lo = hi

    got = {
        r.doc_id: (r.is_first, r.n_seen_before)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == want
    # the pool sizing must actually produce cross-batch duplicate chains
    assert sum(1 for f, _ in want.values() if not f) >= 20


def test_stateful_rate_randomized_cross_batch_sweep(spark, tmp_path):
    """Seeded randomized sweep of the cross-batch rate operator: 8 series
    with random sample times and counter-like values (increments plus
    occasional resets), split into 3 checkpoint-resumed runs whose later
    batches also carry late arrivals (timestamps at or before the series'
    carried last_t — must emit nothing and not disturb state).  Expected
    rows come from a Python replay of the per-batch semantics: per series
    per batch, samples sorted by time, t <= last_t dropped, rate
    (v-pv)/(t-pt) with NULL on value decrease, state carried across
    batches."""
    import random

    rng = random.Random(1901)
    staging = str(tmp_path / "rate_staging")
    ckpt = str(tmp_path / "rate_ckpt")
    out_dir = str(tmp_path / "rate_out")
    base = datetime(2024, 1, 1)
    from datetime import timedelta

    series = {}
    for k in range(8):
        key = (f"m{k % 3}", f"job=j{k}")
        ts = sorted(rng.sample(range(0, 3600, 5), rng.randint(3, 15)))
        v = float(rng.randint(0, 100))
        pts = []
        for t in ts:
            v = float(rng.randint(0, 10)) if rng.random() < 0.2 else v + rng.randint(0, 50)
            pts.append((t, v))
        series[key] = pts

    # batch assignment: mostly time-ordered thirds, but ~15% of later-batch
    # samples are duplicated from an earlier third as LATE arrivals
    batches = [[], [], []]
    for key, pts in series.items():
        third = (len(pts) + 2) // 3
        for i, (t, v) in enumerate(pts):
            batches[min(i // third, 2)].append((key, t, v))
    late = []
    for key, pts in series.items():
        if len(pts) >= 4 and rng.random() < 0.7:
            t, _ = pts[rng.randrange(len(pts) // 2)]
            late.append((key, t, 99999.0))  # late: t <= carried last_t
    batches[2].extend(late)

    # Python replay of the operator's per-batch semantics
    state, want = {}, {}
    for batch in batches:
        per = {}
        for key, t, v in batch:
            per.setdefault(key, []).append((t, v))
        for key, pts in per.items():
            last = state.get(key)
            for t, v in sorted(pts):
                if last is not None and t <= last[0]:
                    continue
                if last is not None:
                    want[(key, t)] = None if v < last[1] else (v - last[1]) / (t - last[0])
                last = (t, v)
            state[key] = last

    def run():
        src = spark.readStream.schema(SAMPLES_SCHEMA).parquet(staging)
        q = (
            stateful_rate_stream(src)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    for batch in batches:
        rows = [
            (base + timedelta(seconds=t), key[0], [key[1]], v)
            for key, t, v in batch
        ]
        rng.shuffle(rows)
        _stage_batch(spark, staging, rows)
        run()

    base_epoch = base.timestamp()  # naive, same zone as collected t
    got = {
        ((r.metric_name, r.labels_str), int(r.t.timestamp() - base_epoch)): r.rate
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == want
    # the generator must produce real resets and late arrivals
    assert sum(1 for v in want.values() if v is None) >= 3 and len(late) >= 3


def test_windowed_max_randomized_cross_batch_sweep(spark, tmp_path):
    """Seeded randomized sweep of the tumbling-window streaming max: 6
    series with random event times (including exact window-boundary
    timestamps, which belong to the LATER window — [start, end) tumbling
    semantics) and values planted so several windows' maxima arrive in a
    different micro-batch than the rest of the window's rows.  Three
    maxFilesPerTrigger=1 batches with shuffled row assignment and a
    watermark wider than the event span; the complete-mode result must
    equal a Python per-(series, window) max."""
    import random
    from datetime import timedelta

    rng = random.Random(2389)
    base = datetime(2024, 1, 1)
    win_s = 60
    rows, want = [], {}
    for k in range(6):
        key = (f"m{k % 2}", (f"job=j{k}",))
        for _ in range(rng.randint(5, 20)):
            off = rng.choice([rng.randrange(1800),
                              rng.randrange(30) * win_s])  # boundary hits
            v = round(rng.uniform(-100, 100), 3)
            rows.append((base + timedelta(seconds=off), key[0], list(key[1]), v))
            wstart = base + timedelta(seconds=off - off % win_s)
            cur = want.get((key, wstart))
            want[(key, wstart)] = v if cur is None else max(cur, v)

    staging = str(tmp_path / "wmax_staging")
    rng.shuffle(rows)
    third = (len(rows) + 2) // 3
    for i in range(3):
        _stage_batch(spark, staging, rows[i * third:(i + 1) * third])

    src = (
        spark.readStream.schema(SAMPLES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    agg = windowed_max_stream(src, window="1 minute", watermark="24 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("wmax_sweep")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        ((r.metric_name, tuple(r.slb)), r.t): r.max_0
        for r in spark.sql("SELECT * FROM wmax_sweep").collect()
    }
    assert got == want
    assert len(want) >= 30  # enough windows to be a real sweep


def test_rate_demo_stream_schema(spark):
    """The demo rate source must emit the exact samples schema so every
    downstream operator (stateful rate, windowed max, ingest writer)
    accepts it unchanged."""
    df = rate_demo_stream(spark)
    assert df.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("ts", "timestamp"), ("metric_name", "string"),
        ("labels", "array<string>"), ("value", "double"),
    ]
