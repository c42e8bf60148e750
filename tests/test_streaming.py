"""Structured Streaming incremental load (SURVEY §2.9): exactly-once
file-arrival append + audit rows, and the tumbling-window extension."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from glamira_end_to_end_data_pipeline_spark.streaming import (
    run_incremental_load_once,
    tumbling_event_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_incremental_load_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, [(1, "view", 1.0), (2, "cart", 2.0)])
    run_incremental_load_once(spark, src, tgt, audit, ckpt, SCHEMA)
    assert spark.read.parquet(tgt).count() == 2

    # second drain with no new files: nothing re-loaded (checkpoint
    # replaces the reference's stable-job-id dedup)
    run_incremental_load_once(spark, src, tgt, audit, ckpt, SCHEMA)
    assert spark.read.parquet(tgt).count() == 2

    # a newly arrived file loads incrementally, exactly once
    _write_batch(spark, src, [(3, "purchase", 3.0)])
    run_incremental_load_once(spark, src, tgt, audit, ckpt, SCHEMA)
    got = spark.read.parquet(tgt)
    assert got.count() == 3
    assert {r.event_id for r in got.collect()} == {1, 2, 3}

    # audit table: one row per non-empty batch, row counts match
    arows = spark.read.parquet(audit).orderBy("batch_id").collect()
    assert [r.row_count for r in arows if r.row_count > 0] == [2, 1]
    assert all(r.status == "ok" for r in arows)
    assert all(r.target_table == "events" for r in arows)
    assert os.path.isdir(ckpt)


def test_tumbling_window_counts_batch(spark):
    rows = [
        (1, "view", "2024-01-01 00:10:00"),
        (2, "view", "2024-01-01 00:50:00"),
        (3, "cart", "2024-01-01 00:20:00"),
        (4, "view", "2024-01-01 01:05:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_s string"
    ).select("event_id", "event_type", F.to_timestamp("ts_s").alias("ts"))
    out = tumbling_event_counts(df, "1 hour").orderBy(
        "window_start", "event_type"
    )
    got = [(str(r.window_start), r.event_type, r.n_events) for r in out.collect()]
    assert got == [
        ("2024-01-01 00:00:00", "cart", 1),
        ("2024-01-01 00:00:00", "view", 2),
        ("2024-01-01 01:00:00", "view", 1),
    ]


def test_tumbling_window_streaming_with_watermark(spark, tmp_path):
    """Same aggregation over a real stream: watermark + append sink;
    late (beyond-watermark) data is dropped, closed windows emit."""
    src = str(tmp_path / "stream_src")
    sink = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "stream_ckpt")
    schema = "event_id long, event_type string, ts timestamp"

    rows1 = [(1, "view", "2024-01-01 00:10:00"), (2, "view", "2024-01-01 03:00:00")]
    spark.createDataFrame(
        [(i, t, s) for i, t, s in rows1], "event_id long, event_type string, ts_s string"
    ).select("event_id", "event_type", F.to_timestamp("ts_s").alias("ts")).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        tumbling_event_counts(stream, "1 hour", "1 hour")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(sink).collect()
    # watermark = max(ts) - 1h = 02:00 → the 00:00-01:00 window closed
    assert [(str(r.window_start), r.n_events) for r in got] == [
        ("2024-01-01 00:00:00", 1)
    ]


def test_incremental_load_replay_idempotent(spark, tmp_path):
    """Crash-after-write-before-commit: restoring the pre-batch
    checkpoint and re-draining replays the batch into the SAME
    batch_id directory (overwrite), so rows are never double-appended
    — the sink is idempotent per batch, not just at-least-once."""
    import shutil

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")
    ckpt_backup = str(tmp_path / "ckpt_backup")

    _write_batch(spark, src, [(1, "view", 1.0), (2, "cart", 2.0)])
    run_incremental_load_once(spark, src, tgt, audit, ckpt, SCHEMA)
    shutil.copytree(ckpt, ckpt_backup)

    _write_batch(spark, src, [(3, "purchase", 3.0)])
    run_incremental_load_once(spark, src, tgt, audit, ckpt, SCHEMA)
    assert spark.read.parquet(tgt).count() == 3

    # simulate the crash: the target write of the last batch happened,
    # but the checkpoint commit did not -> restart re-runs the batch
    shutil.rmtree(ckpt)
    shutil.copytree(ckpt_backup, ckpt)
    run_incremental_load_once(spark, src, tgt, audit, ckpt, SCHEMA)

    got = spark.read.parquet(tgt)
    assert got.count() == 3  # replay overwrote batch_id=1, no doubles
    assert {r.event_id for r in got.collect()} == {1, 2, 3}
    arows = spark.read.parquet(audit).collect()
    per_batch = {}
    for r in arows:
        per_batch[r.batch_id] = per_batch.get(r.batch_id, 0) + 1
    assert all(v == 1 for v in per_batch.values()), per_batch


def test_session_aggregate_batch_semantics(spark):
    """Pin the boundary rule: a gap of exactly 30:00 merges, >30:00
    splits; session_end = last event + gap."""
    from glamira_end_to_end_data_pipeline_spark.streaming import session_aggregate

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:30:00", 2.0),  # gap == 30:00 -> merges
        (1, "2024-01-01 01:00:01", 4.0),  # gap 30:01 -> new session
        (2, "2024-01-01 05:00:00", 8.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    got = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.total_value)
        for r in session_aggregate(df).collect()
    )
    assert got == [
        (1, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 2, 3.0),
        (1, "2024-01-01 01:00:01", "2024-01-01 01:30:01", 1, 4.0),
        (2, "2024-01-01 05:00:00", "2024-01-01 05:30:00", 1, 8.0),
    ]


def test_sessionize_stateful_streaming(spark, tmp_path):
    """applyInPandasWithState sessionizer over a real two-batch stream:
    mid-batch closed sessions emit immediately; the open session emits
    when the event-time timeout fires after the watermark passes."""
    from glamira_end_to_end_data_pipeline_spark.streaming import sessionize_stateful

    src = str(tmp_path / "sess_src")
    sink = str(tmp_path / "sess_sink")
    ckpt = str(tmp_path / "sess_ckpt")

    def write_file(rows):
        spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value").coalesce(
            1
        ).write.mode("append").parquet(src)

    # batch 1: user 1 has a closed session (00:00-00:20) + an open one
    # (02:00); user 2's 10:00 event drives the watermark to 09:00.
    write_file(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:20:00", 2.0),
            (1, "2024-01-01 02:00:00", 4.0),
            (2, "2024-01-01 10:00:00", 8.0),
        ]
    )
    # batch 2: user 2's 11:00 event (gap 60m) closes the 10:00 session.
    write_file([(2, "2024-01-01 11:00:00", 16.0)])

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        sessionize_stateful(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.total_value)
        for r in spark.read.parquet(sink).collect()
    )
    # user 1's 02:00 session closes via EventTimeTimeout (02:30 < the
    # 09:00 watermark); user 2's 11:00 session is still open -> absent.
    assert got == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:50:00", 2, 3.0),
        (1, "2024-01-01 02:00:00", "2024-01-01 02:30:00", 1, 4.0),
        (2, "2024-01-01 10:00:00", "2024-01-01 10:30:00", 1, 8.0),
    ]


def test_dedup_replayed_events_streaming(spark, tmp_path):
    """dropDuplicatesWithinWatermark path: a duplicate redelivered in a
    later micro-batch (within the watermark horizon) is dropped; new
    keys pass through."""
    from glamira_end_to_end_data_pipeline_spark.streaming import dedup_replayed_events

    src = str(tmp_path / "dd_src")
    sink = str(tmp_path / "dd_sink")
    ckpt = str(tmp_path / "dd_ckpt")

    def write_file(rows):
        spark.createDataFrame(
            rows, "event_id long, ts_s string, value double"
        ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "value").coalesce(
            1
        ).write.mode("append").parquet(src)

    write_file([(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:10:00", 2.0)])
    write_file([(1, "2024-01-01 00:00:00", 1.0), (3, "2024-01-01 00:20:00", 4.0)])

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, value double"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        dedup_replayed_events(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.event_id for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3]  # the redelivered event_id=1 appears once


def test_dedup_replayed_events_batch_equivalence(spark):
    """Batch path: a twice-delivered frame dedups back to the original."""
    from glamira_end_to_end_data_pipeline_spark.streaming import dedup_replayed_events

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:10:00", 2.0)],
        "event_id long, ts_s string, value double",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "value")
    out = dedup_replayed_events(df.unionAll(df))
    assert sorted(r.event_id for r in out.collect()) == [1, 2]


def test_attribution_join_streaming_equals_batch(spark, tmp_path):
    """Stream-stream interval join: the same attribution_join over two
    watermarked file streams (drained across micro-batches) must produce
    exactly the batch result — including a cross-batch match (purchase
    arriving one batch after its click)."""
    from glamira_end_to_end_data_pipeline_spark.streaming import attribution_join

    src = str(tmp_path / "att_src")
    sink = str(tmp_path / "att_sink")
    ckpt = str(tmp_path / "att_ckpt")

    def write_file(rows):
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts_s string, event_type string"
        ).select(
            "event_id", "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: user 1 clicks then purchases (same batch); user 2 clicks.
    write_file(
        [
            (1, 1, "2024-01-01 00:00:00", "click"),
            (2, 1, "2024-01-01 01:00:00", "purchase"),
            (3, 2, "2024-01-01 02:00:00", "click"),
        ]
    )
    # batch 2: user 2's purchase matches the batch-1 click (cross-batch
    # state); user 1's stale purchase (>24h after its click) must NOT
    # match; a click AFTER a purchase must not match either.
    write_file(
        [
            (4, 2, "2024-01-01 20:00:00", "purchase"),
            (5, 1, "2024-01-03 00:00:00", "purchase"),
            (6, 2, "2024-01-01 23:00:00", "click"),
        ]
    )

    def sides(df):
        return (
            df.filter(F.col("event_type") == "purchase"),
            df.filter(F.col("event_type") == "click"),
        )

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    q = (
        attribution_join(*sides(stream))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = sorted(
        (r.purchase_id, r.click_id) for r in spark.read.parquet(sink).collect()
    )
    batch = sorted(
        (r.purchase_id, r.click_id)
        for r in attribution_join(*sides(spark.read.parquet(src))).collect()
    )
    assert streamed == batch == [(2, 1), (4, 3)]


def test_snapshot_commit_sink_survives_full_redelivery(spark, tmp_path):
    from glamira_end_to_end_data_pipeline_spark.sources import lake
    from glamira_end_to_end_data_pipeline_spark.streaming.incremental import (
        snapshot_commit_load,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.parquet(src)
    schema = spark.read.parquet(src).schema

    snapshot_commit_load(spark, src, table, str(tmp_path / "c1"), schema)
    v1 = lake.latest_snapshot_version(spark, table)
    assert v1 >= 1
    assert lake.read_snapshot(spark, table).count() == 100
    # full redelivery (fresh checkpoint): tag skip must no-op
    snapshot_commit_load(spark, src, table, str(tmp_path / "c2"), schema)
    assert lake.latest_snapshot_version(spark, table) == v1
    assert lake.read_snapshot(spark, table).count() == 100


def test_snapshot_commit_sink_rebatched_redelivery_with_new_files(spark, tmp_path):
    """The data-loss case id-keyed dedup gets wrong: checkpoint lost,
    NEW files landed, and the redelivered batch 0 now mixes committed
    and uncommitted files — the sink must ingest exactly the new rows."""
    from glamira_end_to_end_data_pipeline_spark.sources import lake
    from glamira_end_to_end_data_pipeline_spark.streaming.incremental import (
        snapshot_commit_load,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    spark.range(0, 50).repartition(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    snapshot_commit_load(spark, src, table, str(tmp_path / "c1"), schema)
    assert lake.read_snapshot(spark, table).count() == 50
    # new files land; checkpoint is lost -> full redelivery in one batch
    spark.range(50, 70).repartition(1).write.mode("append").parquet(src)
    snapshot_commit_load(spark, src, table, str(tmp_path / "c2"), schema)
    got = sorted(r["id"] for r in lake.read_snapshot(spark, table).collect())
    assert got == list(range(70))  # old rows once, new rows ingested


def test_left_outer_attribution_streaming_equals_batch(spark, tmp_path):
    """Stream-stream LEFT OUTER join: unmatched clicks must be emitted
    null-padded, but only once the watermark closes their join window —
    a sentinel click far in the future advances the watermark so every
    pending null flushes, then streamed == batch (sentinel excluded)."""
    from glamira_end_to_end_data_pipeline_spark.streaming import (
        attribution_join_left_outer,
    )

    src = str(tmp_path / "lo_src")
    sink = str(tmp_path / "lo_sink")
    ckpt = str(tmp_path / "lo_ckpt")

    def write_file(rows):
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts_s string, event_type string"
        ).select(
            "event_id", "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: user 1 converts same-batch; user 2's click pends.
    write_file(
        [
            (1, 1, "2024-01-01 00:00:00", "click"),
            (2, 1, "2024-01-01 01:00:00", "purchase"),
            (3, 2, "2024-01-01 02:00:00", "click"),
        ]
    )
    # batch 2: user 2 converts cross-batch; user 3's click will never
    # convert (the null row the outer join exists for); user 1's second
    # click is followed only by a too-late purchase (>24h).
    write_file(
        [
            (4, 2, "2024-01-01 20:00:00", "purchase"),
            (5, 3, "2024-01-01 03:00:00", "click"),
            (6, 1, "2024-01-01 04:00:00", "click"),
            (7, 1, "2024-01-03 00:00:00", "purchase"),
        ]
    )
    # batch 3: watermark-advancing sentinel — pushes event time far
    # past every open window so the unmatched verdicts can be emitted.
    write_file([(99, 9, "2024-02-01 00:00:00", "click")])

    def sides(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    q = (
        attribution_join_left_outer(*sides(stream))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def rows_of(df):
        return sorted(
            (r.click_id, r.purchase_id)
            for r in df.collect()
            if r.click_id != 99
        )

    streamed = rows_of(spark.read.parquet(sink))
    batch = rows_of(attribution_join_left_outer(*sides(spark.read.parquet(src))))
    assert streamed == batch == [(1, 2), (3, 4), (5, None), (6, None)]
