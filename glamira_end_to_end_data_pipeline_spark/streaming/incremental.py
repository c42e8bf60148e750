"""Incremental / streaming ingestion (SURVEY §2.9, §2.1 S9-S11).

The reference's only streaming construct is file-arrival-triggered
append: one GCS object-finalize event → one BigQuery load job, append
disposition, idempotent via a stable job id, with a per-load audit row
(ref ``6.data-pipeline-storage/trigger_bigquery_load.py:18,92-113,
116-168``). Structured Streaming's file source replaces the whole event
plumbing: the checkpoint tracks exactly which files were ingested
(replacing the stable-job-id dedup), ``foreachBatch`` writes the target
table and the audit row in one place, and a restart resumes without
re-loading (replacing the Cloud Functions retry semantics).

Beyond-reference extension, clearly marked: event-time tumbling-window
counts with a watermark over the ``events`` table — the streaming
pattern a clickstream pipeline grows into next.

Scale: the file source lists incrementally (``maxFilesPerTrigger``
bounds batch size); the append sink is partitioned-parquet, so 100 TB
arrives as many small batches each writing only new partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

AUDIT_SCHEMA = (
    "load_ts timestamp, batch_id long, target_table string, "
    "row_count long, source_files array<string>, status string"
)


def incremental_file_load(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    audit_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    table_name: str = "events",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-arrival-triggered append with an audit table.

    Each micro-batch appends newly arrived Parquet files' rows to
    ``target_dir`` and one audit row to ``audit_dir`` — the Spark-native
    form of the reference's load job + audit-table pair. Exactly-once
    file tracking lives in ``checkpoint_dir``; replaying a file never
    double-loads (the reference needed a hand-rolled stable job id for
    the same guarantee).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        files = [
            os.path.basename(r.f)
            for r in batch.select(
                F.input_file_name().alias("f")
            ).distinct().collect()
        ]
        n = batch.count()
        batch.write.mode("append").parquet(target_dir)
        audit = spark_b.createDataFrame(
            [(batch_id, table_name, n, sorted(files), "ok")],
            "batch_id long, target_table string, row_count long, "
            "source_files array<string>, status string",
        ).select(
            F.current_timestamp().alias("load_ts"),
            "batch_id",
            "target_table",
            "row_count",
            "source_files",
            "status",
        )
        audit.write.mode("append").parquet(audit_dir)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_incremental_load_once(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    audit_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    table_name: str = "events",
) -> None:
    """Drain all currently-available files and stop (availableNow) —
    the batch-invokable form used by tests and backfills."""
    q = incremental_file_load(
        spark, source_dir, target_dir, audit_dir, checkpoint_dir, schema, table_name
    )
    q.awaitTermination()


def tumbling_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Beyond-reference demo: event-time tumbling-window counts with a
    watermark for late data. Works identically over a batch DataFrame
    (watermark is a no-op) and a streaming one (state eviction)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )
