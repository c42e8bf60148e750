"""Registry entries for the streaming + multimodal surfaces.

``stream_tumbling_event_counts`` runs the *same* aggregation function
used by the Structured Streaming demo (streaming/incremental.py) in its
batch form — watermarking is a no-op on batch frames, so the oracle can
check the windowing semantics SQL-side with date_trunc.

The multimodal entries are rows-only (no oracle): mapInPandas pipelines
with a stubbed codec are not SQL-expressible; their semantics are
pinned by tests/test_multimodal.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.operators import multimodal as mm
from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.sources import read_table
from glamira_end_to_end_data_pipeline_spark.streaming import tumbling_event_counts


@query(
    "stream_tumbling_event_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window counts (§2.9 extension) — the exact
    aggregation the streaming pipeline runs, evaluated in batch mode.
    1-hour tumbling windows align with date_trunc('hour'), which is what
    lets DuckDB express the oracle."""
    events = read_table(spark, sf_dir, "events")
    return tumbling_event_counts(events, "1 hour")


@query("mm_extract_features")
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over the synthetic media fixture:
    binary payloads → fixed-dim features via Arrow-batched mapInPandas
    (stub codec, real plumbing). No oracle: not SQL-expressible;
    rows-only check, semantics pinned by tests/test_multimodal.py."""
    feats = mm.extract_features(mm.synthetic_media(spark, 256))
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("f0"),
    ).orderBy("media_id")


@query("mm_video_frame_sample")
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled offset via
    mapInPandas. No oracle: not SQL-expressible; rows-only check,
    semantics pinned by tests/test_multimodal.py."""
    frames = mm.sample_video_frames(mm.synthetic_media(spark, 128), every_ms=1000)
    return frames.select(
        "media_id", "frame_ms", F.length("frame_payload").alias("frame_bytes")
    ).orderBy("media_id", "frame_ms")
