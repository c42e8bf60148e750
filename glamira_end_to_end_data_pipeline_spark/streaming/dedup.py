"""Streaming exact dedup (§2.9 + north-star dedup family): drop
re-delivered events by key with *bounded* state.

A training-data ingest stream sees duplicate deliveries (at-least-once
sources, retried producers). Plain ``dropDuplicates`` on a stream keeps
every key seen forever — state grows with the key cardinality, which at
100 TB is the table itself. ``dropDuplicatesWithinWatermark`` keeps a
key only until the watermark passes its event time, so state is bounded
by (arrival rate × watermark horizon) — the correct primitive when
duplicates arrive close to the original, which is what retry storms
look like.

Batch frames take the plain ``dropDuplicates`` path: with the whole
input in range the two semantics coincide, which is what lets the
DuckDB oracle check the operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_replayed_events(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Exactly-one-row-per-key over a possibly-redelivered event feed.

    Streaming: watermark + ``dropDuplicatesWithinWatermark`` — a
    duplicate arriving within ``watermark_delay`` of the original is
    dropped; state for a key is evicted once the watermark passes its
    timestamp, so the store never holds more than the horizon's keys.
    Batch: ``dropDuplicates`` (identical result when the frame is the
    whole horizon).
    """
    keys = list(key_cols)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
