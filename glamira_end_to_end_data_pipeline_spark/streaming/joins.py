"""Stream-stream interval join: click→purchase attribution.

The reference's enrichment joins are all static-dim lookups; the
streaming-native extension is joining two *unbounded* sides — the shape
Structured Streaming supports only as an equi-join plus event-time range
with watermarks on both inputs bounding the buffered state
(conversion-attribution, impression-click stitching, request-response
pairing all reduce to it).

One function serves batch and streaming (the DataFrame API is identical;
Spark picks the stateful symmetric-hash join iff the inputs are
streaming). The registry entry runs it in batch so the DuckDB oracle can
hash-check the semantics; tests/test_streaming.py drains the same
function over a watermarked two-batch stream and asserts the streamed
result equals the batch result — state cleanup included.

Scale: the join is an equi-join on the user key (hash-shuffle both
sides once) with the time band as a post-condition; in streaming, the
watermark + band bound each side's state to |events in lookback window|
per key — without them the state grows unboundedly, which Spark rejects
at analysis time (append mode requires the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "24 hours",
) -> DataFrame:
    """Attribute to each purchase every click by the same user within
    ``lookback`` before it (inclusive on both ends).

    Inputs carry (event_id, user_id, ts); streaming callers must
    ``withWatermark`` both sides before calling.
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("click_user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


def attribution_join_left_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    lookahead: str = "24 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream join — every click, attributed to each
    same-user purchase within ``lookahead`` AFTER it, or emitted with a
    NULL purchase if none arrives: the "unconverted clicks" feed that
    an inner join structurally cannot produce. In streaming, Spark
    buffers each left row until the watermark passes the end of its
    join window and only THEN emits the null-padded row (the unmatched
    verdict needs the window closed) — which is why both sides must be
    watermarked and the time band must bound the condition; the
    streamed result equals this batch plan once the watermark clears
    the data (pinned in tests/test_streaming.py with a
    watermark-advancing sentinel).

    Scale: same state shape as :func:`attribution_join` — equi-join on
    the user key, band as post-condition, per-key state bounded by the
    lookahead window on both sides."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {lookahead}")
        ),
        "left_outer",
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts")
