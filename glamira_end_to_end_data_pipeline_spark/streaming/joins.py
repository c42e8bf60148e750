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
