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

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.operators import multimodal as mm
from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.sources import read_table
from glamira_end_to_end_data_pipeline_spark.sources.ingest import (
    read_manifest,
    write_manifest,
)
from glamira_end_to_end_data_pipeline_spark.sources import lake
from glamira_end_to_end_data_pipeline_spark.sources.lake import (
    read_partitioned,
    write_partitioned,
)
from glamira_end_to_end_data_pipeline_spark.streaming import (
    attribution_join,
    dedup_replayed_events,
    run_incremental_load_once,
    session_aggregate,
    tumbling_event_counts,
)
from glamira_end_to_end_data_pipeline_spark.streaming.incremental import (
    snapshot_commit_load,
)


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


@query(
    "stream_session_windows",
    """
    WITH ev AS (
        SELECT user_id, ts, value, event_id FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    marked AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS s_idx
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess GROUP BY user_id, s_idx
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension — inactivity-gap sessionization via the native
    ``F.session_window`` (30-min gap; a gap of exactly 30:00 merges,
    session_end = last event + gap — semantics pinned against Spark by
    the oracle's lag + cumulative-sum formulation). Identical code path
    runs streaming with a watermark (streaming/sessions.py); evaluated
    here in batch mode so DuckDB can check it."""
    events = read_table(spark, sf_dir, "events")
    return session_aggregate(events)


@query(
    "stream_sliding_window_counts",
    """
    WITH g AS (
        SELECT event_type, ts,
               date_trunc('hour', ts)
                   + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                          ELSE INTERVAL 0 MINUTE END AS g30
        FROM events
    ),
    w AS (
        SELECT event_type,
               unnest([g30, g30 - INTERVAL 30 MINUTE]) AS window_start
        FROM g
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n_events
    FROM w
    GROUP BY 1, 2, 3
    """,
)
def stream_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension — sliding (hopping) windows: 1-hour windows every
    30 minutes, so each event lands in exactly two. ``F.window(ts, len,
    slide)`` expands rows window-side BEFORE the aggregation — the
    oracle mirrors that with an explicit 2-element unnest of the
    containing window starts. Same code path streams with a watermark."""
    events = read_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        events.groupBy(w.alias("__w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


@query(
    "stream_dedup_replayed",
    """
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_replayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-dedup semantics checked in batch: the event feed is
    delivered TWICE (union with itself — an at-least-once source's retry
    storm), deduped by event_id via :func:`dedup_replayed_events`, then
    rolled up per type. The oracle aggregates the original feed once —
    any duplicate surviving (or original lost) mismatches the hash. The
    same function on a stream swaps in dropDuplicatesWithinWatermark
    (bounded state; pinned by tests/test_streaming.py)."""
    events = read_table(spark, sf_dir, "events")
    redelivered = events.unionAll(events)
    return (
        dedup_replayed_events(redelivered)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "stream_interval_join_attribution",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 24 HOUR
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def stream_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension — stream-stream interval join (click→purchase
    attribution, 24 h lookback), evaluated in batch so DuckDB can
    hash-check the band semantics. The identical function joins two
    watermarked streams with bounded state (pinned equal-to-batch in
    tests/test_streaming.py)."""
    events = read_table(spark, sf_dir, "events")
    return attribution_join(
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "click"),
        lookback="24 hours",
    )


@query(
    "s5_s6_incremental_ingest",
    """
    SELECT event_type,
           count(*) AS n_rows,
           (SELECT count(*) FROM events) AS total_loaded,
           CAST(1 AS BIGINT) AS n_loaded_batches,
           (SELECT count(*) FROM events) AS manifest_rows
    FROM events GROUP BY event_type
    """,
)
def s5_s6_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6/S10/S11 end-to-end — the whole ingest loop the reference
    runs as GCS-event → BigQuery load (``trigger_bigquery_load.py:
    92-113,116-168``) + export manifest (``export_to_GCS.py:319-333``),
    oracle-checked through every surface at once:

    - S6 append sink: ``events`` is staged to parquet, drained through
      the Structured Streaming file source into the ``batch_id=N``
      target; per-type counts come from the *re-read target*.
    - S10 idempotency: a second drain with no new files must load no
      batch — ``n_loaded_batches`` stays 1 or the hash mismatches.
    - S11 audit sink: ``total_loaded`` is the audit table's summed
      ``row_count`` (and every status must be 'ok').
    - S5 manifest: the export summary is written via ``df.write.json``
      and re-read; ``manifest_rows`` comes from the round trip.
    """
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_s5s6_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    tgt = os.path.join(base, "tgt")
    audit = os.path.join(base, "audit")
    ckpt = os.path.join(base, "ckpt")
    manifest = os.path.join(base, "manifest")

    staged = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    staged.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    run_incremental_load_once(spark, src, tgt, audit, ckpt, schema, "events")
    # S10: re-drain — the checkpoint must prevent any re-load
    run_incremental_load_once(spark, src, tgt, audit, ckpt, schema, "events")

    loaded = spark.read.parquet(tgt)
    write_manifest(
        loaded.groupBy().agg(F.count("*").alias("row_count")).select(
            F.lit("events").alias("table"), "row_count"
        ),
        manifest,
    )
    mani_rows = read_manifest(spark, manifest).select(
        F.col("row_count").alias("manifest_rows")
    )
    audit_stats = (
        spark.read.parquet(audit)
        .filter((F.col("row_count") > 0) & (F.col("status") == "ok"))
        .agg(
            F.sum("row_count").alias("total_loaded"),
            F.count("*").alias("n_loaded_batches"),
        )
    )
    return (
        loaded.groupBy("event_type")
        .agg(F.count("*").alias("n_rows"))
        .crossJoin(F.broadcast(audit_stats))
        .crossJoin(F.broadcast(mani_rows))
        .select(
            "event_type", "n_rows", "total_loaded", "n_loaded_batches", "manifest_rows"
        )
    )


@query(
    "s_csv_round_trip",
    """
    SELECT event_type,
           count(*) AS n_rows,
           cast(sum(event_id) AS bigint) AS sum_ids,
           cast(sum(user_id) AS bigint) AS sum_users
    FROM events
    GROUP BY event_type
    """,
)
def s_csv_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink/source round trip (format breadth beside parquet, text,
    and JSON manifest): exact-typed columns staged with header, read
    back with an explicit schema (never inferSchema — a second pass
    over the data at scale), aggregated from the RE-READ copy. The
    oracle aggregates the original table — any encode/decode drift
    mismatches the hash."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_csv_{tag}")
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    events.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.schema("event_id long, user_id long, event_type string")
        .option("header", "true")
        .csv(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_ids"),
        F.sum("user_id").alias("sum_users"),
    )


@query(
    "s_orc_round_trip",
    """
    SELECT o_orderpriority,
           count(*) AS n_rows,
           cast(sum(o_orderkey) AS bigint) AS sum_keys,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def s_orc_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source round trip (the remaining first-class columnar
    format beside parquet/CSV/JSON/text): typed columns staged as ORC
    with zlib, read back and aggregated from the RE-READ copy; the
    oracle aggregates the original parquet, so any encode/decode drift
    (timestamp/decimal width, string encoding) mismatches the hash.
    ORC shares parquet's scan machinery — predicate pushdown and column
    pruning apply to the re-read the same way."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_orc_{tag}")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    orders.write.mode("overwrite").option("compression", "zlib").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("sum_keys"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "lake_merge_upsert",
    """
    WITH base AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
    ),
    upd AS (
        SELECT o_orderkey, o_orderpriority,
               round(o_totalprice + 1000.0, 2) AS o_totalprice
        FROM base
        WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey + 10000000 AS o_orderkey,
               '0-BACKFILL' AS o_orderpriority,
               round(o_totalprice, 2) AS o_totalprice
        FROM base
        WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 17 = 0
    ),
    merged AS (
        SELECT b.o_orderkey, b.o_orderpriority,
               round(b.o_totalprice, 2) AS o_totalprice
        FROM base b
        WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        UNION ALL
        SELECT * FROM upd
    )
    SELECT o_orderpriority,
           count(*) AS n_rows,
           cast(sum(o_orderkey) AS bigint) AS sum_keys,
           round(sum(o_totalprice), 2) AS sum_price
    FROM merged
    GROUP BY o_orderpriority
    """,
)
def lake_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on a partitioned parquet lake (the Delta/Hudi COW
    upsert without a table format): orders staged partitioned by
    priority, then one update batch that modifies existing '1-URGENT'
    rows (price bump) and inserts new keys into a brand-new
    '0-BACKFILL' partition. Only the touched partitions are read and
    rewritten (dynamic partition overwrite); the result aggregates the
    RE-READ on-disk state, so a clobbered untouched partition, a lost
    insert, or a surviving pre-update row all mismatch the oracle —
    which computes the expected post-merge state straight from the
    source table. Prices round-trip through round(2) on both sides so
    the parquet double encode cannot drift the hash."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_merge_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    base = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    base.write.partitionBy("o_orderpriority").parquet(path)
    urgent = base.filter(F.col("o_orderpriority") == "1-URGENT")
    updates = (
        urgent.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") + 1000.0, 2))
        .unionByName(
            urgent.filter(F.col("o_orderkey") % 17 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                F.lit("0-BACKFILL").alias("o_orderpriority"),
                F.round("o_totalprice", 2).alias("o_totalprice"),
            )
        )
    )
    lake.merge_upsert_partitioned(
        spark, path, updates, ["o_orderkey"], "o_orderpriority"
    )
    final = spark.read.parquet(path)
    return final.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("sum_keys"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "s_schema_evolution",
    """
    SELECT event_type,
           count(*) AS n_rows,
           cast(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
               AS bigint) AS n_v2_rows,
           cast(sum(CASE WHEN event_id % 2 = 0 THEN user_id
                    ELSE 0 END) AS bigint) AS sum_v2_users
    FROM events
    GROUP BY event_type
    """,
)
def s_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution (the lake reality: writers add columns
    over time): a v1 batch (event_id, event_type) and a widened v2
    batch (+user_id) land in one dataset; ``mergeSchema`` unifies the
    read schema, with NULL user_id for v1 files. The report counts v2
    rows and sums the evolved column — a reader that drops v1 files or
    misaligns the merged schema mismatches the oracle (which computes
    the same split straight from the source)."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_evo_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    events = read_table(spark, sf_dir, "events")
    v1 = events.filter(F.col("event_id") % 2 == 1).select("event_id", "event_type")
    v2 = events.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", "user_id"
    )
    v1.write.mode("append").parquet(base)
    v2.write.mode("append").parquet(base)
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    # v2-ness is detected from the DATA (user_id materialized non-null
    # after the merge), proving v1 files surfaced the evolved column as
    # NULL rather than being dropped or misaligned.
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("user_id").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_v2_rows"),
        F.sum(F.coalesce("user_id", F.lit(0))).cast("long").alias("sum_v2_users"),
    )


@query(
    "s_partitioned_lake",
    """
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    GROUP BY event_type
    """,
)
def s_partitioned_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned lake round trip: events land partitioned by
    event_date (repartition-first write — one file per day, not
    tasks×days small files), then a single day is read back through
    partition pruning (PartitionFilters plan shape pinned in
    tests/test_scale_ops.py) and rolled up. The oracle computes the
    same day's rollup straight from the source table — a pruning bug
    that drops or double-reads a file mismatches the hash."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_lake_{tag}")
    events = read_table(spark, sf_dir, "events").select(
        "event_type", "value", F.to_date("ts").alias("event_date")
    )
    write_partitioned(events, base, ["event_date"])
    day = read_partitioned(spark, base).filter(
        F.col("event_date") == F.lit("2024-01-15").cast("date")
    )
    return day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "mm_extract_features",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 255)) AS media_id),
    h AS (SELECT media_id, md5(media_id::VARCHAR) AS hx FROM ids),
    -- payload = unhex(repeat(md5hex, 4)): the 16 md5 bytes repeated 4x
    -- (64 bytes); stub feature 0 = (# bytes ≡ 0 mod 8) / 64 = c16/16.
    c AS (
        SELECT media_id,
               len(list_filter(
                   generate_series(0, 15),
                   i -> ('0x' || substr(hx, 2*i + 1, 2))::INT % 8 = 0
               )) AS c16
        FROM h
    )
    SELECT media_id,
           CASE media_id % 3 WHEN 0 THEN 'image'
                             WHEN 1 THEN 'audio'
                             ELSE 'video' END AS modality,
           64::BIGINT AS n_bytes,
           round(c16 / 16.0, 6) AS f0
    FROM c ORDER BY media_id
    """,
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over the synthetic media fixture:
    binary payloads → fixed-dim features via Arrow-batched mapInPandas
    (stub codec, real plumbing). The stub codec is deterministic
    arithmetic over md5-derived payload bytes, so the oracle can
    recompute feature 0 (byte-histogram bucket 0 over 64 payload bytes)
    exactly in SQL — every value is an exact binary fraction k/64."""
    feats = mm.extract_features(mm.synthetic_media(spark, 256))
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).cast("double").alias("f0"),
    ).orderBy("media_id")


_MM_COS = (
    "round(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
    "(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
    "sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))), 6)"
)


@query(
    "mm_feature_ann_topk",
    f"""
    WITH ids AS (SELECT unnest(generate_series(0, 255)) AS media_id),
    h AS (SELECT media_id, md5(media_id::VARCHAR) AS hx FROM ids),
    -- stub feature j = (# payload bytes ≡ j mod 8)/64 = count-over-16
    -- md5 bytes / 16 (payload is the 16 md5 bytes repeated 4x); every
    -- value is an exact binary fraction k/16 → float32/decimal-exact.
    f AS (
        SELECT media_id,
               list_transform(generate_series(0, 7), j ->
                   round(len(list_filter(generate_series(0, 15),
                       i -> ('0x' || substr(hx, 2*i + 1, 2))::INT % 8 = j))
                       / 16.0, 6)
               ) AS feat
        FROM h
    ),
    q AS (SELECT media_id AS query_id, feat AS q_vec FROM f WHERE media_id < 8),
    c AS (SELECT media_id AS neighbor_id, feat AS c_vec FROM f WHERE media_id >= 8),
    scored AS (
        SELECT query_id, neighbor_id,
               {_MM_COS.format(a="q_vec", b="c_vec")} AS cosine_sim
        FROM c, q
    )
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def mm_feature_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal → similarity composition: stub-encoded media features
    (Arrow mapInPandas) feed the SAME brute-force cosine top-k operator
    the embedding family uses — the 'embed then search' pipeline in one
    plan. The stub's byte-histogram features are exact binary fractions,
    so the cross-engine hash check covers the full vector, not just one
    component."""
    from glamira_end_to_end_data_pipeline_spark.operators import similarity

    feats = mm.extract_features(mm.synthetic_media(spark, 256)).select(
        "media_id", "features"
    )
    return similarity.brute_force_topk(
        feats.filter(F.col("media_id") < 8),
        feats.filter(F.col("media_id") >= 8),
        k=3,
        id_col="media_id",
        vec_col="features",
    )


@query(
    "mm_resize_images",
    """
    -- images: id % 3 = 0, w = (id%7)*100+100, h = (id%5)*100+100,
    -- payload 64 bytes; stub resize to max_side 256: unchanged when
    -- max(w,h) <= 256, else dims scale by 256/max (int-truncated) and
    -- the payload keeps floor(64*scale^2) bytes (>=1).
    WITH ids AS (SELECT unnest(generate_series(0, 127)) AS media_id),
    img AS (
        SELECT media_id,
               ((media_id % 7) * 100 + 100) AS w,
               ((media_id % 5) * 100 + 100) AS h
        FROM ids WHERE media_id % 3 = 0
    )
    SELECT media_id,
           CASE WHEN greatest(w, h) <= 256 THEN w
                ELSE cast(floor(w * (256.0 / greatest(w, h))) AS int)
           END AS width,
           CASE WHEN greatest(w, h) <= 256 THEN h
                ELSE cast(floor(h * (256.0 / greatest(w, h))) AS int)
           END AS height,
           CASE WHEN greatest(w, h) <= 256 THEN cast(64 AS bigint)
                ELSE greatest(1, cast(floor(
                    64 * (256.0 / greatest(w, h)) * (256.0 / greatest(w, h)))
                    AS bigint))
           END AS n_bytes
    FROM img
    """,
)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing (mapInPandas; stub resampler): metadata
    dims rescale exactly as a real resizer would and the payload
    truncates by the area ratio — deterministic arithmetic over the
    synthetic fixture, so dims AND payload length are oracle-checked.
    Completes the multimodal surface: every mm operator now has a
    hash-checked registry entry."""
    resized = mm.resize_images(mm.synthetic_media(spark, 128), max_side=256)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.length("payload").cast("long").alias("n_bytes"),
    )


@query(
    "mm_video_frame_sample",
    """
    -- videos: id % 3 = 2, duration_ms = id*500 + 1000, payload 64 bytes;
    -- sampled offsets 0..duration-1 step 1000; stub frame = payload
    -- slice [k % 64, k % 64 + 16) for frame index k → length
    -- min(16, 64 - k % 64).
    WITH vids AS (
        SELECT media_id, media_id * 500 + 1000 AS dur
        FROM (SELECT unnest(generate_series(0, 127)) AS media_id)
        WHERE media_id % 3 = 2
    ),
    frames AS (
        SELECT media_id,
               unnest(generate_series(0, dur - 1, 1000)) AS frame_ms
        FROM vids
    )
    SELECT media_id, frame_ms,
           least(16, 64 - (frame_ms // 1000) % 64)::INT AS frame_bytes
    FROM frames ORDER BY media_id, frame_ms
    """,
)
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled offset via
    mapInPandas. The stub sampler's offsets and slice lengths are
    deterministic arithmetic over (media_id, duration_ms), so the
    oracle recomputes them with generate_series."""
    frames = mm.sample_video_frames(mm.synthetic_media(spark, 128), every_ms=1000)
    return frames.select(
        "media_id", "frame_ms", F.length("frame_payload").alias("frame_bytes")
    ).orderBy("media_id", "frame_ms")


@query(
    "lake_snapshot_read",
    """
    WITH v1 AS (SELECT * FROM orders WHERE o_orderdate < DATE '1995-01-01'),
         v2 AS (SELECT * FROM orders),
         delta AS (SELECT * FROM orders WHERE o_orderdate >= DATE '1995-01-01')
    SELECT 'v1' AS snapshot, count(*) AS n_rows,
           cast(sum(o_orderkey) AS bigint) AS sum_keys,
           round(sum(o_totalprice), 2) AS sum_price
    FROM v1
    UNION ALL
    SELECT 'v2', count(*), cast(sum(o_orderkey) AS bigint),
           round(sum(o_totalprice), 2) FROM v2
    UNION ALL
    SELECT 'v2_delta', count(*), cast(sum(o_orderkey) AS bigint),
           round(sum(o_totalprice), 2) FROM delta
    """,
)
def lake_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel + incremental read on the manifest-committed
    lake (sources/lake.py:write_snapshot): commit v1 (pre-1995 orders),
    append-commit v2 (the rest), then audit all three read paths —
    time-travel to v1 (must NOT see the later append: snapshot
    isolation), latest (v2 = full table), and the CDC file-diff read of
    exactly the appended batch. The oracle recomputes each state from
    the source table, so a manifest that leaks v2 files into v1, loses
    an append, or mis-diffs the delta all hash-mismatch. Prices
    round-trip through round(2) pre-write so the parquet double encode
    cannot drift the hash."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_snap_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    cutoff = F.lit("1995-01-01").cast("date")
    lake.write_snapshot(spark, orders.filter(F.col("o_orderdate") < cutoff), path)
    lake.write_snapshot(spark, orders.filter(F.col("o_orderdate") >= cutoff), path)

    def summarize(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        ).select(F.lit(label).alias("snapshot"), "n_rows", "sum_keys", "sum_price")

    return (
        summarize(lake.read_snapshot(spark, path, 1), "v1")
        .unionByName(summarize(lake.read_snapshot(spark, path), "v2"))
        .unionByName(summarize(lake.read_incremental(spark, path, 1, 2), "v2_delta"))
    )


@query(
    "lake_gc_orphans",
    """
    WITH v1 AS (SELECT * FROM orders WHERE o_orderdate < DATE '1995-01-01')
    SELECT 2 AS n_orphans_removed,
           count(*) AS n_rows_latest,
           cast(sum(o_orderkey) AS bigint) AS sum_keys_latest,
           (SELECT count(*) FROM v1) AS n_rows_v1
    FROM orders
    """,
)
def lake_gc_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-file GC on the manifest-committed lake
    (sources/lake.py:gc_orphan_files — the remove_orphan_files/VACUUM
    maintenance job): commit v1 and v2, then simulate a CRASHED commit
    by writing a 2-file data directory with no manifest. GC must remove
    exactly those 2 unreferenced files and nothing else — proven by
    re-reading BOTH the latest snapshot (full table) and the v1
    time-travel snapshot after the sweep and hash-checking them against
    the source-derived oracle. A GC that deletes referenced files,
    or misses the orphans, mismatches."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_gc_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cutoff = F.lit("1995-01-01").cast("date")
    lake.write_snapshot(spark, orders.filter(F.col("o_orderdate") < cutoff), path)
    lake.write_snapshot(spark, orders.filter(F.col("o_orderdate") >= cutoff), path)
    # Crashed third commit: data files landed, manifest never renamed in.
    orders.limit(10).repartition(2).write.parquet(path + "/data/v3")
    removed = lake.gc_orphan_files(spark, path)

    latest = lake.read_snapshot(spark, path)
    v1_rows = lake.read_snapshot(spark, path, 1).count()
    return latest.agg(
        F.count(F.lit(1)).alias("n_rows_latest"),
        F.sum("o_orderkey").cast("bigint").alias("sum_keys_latest"),
    ).select(
        F.lit(removed).cast("int").alias("n_orphans_removed"),
        "n_rows_latest",
        "sum_keys_latest",
        F.lit(v1_rows).cast("long").alias("n_rows_v1"),
    )


@query(
    "lake_compact_commit",
    """
    WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_orderkey % 3 = 0)
    SELECT 3 AS compacted_version,
           2 AS n_compacted_files,
           count(*) AS n_rows,
           cast(sum(o_orderkey) AS bigint) AS sum_keys,
           round(sum(round(o_totalprice, 2)), 2) AS sum_price,
           count(*) AS n_rows_v2
    FROM base
    """,
)
def lake_compact_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction as a COMMIT (Iceberg rewrite_data_files shape,
    sources/lake.py:compact_snapshot): two fragmented append commits
    (8 + 4 files), then a compaction commit rewrites the table into 2
    files behind a new manifest — readers flip atomically, nothing is
    modified in place, and v2 time travel still sees the pre-compaction
    state. The result re-reads the COMPACTED manifest and must
    hash-match the source-derived oracle (row loss, duplication, or a
    manifest still referencing fragments all mismatch)."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_cc_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    base = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )
    half = base.filter(F.col("o_orderkey") % 2 == 0)
    rest = base.filter(F.col("o_orderkey") % 2 != 0)
    lake.write_snapshot(spark, half.repartition(8), path)
    lake.write_snapshot(spark, rest.repartition(4), path)
    version, n_files = lake.compact_snapshot(spark, path, n_files=2)
    v2_rows = lake.read_snapshot(spark, path, 2).count()
    return (
        lake.read_snapshot(spark, path)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.lit(version).cast("int").alias("compacted_version"),
            F.lit(n_files).cast("int").alias("n_compacted_files"),
            "n_rows",
            "sum_keys",
            "sum_price",
            F.lit(v2_rows).cast("long").alias("n_rows_v2"),
        )
    )


@query(
    "stream_snapshot_commits",
    """
    WITH src AS (SELECT event_id, event_type, value FROM events)
    SELECT event_type,
           count(*) AS n_rows,
           round(sum(round(value, 2)), 2) AS total_value,
           (SELECT count(*) FROM src) AS n_rows_total
    FROM src
    GROUP BY event_type
    """,
)
def stream_snapshot_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion INTO the manifest-committed lake
    (streaming/incremental.py:snapshot_commit_load): the events feed is
    staged as files, drained through the Structured Streaming file
    source, and each micro-batch lands as one tagged append-snapshot
    commit. Exactly-once is then attacked twice: (1) a re-drain with
    the same checkpoint must see no new files, and (2) a re-drain with
    a FRESH checkpoint — a full redelivery, the at-least-once
    worst case — re-offers every batch, and the batch-tag skip must
    make each replay a no-op. The result aggregates the re-read LATEST
    snapshot: any double-append, lost batch, or torn commit mismatches
    the once-only oracle."""
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_snapsink_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    table = os.path.join(base, "table")
    ckpt1 = os.path.join(base, "ckpt1")
    ckpt2 = os.path.join(base, "ckpt2")

    staged = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round("value", 2).alias("value")
    )
    staged.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    snapshot_commit_load(spark, src, table, ckpt1, schema)
    # same checkpoint: no new files -> no new commits
    snapshot_commit_load(spark, src, table, ckpt1, schema)
    # FRESH checkpoint: full redelivery -> tag skip must no-op every batch
    snapshot_commit_load(spark, src, table, ckpt2, schema)

    latest = lake.read_snapshot(spark, table)
    total = latest.count()
    return latest.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).withColumn("n_rows_total", F.lit(total).cast("long"))
