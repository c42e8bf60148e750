"""Driver-registry entries for the star-schema models.

The glamira raw tables don't exist in the driver testdata, so each entry
derives a summary/product/geo-shaped input from ``events`` with pure
deterministic column expressions — *identically* on the Spark side (via
``summary_from_events`` etc.) and in the oracle SQL (via the shared CTE
text below) — then runs the REAL model functions from
``plans.models``. What's compared is therefore the model semantics
(typed projection, dedup-to-latest, surrogate keys, null-miss joins,
spine generation), not the synthetic mapping.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.caching import tracked_persist
from glamira_end_to_end_data_pipeline_spark.plans import models
from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.sources import read_table

# ---------------------------------------------------------------------------
# events -> summary-shaped raw table (Spark + SQL twins)
# ---------------------------------------------------------------------------


def summary_from_events(events: DataFrame) -> DataFrame:
    eid, uid = F.col("event_id"), F.col("user_id")
    ip = F.concat_ws(
        ".",
        ((uid * 2654435761) % 223 + 1).cast("string"),
        ((uid * 40503) % 256).cast("string"),
        ((uid * 65537) % 256).cast("string"),
        ((uid * 97) % 256).cast("string"),
    )
    pid = F.concat(F.lit("P"), (eid % 37).cast("string"))
    return events.select(
        F.unix_timestamp("ts").alias("time_stamp"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("local_time"),
        F.when(uid % 5 == 0, F.lit(None).cast("string"))
        .otherwise(uid.cast("string"))
        .alias("user_id_db"),
        F.when(eid % 6 == 0, F.lit(None).cast("string")).otherwise(pid).alias(
            "product_id"
        ),
        F.when(eid % 10 < 3, F.concat(F.lit("O"), (eid % 101).cast("string"))).alias(
            "order_id"
        ),
        F.concat(F.lit("D"), (uid % 7).cast("string")).alias("device_id"),
        F.when(eid % 20 == 0, F.lit(None).cast("string"))
        .when(eid % 21 == 0, F.lit(""))
        .otherwise(ip)
        .alias("ip"),
        F.when(uid % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("UA-"), (uid % 13).cast("string")))
        .alias("user_agent"),
        F.when(eid % 7 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.element_at(
                F.array(F.lit("1920x1080"), F.lit("1366x768"), F.lit("390x844")),
                (uid % 3 + 1).cast("int"),
            )
        )
        .alias("resolution"),
        F.when(eid % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("https://ref.example/"), (eid % 5).cast("string")))
        .alias("referrer_url"),
        F.concat(
            F.lit("https://shop.example"),
            F.when(
                eid % 3 == 0,
                F.concat(F.lit("/catalog/product/view/id/"), (eid % 37).cast("string")),
            ).otherwise(F.concat(F.lit("/p/"), (eid % 37).cast("string"))),
        ).alias("current_url"),
        (uid % 10).cast("string").alias("store_id"),
        F.when(uid % 2 == 0, F.lit("1.0")).otherwise(F.lit("2.0")).alias("api_version"),
        F.when(uid % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("u"), uid.cast("string"), F.lit("@example.com")))
        .alias("email_address"),
        F.when(eid % 13 == 0, F.lit("N/A"))
        .otherwise(F.round("value", 2).cast("string"))
        .alias("price"),
        F.element_at(
            F.array(F.lit("EUR"), F.lit("USD"), F.lit("GBP"), F.lit("CHF")),
            (uid % 4 + 1).cast("int"),
        ).alias("currency"),
    )


SUMMARY_CTE = """
summary AS (
    SELECT cast(floor(epoch(ts)) AS bigint) AS time_stamp,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS local_time,
           CASE WHEN user_id % 5 = 0 THEN NULL
                ELSE cast(user_id AS varchar) END AS user_id_db,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE 'P' || cast(event_id % 37 AS varchar) END AS product_id,
           CASE WHEN event_id % 10 < 3
                THEN 'O' || cast(event_id % 101 AS varchar) END AS order_id,
           'D' || cast(user_id % 7 AS varchar) AS device_id,
           CASE WHEN event_id % 20 = 0 THEN NULL
                WHEN event_id % 21 = 0 THEN ''
                ELSE ((user_id * 2654435761) % 223 + 1) || '.' ||
                     ((user_id * 40503) % 256) || '.' ||
                     ((user_id * 65537) % 256) || '.' ||
                     ((user_id * 97) % 256) END AS ip,
           CASE WHEN user_id % 11 = 0 THEN NULL
                ELSE 'UA-' || cast(user_id % 13 AS varchar) END AS user_agent,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE (['1920x1080', '1366x768', '390x844'])[user_id % 3 + 1]
                END AS resolution,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE 'https://ref.example/' || cast(event_id % 5 AS varchar)
                END AS referrer_url,
           'https://shop.example' ||
               CASE WHEN event_id % 3 = 0
                    THEN '/catalog/product/view/id/' || cast(event_id % 37 AS varchar)
                    ELSE '/p/' || cast(event_id % 37 AS varchar) END AS current_url,
           cast(user_id % 10 AS varchar) AS store_id,
           CASE WHEN user_id % 2 = 0 THEN '1.0' ELSE '2.0' END AS api_version,
           CASE WHEN user_id % 3 = 0 THEN NULL
                ELSE 'u' || cast(user_id AS varchar) || '@example.com'
                END AS email_address,
           CASE WHEN event_id % 13 = 0 THEN 'N/A'
                ELSE cast(round(value, 2) AS varchar) END AS price,
           (['EUR', 'USD', 'GBP', 'CHF'])[user_id % 4 + 1] AS currency
    FROM events
)
"""

STG_CTE = """
stg AS (
    SELECT make_timestamp(time_stamp * 1000000) AS event_timestamp,
           local_time,
           user_id_db AS customer_source_id,
           product_id AS product_source_id,
           order_id AS order_source_id,
           device_id,
           ip AS ip_address,
           user_agent, resolution, referrer_url, current_url,
           store_id, api_version, email_address,
           try_cast(price AS double) AS price,
           currency
    FROM summary
)
"""

_SK = "coalesce(cast({} AS varchar), '_dbt_utils_surrogate_key_null_')"


def _sk_sql(*cols: str) -> str:
    return "md5(concat_ws('-', " + ", ".join(_SK.format(c) for c in cols) + "))"


# ---------------------------------------------------------------------------
# product_details / ip_locations shaped inputs (for dim_product/location/fact)
# ---------------------------------------------------------------------------


def product_details_from_events(events: DataFrame) -> DataFrame:
    """~4/5 of the product ids seen in summary (pid suffix % 5 != 0 kept)
    so the fact's unmatched->'-1' path is exercised."""
    pids = (
        events.select((F.col("event_id") % 37).alias("pnum"))
        .distinct()
        .filter(F.col("pnum") % 5 != 0)
    )
    pid = F.concat(F.lit("P"), F.col("pnum").cast("string"))
    return pids.select(
        pid.alias("product_id"),
        F.concat(F.lit("Product "), pid, F.lit(" | GLAMIRA Shop")).alias(
            "product_name"
        ),
        F.round(F.col("pnum") * 13.75 + 99.9, 2).alias("price"),
        F.lit("EUR").alias("currency"),
        F.concat(F.lit("cat"), (F.col("pnum") % 5).cast("string")).alias("category"),
        F.concat(
            F.lit("Home > cat"), (F.col("pnum") % 5).cast("string"), F.lit(" > "), pid
        ).alias("category_path"),
        F.concat(F.lit("Description of "), pid).alias("description"),
        F.concat(F.lit("https://img.example/"), pid, F.lit(".jpg")).alias("image_url"),
        F.round((F.col("pnum") % 50) / 10.0, 1).alias("rating"),
        F.lit("2024-02-01T10:00:00").alias("crawled_at"),
    )


PRODUCT_DETAILS_CTE = """
product_details AS (
    SELECT 'P' || cast(pnum AS varchar) AS product_id,
           'Product P' || cast(pnum AS varchar) || ' | GLAMIRA Shop' AS product_name,
           round(pnum * 13.75e0 + 99.9e0, 2) AS price,
           'EUR' AS currency,
           'cat' || cast(pnum % 5 AS varchar) AS category,
           'Home > cat' || cast(pnum % 5 AS varchar) || ' > P' || cast(pnum AS varchar)
               AS category_path,
           'Description of P' || cast(pnum AS varchar) AS description,
           'https://img.example/P' || cast(pnum AS varchar) || '.jpg' AS image_url,
           round((pnum % 50) / 10.0e0, 1) AS rating,
           '2024-02-01T10:00:00' AS crawled_at
    FROM (SELECT DISTINCT event_id % 37 AS pnum FROM events)
    WHERE pnum % 5 <> 0
)
"""


def ip_locations_from_events(events: DataFrame) -> DataFrame:
    """Two enrichment rows per seen ip (one stale, one fresh with
    differing city) so dim_location's dedup-to-latest is observable;
    ips whose first octet % 7 == 0 are missing (fact '-1' path);
    country '-' sentinel on % 11 == 0 (kept as-is by the reference's
    dim — sentinel nulling happens upstream at enrichment)."""
    uid = F.col("user_id")
    o1 = (uid * 2654435761) % 223 + 1
    ip = F.concat_ws(
        ".",
        o1.cast("string"),
        ((uid * 40503) % 256).cast("string"),
        ((uid * 65537) % 256).cast("string"),
        ((uid * 97) % 256).cast("string"),
    )
    base = (
        events.select(ip.alias("ip_address"), o1.alias("o1"))
        .distinct()
        .filter(F.col("o1") % 7 != 0)
    )
    country = F.when(F.col("o1") % 11 == 0, F.lit("-")).otherwise(
        F.concat(F.lit("C"), (F.col("o1") % 50).cast("string"))
    )

    def variant(city_tag: str, ts_off: int) -> DataFrame:
        return base.select(
            "ip_address",
            F.concat(F.lit(city_tag), (F.col("o1") % 30).cast("string")).alias(
                "city_name"
            ),
            country.alias("country_code"),
            F.concat(F.lit("Country"), (F.col("o1") % 50).cast("string")).alias(
                "country_name"
            ),
            F.concat(F.lit("Region"), (F.col("o1") % 12).cast("string")).alias(
                "region_name"
            ),
            (F.lit(1706745600) + F.col("o1") * 60 + ts_off).alias("processed_at"),
        )

    return variant("OldCity", 0).unionByName(variant("NewCity", 86400))


IP_LOCATIONS_CTE = """
ip_base AS (
    SELECT DISTINCT
           ((user_id * 2654435761) % 223 + 1) || '.' ||
           ((user_id * 40503) % 256) || '.' ||
           ((user_id * 65537) % 256) || '.' ||
           ((user_id * 97) % 256) AS ip_address,
           (user_id * 2654435761) % 223 + 1 AS o1
    FROM events
),
ip_locations AS (
    SELECT ip_address,
           tag || cast(o1 % 30 AS varchar) AS city_name,
           CASE WHEN o1 % 11 = 0 THEN '-'
                ELSE 'C' || cast(o1 % 50 AS varchar) END AS country_code,
           'Country' || cast(o1 % 50 AS varchar) AS country_name,
           'Region' || cast(o1 % 12 AS varchar) AS region_name,
           1706745600 + o1 * 60 + off AS processed_at
    FROM ip_base, (VALUES ('OldCity', 0), ('NewCity', 86400)) v(tag, off)
    WHERE o1 % 7 <> 0
)
"""


# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


@query(
    "star_stg_summary",
    f"""
    WITH {SUMMARY_CTE.strip()},
    {STG_CTE.strip()}
    SELECT * FROM stg
    """,
)
def star_stg_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/F1/F2 — the stg_summary model (ref ``stg_summary.sql``) over the
    events-derived raw table."""
    return models.stg_summary(summary_from_events(_events(spark, sf_dir)))


@query(
    "star_dim_customer",
    f"""
    WITH {SUMMARY_CTE.strip()},
    {STG_CTE.strip()},
    dc AS (
        SELECT DISTINCT customer_source_id, email_address, device_id, event_timestamp
        FROM stg WHERE customer_source_id IS NOT NULL
    )
    SELECT {_sk_sql("customer_source_id")} AS customer_key,
           customer_source_id, email_address, device_id,
           cast(event_timestamp AS date) AS insert_date
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY customer_source_id
            ORDER BY event_timestamp DESC NULLS LAST,
                     email_address DESC NULLS LAST,
                     device_id DESC NULLS LAST) AS rn
        FROM dc
    ) WHERE rn = 1
    """,
)
def star_dim_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/W1/F4 — dim_customer (ref ``dim_customer.sql``): distinct grain,
    dedup-to-latest, md5 surrogate key."""
    stg = models.stg_summary(summary_from_events(_events(spark, sf_dir)))
    return models.dim_customer(stg)


@query(
    "star_dim_session_context",
    f"""
    WITH {SUMMARY_CTE.strip()},
    {STG_CTE.strip()},
    ds AS (
        SELECT DISTINCT ip_address, user_agent, resolution, referrer_url,
               current_url, store_id, api_version
        FROM stg
        WHERE ip_address IS NOT NULL OR user_agent IS NOT NULL
    )
    SELECT {_sk_sql("ip_address", "user_agent", "resolution", "referrer_url",
                    "current_url", "store_id", "api_version")}
               AS session_context_key,
           ip_address, user_agent, resolution, referrer_url, current_url,
           store_id, api_version
    FROM ds
    """,
)
def star_dim_session_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/P5/F4 — dim_session_context (ref ``dim_session_context.sql``):
    7-column distinct + composite surrogate key with NULL sentinels."""
    stg = models.stg_summary(summary_from_events(_events(spark, sf_dir)))
    return models.dim_session_context(stg)


@query(
    "star_date_range",
    f"""
    WITH {SUMMARY_CTE.strip()},
    {STG_CTE.strip()}
    SELECT coalesce(min(cast(event_timestamp AS date)), current_date) AS start_date,
           coalesce(max(cast(event_timestamp AS date)), current_date) AS end_date
    FROM stg
    """,
)
def star_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stg_summary_date_range model (ref
    ``stg_summary_date_range.sql:3-21``) as its own graded entry — the
    8th of the reference's 8 dbt models (previously exercised only
    inside dim_date). The reference asks BigQuery partition metadata for
    the ingestion-date bounds; the Spark-first twin is min/max over the
    event-timestamp date, answered by parquet footer stats without a
    full scan, with NULL bounds coalescing to the run date."""
    stg = models.stg_summary(summary_from_events(_events(spark, sf_dir)))
    return models.stg_summary_date_range(stg)


@query(
    "star_dim_date",
    f"""
    WITH {SUMMARY_CTE.strip()},
    {STG_CTE.strip()},
    rng AS (
        SELECT coalesce(min(cast(event_timestamp AS date)), current_date) AS start_date,
               coalesce(max(cast(event_timestamp AS date)), current_date) AS end_date
        FROM stg
    ),
    spine AS (
        -- dbt date_spine is end-exclusive: last row is end+29d
        SELECT cast(unnest(generate_series(
                   least(start_date, end_date) - 30,
                   greatest(start_date, end_date) + 29,
                   INTERVAL 1 DAY)) AS date) AS date_day
        FROM rng
    )
    SELECT cast(strftime(date_day, '%Y%m%d') AS bigint) AS date_key,
           date_day AS full_date,
           dayofmonth(date_day) AS day_of_month,
           month(date_day) AS month_of_year,
           year(date_day) AS calendar_year,
           quarter(date_day) AS calendar_quarter,
           dayname(date_day) AS day_name,
           strftime(date_day, '%a') AS day_name_short,
           monthname(date_day) AS month_name,
           strftime(date_day, '%b') AS month_name_short,
           dayofweek(date_day) + 1 AS day_of_week,
           CASE WHEN dayofyear(date_day) <
                     1 + (8 - (dayofweek(date_trunc('year', date_day)) + 1)) % 7
                THEN 0
                ELSE cast(floor((dayofyear(date_day)
                     - (1 + (8 - (dayofweek(date_trunc('year', date_day)) + 1)) % 7))
                     / 7) AS bigint) + 1 END AS calendar_week,
           CASE WHEN dayofweek(date_day) IN (0, 6) THEN true ELSE false END
               AS is_weekend
    FROM spine
    """,
)
def star_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/F6-F12 — dim_date (ref ``dim_date.sql``): ±30d padded spine +
    BigQuery-parity date parts (Sunday-week-0 calendar_week)."""
    stg = models.stg_summary(summary_from_events(_events(spark, sf_dir)))
    return models.dim_date(models.stg_summary_date_range(stg))


@query(
    "star_dim_product",
    f"""
    WITH {PRODUCT_DETAILS_CTE.strip()}
    SELECT {_sk_sql("product_id")} AS product_key,
           product_id AS product_source_id,
           product_name,
           price AS list_price,
           currency AS currency_code,
           category, category_path, description, image_url, rating,
           try_cast(crawled_at AS timestamp) AS insert_timestamp
    FROM product_details
    """,
)
def star_dim_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 + projection — dim_product (ref ``dim_product.sql``)."""
    return models.dim_product(product_details_from_events(_events(spark, sf_dir)))


@query(
    "star_dim_location",
    f"""
    WITH {IP_LOCATIONS_CTE.strip()}
    SELECT {_sk_sql("ip_address")} AS location_key,
           ip_address, city_name, country_code, country_name, region_name,
           make_timestamp(insert_date * 1000000) AS insert_timestamp
    FROM (
        SELECT *, processed_at AS insert_date, row_number() OVER (
            PARTITION BY ip_address
            ORDER BY processed_at DESC NULLS LAST,
                     city_name DESC NULLS LAST,
                     country_code DESC NULLS LAST) AS rn
        FROM ip_locations
    ) WHERE rn = 1
    """,
)
def star_dim_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/F1/F4 — dim_location (ref ``dim_location.sql``): dedup-to-latest
    per ip, epoch → timestamp."""
    return models.dim_location(ip_locations_from_events(_events(spark, sf_dir)))


# Full fact-model oracle — shared by the batch entry and the streaming
# incremental capstone (identical final fact rows by construction).
FACT_ORACLE_SQL = f"""
    WITH {SUMMARY_CTE.strip()},
    {STG_CTE.strip()},
    {PRODUCT_DETAILS_CTE.strip()},
    {IP_LOCATIONS_CTE.strip()},
    dim_product AS (
        SELECT {_sk_sql("product_id")} AS product_key, product_id AS product_source_id
        FROM product_details
    ),
    dim_customer AS (
        SELECT {_sk_sql("customer_source_id")} AS customer_key, customer_source_id
        FROM (
            SELECT customer_source_id, row_number() OVER (
                PARTITION BY customer_source_id ORDER BY customer_source_id) AS rn
            FROM (SELECT DISTINCT customer_source_id FROM stg
                  WHERE customer_source_id IS NOT NULL)
        ) WHERE rn = 1
    ),
    dim_location AS (
        SELECT {_sk_sql("ip_address")} AS location_key, ip_address
        FROM (SELECT DISTINCT ip_address FROM ip_locations)
    ),
    rng AS (
        SELECT min(cast(event_timestamp AS date)) AS start_date,
               max(cast(event_timestamp AS date)) AS end_date
        FROM stg
    ),
    dim_date AS (
        SELECT cast(strftime(cast(d AS date), '%Y%m%d') AS bigint) AS date_key,
               cast(d AS date) AS full_date
        FROM (SELECT unnest(generate_series(start_date - 30, end_date + 29,
                                            INTERVAL 1 DAY)) AS d FROM rng)
    ),
    dim_session AS (
        SELECT {_sk_sql("ip_address", "user_agent", "resolution", "referrer_url",
                        "current_url", "store_id", "api_version")}
                   AS session_context_key,
               ip_address, user_agent, resolution, referrer_url, current_url,
               store_id, api_version
        FROM (SELECT DISTINCT ip_address, user_agent, resolution, referrer_url,
                     current_url, store_id, api_version
              FROM stg WHERE ip_address IS NOT NULL OR user_agent IS NOT NULL)
    )
    SELECT {_sk_sql("stg.order_source_id", "stg.product_source_id")}
               AS sales_order_key,
           coalesce(dp.product_key, '-1') AS product_key,
           coalesce(dc.customer_key, '-1') AS customer_key,
           coalesce(dl.location_key, '-1') AS location_key,
           coalesce(dsc.session_context_key, '-1') AS session_context_key,
           coalesce(dd.date_key, -1) AS date_key,
           stg.price AS sales_amount,
           stg.order_source_id,
           stg.ip_address,
           stg.local_time,
           stg.currency,
           stg.event_timestamp AS order_timestamp
    FROM stg
    LEFT JOIN dim_product dp ON stg.product_source_id = dp.product_source_id
    LEFT JOIN dim_customer dc ON stg.customer_source_id = dc.customer_source_id
    LEFT JOIN dim_location dl ON stg.ip_address = dl.ip_address
    LEFT JOIN dim_date dd ON cast(stg.event_timestamp AS date) = dd.full_date
    LEFT JOIN dim_session dsc
        ON stg.ip_address = dsc.ip_address
       AND stg.user_agent = dsc.user_agent
       AND stg.resolution = dsc.resolution
       AND stg.referrer_url = dsc.referrer_url
       AND stg.current_url = dsc.current_url
       AND stg.store_id = dsc.store_id
       AND stg.api_version = dsc.api_version
    WHERE stg.order_source_id IS NOT NULL
    """


@query("star_fact_sales_order", FACT_ORACLE_SQL)
def star_fact_sales_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J5/F4 — the full fact model (ref ``fact_sales_order.sql``):
    five broadcast left joins, '-1' unmatched defaults, `=` null-miss
    semantics on the 7-column session key."""
    events = _events(spark, sf_dir)
    # stg feeds the fact scan plus three dims — persist to avoid four
    # recomputations of the projection diamond (same rationale at 100 TB,
    # where stg would be a materialized staging table).
    stg = tracked_persist(models.stg_summary(summary_from_events(events)))
    dims = {
        "product": models.dim_product(product_details_from_events(events)),
        "customer": models.dim_customer(stg),
        "location": models.dim_location(ip_locations_from_events(events)),
        "date": models.dim_date(models.stg_summary_date_range(stg)),
        "session": models.dim_session_context(stg),
    }
    return models.fact_sales_order(
        stg,
        dims["product"],
        dims["customer"],
        dims["location"],
        dims["date"],
        dims["session"],
    )


@query("stream_star_fact_incremental", FACT_ORACLE_SQL)
def stream_star_fact_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone integration — the reference's WHOLE pipeline (ingest →
    staging → star build, ``trigger_bigquery_load.py`` +
    ``fact_sales_order.sql``) as one incremental streaming flow:

    staging rows land in three parquet chunks, a Structured Streaming
    file source drains them one file per micro-batch, and each batch is
    joined to the (stable, broadcast) dimensions inside ``foreachBatch``
    and appended to an idempotent ``batch_id=N`` fact partition. The
    fact model is row-wise over staging (each dim join matches ≤ 1
    row), so the union of per-batch facts must equal the one-shot batch
    fact — the oracle IS the batch fact SQL, hash-compared against the
    re-read incremental output. This is the 100 TB operating mode: dims
    refresh slowly, the fact grows append-only, and a replayed batch
    rewrites its own partition instead of double-appending."""
    events = _events(spark, sf_dir)
    stg = tracked_persist(models.stg_summary(summary_from_events(events)))
    dims = {
        "product": models.dim_product(product_details_from_events(events)),
        "customer": models.dim_customer(stg),
        "location": models.dim_location(ip_locations_from_events(events)),
        "date": models.dim_date(models.stg_summary_date_range(stg)),
        "session": models.dim_session_context(stg),
    }

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_streamstar_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "stg")
    fact_dir = os.path.join(base, "fact")
    ckpt = os.path.join(base, "ckpt")

    # stage in three deterministic chunks -> three micro-batches
    chunk = F.pmod(F.xxhash64(F.col("order_source_id").cast("string")), F.lit(3))
    for i in range(3):
        stg.filter(chunk == i).coalesce(1).write.mode("append").parquet(src)
    stg_schema = spark.read.parquet(src).schema

    def build_batch(batch: DataFrame, batch_id: int) -> None:
        fact = models.fact_sales_order(
            batch,
            dims["product"],
            dims["customer"],
            dims["location"],
            dims["date"],
            dims["session"],
        )
        fact.write.mode("overwrite").parquet(
            os.path.join(fact_dir, f"batch_id={batch_id}")
        )

    q = (
        spark.readStream.schema(stg_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(build_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(fact_dir).drop("batch_id")
