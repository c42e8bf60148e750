"""Registry entries for the ingest/egress surface (SURVEY §2.1 S7/S9,
§2.2 P8/P9, §2.8 F22-F24) — sources/ingest.py driven end-to-end on the
driver testdata, with DuckDB oracles.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.functions import (
    clean_product_name,
    domain_of,
    parse_locale_price,
    rating_value,
)
from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.sources import read_table
from glamira_end_to_end_data_pipeline_spark.sources.ingest import (
    read_text_worklist,
    route_load_events,
    unify_master_schema,
    write_text_worklist,
)


@query(
    "s7_master_schema_rules",
    """
    SELECT event_type AS label,
           round(sum(value), 2) AS sum_value,
           count(user_id) AS n,
           max(length(cast(user_id AS varchar))) AS max_gclid_len
    FROM events
    GROUP BY 1
    """,
)
def s7_master_schema_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — master-schema unification (``export_to_GCS.py:107-209``).
    A free-schema (all-string) projection of ``events`` goes through
    :func:`unify_master_schema`: the stringified measure is promoted back
    to double (every value parses), the label column stays string (not
    parseable), and the ``gclid``-named column stays string despite being
    fully numeric (force-string rule, ``export_to_GCS.py:51,116``). The
    aggregate only type-checks if the promotion happened; dtype
    assertions live in tests/test_ingest.py."""
    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("label"),
        F.col("value").cast("string").alias("value_str"),
        F.col("user_id").cast("string").alias("gclid"),
    )
    unified = unify_master_schema(ev)
    return unified.groupBy("label").agg(
        F.round(F.sum("value_str"), 2).alias("sum_value"),
        F.count("gclid").alias("n"),
        F.max(F.length("gclid")).alias("max_gclid_len"),
    )


@query(
    "s9_load_routing",
    """
    WITH objs AS (
        SELECT CASE doc_id % 3
                 WHEN 0 THEN 'data_in_parquet/summary/part-' || doc_id
                 WHEN 1 THEN 'data_in_parquet/ip locations-' || doc_id
                 ELSE 'tmp_scratch/skip-' || doc_id
               END ||
               CASE doc_id % 4
                 WHEN 0 THEN '.parquet'
                 WHEN 1 THEN '.json'
                 WHEN 2 THEN '.csv'
                 ELSE '.txt'
               END AS path
        FROM documents
    ),
    kept AS (
        SELECT path AS uri,
               CASE WHEN path LIKE '%.parquet' THEN 'PARQUET'
                    WHEN path LIKE '%.json' THEN 'NEWLINE_DELIMITED_JSON'
                    WHEN path LIKE '%.csv' THEN 'CSV'
               END AS load_format,
               substr(path, length('data_in_parquet/') + 1) AS rel
        FROM objs
        WHERE path LIKE 'data_in_parquet/%'
    )
    SELECT uri,
           load_format,
           regexp_replace(
               CASE WHEN strpos(rel, '/') > 0
                    THEN substr(rel, 1, strpos(rel, '/') - 1)
                    ELSE regexp_replace(rel, '\\.[^.]*$', '')
               END,
               '[^a-zA-Z0-9_]', '_', 'g') AS target_table,
           md5(uri || '|' ||
               regexp_replace(
                   CASE WHEN strpos(rel, '/') > 0
                        THEN substr(rel, 1, strpos(rel, '/') - 1)
                        ELSE regexp_replace(rel, '\\.[^.]*$', '')
                   END,
                   '[^a-zA-Z0-9_]', '_', 'g')) AS job_id
    FROM kept
    WHERE load_format IS NOT NULL
    """,
)
def s9_load_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 + P8/P9 + F22/F23/F24 — the load-trigger routing pipeline
    (``trigger_bigquery_load.py``) over synthesized object-arrival paths:
    prefix filter, extension→format dispatch (unsupported ``.txt``
    dropped), subfolder-else-stem table inference with sanitization
    (the ``ip locations`` space → underscore), and the portable stable
    job id. Pure column expressions — no UDFs in the routing path."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    folder = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("data_in_parquet/summary/part-"), F.col("doc_id")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("data_in_parquet/ip locations-"), F.col("doc_id")),
        )
        .otherwise(F.concat(F.lit("tmp_scratch/skip-"), F.col("doc_id")))
    )
    ext = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(".parquet"))
        .when(F.col("doc_id") % 4 == 1, F.lit(".json"))
        .when(F.col("doc_id") % 4 == 2, F.lit(".csv"))
        .otherwise(F.lit(".txt"))
    )
    objects = docs.select(F.concat(folder, ext).alias("path"))
    return route_load_events(objects)


@query(
    "s4_text_ip_worklist",
    """
    SELECT DISTINCT
           ((user_id * 2654435761) % 223 + 1) || '.' ||
           ((user_id * 40503) % 256) || '.' ||
           ((user_id * 65537) % 256) || '.' ||
           ((user_id * 97) % 256) AS ip
    FROM events WHERE user_id IS NOT NULL
    """,
)
def s4_text_ip_worklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — text-file sink/source round-trip of the distinct-IP worklist
    (``ip_processor.py:88-124`` writes unique IPs one per line, then
    re-loads them with strip + skip-empty). The synthesized dotted-quads
    are the same recipe as f_ip_enrichment; the entry only passes the
    oracle if the text write→read round-trip is lossless."""
    events = read_table(spark, sf_dir, "events")
    ip = F.concat_ws(
        ".",
        ((F.col("user_id") * 2654435761) % 223 + 1).cast("string"),
        ((F.col("user_id") * 40503) % 256).cast("string"),
        ((F.col("user_id") * 65537) % 256).cast("string"),
        ((F.col("user_id") * 97) % 256).cast("string"),
    )
    ips = (
        events.filter(F.col("user_id").isNotNull()).select(ip.alias("ip")).distinct()
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_s4_worklist_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    write_text_worklist(ips, path, "ip")
    return read_text_worklist(spark, path, "ip")


@query(
    "s12_crawler_parse",
    """
    SELECT p_partkey AS product_id,
           p_name AS product_name,
           cast(round(p_retailprice * 100) AS bigint) AS price_cents,
           (p_partkey % 5 + 1) * 10 + p_partkey % 10 AS rating_x10,
           'glamira.' || CASE p_partkey % 3
                           WHEN 0 THEN 'com'
                           WHEN 1 THEN 'de'
                           ELSE 'fr'
                         END AS domain
    FROM part
    """,
)
def s12_crawler_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 + F14/F15/F16/F17 — the product-crawler extraction pipeline
    (``product_crawler.py:214-295,357-474``) as pure column expressions:
    synthesize an HTML page per ``part`` row (marketing-suffixed title,
    EU-or-US-locale price, rating text, canonical URL), then recover
    every field from the raw HTML alone — title cleanup, locale-aware
    price parse, rating extraction, domain normalization. No UDFs;
    outputs integer-coded (cents, rating*10) so the cross-engine hash is
    float-safe. The oracle computes the expected values directly from
    ``part``, so any extraction drift fails the gate."""
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice"
    )
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    eu = F.col("p_partkey") % 2 == 0
    price_txt = F.when(
        eu,
        F.concat(
            (cents / 100).cast("long").cast("string"),
            F.lit(","),
            F.lpad((cents % 100).cast("string"), 2, "0"),
            F.lit(" €"),
        ),
    ).otherwise(
        F.concat(
            F.lit("$"),
            (cents / 100).cast("long").cast("string"),
            F.lit("."),
            F.lpad((cents % 100).cast("string"), 2, "0"),
        )
    )
    rating_txt = F.concat(
        F.lit("Rated "),
        (F.col("p_partkey") % 5 + 1).cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 10).cast("string"),
        F.lit(" Sterne"),
    )
    tld = (
        F.when(F.col("p_partkey") % 3 == 0, F.lit("com"))
        .when(F.col("p_partkey") % 3 == 1, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    url = F.concat(
        F.lit("https://www.glamira."),
        tld,
        F.lit("/catalog/product/view/id/"),
        F.col("p_partkey").cast("string"),
    )
    pages = part.select(
        "p_partkey",
        F.concat(
            F.lit('<html><head><title>'),
            F.col("p_name"),
            F.lit(" | GLAMIRA Jewelry Online</title></head>"),
            F.lit('<body><span class="price">'),
            price_txt,
            F.lit('</span><div class="rating">'),
            rating_txt,
            F.lit('</div><a href="'),
            url,
            F.lit('">p</a></body></html>'),
        ).alias("html"),
    )
    return pages.select(
        F.col("p_partkey").alias("product_id"),
        clean_product_name(
            F.regexp_extract("html", r"<title>(.*?)</title>", 1)
        ).alias("product_name"),
        F.round(
            parse_locale_price(
                F.regexp_extract("html", r'<span class="price">(.*?)</span>', 1)
            )
            * 100
        )
        .cast("long")
        .alias("price_cents"),
        F.round(
            rating_value(
                F.regexp_extract("html", r'<div class="rating">(.*?)</div>', 1)
            )
            * 10
        )
        .cast("long")
        .alias("rating_x10"),
        domain_of(F.regexp_extract("html", r'href="(.*?)"', 1)).alias("domain"),
    )
