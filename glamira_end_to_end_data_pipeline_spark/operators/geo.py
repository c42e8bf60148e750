"""Geo range-join operators (SURVEY §2.3 J6, ref ``ip_processor.py``).

The reference binary-searches an IP2Location BIN per IP at ~1,350-1,800
lookups/s on one core (BASELINE.md). The Spark-first equivalents:

- ``range_join_broadcast`` — broadcast the range table, band predicate.
  Catalyst plans BroadcastNestedLoopJoin: each probe row scans the
  broadcast ranges. Fine when ranges ≲ 10⁴.
- ``range_join_bucketed`` — the 100 TB path: both sides get a /16-prefix
  bucket key (ranges exploded across every bucket they overlap), the
  join becomes an *equi* join on the bucket + residual band filter, so
  it hash-joins (and AQE-skew-splits) instead of nested-looping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.functions import ip_to_int

BUCKET_BITS = 16  # /16 prefix → 65,536 buckets over the IPv4 space


def enrich_ips_broadcast(ips: DataFrame, geo: DataFrame) -> DataFrame:
    """ips(ip) ⨝ geo(start_ip_num, end_ip_num, ...attrs) via broadcast
    band join; '-' sentinels in geo attrs are upstream concerns."""
    withnum = ips.withColumn("ip_num", ip_to_int("ip"))
    return withnum.join(
        F.broadcast(geo),
        (withnum.ip_num >= geo.start_ip_num) & (withnum.ip_num <= geo.end_ip_num),
        "left",
    )


def range_join_bucketed(ips: DataFrame, geo: DataFrame, how: str = "left") -> DataFrame:
    """Equi-join-able range join: explode each geo range over the /16
    buckets it spans, bucket each probe IP, hash-join on the bucket,
    then apply the residual [start, end] filter.

    Shuffle keys are ints; per-bucket fanout of a typical geo DB is
    small (ranges rarely span many /16s), so the exploded side stays
    ~O(|geo|). This is the plan that survives 10⁹ distinct IPs."""
    shift = 32 - BUCKET_BITS
    g = geo.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.shiftright("start_ip_num", shift),
                F.shiftright("end_ip_num", shift),
            )
        ),
    )
    p = ips.withColumn("ip_num", ip_to_int("ip")).withColumn(
        "bucket", F.shiftright("ip_num", shift)
    )
    # band predicate inside the join condition (not a post-filter): left
    # rows whose bucket matched but range didn't must survive with NULLs.
    return p.join(
        g,
        (p["bucket"] == g["bucket"])
        & (p["ip_num"] >= g["start_ip_num"])
        & (p["ip_num"] <= g["end_ip_num"]),
        how,
    ).drop(g["bucket"])
