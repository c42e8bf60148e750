from __future__ import annotations

from glamira_end_to_end_data_pipeline_spark.operators.geo import (
    enrich_ips_broadcast,
    range_join_bucketed,
)


def _geo(spark):
    # 10.0.0.0 = 167772160; range spans many /16 buckets (width 2^24);
    # second range is sub-/16 narrow; gap between them catches misses.
    return spark.createDataFrame(
        [
            (167772160, 184549375, "A"),  # 10.0.0.0 - 10.255.255.255
            (3232235520, 3232235775, "B"),  # 192.168.0.0 - 192.168.0.255
        ],
        "start_ip_num long, end_ip_num long, country string",
    )


def _ips(spark):
    return spark.createDataFrame(
        [("10.1.2.3",), ("192.168.0.200",), ("8.8.8.8",)], "ip string"
    )


def test_range_join_bucketed_matches_broadcast(spark):
    geo, ips = _geo(spark), _ips(spark)
    got = {
        r["ip"]: r["country"]
        for r in range_join_bucketed(ips, geo).select("ip", "country").collect()
    }
    ref = {
        r["ip"]: r["country"]
        for r in enrich_ips_broadcast(ips, geo).select("ip", "country").collect()
    }
    assert got == ref == {"10.1.2.3": "A", "192.168.0.200": "B", "8.8.8.8": None}


def test_range_join_bucketed_inner_drops_misses(spark):
    out = range_join_bucketed(_ips(spark), _geo(spark), how="inner")
    assert {r["ip"] for r in out.collect()} == {"10.1.2.3", "192.168.0.200"}
