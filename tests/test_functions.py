"""Unit tests for the scalar function library (SURVEY §2.8)."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.functions import (
    bq_week,
    clean_product_name,
    domain_of,
    ip_to_int,
    nullify_sentinel,
    parse_locale_price,
    rating_value,
    surrogate_key,
    ws_normalize,
)


def _run(spark, col, values, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"x {in_type}")
    return [r[0] for r in df.select(col).collect()]


def test_surrogate_key_matches_dbt_recipe(spark):
    # dbt_utils.generate_surrogate_key: md5(concat_ws('-', coalesce(...)))
    out = _run(spark, surrogate_key("x", "x"), ["a", None])
    assert out[0] == hashlib.md5(b"a-a").hexdigest()
    sentinel = "_dbt_utils_surrogate_key_null_"
    assert out[1] == hashlib.md5(f"{sentinel}-{sentinel}".encode()).hexdigest()


def test_parse_locale_price(spark):
    cases = {
        "5.165,00 €": 5165.0,  # EU thousands + decimal comma
        "$1,234.56": 1234.56,  # US
        "1234,5": 1234.5,  # lone decimal comma
        "999": 999.0,
        # ambiguous lone comma is *decimal* per ref product_crawler.py:276-277
        "1,234": 1.234,
        "": None,
        "n/a": None,
    }
    out = _run(spark, parse_locale_price("x"), list(cases))
    for (raw, want), got in zip(cases.items(), out):
        assert got == want, f"{raw!r}: want {want}, got {got}"


def test_ip_to_int(spark):
    cases = {
        "0.0.0.0": 0,
        "255.255.255.255": 4294967295,
        "192.168.1.1": 3232235777,
        "10.0.0.300": None,  # octet out of range
        "not-an-ip": None,
        None: None,
    }
    out = _run(spark, ip_to_int("x"), list(cases))
    for (raw, want), got in zip(cases.items(), out):
        assert got == want, f"{raw!r}: want {want}, got {got}"


def test_bq_week_semantics(spark):
    # 2024-01-01 is a Monday; first Sunday of 2024 is Jan 7.
    cases = {
        datetime.date(2024, 1, 1): 0,
        datetime.date(2024, 1, 6): 0,
        datetime.date(2024, 1, 7): 1,
        datetime.date(2024, 1, 13): 1,
        datetime.date(2024, 1, 14): 2,
        # 2023-01-01 is a Sunday -> week 1 immediately.
        datetime.date(2023, 1, 1): 1,
        datetime.date(2023, 12, 31): 53,
    }
    out = _run(spark, bq_week("x"), list(cases), in_type="date")
    for (d, want), got in zip(cases.items(), out):
        assert got == want, f"{d}: want {want}, got {got}"


def test_string_cleaners(spark):
    assert _run(spark, ws_normalize("x"), ["  a \t b\n c  ", "   "]) == ["a b c", None]
    assert _run(
        spark,
        clean_product_name("x"),
        ["Gold Ring | GLAMIRA Jewelry", "Ring - Buy online now", "ab | GLAMIRA"],
    ) == ["Gold Ring", "Ring", None]
    assert _run(spark, rating_value("x"), ["4.8 Sterne", "no rating"]) == [4.8, None]
    assert _run(spark, nullify_sentinel("x"), ["-", "US"]) == [None, "US"]
    assert _run(
        spark,
        domain_of("x"),
        ["https://www.glamira.de/ring.html", "https://shop.example/x"],
    ) == ["glamira.de", "shop.example"]


def test_breadcrumbs(spark):
    df = spark.createDataFrame([(["Home", "Rings", "Gold"],)], schema="x array<string>")
    from glamira_end_to_end_data_pipeline_spark.functions import breadcrumb_join, breadcrumb_leaf

    row = df.select(
        breadcrumb_join("x").alias("j"), breadcrumb_leaf("x").alias("l")
    ).collect()[0]
    assert row.j == "Home > Rings > Gold"
    assert row.l == "Gold"
