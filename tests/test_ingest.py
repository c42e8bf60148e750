from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from glamira_end_to_end_data_pipeline_spark.sources.ingest import (
    dispatch_format,
    read_manifest,
    route_load_events,
    stable_job_id,
    table_name_from_path,
    unify_master_schema,
    write_manifest,
)


def test_unify_master_schema_dtypes(spark):
    df = spark.createDataFrame(
        [("a", "1.5", "123", "x1"), ("b", "2", "456", None), ("c", None, "789", "y")],
        "label string, num string, gclid string, mixed string",
    )
    out = unify_master_schema(df)
    types = {f.name: f.dataType for f in out.schema.fields}
    # every non-null value of `num` parses -> promoted to double
    assert isinstance(types["num"], T.DoubleType)
    # fully-numeric but force-string column stays string (export_to_GCS.py:51,116)
    assert isinstance(types["gclid"], T.StringType)
    # non-parseable column stays string
    assert isinstance(types["label"], T.StringType)
    assert isinstance(types["mixed"], T.StringType)
    vals = {r["label"]: r["num"] for r in out.collect()}
    assert vals == {"a": 1.5, "b": 2.0, "c": None}


def test_unify_one_bad_value_blocks_promotion(spark):
    # pandas to_numeric(errors='raise') semantics: one unparseable value
    # keeps the whole column string
    df = spark.createDataFrame(
        [("1",), ("2",), ("oops",)], "almost_num string"
    )
    out = unify_master_schema(df)
    assert isinstance(out.schema["almost_num"].dataType, T.StringType)


def test_routing_pipeline(spark):
    objects = spark.createDataFrame(
        [
            ("data_in_parquet/summary/part-0.parquet",),  # subfolder mode
            ("data_in_parquet/ip locations-1.json",),  # stem mode + sanitize
            ("data_in_parquet/audit.csv",),
            ("data_in_parquet/readme.txt",),  # unsupported format -> dropped
            ("tmp_scratch/skip.parquet",),  # outside prefix -> dropped
        ],
        "path string",
    )
    rows = {r["uri"]: r for r in route_load_events(objects).collect()}
    assert set(rows) == {
        "data_in_parquet/summary/part-0.parquet",
        "data_in_parquet/ip locations-1.json",
        "data_in_parquet/audit.csv",
    }
    r0 = rows["data_in_parquet/summary/part-0.parquet"]
    assert (r0["load_format"], r0["target_table"]) == ("PARQUET", "summary")
    r1 = rows["data_in_parquet/ip locations-1.json"]
    assert (r1["load_format"], r1["target_table"]) == (
        "NEWLINE_DELIMITED_JSON",
        "ip_locations_1",
    )
    assert rows["data_in_parquet/audit.csv"]["load_format"] == "CSV"
    # job id is stable across evaluations (replay idempotency, F24)
    again = {r["uri"]: r["job_id"] for r in route_load_events(objects).collect()}
    assert all(again[u] == rows[u]["job_id"] for u in rows)


def test_manifest_roundtrip(spark, tmp_path):
    summaries = spark.createDataFrame(
        [("summary", 100), ("ip_locations", 42)], "table string, row_count long"
    )
    write_manifest(summaries, str(tmp_path / "manifest"))
    back = read_manifest(spark, str(tmp_path / "manifest"))
    got = {r["table"]: r["row_count"] for r in back.collect()}
    assert got == {"summary": 100, "ip_locations": 42}
    assert "export_ts" in back.columns


def test_text_worklist_roundtrip(spark, tmp_path):
    # S4 (ip_processor.py:88-124): one value per line out, strip +
    # skip-empty back in; blanks/NULLs never reach the file.
    from glamira_end_to_end_data_pipeline_spark.sources.ingest import (
        read_text_worklist,
        write_text_worklist,
    )

    df = spark.createDataFrame(
        [("1.2.3.4",), ("  5.6.7.8  ",), ("",), ("   ",), (None,)],
        "ip string",
    )
    path = str(tmp_path / "worklist")
    write_text_worklist(df, path, "ip")
    back = read_text_worklist(spark, path, "ip")
    assert sorted(r["ip"] for r in back.collect()) == ["1.2.3.4", "5.6.7.8"]
