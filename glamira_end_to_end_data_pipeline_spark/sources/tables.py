"""Parquet table sources over the driver testdata layout.

The reference's raw zone is MongoDB streamed to chunked Parquet with a
frozen first-chunk "master schema" (``6.dps/export_to_GCS.py:107-209``).
Our canonical at-rest format is Parquet read natively by Spark — the
schema is the writer's embedded schema, applied once, so the per-chunk
unification dance disappears (SURVEY.md §2.1 S7).

Column pruning + predicate pushdown reach the scan automatically because
every operator in this package is expressed declaratively; a
``ReadSchema`` with only referenced columns and non-empty
``PushedFilters`` in ``.explain("formatted")`` is the acceptance bar.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The ten driver tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Accepts both ``<dir>/<name>.parquet``
    single-file layout and ``<dir>/<name>/`` directory layout so the same
    call works against driver testdata and our own partitioned outputs."""
    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    path = file_path if os.path.exists(file_path) else dir_path
    df = spark.read.parquet(path)
    # Parquet TIMESTAMP(NANOS) columns arrive as nanosecond longs
    # (spark.sql.legacy.parquet.nanosAsLong); convert to microsecond
    # timestamps — same truncation DuckDB/pyarrow apply on read.
    for field in df.schema.fields:
        if isinstance(field.dataType, T.LongType) and field.metadata.get(
            "__nanos_as_long", field.name == "ts" and name == "events"
        ):
            # `div` is integer division — ns longs exceed double's 2^53
            # mantissa, so float division would corrupt timestamps.
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (the engine's
    'warehouse'; mirrors dbt sources → BigQuery tables)."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
