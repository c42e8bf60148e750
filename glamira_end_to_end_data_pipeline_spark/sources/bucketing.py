"""Bucketed tables (SURVEY §4): pre-shuffled storage for co-located,
exchange-free joins.

The reference's fact build re-joins the same staging grain to five
dimensions every run (``fact_sales_order.sql``); at 100 TB the
dominant cost of any such recurring join is re-shuffling the big side
on the same key every time. Bucketing moves that shuffle to write time:
``bucketBy(n, key)`` hash-partitions rows into fixed buckets inside
each write, and Spark's bucketed scan then feeds a sort-merge join
directly — *no Exchange on either side* when both tables share the
bucket spec (asserted by the plan-shape test). ``sortBy`` additionally
lets single-file buckets skip the sort.

Bucket metadata lives in the session catalog (``saveAsTable``), which
is what distinguishes these from plain parquet directories — a bare
``spark.read.parquet`` of the same files would not know the layout and
would shuffle anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort: bool = True,
    reuse: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed parquet table at ``path``,
    registered as ``table_name`` in the session catalog.

    With ``reuse`` (default) an already-registered table is kept as-is —
    bucketing is write-once/query-many, so a session that builds the
    same immutable input twice (e.g. the oracle gate running an entry
    repeatedly) pays the bucketing shuffle once. Pass ``reuse=False``
    for mutable inputs."""
    if reuse and df.sparkSession.catalog.tableExists(table_name):
        return
    cols = list(bucket_cols)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    if sort:
        writer = writer.sortBy(cols[0], *cols[1:])
    writer.saveAsTable(table_name)


def bucketed_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog-aware read — the scan carries the bucket spec, so joins
    and aggregations on the bucket key skip their Exchange."""
    return spark.table(table_name)
