"""Hive-partitioned lake layout (SURVEY §4): directory-per-value
partitioning so date-scoped queries prune at the listing level.

The reference lands everything in flat date-stamped object prefixes
(``export_to_GCS.py`` writes ``data_in_parquet/<table>/...``) and every
BigQuery query re-scans the table. The Spark-lake form is
``partitionBy(event_date)``: a reader filtering on the partition column
never opens the other directories (``PartitionFilters`` in the scan,
asserted by tests), which at 100 TB × daily partitions is the
difference between scanning one day and scanning three years.

Write discipline: ``repartition(partition_cols)`` first, so each task
owns whole partition values and writes ONE file per partition instead
of (tasks × partitions) small files — the classic lake-write mistake.
An optional ``sortWithinPartitions`` clusters rows so min/max row-group
stats also prune within the day.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Partitioned parquet write, one file per partition value."""
    cols = list(partition_cols)
    out = df.repartition(*cols)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy(*cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Partition-discovering read; filters on partition columns prune
    directories before any file is opened."""
    return spark.read.parquet(path)
