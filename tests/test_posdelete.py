"""Positional-delete (Iceberg-v2 (file, pos) MoR flavor) unit tests —
sources/posdelete.py. The graded entry lake_position_deletes drives the
same flows over the customer table; these pin the semantics on a tiny
explicit fixture."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.sources import posdelete


def _mk(spark, tmp_path, rows):
    path = str(tmp_path / "ptab")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(rows, "k long, grp long, val string")
    posdelete.write_data(spark, df, path, "grp", "k")
    return path


def test_position_delete_then_reinsert_survives(spark, tmp_path):
    """A tombstone names a physical file, so rows appended AFTER the
    delete survive even when they match the original predicate — the
    no-sequence-rule property positional deletes are for."""
    path = _mk(
        spark,
        tmp_path,
        [(1, 0, "drop"), (2, 0, "keep"), (3, 1, "drop"), (4, 1, "keep")],
    )
    n = posdelete.position_delete(spark, path, F.col("val") == "drop")
    assert n == 2
    re_ins = spark.createDataFrame(
        [(5, 0, "drop"), (6, 1, "drop")], "k long, grp long, val string"
    )
    posdelete.write_data(spark, re_ins, path, "grp", "k")
    got = sorted(r.k for r in posdelete.read_mor(spark, path).collect())
    assert got == [2, 4, 5, 6]


def test_position_delete_never_duplicates_tombstones(spark, tmp_path):
    """Re-running the same predicate tombstones nothing new (the write
    path subtracts existing tombstones before emitting)."""
    path = _mk(spark, tmp_path, [(1, 0, "drop"), (2, 0, "keep")])
    assert posdelete.position_delete(spark, path, F.col("val") == "drop") == 1
    assert posdelete.position_delete(spark, path, F.col("val") == "drop") == 0
    got = sorted(r.k for r in posdelete.read_mor(spark, path).collect())
    assert got == [2]


def test_second_delete_spans_both_commits(spark, tmp_path):
    """A later delete tombstones matching rows in files of EVERY earlier
    commit (position scoping is per file, not per commit)."""
    path = _mk(spark, tmp_path, [(1, 0, "x"), (2, 0, "y")])
    extra = spark.createDataFrame([(3, 0, "x")], "k long, grp long, val string")
    posdelete.write_data(spark, extra, path, "grp", "k")
    n = posdelete.position_delete(spark, path, F.col("val") == "x")
    assert n == 2
    got = sorted(r.k for r in posdelete.read_mor(spark, path).collect())
    assert got == [2]


def test_read_mor_without_deletes_dir_and_exists_gate(spark, tmp_path):
    """Before any positional delete the deletes dir is absent and
    read_mor must return all rows (exists-gated, not exception-
    swallowed — a genuine read error on an existing deletes dir now
    propagates instead of silently resurrecting deleted rows)."""
    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "pd_nodel")
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 2), (3, "b", 1)], "k long, grp string, ord int"
    )
    posdelete.write_data(spark, df, path, "grp", "ord")
    assert posdelete.read_mor(spark, path).count() == 3
    # corrupt deletes dir -> error must PROPAGATE
    import os

    import pytest

    os.makedirs(os.path.join(path, "deletes"))
    with open(os.path.join(path, "deletes", "junk.parquet"), "w") as f:
        f.write("not parquet")
    with pytest.raises(Exception):
        posdelete.read_mor(spark, path).count()
