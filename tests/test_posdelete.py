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


def test_deletion_vector_compaction_lifecycle(spark, tmp_path):
    """Compaction folds per-row tombstones into one vector per file,
    drops the deletes dir, merges with EXISTING vectors on re-compact,
    and read_mor_dv applies vectors + residuals identically to the
    uncompacted read."""
    import os

    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "dv")
    df = spark.createDataFrame(
        [(i, i % 2, i) for i in range(20)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, df, path, "grp", "ord")
    assert posdelete.position_delete(spark, path, F.col("k") < 5) == 5
    n_dv = posdelete.compact_to_deletion_vectors(spark, path)
    assert n_dv >= 1
    assert not os.path.isdir(os.path.join(path, "deletes"))
    assert sorted(
        r.k for r in posdelete.read_mor_dv(spark, path).collect()
    ) == list(range(5, 20))
    # post-compaction delete lands as residual; read merges both
    assert posdelete.position_delete(spark, path, F.col("k") >= 18) == 2
    assert os.path.isdir(os.path.join(path, "deletes"))
    assert sorted(
        r.k for r in posdelete.read_mor_dv(spark, path).collect()
    ) == list(range(5, 18))
    # re-compaction merges existing vectors with the residual
    assert posdelete.compact_to_deletion_vectors(spark, path) >= 1
    assert sorted(
        r.k for r in posdelete.read_mor_dv(spark, path).collect()
    ) == list(range(5, 18))


def test_deletion_vector_double_entry_idempotent(spark, tmp_path):
    """The crash window (dv written, deletes/ not yet dropped) leaves
    the same tombstone in both stores — application is a set union, so
    the read is unaffected and the next compaction folds it away."""
    import shutil

    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "dvcrash")
    df = spark.createDataFrame(
        [(i, 0, i) for i in range(10)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, df, path, "grp", "ord")
    posdelete.position_delete(spark, path, F.col("k") < 3)
    # snapshot deletes/, compact, then restore the dir = the crash state
    shutil.copytree(f"{path}/deletes", f"{path}/deletes_bak")
    posdelete.compact_to_deletion_vectors(spark, path)
    shutil.move(f"{path}/deletes_bak", f"{path}/deletes")
    assert sorted(
        r.k for r in posdelete.read_mor_dv(spark, path).collect()
    ) == list(range(3, 10))
    posdelete.compact_to_deletion_vectors(spark, path)
    assert sorted(
        r.k for r in posdelete.read_mor_dv(spark, path).collect()
    ) == list(range(3, 10))


def test_read_mor_is_dv_aware_after_compaction(spark, tmp_path):
    """The PUBLIC read_mor must not resurrect compacted tombstones:
    after compact_to_deletion_vectors removes deletes/, the tombstones
    live only in dv/ — read_mor delegates to the DV-aware read when
    dv/ exists (ADVICE r12), so both public reads agree at every stage
    of the lifecycle."""
    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "dvpub")
    df = spark.createDataFrame(
        [(i, i % 2, i) for i in range(12)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, df, path, "grp", "ord")
    assert posdelete.position_delete(spark, path, F.col("k") < 4) == 4
    posdelete.compact_to_deletion_vectors(spark, path)
    # deletes/ is gone; the anti-join-only read would return ALL rows
    assert sorted(r.k for r in posdelete.read_mor(spark, path).collect()) == list(
        range(4, 12)
    )
    # residual tombstones after compaction: read_mor applies BOTH
    assert posdelete.position_delete(spark, path, F.col("k") >= 10) == 2
    assert sorted(r.k for r in posdelete.read_mor(spark, path).collect()) == list(
        range(4, 10)
    )


def test_compaction_swap_is_crash_recoverable(spark, tmp_path):
    """The dv/-replacement window: compaction writes the merged vectors
    to dv__compacting and swaps via rename. Simulate the two crash
    states (backup present without live dv/; stale tmp) and check the
    next compaction recovers the committed vectors instead of silently
    resurrecting deleted rows."""
    import os
    import shutil

    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "dvswap")
    df = spark.createDataFrame(
        [(i, 0, i) for i in range(10)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, df, path, "grp", "ord")
    posdelete.position_delete(spark, path, F.col("k") < 3)
    posdelete.compact_to_deletion_vectors(spark, path)
    # crash state A: renamed live dv/ aside, died before tmp -> live
    shutil.move(f"{path}/dv", f"{path}/dv__precompact")
    os.makedirs(f"{path}/dv__compacting")  # stale incomplete tmp too
    # a fresh tombstone arrives, then compaction runs: it must restore
    # the backup, fold the new tombstone in, and lose NOTHING
    posdelete.position_delete(spark, path, F.col("k") == 9)
    posdelete.compact_to_deletion_vectors(spark, path)
    assert not os.path.isdir(f"{path}/dv__precompact")
    assert not os.path.isdir(f"{path}/dv__compacting")
    assert sorted(r.k for r in posdelete.read_mor(spark, path).collect()) == [
        3,
        4,
        5,
        6,
        7,
        8,
    ]
    # crash state B: backup alongside a committed live dv/ -> dropped
    shutil.copytree(f"{path}/dv", f"{path}/dv__precompact")
    posdelete.compact_to_deletion_vectors(spark, path)
    assert not os.path.isdir(f"{path}/dv__precompact")
    assert sorted(r.k for r in posdelete.read_mor(spark, path).collect()) == [
        3,
        4,
        5,
        6,
        7,
        8,
    ]


def test_pruned_read_no_overlap_returns_empty_with_schema(spark, tmp_path):
    """A probe range overlapping no file's [min, max] prunes everything:
    zero files opened, empty result, schema intact (the planner's
    empty-scan path, not an error)."""
    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "dvempty")
    df = spark.createDataFrame(
        [(i, i % 2, i) for i in range(10)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, df, path, "grp", "ord")
    posdelete.collect_file_stats(spark, path, ["k"])
    pruned, n_read, n_total = posdelete.read_mor_dv_pruned(
        spark, path, "k", 100, 200
    )
    assert n_read == 0 and n_total >= 1
    assert pruned.count() == 0
    assert {"k", "grp", "ord"} <= set(pruned.columns)


def test_rewrite_compact_applies_tombstones_and_resets_metadata(
    spark, tmp_path
):
    """MoR->COW file compaction: after rewrite_compact the live rows
    are unchanged, dv//deletes//stats/ are gone (they referenced dead
    files), positions are freshly assigned, and the tombstone
    machinery works on the rewritten table (a post-rewrite delete +
    re-insert behave exactly as on a fresh table)."""
    import os

    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "rw")
    df = spark.createDataFrame(
        [(i, i % 2, i) for i in range(20)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, df, path, "grp", "ord")
    posdelete.position_delete(spark, path, F.col("k") < 4)
    posdelete.compact_to_deletion_vectors(spark, path)
    posdelete.position_delete(spark, path, F.col("k") >= 18)
    posdelete.collect_file_stats(spark, path, ["k"])
    n = posdelete.rewrite_compact(spark, path, "grp", "ord")
    assert n == 14
    for sub in ("dv", "deletes", "stats"):
        assert not os.path.isdir(os.path.join(path, sub)), sub
    assert sorted(r.k for r in posdelete.read_mor(spark, path).collect()) == list(
        range(4, 18)
    )
    # positions restart per file group on the rewritten table
    mx = (
        spark.read.parquet(f"{path}/data")
        .groupBy("grp")
        .agg(F.max("__pos").alias("m"), F.count("*").alias("c"))
        .collect()
    )
    assert all(r.m == r.c for r in mx)
    # tombstones + re-inserts behave as on a fresh table
    assert posdelete.position_delete(spark, path, F.col("k") == 10) == 1
    re_ins = spark.createDataFrame(
        [(10, 0, 100)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, re_ins, path, "grp", "ord")
    got = sorted(r.k for r in posdelete.read_mor(spark, path).collect())
    assert got == [4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17]


def test_rewrite_compact_crash_recovery(spark, tmp_path):
    """The rewrite swap's two crash states: a data__precompact orphan
    without a live data dir is restored on entry; a stale
    data__rewrite is dropped."""
    import os
    import shutil

    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "rwcrash")
    df = spark.createDataFrame(
        [(i, 0, i) for i in range(10)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, df, path, "grp", "ord")
    posdelete.position_delete(spark, path, F.col("k") < 2)
    # crash state: live renamed aside, tmp incomplete
    shutil.move(f"{path}/data", f"{path}/data__precompact")
    os.makedirs(f"{path}/data__rewrite")
    n = posdelete.rewrite_compact(spark, path, "grp", "ord")
    assert n == 8
    assert not os.path.isdir(f"{path}/data__precompact")
    assert not os.path.isdir(f"{path}/data__rewrite")
    assert sorted(r.k for r in posdelete.read_mor(spark, path).collect()) == list(
        range(2, 10)
    )


def test_collect_file_stats_incremental_profiles_only_new_files(
    spark, tmp_path
):
    """Append-mostly stats maintenance: after a full profile, a new
    commit's files are profiled by an incremental pass that skips
    every known file (returns the new-file count, 0 when nothing is
    new), and the merged stats serve the pruned read exactly as a
    full rescan would."""
    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "incstats")
    df1 = spark.createDataFrame(
        [(i, i % 2, i) for i in range(10)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, df1, path, "grp", "ord")
    n_full = posdelete.collect_file_stats(spark, path, ["k"])
    assert n_full == 2
    assert posdelete.collect_file_stats(
        spark, path, ["k"], incremental=True
    ) == 0
    # commit 2: ks 100..105 land in NEW files
    df2 = spark.createDataFrame(
        [(i, i % 2, i) for i in range(100, 106)],
        "k long, grp long, ord long",
    )
    posdelete.write_data(spark, df2, path, "grp", "ord")
    n_inc = posdelete.collect_file_stats(
        spark, path, ["k"], incremental=True
    )
    assert n_inc == 2  # one new file per group directory
    pruned, n_read, n_total = posdelete.read_mor_dv_pruned(
        spark, path, "k", 100, 200
    )
    assert n_total == 4 and n_read == 2
    assert sorted(r.k for r in pruned.collect()) == list(range(100, 106))
    # old-range probe still resolves through the original stats rows
    pruned2, n_read2, _ = posdelete.read_mor_dv_pruned(
        spark, path, "k", 0, 9
    )
    assert n_read2 == 2
    assert sorted(r.k for r in pruned2.collect()) == list(range(10))


def test_pruned_read_includes_unprofiled_files(spark, tmp_path):
    """STALE-STATS SAFETY (ADVICE r13): data files appended AFTER the
    last collect_file_stats have no stats row — the pruned read must
    treat them as must-read (Iceberg's files-without-metrics rule),
    never silently exclude them, and n_files_total must count the live
    listing, not the profiled subset."""
    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "stale_stats")
    df1 = spark.createDataFrame(
        [(i, i % 2, i) for i in range(10)], "k long, grp long, ord long"
    )
    posdelete.write_data(spark, df1, path, "grp", "ord")
    posdelete.collect_file_stats(spark, path, ["k"])
    # commit 2 lands OUTSIDE the probed range and is never profiled
    df2 = spark.createDataFrame(
        [(i, i % 2, i) for i in range(100, 106)],
        "k long, grp long, ord long",
    )
    posdelete.write_data(spark, df2, path, "grp", "ord")
    pruned, n_read, n_total = posdelete.read_mor_dv_pruned(
        spark, path, "k", 100, 200
    )
    assert n_total == 4  # live listing, not the 2 profiled files
    assert n_read == 2  # both unprofiled files are must-read
    assert sorted(r.k for r in pruned.collect()) == list(range(100, 106))
    # a probe that overlaps profiled files reads profiled + unprofiled
    _, n_read_all, _ = posdelete.read_mor_dv_pruned(spark, path, "k", 0, 9)
    assert n_read_all == 4


def test_pruned_read_null_bounds_are_must_read(spark, tmp_path):
    """A profiled file whose pruning column is all-NULL has NULL
    min/max; the driver-side overlap test must treat it as must-read
    instead of raising TypeError (ADVICE r13)."""
    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "null_bounds")
    df = spark.createDataFrame(
        [(1, 0, 1, 5.0), (2, 0, 2, 9.0), (3, 1, 1, None), (4, 1, 2, None)],
        "k long, grp long, ord long, v double",
    )
    posdelete.write_data(spark, df, path, "grp", "ord")
    posdelete.collect_file_stats(spark, path, ["v"])
    pruned, n_read, n_total = posdelete.read_mor_dv_pruned(
        spark, path, "v", 0.0, 100.0
    )
    assert (n_read, n_total) == (2, 2)
    assert sorted(r.k for r in pruned.collect()) == [1, 2, 3, 4]
    # a non-overlapping probe still prunes the bounded file but must
    # keep the NULL-bounds file
    pruned2, n_read2, _ = posdelete.read_mor_dv_pruned(
        spark, path, "v", 1000.0, 2000.0
    )
    assert n_read2 == 1
    assert sorted(r.k for r in pruned2.collect()) == [3, 4]


def test_merge_mor_upsert_semantics_and_no_rewrite(spark, tmp_path):
    """MoR MERGE: matched keys survive as the SOURCE row (old version
    becomes DV bits), unmatched source keys insert, unmatched target
    rows pass through — and every pre-existing data file survives
    byte-identical (no COW rewrites)."""
    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "mormerge")
    target = spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "b"), (3, 1, "c")], "k long, grp long, val string"
    )
    posdelete.write_data(spark, target, path, "grp", "k")
    before = dict(posdelete._list_data_files_sized(spark, path))

    src = spark.createDataFrame(
        [(2, 0, "B2"), (9, 1, "new")], "k long, grp long, val string"
    )
    n_matched, n_source = posdelete.merge_mor(spark, path, src, "k", "grp", "k")
    assert (n_matched, n_source) == (1, 2)

    after = dict(posdelete._list_data_files_sized(spark, path))
    assert set(before) <= set(after)
    assert all(after[f] == sz for f, sz in before.items())
    assert len(after) > len(before)

    got = {r.k: r.val for r in posdelete.read_mor_dv(spark, path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}
    # the matched row is a VECTOR bit, not a residual tombstone
    dv = spark.read.parquet(f"{path}/dv")
    assert dv.agg({"__cardinality": "sum"}).collect()[0][0] == 1


def test_merge_mor_repeated_merge_is_result_stable(spark, tmp_path):
    """Re-merging the same source converges: the second pass tombstones
    the first pass's written rows and rewrites them from the source —
    the visible table is unchanged and still duplicate-free."""
    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    path = str(tmp_path / "mormerge2")
    target = spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "b")], "k long, grp long, val string"
    )
    posdelete.write_data(spark, target, path, "grp", "k")
    src = spark.createDataFrame([(2, 0, "B")], "k long, grp long, val string")
    posdelete.merge_mor(spark, path, src, "k", "grp", "k")
    n_matched2, _ = posdelete.merge_mor(spark, path, src, "k", "grp", "k")
    assert n_matched2 == 1  # the previously-merged row re-matches
    got = sorted(
        (r.k, r.val) for r in posdelete.read_mor_dv(spark, path).collect()
    )
    assert got == [(1, "a"), (2, "B")]


# ---------------------------------------------------------------------------
# Per-file Bloom data-skipping index
# ---------------------------------------------------------------------------


def test_bloom_pruned_read_no_false_negatives_and_prunes(spark, tmp_path):
    """Every present key survives a bloom-planned read (a Bloom 'no'
    must be definite), and probing a key confined to one file group's
    files opens fewer files than the table holds."""
    path = str(tmp_path / "btab")
    rows = [(k, k % 4, f"v{k}") for k in range(1, 201)]
    df = spark.createDataFrame(rows, "k long, grp long, val string")
    posdelete.write_data(spark, df, path, "grp", "k")
    assert posdelete.collect_file_blooms(spark, path, "k") > 0
    for probe in (1, 57, 200):
        got, n_read, n_total = posdelete.read_bloom_pruned(
            spark, path, "k", [probe]
        )
        ks = {r.k for r in got.collect()}
        assert probe in ks, f"false negative for {probe}"
    # a multi-key probe still opens fewer files than the table holds
    _, n_read, n_total = posdelete.read_bloom_pruned(
        spark, path, "k", [3, 7]
    )
    assert 0 < n_read < n_total


def test_bloom_absent_key_reads_zero_files(spark, tmp_path):
    """A key absent from every file is (with these tiny filters)
    pruned everywhere: the planned scan opens nothing and returns an
    empty frame with the table schema intact."""
    path = str(tmp_path / "btab2")
    df = spark.createDataFrame(
        [(k, k % 2, "x") for k in range(1, 51)], "k long, grp long, val string"
    )
    posdelete.write_data(spark, df, path, "grp", "k")
    posdelete.collect_file_blooms(spark, path, "k")
    got, n_read, n_total = posdelete.read_bloom_pruned(
        spark, path, "k", [999_999]
    )
    assert n_read == 0 and n_total > 0
    assert got.count() == 0
    assert "val" in got.columns


def test_bloom_incremental_profiles_only_new_files(spark, tmp_path):
    """incremental=True profiles only files missing from blooms/ and
    appends; already-profiled files are never rescanned (returned
    profile count covers the fresh commit only)."""
    path = str(tmp_path / "btab3")
    df1 = spark.createDataFrame(
        [(k, k % 2, "a") for k in range(1, 41)], "k long, grp long, val string"
    )
    posdelete.write_data(spark, df1, path, "grp", "k")
    n1 = posdelete.collect_file_blooms(spark, path, "k")
    assert n1 > 0
    # nothing new -> zero work
    assert posdelete.collect_file_blooms(spark, path, "k", incremental=True) == 0
    df2 = spark.createDataFrame(
        [(k, k % 2, "b") for k in range(100, 141)],
        "k long, grp long, val string",
    )
    posdelete.write_data(spark, df2, path, "grp", "k")
    n2 = posdelete.collect_file_blooms(spark, path, "k", incremental=True)
    assert 0 < n2 <= n1  # only the fresh commit's files
    # both eras probe correctly through the merged index
    got, n_read, n_total = posdelete.read_bloom_pruned(
        spark, path, "k", [5, 105]
    )
    ks = {r.k for r in got.collect()}
    assert {5, 105} <= ks
    assert n_read < n_total


def test_bloom_unprofiled_files_are_must_read(spark, tmp_path):
    """A data file appended AFTER the last bloom pass has no bitmap —
    the stale-safe rule reads it unconditionally, so its rows are
    served even though no bloom admits them."""
    path = str(tmp_path / "btab4")
    df1 = spark.createDataFrame(
        [(k, 0, "old") for k in range(1, 21)], "k long, grp long, val string"
    )
    posdelete.write_data(spark, df1, path, "grp", "k")
    posdelete.collect_file_blooms(spark, path, "k")
    df2 = spark.createDataFrame(
        [(500, 0, "fresh")], "k long, grp long, val string"
    )
    posdelete.write_data(spark, df2, path, "grp", "k")
    got, n_read, n_total = posdelete.read_bloom_pruned(
        spark, path, "k", [500]
    )
    assert [r.val for r in got.filter(F.col("k") == 500).collect()] == [
        "fresh"
    ]


def test_rewrite_compact_drops_bloom_index(spark, tmp_path):
    """rewrite_compact rewrites data files, so the bloom index it
    describes is dropped with them (derived metadata lifecycle, same
    as stats/)."""
    path = str(tmp_path / "btab5")
    df = spark.createDataFrame(
        [(k, k % 2, "x") for k in range(1, 31)], "k long, grp long, val string"
    )
    posdelete.write_data(spark, df, path, "grp", "k")
    posdelete.collect_file_blooms(spark, path, "k")
    posdelete.position_delete(spark, path, F.col("k") <= 5)
    posdelete.rewrite_compact(spark, path, "grp", "k")
    import os

    assert not os.path.exists(f"{path}/blooms")
    # a fresh pass over the compacted files works from scratch
    assert posdelete.collect_file_blooms(spark, path, "k") > 0
