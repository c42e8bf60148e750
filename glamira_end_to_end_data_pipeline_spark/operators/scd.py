"""Slowly-changing-dimension (Type 2) versioning and as-of joins.

The reference's dbt dims are dedup-to-latest (Type 1: ``dim_customer.sql:18``
keeps only the newest row per key). The natural warehouse extension — and
the shape dbt ships as *snapshots* — is Type 2: keep every distinct state
as a version row with a validity interval, then resolve "which version was
active at time T" with an as-of join.

Spark-first design, both halves one-shuffle:

- ``scd2_versions``: change detection is ``lag`` over (key, ts); version
  rows are the change points only, so the output is |changes|, not
  |events|. Both windows (lag + lead) share the same partitioning, so
  Catalyst plans a single Exchange on the key.
- ``asof_join``: the classic sort-merge trick — UNION state rows and probe
  rows, sort per key by (ts, kind), and let ``last(value, ignorenulls)``
  carry the latest state forward onto each probe row. One shuffle on the
  key, zero range-join explosion: at 100 TB this is the only as-of shape
  that survives (an inequality join degenerates to per-key cross products
  under skew; the union-window is linear in |states| + |probes| and
  AQE-splittable like any other sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an event stream into SCD2 version rows.

    A version starts at every row whose ``state_col`` differs from the
    previous row's (per key, ordered by ``ts_col, tiebreak_col``). When
    several changes share one timestamp the last one (max tiebreak) wins
    the version slot — mirrored in the oracle — so the result is total-
    order deterministic.

    Returns: key, segment, valid_from, valid_to (NULL = open), version_no
    (1-based per key), is_current.
    """
    w_order = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = df.select(
        F.col(key_col),
        F.col(state_col).alias("segment"),
        F.col(ts_col).alias("valid_from"),
        F.col(tiebreak_col).alias("_tb"),
        F.lag(state_col).over(w_order).alias("_prev"),
    ).filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("segment")))

    # One version per (key, valid_from): the last change at that instant
    # defines the state from then on.
    w_dedup = Window.partitionBy(key_col, "valid_from").orderBy(F.desc("_tb"))
    starts = (
        changed.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prev", "_tb")
    )

    w_ver = Window.partitionBy(key_col).orderBy("valid_from")
    return starts.select(
        F.col(key_col),
        "segment",
        "valid_from",
        F.lead("valid_from").over(w_ver).alias("valid_to"),
        F.row_number().over(w_ver).alias("version_no"),
        F.lead("valid_from").over(w_ver).isNull().alias("is_current"),
    )


def asof_join(
    probe: DataFrame,
    states: DataFrame,
    key_col: str,
    probe_ts_col: str,
    state_ts_col: str,
    value_col: str,
    default: str | None = None,
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left as-of join: attach the latest state with
    ``state_ts <= probe_ts`` to every probe row.

    Union-window implementation (see module docstring): state rows sort
    *before* probe rows at equal timestamps (``_kind`` 0 < 1), so a state
    becoming valid exactly at the probe instant IS picked up — matching
    DuckDB's ``ASOF JOIN ... ON probe.ts >= state.ts`` semantics.

    ``tolerance`` is the feature-store STALENESS BOUND (pandas
    ``merge_asof(tolerance=)``; point-in-time-correct feature joins):
    a carried state older than ``tolerance`` at the probe instant is
    discarded — the probe gets ``default``/NULL, never a stale
    feature. Units: SECONDS for timestamp columns, the column's own
    units for numerics. Implemented by carrying the matched state's
    timestamp through the same window (one struct column — no extra
    shuffle, no join): the tolerance test is a map-side filter on the
    carried pair."""
    from pyspark.sql.types import DateType, TimestampType

    probe_cols = probe.columns
    tagged_states = states.select(
        F.col(key_col).alias("_key"),
        F.col(state_ts_col).alias("_ts"),
        F.col(value_col).alias("_state"),
        F.lit(0).alias("_kind"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    )
    tagged_probes = probe.select(
        F.col(key_col).alias("_key"),
        F.col(probe_ts_col).alias("_ts"),
        F.lit(None).cast(states.schema[value_col].dataType).alias("_state"),
        F.lit(1).alias("_kind"),
        *probe_cols,
    )
    w = (
        Window.partitionBy("_key")
        .orderBy("_ts", "_kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The carried payload is (state_ts, value) as ONE struct so a
    # single last(ignorenulls) window keeps them consistent — two
    # separate last() calls could disagree if a state's value were
    # NULL (ignorenulls would skip it for the value but not the ts).
    pair = F.when(
        F.col("_kind") == 0, F.struct(F.col("_ts").alias("sts"), F.col("_state").alias("sval"))
    )
    out = (
        tagged_states.unionByName(tagged_probes)
        .withColumn("_carried", F.last(pair, ignorenulls=True).over(w))
        .filter(F.col("_kind") == 1)
    )
    asof = F.col("_carried.sval")
    if tolerance is not None:
        ts_type = isinstance(
            probe.schema[probe_ts_col].dataType, (TimestampType, DateType)
        )
        if ts_type:
            age = F.unix_timestamp(F.col("_ts")) - F.unix_timestamp(
                F.col("_carried.sts")
            )
        else:
            age = F.col("_ts") - F.col("_carried.sts")
        asof = F.when(age <= tolerance, asof)
    if default is not None:
        asof = F.coalesce(asof, F.lit(default))
    return out.select(*probe_cols, asof.alias(value_col))


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    state_col: str = "segment",
    eff_col: str = "valid_from",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    cur_col: str = "is_current",
) -> DataFrame:
    """Apply a change batch to an existing SCD2 dimension — the
    maintenance half of the snapshot pattern (:func:`scd2_versions`
    builds history from scratch; this is the nightly MERGE that evolves
    it): each REAL change (new state ≠ the key's current state) CLOSES
    the current version (``valid_to`` = the change's effective ts,
    ``is_current`` = false) and appends a new open version; no-op
    changes (same state) and unknown keys touch nothing. Closed history
    rows pass through untouched.

    ``changes`` columns: ``key_col``, ``state_col`` (the new state),
    ``eff_col`` (effective timestamp) — at most one change per key per
    batch (pre-dedup with dedup-to-latest otherwise; enforcing it here
    would hide a double-apply bug).

    ``dim`` may carry ANY extra attribute columns beyond the key /
    state / validity triplet — they pass through untouched on history
    and unchanged rows, and a real change carries the current version's
    attribute values onto both the closed row and the new open version
    (the change batch describes only the tracked state; untracked
    attributes persist until their own feed updates them — the standard
    multi-attribute SCD2 merge). The validity columns are
    parameterized (``from_col`` / ``to_col`` / ``cur_col``) so a
    dimension with differently-named bookkeeping columns resolves
    instead of failing.

    Plan shape: ONE key-keyed shuffle joins changes to current rows;
    history rides a union with no shuffle. Output is the full new
    dimension state with exactly ``dim``'s columns. A NULL ``cur_col``
    (an upstream load glitch) is treated as not-current: the row passes
    through with history, untouched — never silently dropped."""
    for c in (key_col, state_col, from_col, to_col, cur_col):
        if c not in dim.columns:
            raise ValueError(f"dim is missing required column {c!r}")
    cur = dim.filter(F.col(cur_col).eqNullSafe(F.lit(True)))
    hist = dim.filter(~F.col(cur_col).eqNullSafe(F.lit(True)))
    ch = changes.select(
        F.col(key_col),
        F.col(state_col).alias("_new_state"),
        F.col(eff_col).alias("_eff"),
    )
    j = cur.join(ch, key_col, "left")
    # Null-safe change detection: a current row whose tracked state is
    # NULL (dim seeded before the attribute's feed went live) must still
    # match exactly one branch. With plain =/!= both predicates evaluate
    # NULL for such a row and it silently vanishes from the output. A
    # NULL incoming state stays a no-op (indistinguishable from "no
    # change row" after the left join); NULL→X is a real change and
    # closes/opens. Oracle mirror: IS NOT DISTINCT FROM.
    unchanged = j.filter(
        F.col("_new_state").isNull()
        | F.col("_new_state").eqNullSafe(F.col(state_col))
    ).select(*dim.columns)
    closed = j.filter(
        F.col("_new_state").isNotNull()
        & ~F.col("_new_state").eqNullSafe(F.col(state_col))
    )
    # Rebuild rows by OVERRIDING the affected columns positionally over
    # dim's full column list, so extra attribute columns ride along.
    closed_over = {
        to_col: F.col("_eff"),
        cur_col: F.lit(False),
    }
    new_over = {
        state_col: F.col("_new_state"),
        from_col: F.col("_eff"),
        to_col: F.lit(None).cast(dim.schema[to_col].dataType),
        cur_col: F.lit(True),
    }
    closed_rows = closed.select(
        *[closed_over.get(c, F.col(c)).alias(c) for c in dim.columns]
    )
    new_rows = closed.select(
        *[new_over.get(c, F.col(c)).alias(c) for c in dim.columns]
    )
    return (
        hist.select(*dim.columns)
        .unionByName(unchanged)
        .unionByName(closed_rows)
        .unionByName(new_rows)
    )


def scd4_apply(
    spark,
    current_path: str,
    history_path: str,
    changes: DataFrame,
    key_col: str,
    state_col: str,
    eff_col: str = "effective_ts",
    superseded_col: str = "superseded_at",
) -> tuple[int, int]:
    """SCD TYPE 4 — the current/history TABLE PAIR: the current table
    stays narrow and validity-free (every query against it is a plain
    key lookup, no ``is_current`` filter, no interval predicate), and
    every superseded version is appended to a separate history table
    stamped with when it was replaced. Type 4 is what warehouses pick
    when the dimension is hot (the current table is the join target on
    every fact load) and history is cold (audited occasionally) —
    versus Type 2's single table where every reader pays the validity
    filter forever.

    Semantics per change row (at most one per key per batch, same
    contract as :func:`scd2_apply_changes`): a REAL change (new state
    differs null-safely from the key's current state) appends the OLD
    current row + ``superseded_col`` = the change's ``eff_col`` to the
    history table and replaces the row in the current table; no-op
    changes and unknown keys touch nothing.

    Returns ``(n_superseded, n_current)``.

    Plan shape: ONE key-keyed join decides everything; history is an
    append of change-sized rows; the new current table is written to a
    sibling directory and swapped in with a filesystem rename (the
    copy-on-write discipline every overwrite-while-reading path here
    uses — never overwrite the directory a live plan is scanning).
    At 100 TB the current table would be key-partitioned and only
    touched partitions rewritten (merge_upsert_partitioned's
    contract); the swap shape is identical.

    HISTORY EXACTLY-ONCE: the history append is STAGED, not direct —
    superseded rows land in a sibling ``<history>.pending`` directory
    before the swap, and fold into the history table only AFTER the
    current-table swap commits. The fold is file-by-file renames
    (atomic per file, names unique per write job), and the commit
    signal is a ``_PENDING_HISTORY`` marker written INSIDE the new
    current table before it is swapped in: the marker becomes visible
    exactly when the swap does. A crash anywhere is safe to retry —
    before the swap, the recomputed run overwrites the identical
    pending set; after the swap, entry-time recovery sees the marker
    in the live table and finishes the fold (renames that already
    happened are skipped because the files are gone from pending),
    while the retried run itself computes an EMPTY change set against
    the already-updated current table. The direct-append design this
    replaces duplicated history rows on exactly that retry."""
    from glamira_end_to_end_data_pipeline_spark.sources.lake import _hadoop_fs

    fs, live = _hadoop_fs(spark, current_path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    old = jvm_path(current_path.rstrip("/") + ".old")
    # Recovery from a prior failed swap: ``.old`` present WITHOUT a
    # live current dir means we crashed between the two renames — the
    # backup IS the current table; restore it before reading. (A
    # leftover ``.old`` alongside a live dir is just an uncleaned
    # backup from a completed swap — drop it.)
    if fs.exists(old):
        if fs.exists(live):
            fs.delete(old, True)
        elif not fs.rename(old, live):
            raise IOError(f"could not restore {old} -> {current_path}")
    pending = jvm_path(history_path.rstrip("/") + ".pending")
    marker = jvm_path(current_path.rstrip("/") + "/_PENDING_HISTORY")
    # Recovery from a crash AFTER a committed swap but before the
    # staged history folded: the live current table still carries the
    # marker — finish the fold, then clean up. (A pending dir WITHOUT
    # the marker is a pre-swap leftover: the change set never hit the
    # current table, so folding it would fabricate history — the
    # retried run recomputes and overwrites it instead.)
    if fs.exists(marker):
        _fold_pending_history(fs, jvm_path, pending, history_path)
        fs.delete(marker, False)

    cur = spark.read.parquet(current_path)
    ch = changes.select(
        F.col(key_col),
        F.col(state_col).alias("_new_state"),
        F.col(eff_col).alias("_eff"),
    )
    j = cur.join(ch, key_col, "left")
    real = j.filter(
        F.col("_new_state").isNotNull()
        & ~F.col("_new_state").eqNullSafe(F.col(state_col))
    )
    superseded = real.select(
        *cur.columns, F.col("_eff").alias(superseded_col)
    )
    n_hist = superseded.count()
    if n_hist:
        # staged, NOT appended — the fold happens after the swap commits
        superseded.write.mode("overwrite").parquet(pending.toString())
    replaced = real.select(
        *[
            F.col("_new_state").alias(c) if c == state_col else F.col(c)
            for c in cur.columns
        ]
    )
    untouched = j.filter(
        F.col("_new_state").isNull()
        | F.col("_new_state").eqNullSafe(F.col(state_col))
    ).select(*cur.columns)
    nxt = untouched.unionByName(replaced)
    tmp = current_path.rstrip("/") + ".tmp"
    nxt.write.mode("overwrite").parquet(tmp)
    n_cur = spark.read.parquet(tmp).count()
    if n_hist:
        # the marker rides INSIDE the new table: it becomes visible to
        # recovery exactly when the swap commits, never before
        fs.create(jvm_path(tmp + "/_PENDING_HISTORY"), True).close()
    # Hadoop FileSystem.rename signals failure by RETURNING FALSE, not
    # by raising — an unchecked rename here would report success counts
    # while leaving the current/history pair silently inconsistent.
    # Check both; on a failed second rename roll the backup straight
    # back so a live current directory always exists. History is still
    # only STAGED at this point, so a failed swap appends nothing.
    if not fs.rename(live, old):
        raise IOError(
            f"could not stage {current_path} -> {old}; history staged "
            f"({n_hist} rows) but NOT folded — current table untouched"
        )
    if not fs.rename(jvm_path(tmp), live):
        if not fs.rename(old, live):
            raise IOError(
                f"could not swap in {tmp} AND could not restore {old} -> "
                f"{current_path}; restore {old} manually"
            )
        raise IOError(
            f"could not swap {tmp} -> {current_path}; previous current "
            f"table restored (history staged, not folded)"
        )
    fs.delete(old, True)
    if n_hist:
        _fold_pending_history(fs, jvm_path, pending, history_path)
        fs.delete(marker, False)
    return n_hist, n_cur


def _fold_pending_history(fs, jvm_path, pending, history_path: str) -> None:
    """Fold the staged ``<history>.pending`` directory into the history
    table by RENAMING each data file in — atomic per file and
    exactly-once (a file lives in pending or in history, never both;
    part-file names carry the write job's UUID so they never collide).
    Safe to re-enter after a crash mid-fold: already-moved files are
    simply absent from pending. No-op when pending is gone (a prior
    fold completed before the marker was cleared)."""
    if not fs.exists(pending):
        return
    hist = jvm_path(history_path)
    if not fs.exists(hist):
        fs.mkdirs(hist)
    for status in fs.listStatus(pending):
        p = status.getPath()
        name = p.getName()
        if name.startswith(("_", ".")):
            continue
        if not fs.rename(p, jvm_path(history_path.rstrip("/") + "/" + name)):
            raise IOError(f"could not fold {p} into {history_path}")
    fs.delete(pending, True)
