"""SCD2 versioning + as-of join semantics and plan-shape pins."""

from __future__ import annotations

import datetime as dt

from glamira_end_to_end_data_pipeline_spark.operators.scd import (
    asof_join,
    scd2_versions,
)
from tests.conftest import SF_SMALL
from tests.test_plans import plan_of


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_scd2_versions_semantics(spark):
    rows = [
        # user 1: a → a (no change) → b → a
        (1, _ts(1), 10, "a"),
        (1, _ts(2), 11, "a"),
        (1, _ts(3), 12, "b"),
        (1, _ts(5), 13, "a"),
        # user 2: two conflicting changes at the same instant — the
        # higher tiebreak (event_id 21) must win the version slot.
        (2, _ts(1), 20, "x"),
        (2, _ts(1), 21, "y"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, seg string")
    out = scd2_versions(df, "user_id", "seg", "ts", "event_id")
    got = {
        (r.user_id, r.version_no): (r.segment, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("a", _ts(1), _ts(3), False),
        (1, 2): ("b", _ts(3), _ts(5), False),
        (1, 3): ("a", _ts(5), None, True),
        (2, 1): ("y", _ts(1), None, True),
    }


def test_asof_join_semantics(spark):
    states = spark.createDataFrame(
        [(1, _ts(2), "v1"), (1, _ts(4), "v2"), (2, _ts(3), "w1")],
        "k int, vf timestamp, seg string",
    )
    probes = spark.createDataFrame(
        [
            (100, 1, _ts(1)),   # before any state -> default
            (101, 1, _ts(2)),   # exactly at a state ts -> inclusive pickup
            (102, 1, _ts(3)),   # between versions -> v1
            (103, 1, _ts(9)),   # after last -> v2
            (104, 3, _ts(5)),   # key with no states -> default
        ],
        "pid int, k int, pts timestamp",
    )
    out = asof_join(
        probes, states,
        key_col="k", probe_ts_col="pts", state_ts_col="vf",
        value_col="seg", default="none",
    )
    got = {r.pid: r.seg for r in out.collect()}
    assert got == {100: "none", 101: "v1", 102: "v1", 103: "v2", 104: "none"}
    assert out.columns == ["pid", "k", "pts", "seg"]


def test_asof_plan_is_two_exchanges_no_join(spark, registry=None):
    """The union-window as-of must not plan a join at all (no nested
    loop, no range explosion): one Exchange for the SCD2 build, one for
    the merge window."""
    from __spark_entry__ import queries

    plan = plan_of(queries()["j8_asof_event_segments"](spark, SF_SMALL))
    assert plan.count("+- Exchange") == 2, plan
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan


def test_scd2_single_exchange(spark):
    """lag-detect, same-instant dedup, and lead/version windows must all
    share one shuffle on the key."""
    from __spark_entry__ import queries

    plan = plan_of(queries()["w5_scd2_user_segments"](spark, SF_SMALL))
    assert plan.count("+- Exchange") == 1, plan


def test_scd2_apply_changes_semantics(spark):
    from datetime import date

    from glamira_end_to_end_data_pipeline_spark.operators.scd import (
        scd2_apply_changes,
    )

    d = lambda s: date.fromisoformat(s)  # noqa: E731
    dim = spark.createDataFrame(
        [
            # key 1: history + current
            (1, "A", d("2023-01-01"), d("2024-01-01"), False),
            (1, "B", d("2024-01-01"), None, True),
            # key 2: current only
            (2, "A", d("2024-01-01"), None, True),
            # key 3: untouched by the batch
            (3, "C", d("2024-01-01"), None, True),
        ],
        "c_custkey long, segment string, valid_from date, valid_to date, "
        "is_current boolean",
    )
    changes = spark.createDataFrame(
        [
            (1, "Z", d("2024-06-01")),  # real change
            (2, "A", d("2024-06-01")),  # no-op: same state
            (9, "Q", d("2024-06-01")),  # unknown key: ignored
        ],
        "c_custkey long, segment string, valid_from date",
    )
    got = {
        (r.c_custkey, r.segment, r.valid_from): (r.valid_to, r.is_current)
        for r in scd2_apply_changes(dim, changes, "c_custkey").collect()
    }
    assert got == {
        (1, "A", d("2023-01-01")): (d("2024-01-01"), False),  # history intact
        (1, "B", d("2024-01-01")): (d("2024-06-01"), False),  # closed
        (1, "Z", d("2024-06-01")): (None, True),              # new current
        (2, "A", d("2024-01-01")): (None, True),              # no-op kept open
        (3, "C", d("2024-01-01")): (None, True),              # untouched
    }


def test_scd2_apply_changes_null_is_current_passes_through(spark):
    from datetime import date

    from glamira_end_to_end_data_pipeline_spark.operators.scd import (
        scd2_apply_changes,
    )

    d = lambda s: date.fromisoformat(s)  # noqa: E731
    dim = spark.createDataFrame(
        [
            (1, "A", d("2024-01-01"), None, None),   # glitched flag
            (2, "B", d("2024-01-01"), None, True),
        ],
        "c_custkey long, segment string, valid_from date, valid_to date, "
        "is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "Z", d("2024-06-01")), (2, "Z", d("2024-06-01"))],
        "c_custkey long, segment string, valid_from date",
    )
    rows = scd2_apply_changes(dim, changes, "c_custkey").collect()
    by = {(r.c_custkey, r.segment): (r.valid_to, r.is_current) for r in rows}
    # NULL-flag row survives untouched (treated as not-current, so the
    # change to key 1 is a no-op against a key with no current version)
    assert by[(1, "A")] == (None, None)
    assert len([r for r in rows if r.c_custkey == 1]) == 1
    # key 2 merges normally
    assert by[(2, "B")] == (d("2024-06-01"), False)
    assert by[(2, "Z")] == (None, True)


def test_scd2_apply_changes_null_state_closes_not_drops(spark):
    """r6 VERDICT bug: a current row with NULL tracked state receiving
    a real change matched neither =/!= branch (both evaluate NULL) and
    vanished. Null-safe detection must CLOSE it and open the new
    version; a NULL incoming state stays a no-op."""
    from datetime import date

    from glamira_end_to_end_data_pipeline_spark.operators.scd import (
        scd2_apply_changes,
    )

    d = lambda s: date.fromisoformat(s)  # noqa: E731
    dim = spark.createDataFrame(
        [
            (1, None, d("2024-01-01"), None, True),  # NULL state + change
            (2, None, d("2024-01-01"), None, True),  # NULL state, no change
            (3, "A", d("2024-01-01"), None, True),   # NULL incoming state
        ],
        "c_custkey long, segment string, valid_from date, valid_to date, "
        "is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "Z", d("2024-06-01")), (3, None, d("2024-06-01"))],
        "c_custkey long, segment string, valid_from date",
    )
    rows = scd2_apply_changes(dim, changes, "c_custkey").collect()
    got = {
        (r.c_custkey, r.segment, r.valid_from): (r.valid_to, r.is_current)
        for r in rows
    }
    assert got == {
        (1, None, d("2024-01-01")): (d("2024-06-01"), False),  # closed
        (1, "Z", d("2024-06-01")): (None, True),               # opened
        (2, None, d("2024-01-01")): (None, True),              # untouched
        (3, "A", d("2024-01-01")): (None, True),               # NULL ch = no-op
    }
    assert len(rows) == 4  # nothing dropped, nothing duplicated


def test_scd2_apply_changes_carries_wide_columns(spark):
    # A dim with extra attribute columns AND renamed validity columns:
    # the round-6 generalization must carry the untracked attributes
    # onto closed + new rows and resolve the custom names.
    from datetime import date

    from glamira_end_to_end_data_pipeline_spark.operators.scd import (
        scd2_apply_changes,
    )

    d = lambda s: date.fromisoformat(s)  # noqa: E731
    dim = spark.createDataFrame(
        [
            (1, "A", d("2024-01-01"), None, True, "Alice", 7),
            (2, "B", d("2024-01-01"), None, True, "Bob", 9),
        ],
        "k long, seg string, eff_from date, eff_to date, cur boolean, "
        "name string, region long",
    )
    changes = spark.createDataFrame(
        [(1, "Z", d("2024-06-01"))], "k long, seg string, eff date"
    )
    rows = scd2_apply_changes(
        dim,
        changes,
        "k",
        state_col="seg",
        eff_col="eff",
        from_col="eff_from",
        to_col="eff_to",
        cur_col="cur",
    ).collect()
    assert {tuple(r) for r in rows} == {
        (1, "A", d("2024-01-01"), d("2024-06-01"), False, "Alice", 7),
        (1, "Z", d("2024-06-01"), None, True, "Alice", 7),
        (2, "B", d("2024-01-01"), None, True, "Bob", 9),
    }


def test_scd2_apply_changes_missing_column_raises(spark):
    import pytest as _pytest

    from glamira_end_to_end_data_pipeline_spark.operators.scd import (
        scd2_apply_changes,
    )

    dim = spark.createDataFrame([(1, "A")], "k long, seg string")
    with _pytest.raises(ValueError, match="valid_from"):
        scd2_apply_changes(dim, dim, "k", state_col="seg")


def test_asof_join_tolerance_discards_stale_states(spark):
    states = spark.createDataFrame(
        [(1, _ts(1), "old"), (1, _ts(5), "new")],
        "k int, vf timestamp, seg string",
    )
    probes = spark.createDataFrame(
        [
            (100, 1, _ts(1, 12)),  # 12h after 'old' -> stale under 6h bound
            (101, 1, _ts(5, 3)),   # 3h after 'new' -> fresh
            (102, 1, _ts(5)),      # exactly at the state -> age 0, fresh
        ],
        "pid int, k int, pts timestamp",
    )
    out = asof_join(
        probes, states,
        key_col="k", probe_ts_col="pts", state_ts_col="vf",
        value_col="seg", default="none", tolerance=6 * 3600,
    )
    got = {r.pid: r.seg for r in out.collect()}
    assert got == {100: "none", 101: "new", 102: "new"}


def test_scd4_apply_pair_semantics(spark, tmp_path):
    """SCD4: real changes replace the current row and append the OLD
    version + supersession ts to history; no-ops and unknown keys touch
    nothing; current cardinality is invariant."""
    from pyspark.sql import functions as F

    from glamira_end_to_end_data_pipeline_spark.operators.scd import scd4_apply

    cur_path = str(tmp_path / "cur")
    hist_path = str(tmp_path / "hist")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "k long, seg string"
    ).write.parquet(cur_path)
    ch = spark.createDataFrame(
        [(1, "x", "2020-01-01"), (2, "b", "2020-01-01"), (9, "z", "2020-01-01")],
        "k long, seg string, effective_ts string",
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    n_hist, n_cur = scd4_apply(spark, cur_path, hist_path, ch, "k", "seg")
    assert (n_hist, n_cur) == (1, 3)
    cur = {r.k: r.seg for r in spark.read.parquet(cur_path).collect()}
    assert cur == {1: "x", 2: "b", 3: "a"}
    hist = spark.read.parquet(hist_path).collect()
    assert len(hist) == 1 and hist[0].k == 1 and hist[0].seg == "a"
    assert str(hist[0].superseded_at).startswith("2020-01-01")


def test_scd4_apply_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between scd4_apply's two renames leaves `.old` holding
    the current table and no live directory; the next apply must
    restore it before reading (ADVICE r12: Hadoop rename fails by
    returning false — the swap is now checked and recoverable)."""
    import shutil

    from pyspark.sql import functions as F

    from glamira_end_to_end_data_pipeline_spark.operators.scd import scd4_apply

    cur_path = str(tmp_path / "cur4r")
    hist_path = str(tmp_path / "hist4r")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, seg string"
    ).write.parquet(cur_path)
    # simulate the mid-swap crash: live renamed to .old, tmp never
    # landed (and a stale .tmp from the dead writer is still around)
    shutil.move(cur_path, cur_path + ".old")
    ch = spark.createDataFrame(
        [(1, "x", "2021-06-01")], "k long, seg string, effective_ts string"
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    n_hist, n_cur = scd4_apply(spark, cur_path, hist_path, ch, "k", "seg")
    assert (n_hist, n_cur) == (1, 2)
    cur = {r.k: r.seg for r in spark.read.parquet(cur_path).collect()}
    assert cur == {1: "x", 2: "b"}


def test_scd4_history_fold_exactly_once_after_swap_commit(spark, tmp_path):
    """ADVICE r13: a crash AFTER the current-table swap but BEFORE the
    staged history folds leaves the `_PENDING_HISTORY` marker inside
    the live current table and the superseded rows in
    `<history>.pending`. The next apply must fold them exactly once —
    the retried (now no-op) change set must not duplicate them, and a
    further apply must not re-fold."""
    import os

    from pyspark.sql import functions as F

    from glamira_end_to_end_data_pipeline_spark.operators.scd import scd4_apply

    cur_path = str(tmp_path / "cur4f")
    hist_path = str(tmp_path / "hist4f")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, seg string"
    ).write.parquet(cur_path)
    ch = spark.createDataFrame(
        [(1, "x", "2022-01-01")], "k long, seg string, effective_ts string"
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    n_hist, _ = scd4_apply(spark, cur_path, hist_path, ch, "k", "seg")
    assert n_hist == 1
    assert spark.read.parquet(hist_path).count() == 1

    # Reconstruct the post-swap/pre-fold crash state: the superseded
    # rows sit in pending (a distinct write job — distinct part-file
    # names, as in reality) and the marker is in the live table —
    # exactly what a crash between the swap and the fold leaves behind.
    spark.read.parquet(hist_path).write.parquet(hist_path + ".pending")
    open(os.path.join(cur_path, "_PENDING_HISTORY"), "w").close()
    # The retried change set is a NO-OP against the already-swapped
    # current table; only entry-time recovery may touch history.
    n_hist2, n_cur2 = scd4_apply(spark, cur_path, hist_path, ch, "k", "seg")
    assert (n_hist2, n_cur2) == (0, 2)
    # folded exactly once: the original row + the recovered copy = 2,
    # NOT 3 (the direct-append design re-appended on retry)
    assert spark.read.parquet(hist_path).count() == 2
    assert not os.path.exists(hist_path + ".pending")
    assert not os.path.exists(os.path.join(cur_path, "_PENDING_HISTORY"))
    # a further apply folds nothing more
    n_hist3, _ = scd4_apply(spark, cur_path, hist_path, ch, "k", "seg")
    assert n_hist3 == 0
    assert spark.read.parquet(hist_path).count() == 2


def test_scd4_pre_swap_pending_is_never_fabricated_into_history(
    spark, tmp_path
):
    """A pending directory WITHOUT the marker is a pre-swap leftover
    (the change set never hit the current table) — folding it would
    fabricate history. The retried run must recompute and land the
    correct single history row."""
    import os

    from pyspark.sql import functions as F

    from glamira_end_to_end_data_pipeline_spark.operators.scd import scd4_apply

    cur_path = str(tmp_path / "cur4p")
    hist_path = str(tmp_path / "hist4p")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, seg string"
    ).write.parquet(cur_path)
    # dead writer staged pending, crashed before the swap
    spark.createDataFrame(
        [(1, "a", "2022-01-01")],
        "k long, seg string, superseded_at string",
    ).write.parquet(hist_path + ".pending")
    ch = spark.createDataFrame(
        [(1, "x", "2022-01-01")], "k long, seg string, effective_ts string"
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    n_hist, _ = scd4_apply(spark, cur_path, hist_path, ch, "k", "seg")
    assert n_hist == 1
    assert spark.read.parquet(hist_path).count() == 1
    assert not os.path.exists(hist_path + ".pending")
