"""Round-11 additions — dense-delete MoR lifecycle proof, robust trend
estimation, and a classic fraud/DQ screen:

- ``lake_mor_dense_deletes`` — the r10 VERDICT's ask: a merge-on-read
  fixture where DELETES OUTNUMBER SURVIVORS across two delete commits
  with a snapshot EXPIRY between them, four data eras, and re-inserts
  interleaved both as a WAP branch publish (the r10 ADVICE's
  data-corruption path — branch files live at /data/vb_*/ forever) and
  as a plain append. An in-query gate RAISES unless deletes really do
  outnumber survivors, so the green grade is a density proof, not just
  a value match.
- ``w_theil_sen_trend`` — Theil–Sen robust slope per nation over the
  monthly revenue series: the median of all pairwise slopes, immune to
  the outlier months a least-squares fit chases (Sen 1968). Bounded:
  pairs are per-nation month-pair combinations (~84² /2), never row
  pairs.
- ``dq_benford_first_digit`` — Benford's-law first-significant-digit
  screen over order totals with per-digit chi-squared contributions —
  the classic fabricated-numbers detector, one map-only pass + a
  9-group aggregate.

Design note: every entry keeps the registry's scale discipline —
map-only or single-exchange plans, bounded driver metadata, no RNG
state, Arrow-only Python. Reference citations use the SURVEY §0
shorthand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.sources import read_table

# ---------------------------------------------------------------------------
# Dense-delete merge-on-read lifecycle (VERDICT r10 task 5)
# ---------------------------------------------------------------------------
# Timeline (k = c_custkey):
#   v1 append  era1 = k%3==0
#   v2 delete  D1   = k%6==0            (kills half of era1)
#   v3 append  era2 = k%3==1
#   -- expire keep_last=1: v1+v2 manifests drop, D1 folds into v3 as a
#      carried delete with its ORIGINAL version 2 --
#   v4 WAP     R1   = k%60==0, bal 111  (stage+publish: files live at
#                                        /data/vb_*/ — the ADVICE path)
#   v5 delete  D2   = k%4!=0            (kills 3/4 of everything older)
#   v6 append  R2   = k%12==1, bal 222  (re-insert of D2 victims)
# Final survivors: era2 ∩ (k%12==4) at original balance, R1 at 111
# (era 4 outranks carried D1@2), R2 at 222 (era 6 outranks D2@5).
# era1 dies entirely: D1 takes k%6==0, D2 takes the odd remainder.


@query(
    "lake_mor_dense_deletes",
    """
    WITH base AS (
        SELECT cast(c_custkey AS BIGINT) AS k, c_mktsegment, c_acctbal
        FROM customer
    ),
    final AS (
        SELECT k, c_mktsegment, c_acctbal FROM base WHERE k % 12 = 4
        UNION ALL
        SELECT k, c_mktsegment, 111.0 AS c_acctbal FROM base WHERE k % 60 = 0
        UNION ALL
        SELECT k, c_mktsegment, 222.0 AS c_acctbal FROM base WHERE k % 12 = 1
    )
    SELECT c_mktsegment, count(*) AS n_rows,
           round(sum(c_acctbal), 2) AS total_bal
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def lake_mor_dense_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read under DELETE-DOMINATED history (sources/lake.py:
    delete_snapshot / expire_snapshots / publish_branch /
    read_snapshot_mor): two delete commits bracket a snapshot EXPIRY —
    the first delete survives only as a carried_delete folded into the
    oldest retained manifest with its original version — and the two
    re-inserts take the two distinct era paths: a WAP branch publish
    (files under /data/vb_<branch>_<base>/ FOREVER; era comes from the
    manifest's recorded per-file eras — the r10 ADVICE corruption bug:
    path-parsed eras were NULL there and the survivor filter dropped
    every re-inserted row) and a plain append. Deletes outnumber
    survivors by construction and an in-query gate RAISES if they
    don't, so the green grade certifies the density, the fold-forward,
    and both era paths at once. The oracle derives the same final
    state from the source table in closed form."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import lake

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_mordense_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"),
        "c_mktsegment",
        "c_acctbal",
    )
    k = F.col("k")
    lake.write_snapshot(spark, base.filter(k % 3 == 0), path)  # v1
    lake.delete_snapshot(spark, base.filter(k % 6 == 0).select("k"), path, ["k"])  # v2
    lake.write_snapshot(spark, base.filter(k % 3 == 1), path)  # v3
    out = lake.expire_snapshots(spark, path, keep_last=1)
    if out["expired_versions"] != 2:
        raise AssertionError(
            f"fixture drift: expected to expire v1+v2, got {out}"
        )
    lake.stage_branch(
        spark,
        base.filter(k % 60 == 0).select(
            "k", "c_mktsegment", F.lit(111.0).alias("c_acctbal")
        ),
        path,
        "reinstate",
    )
    v4 = lake.publish_branch(spark, path, "reinstate")
    if v4 != 4:
        raise AssertionError(f"fixture drift: WAP publish landed at v{v4}")
    lake.delete_snapshot(spark, base.filter(k % 4 != 0).select("k"), path, ["k"])  # v5
    lake.write_snapshot(
        spark,
        base.filter(k % 12 == 1).select(
            "k", "c_mktsegment", F.lit(222.0).alias("c_acctbal")
        ),
        path,
    )  # v6
    served = lake.read_snapshot_mor(spark, path)
    # Density gate: the raw data-file view holds every row ever
    # appended; the MoR view must have LOST more than it kept, or this
    # fixture no longer grades what it claims to.
    n_raw = lake.read_snapshot(spark, path).count()
    n_live = served.count()
    if not (n_raw - n_live > n_live):
        raise AssertionError(
            f"fixture drift: deletes ({n_raw - n_live}) do not outnumber "
            f"survivors ({n_live})"
        )
    return (
        served.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend per nation
# ---------------------------------------------------------------------------


@query(
    "w_theil_sen_trend",
    """
    WITH monthly AS (
        SELECT n.n_name,
               (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS t,
               round(sum(o.o_totalprice), 2) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.n_name,
               (b.rev - a.rev) / (b.t - a.t) AS slope
        FROM monthly a JOIN monthly b
          ON a.n_name = b.n_name AND b.t > a.t
    )
    SELECT n_name,
           cast(count(*) AS BIGINT) AS n_pairs,
           round(median(slope), 4) AS theil_sen_slope
    FROM slopes GROUP BY 1 ORDER BY 1
    """,
)
def w_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator per nation over the monthly revenue series:
    slope = MEDIAN over all month-pair slopes (rev_j − rev_i)/(t_j −
    t_i) — the robust trend a dashboard wants when one promo month
    would drag least squares (Sen 1968; Theil 1950). Reference parity:
    the reference's dbt layer aggregates to time grains but fits
    nothing (7.dtv models); this is the engine-side upgrade.

    Scale shape: rows collapse to (nation × month) FIRST (one shuffled
    aggregate — the only data-sized exchange), so the pairwise
    self-join is over series points, ~84²/2 pairs per nation, never
    row pairs; the per-nation median is one exact ``percentile`` over
    those bounded groups. Monthly revenue is rounded to cents BEFORE
    slopes so both engines difference identical inputs (double sums
    agree to well under a cent at any SF; the slope subtraction would
    otherwise amplify last-ulp noise)."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    monthly = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("t"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    # the (nation × month) series is dimension-sized (~25 × 84 rows
    # at ANY SF — it only grows with the calendar), so the pairwise
    # side rides a broadcast and the self-join never shuffles the
    # series twice
    slopes = a.join(
        F.broadcast(b),
        (F.col("a.n_name") == F.col("b.n_name")) & (F.col("b.t") > F.col("a.t")),
    ).select(
        F.col("a.n_name").alias("n_name"),
        ((F.col("b.rev") - F.col("a.rev")) / (F.col("b.t") - F.col("a.t"))).alias(
            "slope"
        ),
    )
    return (
        slopes.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)"), 4).alias(
                "theil_sen_slope"
            ),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen
# ---------------------------------------------------------------------------


@query(
    "dq_benford_first_digit",
    """
    WITH digits AS (
        SELECT cast(substr(cast(cast(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
               AS first_digit
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
        SELECT first_digit, cast(count(*) AS BIGINT) AS n_obs FROM digits GROUP BY 1
    ),
    tot AS (SELECT sum(n_obs) AS n FROM counts)
    SELECT c.first_digit, c.n_obs,
           round(t.n * ln(1.0 + 1.0 / c.first_digit) / ln(10.0), 4) AS expected_n,
           round(
               pow(c.n_obs - t.n * ln(1.0 + 1.0 / c.first_digit) / ln(10.0), 2)
               / (t.n * ln(1.0 + 1.0 / c.first_digit) / ln(10.0)),
               4
           ) AS chi2_term
    FROM counts c CROSS JOIN tot t
    ORDER BY c.first_digit
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit screen over order totals —
    the classic fabricated-data detector (Benford 1938; Nigrini's audit
    usage): natural multi-scale amounts put P(d) = log10(1+1/d) mass on
    first digit d, and a feed that someone typed by hand (or a unit
    bug that shifted scales) shows up as a fat chi-squared term long
    before any row-level rule fires. Emits per-digit observed counts,
    expected counts, and chi² contributions.

    Scale shape: the digit extraction is exact integer/string map-side
    work (floor → BIGINT → leading char — identical semantics on both
    engines, no double-format round-trip), the aggregate has 9 groups,
    and the expectation join is a one-row scalar broadcast (the
    q11/q15 crossJoin pattern). One pass, one 9-key exchange."""
    orders = read_table(spark, sf_dir, "orders").select("o_totalprice")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = counts.agg(F.sum("n_obs").alias("n"))
    expected = F.col("n") * F.log(1.0 + 1.0 / F.col("first_digit")) / F.log(
        F.lit(10.0)
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            "n_obs",
            F.round(expected, 4).alias("expected_n"),
            F.round(
                F.pow(F.col("n_obs") - expected, 2) / expected, 4
            ).alias("chi2_term"),
        )
        .orderBy("first_digit")
    )
