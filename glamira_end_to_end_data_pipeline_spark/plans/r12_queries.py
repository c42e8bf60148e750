"""Round-12 additions — the nonparametric/exact-rank statistics family,
the privacy-trio completion, FDR-controlled multiple testing, and two
lake-format parity entries (positional deletes, bucket-transform
pruning):

- ``dq_mann_whitney_u`` — exact tie-corrected Mann–Whitney U between two
  md5-assigned halves of the event-value feed: the rank-sum sibling of
  ``dq_ks_two_sample`` (same distributed prefix-sum shape, different
  statistic — MW reads mean rank shift where KS reads sup CDF gap).
- ``a_spearman_corr`` — exact Spearman rank correlation (midranks under
  ties) between quantity and price: both rank assignments run as
  bucket-partitioned prefix sums over per-distinct-value rollups, then
  Pearson over integer 2×midranks via one sufficient-stats aggregate.
- ``dq_t_closeness`` — the third leg of the privacy trio (k-anonymity,
  l-diversity already graded): ordered-EMD distance between each
  quasi-identifier group's sensitive-attribute distribution and the
  global one, over a bounded (group × bucket) grid.
- ``dq_bh_fdr_proportions`` — Benjamini–Hochberg FDR control over 25
  per-nation return-rate z-tests; normal CDF via the Abramowitz–Stegun
  7.1.26 erf polynomial written identically in both engines.
- ``a_trimmed_winsorized_mean`` — EXACT 10%-trimmed and winsorized means
  per segment without a per-group sort: four order statistics located
  by the two-phase bucket recount (operators/exact_stats.py) with
  boundary-tie corrections in integer cents.
- ``sample_consistent_hash_keys`` — join-consistent sampling: customer
  and orders sampled INDEPENDENTLY by the same md5 key bucket remain
  referentially consistent with zero coordination — the cross-table
  sampling discipline a 100 TB star needs (no sampled-key broadcast,
  no join at sample time).
- ``a_event_sequence_match`` — funnel-pattern matching over each user's
  time-ordered event string (ClickHouse ``sequenceMatch`` semantics):
  one groupBy + sort_array, pattern applied as a regex, no window.
- ``w_lagged_cross_correlation`` — lead–lag Pearson between two
  segments' daily-revenue series at lags 0..7, lags materialized by an
  explode (no cross join), correlation from per-lag sufficient stats.
- ``lake_position_deletes`` — Iceberg-v2 POSITIONAL delete files
  (sources/posdelete.py): deletes address (file, row-ordinal), so a
  later re-insert of the same key is untouched by construction — the
  complementary flavor to ``lake_mor_equality_deletes``, no sequence
  rule needed because file identity scopes the tombstone.
- ``graph_betweenness_source`` — Brandes single-source dependency
  accumulation (the backward pass over ``bfs_path_counts``'s forward
  σ/levels); oracle enumerates every shortest path with an explicit
  path string and charges interior nodes 1/σ(t).
- ``lake_bucket_partition_prune`` — Iceberg ``bucket(N, col)`` partition
  transform expressed as a stored computed column: an equality probe on
  the natural key prunes to 1/N of the files by metadata alone, with an
  in-query gate on the pruning counters.

Design note: every entry keeps the registry's scale discipline —
map-only or single/double-exchange plans, bounded driver metadata, no
RNG state, Arrow-only Python, unpartitioned windows only over bounded
rollups (allow-listed with justification in tests/test_plan_audit.py).
No reference parity for the statistics (the reference aggregates in
BigQuery and never runs hypothesis tests); the lake entries extend the
SURVEY §2.9 snapshot-table family toward Iceberg-v2 parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.plans.r8_queries import _hash_mod
from glamira_end_to_end_data_pipeline_spark.sources import read_table

# ---------------------------------------------------------------------------
# Mann–Whitney U — exact, tie-corrected, via distributed prefix sums
# ---------------------------------------------------------------------------


@query(
    "dq_mann_whitney_u",
    """
    WITH v AS (
        SELECT value,
               ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT % 2 AS s
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT value,
               sum((s = 0)::INT) AS ca, sum((s = 1)::INT) AS cb
        FROM v GROUP BY value
    ),
    c AS (
        SELECT ca, cb,
               coalesce(sum(ca + cb) OVER (
                   ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS prior
        FROM g
    ),
    t AS (
        SELECT cast(sum(ca) AS BIGINT) AS na,
               cast(sum(cb) AS BIGINT) AS nb,
               cast(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
                    AS BIGINT) AS tie
        FROM g
    ),
    r AS (
        SELECT cast(sum(ca * (2 * prior + ca + cb + 1)) AS BIGINT) AS r2
        FROM c
    )
    SELECT na AS n_a, nb AS n_b,
           (r2 - na * (na + 1)) / 2.0 AS u_stat,
           round(((r2 - na * (na + 1)) / 2.0 - na * nb / 2.0)
                 / sqrt(na * nb / 12.0
                        * ((na + nb + 1)
                           - tie / (1.0 * (na + nb) * (na + nb - 1)))),
                 6) AS z_score,
           abs(((r2 - na * (na + 1)) / 2.0 - na * nb / 2.0)
               / sqrt(na * nb / 12.0
                      * ((na + nb + 1)
                         - tie / (1.0 * (na + nb) * (na + nb - 1)))))
               > 1.96 AS reject_05
    FROM r, t
    """,
)
def dq_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Mann–Whitney U (Wilcoxon rank-sum) between two
    md5-assigned halves of the event-value feed, with midranks and the
    tie-corrected normal approximation — the location-shift audit that
    complements ``dq_ks_two_sample``'s shape test. A sound hash split
    should NOT reject.

    Scale shape — the SAME distributed prefix sum as the KS entry, no
    global sort: one groupBy collapses rows to per-distinct-value
    (cntA, cntB); the EXCLUSIVE cumulative count (rows strictly below
    each value) runs as a window PARTITIONED on a coarse value bucket
    plus a bounded ≤|buckets| offset rollup (allow-listed). Ranks stay
    INTEGER throughout by carrying 2×midrank = 2·prior + cnt + 1, so
    2·R_A = Σ cntA·(2·prior + cnt + 1) is an exact BIGINT and the
    statistic is bit-identical cross-engine; the only floating math is
    the final z normalization, mirrored expression-for-expression in
    the oracle."""
    from glamira_end_to_end_data_pipeline_spark.operators.exact_stats import (
        exclusive_prefix_over_values,
    )

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = _hash_mod(F.col("event_id"), 2)
    g = (
        ev.select("value", s.alias("s"))
        .groupBy("value")
        .agg(
            F.sum((F.col("s") == 0).cast("long")).alias("ca"),
            F.sum((F.col("s") == 1).cast("long")).alias("cb"),
        )
        .withColumn("cnt", F.col("ca") + F.col("cb"))
    )
    ranked = exclusive_prefix_over_values(g, "value", "cnt", 50.0)
    stats = ranked.agg(
        F.sum(F.col("ca") * (2 * F.col("prior") + F.col("cnt") + 1)).alias("r2"),
    )
    tots = g.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie"),
    )
    na, nb, tie = F.col("na"), F.col("nb"), F.col("tie")
    u = (F.col("r2") - na * (na + 1)) / 2.0
    z = (u - na * nb / 2.0) / F.sqrt(
        na * nb / 12.0
        * ((na + nb + 1) - tie / (1.0 * (na + nb) * (na + nb - 1)))
    )
    return (
        stats.crossJoin(F.broadcast(tots))
        .select(
            na.alias("n_a"),
            nb.alias("n_b"),
            u.alias("u_stat"),
            F.round(z, 6).alias("z_score"),
            (F.abs(z) > 1.96).alias("reject_05"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation — exact midranks, integer sufficient stats
# ---------------------------------------------------------------------------


@query(
    "a_spearman_corr",
    """
    WITH rows_in AS (
        SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
    ),
    rx AS (
        SELECT x,
               2 * coalesce(sum(cnt) OVER (
                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) + cnt + 1 AS r2x
        FROM (SELECT x, count(*) AS cnt FROM rows_in GROUP BY x)
    ),
    ry AS (
        SELECT y,
               2 * coalesce(sum(cnt) OVER (
                   ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) + cnt + 1 AS r2y
        FROM (SELECT y, count(*) AS cnt FROM rows_in GROUP BY y)
    ),
    j AS (
        SELECT r2x, r2y FROM rows_in
        JOIN rx USING (x) JOIN ry USING (y)
    ),
    s AS (
        SELECT cast(count(*) AS DOUBLE) AS n,
               cast(sum(r2x) AS DOUBLE) AS sx,
               cast(sum(r2y) AS DOUBLE) AS sy,
               cast(sum(r2x * r2x) AS DOUBLE) AS sxx,
               cast(sum(r2y * r2y) AS DOUBLE) AS syy,
               cast(sum(r2x * r2y) AS DOUBLE) AS sxy
        FROM j
    )
    SELECT cast(n AS BIGINT) AS n_rows,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS spearman_rho
    FROM s
    """,
)
def a_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation (midranks under ties) between
    line-item quantity and extended price — the monotone-association
    measure Pearson (a_corr_stats) misses on nonlinear-but-monotone
    relations.

    Scale shape: NO global sort. Each column's midranks come from a
    per-distinct-value rollup (one groupBy) with the exclusive prefix
    count computed under a bucket-partitioned window plus a bounded
    bucket-offset rollup; rows then re-acquire their two ranks through
    two key-partitioned joins. Ranks are carried as integer 2×midrank
    (Pearson is scale-invariant, so the factor 2 cancels) and the six
    sufficient statistics are exact BIGINTs cast to double only for
    the final closed form — mirrored exactly in the oracle. The
    quantity side has ~50 distinct values so its rank table broadcasts;
    the price side stays a shuffle join on the value key. Overflow
    headroom: Σ(2r)² ≤ 4n³ stays inside BIGINT to n ≈ 1.3e6 rows (fine
    at every graded SF); past that, accumulate the second moments in
    double as a_ratio_metric_delta_ci does — rank products are exact
    doubles until 2^53 and the ±ulp summation noise is orders below
    the 6-decimal rounding."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )

    from glamira_end_to_end_data_pipeline_spark.operators.exact_stats import (
        exclusive_prefix_over_values,
    )

    def midranks(df: DataFrame, col: str, width: float, out: str) -> DataFrame:
        g = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        p = exclusive_prefix_over_values(g, col, "cnt", width)
        return p.select(
            col, (2 * F.col("prior") + F.col("cnt") + 1).alias(out)
        )

    rx = midranks(li, "x", 5.0, "r2x")
    ry = midranks(li, "y", 1000.0, "r2y")
    j = li.join(F.broadcast(rx), "x").join(ry, "y")
    s = j.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("r2x").cast("double").alias("sx"),
        F.sum("r2y").cast("double").alias("sy"),
        F.sum(F.col("r2x") * F.col("r2x")).cast("double").alias("sxx"),
        F.sum(F.col("r2y") * F.col("r2y")).cast("double").alias("syy"),
        F.sum(F.col("r2x") * F.col("r2y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    rho = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select(
        n.cast("bigint").alias("n_rows"),
        F.round(rho, 6).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# t-closeness — ordered EMD between group and global sensitive
# distributions (completes the k-anonymity / l-diversity privacy trio)
# ---------------------------------------------------------------------------


@query(
    "dq_t_closeness",
    """
    WITH src AS (
        SELECT c_nationkey AS g,
               cast(floor(c_acctbal / 1000.0) AS BIGINT) AS b
        FROM customer
    ),
    cells AS (SELECT g, b, count(*) AS c FROM src GROUP BY g, b),
    groups AS (SELECT g, sum(c) AS ng FROM cells GROUP BY g),
    buckets AS (SELECT b, sum(c) AS cb FROM cells GROUP BY b),
    m AS (SELECT count(*) AS m, sum(cb) AS n FROM buckets),
    grid AS (
        SELECT groups.g, groups.ng, buckets.b, buckets.cb,
               coalesce(cells.c, 0) AS c
        FROM groups CROSS JOIN buckets
        LEFT JOIN cells ON cells.g = groups.g AND cells.b = buckets.b
    ),
    cum AS (
        SELECT g, ng,
               sum(c) OVER (PARTITION BY g ORDER BY b) AS cp,
               sum(cb) OVER (PARTITION BY g ORDER BY b) AS cq
        FROM grid
    )
    SELECT cast(g AS BIGINT) AS nationkey,
           round(sum(abs(cp / (1.0 * ng) - cq / (1.0 * (SELECT n FROM m))))
                 / ((SELECT m FROM m) - 1), 6) AS emd,
           sum(abs(cp / (1.0 * ng) - cq / (1.0 * (SELECT n FROM m))))
               / ((SELECT m FROM m) - 1) > 0.15 AS violates_t
    FROM cum GROUP BY g ORDER BY 1
    """,
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian 2007) over the customer
    table: nationkey is the quasi-identifier, the account balance
    (1000-wide ordered buckets) is the sensitive attribute, and the
    distance is the ORDERED Earth-Mover's Distance — for a 1-D ordered
    domain EMD has the closed form Σ|cumP − cumQ|/(m−1) over bucket
    prefix sums. Completes the privacy trio next to ``dq_k_anonymity``
    and ``dq_l_diversity``.

    Scale shape: rows collapse to a (group × bucket) cell rollup in one
    exchange; everything after runs on the BOUNDED dense grid
    (|nations| × |buckets| ≈ 275 rows — the broadcast cross join is
    allow-listed with that bound). Cumulative windows are partitioned
    by group; the global distribution rides along as a per-bucket
    column of the grid, so no second pass over data."""
    src = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("g"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("b"),
    )
    cells = src.groupBy("g", "b").agg(F.count(F.lit(1)).alias("c"))
    groups = cells.groupBy("g").agg(F.sum("c").alias("ng"))
    buckets = cells.groupBy("b").agg(F.sum("c").alias("cb"))
    mrow = buckets.agg(
        F.count(F.lit(1)).alias("m"), F.sum("cb").alias("n")
    )
    grid = (
        groups.crossJoin(F.broadcast(buckets))
        .join(cells, ["g", "b"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    win = (
        Window.partitionBy("g")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "g",
        "ng",
        F.sum("c").over(win).alias("cp"),
        F.sum("cb").over(win).alias("cq"),
    )
    emd = (
        cum.crossJoin(F.broadcast(mrow))
        .groupBy("g", "ng", "m", "n")
        .agg(
            F.sum(
                F.abs(
                    F.col("cp") / (1.0 * F.col("ng"))
                    - F.col("cq") / (1.0 * F.col("n"))
                )
            ).alias("d")
        )
        .select(
            F.col("g").cast("bigint").alias("nationkey"),
            F.round(F.col("d") / (F.col("m") - 1), 6).alias("emd"),
            (F.col("d") / (F.col("m") - 1) > 0.15).alias("violates_t"),
        )
    )
    return emd.orderBy("nationkey")


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR over per-nation return-rate z-tests
# ---------------------------------------------------------------------------

# Abramowitz & Stegun 7.1.26 erf polynomial (|err| ≤ 1.5e-7), written
# once here and once, term-for-term, in the oracle SQL so both engines
# evaluate the IDENTICAL double expression.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _pvalue_two_sided(zabs):
    """2·(1 − Φ(|z|)) via the A&S erf approximation, |z| ≥ 0."""
    x = zabs / F.lit(2.0**0.5)
    t = 1.0 / (1.0 + _AS_P * x)
    poly = (
        _AS_A[0] * t
        + _AS_A[1] * t * t
        + _AS_A[2] * t * t * t
        + _AS_A[3] * t * t * t * t
        + _AS_A[4] * t * t * t * t * t
    )
    erf = 1.0 - poly * F.exp(-x * x)
    return 2.0 * (1.0 - 0.5 * (1.0 + erf))


_SQL_PVAL = """
        2 * (1 - 0.5 * (1 + (1 - (0.254829592 * (1 / (1 + 0.3275911 * (zabs / sqrt(2.0))))
            - 0.284496736 * pow(1 / (1 + 0.3275911 * (zabs / sqrt(2.0))), 2)
            + 1.421413741 * pow(1 / (1 + 0.3275911 * (zabs / sqrt(2.0))), 3)
            - 1.453152027 * pow(1 / (1 + 0.3275911 * (zabs / sqrt(2.0))), 4)
            + 1.061405429 * pow(1 / (1 + 0.3275911 * (zabs / sqrt(2.0))), 5))
            * exp(-(zabs / sqrt(2.0)) * (zabs / sqrt(2.0))))))
"""


@query(
    "dq_bh_fdr_proportions",
    f"""
    WITH li AS (
        SELECT s.s_nationkey AS g,
               (l.l_returnflag = 'R')::INT AS is_r
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    per AS (
        SELECT g, count(*) AS n, sum(is_r) AS r FROM li GROUP BY g
    ),
    gl AS (
        SELECT sum(n) AS nn, sum(r) AS rr, count(*) AS m FROM per
    ),
    z AS (
        SELECT g, n, r,
               abs((r / (1.0 * n) - rr / (1.0 * nn))
                   / sqrt((rr / (1.0 * nn)) * (1 - rr / (1.0 * nn)) / n))
                   AS zabs,
               m
        FROM per, gl
    ),
    p AS (
        SELECT g, n, r, m, {_SQL_PVAL} AS pval FROM z
    ),
    rk AS (
        SELECT *, row_number() OVER (ORDER BY pval, g) AS rnk FROM p
    ),
    thr AS (
        SELECT coalesce(max(CASE WHEN pval * m <= 0.05 * rnk
                                 THEN rnk END), 0) AS rmax
        FROM rk
    )
    SELECT cast(g AS BIGINT) AS nationkey,
           cast(n AS BIGINT) AS n_items,
           round(r / (1.0 * n), 6) AS return_rate,
           round(pval, 6) AS p_value,
           rnk <= rmax AS reject_fdr_05
    FROM rk, thr ORDER BY 1
    """,
)
def dq_bh_fdr_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control (BH 1995) over 25 simultaneous
    per-nation return-rate tests: each supplier nation's returned-flag
    proportion is z-tested against the global rate, p-values come from
    the Abramowitz–Stegun 7.1.26 erf polynomial (written identically in
    both engines so the doubles agree bit-for-bit), and the BH step-up
    rule rejects every hypothesis at or below the largest rank r with
    p_(r) ≤ α·r/m — the multiple-testing discipline a 25-way drift scan
    needs where per-test α would fire 1-in-20 nations by chance.

    Scale shape: one broadcast dim join + one groupBy collapse rows to
    the 25-row per-nation rollup; the rank window and the step-up max
    run on that bounded rollup (unpartitioned window allow-listed at
    ≤|nations| rows; the threshold rides a one-row broadcast)."""
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_returnflag")
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    per = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("r"),
        )
    )
    glob = per.agg(
        F.sum("n").alias("nn"), F.sum("r").alias("rr"), F.count(F.lit(1)).alias("m")
    )
    z = per.crossJoin(F.broadcast(glob)).select(
        "g",
        "n",
        "r",
        "m",
        F.abs(
            (F.col("r") / (1.0 * F.col("n")) - F.col("rr") / (1.0 * F.col("nn")))
            / F.sqrt(
                (F.col("rr") / (1.0 * F.col("nn")))
                * (1 - F.col("rr") / (1.0 * F.col("nn")))
                / F.col("n")
            )
        ).alias("zabs"),
    )
    p = z.withColumn("pval", _pvalue_two_sided(F.col("zabs")))
    rk = p.withColumn(
        "rnk", F.row_number().over(Window.orderBy("pval", "g"))
    )
    thr = rk.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("pval") * F.col("m") <= 0.05 * F.col("rnk"),
                    F.col("rnk"),
                )
            ),
            F.lit(0),
        ).alias("rmax")
    )
    return (
        rk.crossJoin(F.broadcast(thr))
        .select(
            F.col("g").cast("bigint").alias("nationkey"),
            F.col("n").cast("bigint").alias("n_items"),
            F.round(F.col("r") / (1.0 * F.col("n")), 6).alias("return_rate"),
            F.round(F.col("pval"), 6).alias("p_value"),
            (F.col("rnk") <= F.col("rmax")).alias("reject_fdr_05"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Exact trimmed + winsorized means — order statistics by bucket recount
# ---------------------------------------------------------------------------


@query(
    "a_trimmed_winsorized_mean",
    """
    WITH v AS (
        SELECT c_mktsegment AS g,
               cast(round(c_acctbal * 100) AS BIGINT) AS x
        FROM customer
    ),
    o AS (
        SELECT g, x,
               row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
               count(*) OVER (PARTITION BY g) AS n
        FROM v
    ),
    kk AS (
        SELECT g, n, cast(floor(0.1 * n) AS BIGINT) AS k
        FROM (SELECT DISTINCT g, n FROM o)
    ),
    t AS (
        SELECT o.g,
               any_value(kk.n) AS n, any_value(kk.k) AS k,
               sum(CASE WHEN rn > kk.k AND rn <= kk.n - kk.k
                        THEN x END) AS tsum,
               max(CASE WHEN rn = kk.k + 1 THEN x END) AS xlo1,
               max(CASE WHEN rn = kk.n - kk.k THEN x END) AS xhi0
        FROM o JOIN kk ON o.g = kk.g
        GROUP BY o.g
    )
    SELECT g AS segment,
           cast(n AS BIGINT) AS n_rows,
           cast(k AS BIGINT) AS n_trimmed_each,
           ((2 * tsum * 100 + (n - 2 * k)) // (2 * (n - 2 * k)))
               / 10000.0 AS trimmed_mean,
           ((2 * (tsum + k * xlo1 + k * xhi0) * 100 + n) // (2 * n))
               / 10000.0 AS winsor_mean
    FROM t ORDER BY 1
    """,
)
def a_trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 10%-trimmed and winsorized means of account balance per
    market segment — the outlier-robust location estimates — WITHOUT a
    per-group sort: the three order statistics each group needs (ranks
    k, k+1, n−k with k = ⌊n/10⌋, which VARY per group and so defeat
    fixed-quantile helpers) are located by
    ``operators/exact_stats.values_at_ranks``'s two-phase bucket
    recount, and boundary ties are settled in integer cents via the
    strictly-below prefix sums it returns: the trimmed sum is
    kept(n−k) − kept(k) where kept(m) = sum_lt(x₍ₘ₎) + (m −
    cnt_lt(x₍ₘ₎))·x₍ₘ₎, and winsorizing adds k copies of x₍ₖ₊₁₎ and
    x₍ₙ₋ₖ₎. Every accumulated term is a BIGINT; the oracle computes the
    same statistics with the full row_number sort an oracle can afford.
    An in-query gate RAISES if any group's k < 1 (the trim would be a
    no-op and the entry ungraded)."""
    from glamira_end_to_end_data_pipeline_spark.operators.exact_stats import (
        values_at_ranks,
    )

    v = read_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("g"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
    )
    tot = v.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    kmin = tot.agg(F.min(F.floor(0.1 * F.col("n")))).collect()[0][0]
    if kmin is None or kmin < 1:
        raise AssertionError(
            f"fixture drift: smallest group trims k={kmin} rows — the "
            "trimmed mean would equal the plain mean"
        )
    ranks = tot.select(
        "g",
        F.explode(
            F.array(
                F.struct(
                    F.lit("klo").alias("label"),
                    F.floor(0.1 * F.col("n")).cast("long").alias("rk"),
                ),
                F.struct(
                    F.lit("klo1").alias("label"),
                    (F.floor(0.1 * F.col("n")) + 1).cast("long").alias("rk"),
                ),
                F.struct(
                    F.lit("khi").alias("label"),
                    (F.col("n") - F.floor(0.1 * F.col("n")))
                    .cast("long")
                    .alias("rk"),
                ),
            )
        ).alias("s"),
    ).select("g", F.col("s.label").alias("label"), F.col("s.rk").alias("rk"))
    at = values_at_ranks(v, "g", "x", ranks, bucket_width=100000.0)
    piv = at.groupBy("g").agg(
        F.max(F.when(F.col("label") == "klo", F.col("rk"))).alias("k"),
        F.max(F.when(F.col("label") == "klo", F.col("x_at"))).alias("xlo"),
        F.max(F.when(F.col("label") == "klo", F.col("cnt_lt"))).alias("clo"),
        F.max(F.when(F.col("label") == "klo", F.col("sum_lt"))).alias("slo"),
        F.max(F.when(F.col("label") == "klo1", F.col("x_at"))).alias("xlo1"),
        F.max(F.when(F.col("label") == "khi", F.col("rk"))).alias("rhi"),
        F.max(F.when(F.col("label") == "khi", F.col("x_at"))).alias("xhi"),
        F.max(F.when(F.col("label") == "khi", F.col("cnt_lt"))).alias("chi"),
        F.max(F.when(F.col("label") == "khi", F.col("sum_lt"))).alias("shi"),
    )
    out = piv.join(tot, "g").select(
        "g",
        "n",
        "k",
        (
            (F.col("shi") + (F.col("rhi") - F.col("chi")) * F.col("xhi"))
            - (F.col("slo") + (F.col("k") - F.col("clo")) * F.col("xlo"))
        ).alias("tsum"),
        "xlo1",
        F.col("xhi").alias("xhi0"),
    )
    # Final 4-decimal rounding in INTEGER half-up arithmetic — the mean
    # grid is 1/(100·n)-spaced, so a double round() can land exactly on
    # a decimal half and the two engines' round() would disagree at the
    # last digit; (2a + b) div (2b) is exact for the positive sums the
    # gate below certifies.
    out = out.withColumn("d", F.col("n") - 2 * F.col("k")).withColumn(
        "wsum",
        F.col("tsum") + F.col("k") * F.col("xlo1") + F.col("k") * F.col("xhi0"),
    )
    bad = out.filter((F.col("tsum") <= 0) | (F.col("wsum") <= 0)).count()
    if bad:
        raise AssertionError(
            "fixture drift: a group's trimmed/winsorized sum is non-positive "
            "— the integer half-up rounding below assumes positive numerators"
        )
    return out.select(
        F.col("g").alias("segment"),
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("k").cast("bigint").alias("n_trimmed_each"),
        (
            F.expr("(2 * tsum * 100 + d) div (2 * d)") / 10000.0
        ).alias("trimmed_mean"),
        (
            F.expr("(2 * wsum * 100 + n) div (2 * n)") / 10000.0
        ).alias("winsor_mean"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Join-consistent sampling by shared key hash
# ---------------------------------------------------------------------------


@query(
    "sample_consistent_hash_keys",
    """
    WITH cs AS (
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE ('0x' || substr(md5(c_custkey::VARCHAR), 1, 15))::BIGINT % 5 = 0
    ),
    os AS (
        SELECT o_custkey, o_totalprice FROM orders
        WHERE ('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::BIGINT % 5 = 0
    )
    SELECT c_mktsegment AS segment,
           count(DISTINCT cs.c_custkey) AS n_cust_sampled,
           count(os.o_custkey) AS n_orders_sampled,
           cast(count(os.o_custkey) * 5 AS BIGINT) AS est_total_orders,
           round(sum(os.o_totalprice), 2) AS sampled_revenue
    FROM cs LEFT JOIN os ON os.o_custkey = cs.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def sample_consistent_hash_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-CONSISTENT sampling across the customer/orders star edge:
    both tables are sampled INDEPENDENTLY by the same md5 bucket of the
    customer key, so the 20% customer sample and the orders sample stay
    referentially intact with ZERO coordination — no sampled-key
    broadcast, no sampling-time join, each table one map-only filter
    (the universe-sampling trick: consistent hashing makes the sample a
    deterministic function of the key, so any table sharing the key
    self-selects the same entities; VLDB folklore, e.g. Gemulla 2008).
    An in-query gate RAISES if any sampled order misses its sampled
    customer — the consistency proof. Estimator column: sampled order
    count × 5 is unbiased for the total order count.

    Scale shape: two map-only hash filters (pushed to the scans) + one
    key-partitioned join for the report; at 100 TB the filters prune
    before any shuffle and the join carries only the 20% sample."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cs = cust.filter(_hash_mod(F.col("c_custkey"), 5) == 0)
    os_ = orders.filter(_hash_mod(F.col("o_custkey"), 5) == 0)
    missing = os_.join(
        cs, os_["o_custkey"] == cs["c_custkey"], "left_anti"
    ).count()
    if missing:
        raise AssertionError(
            f"consistency breach: {missing} sampled orders have no sampled "
            "customer — the shared-key hash must self-select both sides"
        )
    return (
        cs.join(os_, os_["o_custkey"] == cs["c_custkey"], "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("c_custkey").alias("n_cust_sampled"),
            F.count("o_custkey").alias("n_orders_sampled"),
            (F.count("o_custkey") * 5).cast("bigint").alias("est_total_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sampled_revenue"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Event-sequence pattern matching (ClickHouse sequenceMatch semantics)
# ---------------------------------------------------------------------------


@query(
    "a_event_sequence_match",
    """
    WITH seqs AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    ),
    tagged AS (
        SELECT CASE
                   WHEN seq NOT LIKE '%purchase%' THEN 'no_purchase'
                   WHEN regexp_matches(seq, 'view.*purchase')
                       THEN 'viewed_then_purchased'
                   ELSE 'purchased_unviewed'
               END AS funnel
        FROM seqs
    )
    SELECT funnel, count(*) AS n_users
    FROM tagged GROUP BY 1 ORDER BY 1
    """,
)
def a_event_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel-pattern matching over each user's TIME-ORDERED event-type
    string — ClickHouse's ``sequenceMatch('(?1).*(?2)')`` semantics
    re-expressed relationally: did a 'view' precede a 'purchase'
    anywhere in the user's history? Users split three ways: never
    purchased, purchased with a prior view, purchased without one.

    Scale shape: ONE exchange (groupBy user) — the sequence is built by
    sort_array over collect_list of (ts, event_id, type) structs (the
    tiebreak makes the string deterministic under any task order), the
    pattern is a single JVM regex per user row, and the final tag
    rollup is a 3-row aggregate. No window, no per-event shuffle;
    event-type names are prefix-free so the '>'-joined string matches
    exactly the event sequence."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("seq")
    )
    tagged = seqs.select(
        F.when(~F.col("seq").contains("purchase"), F.lit("no_purchase"))
        .when(F.col("seq").rlike("view.*purchase"), F.lit("viewed_then_purchased"))
        .otherwise(F.lit("purchased_unviewed"))
        .alias("funnel")
    )
    return (
        tagged.groupBy("funnel")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("funnel")
    )


# ---------------------------------------------------------------------------
# Lead–lag cross-correlation between two segments' daily revenue
# ---------------------------------------------------------------------------


@query(
    "w_lagged_cross_correlation",
    """
    WITH o AS (
        SELECT c.c_mktsegment AS seg,
               cast(o.o_orderdate AS DATE) AS d,
               cast(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    a AS (SELECT d, sum(cents) AS ra FROM o WHERE seg = 'BUILDING' GROUP BY d),
    b AS (SELECT d, sum(cents) AS rb FROM o WHERE seg = 'MACHINERY' GROUP BY d),
    lagged AS (
        SELECT t.lag AS lag, a.d, a.ra, b.rb
        FROM a CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS lag) t
        JOIN b ON b.d = a.d - cast(t.lag AS INT)
    ),
    s AS (
        SELECT lag,
               cast(count(*) AS DOUBLE) AS n,
               cast(sum(ra) AS DOUBLE) AS sa,
               cast(sum(rb) AS DOUBLE) AS sb,
               sum(cast(ra AS DOUBLE) * cast(ra AS DOUBLE)) AS saa,
               sum(cast(rb AS DOUBLE) * cast(rb AS DOUBLE)) AS sbb,
               sum(cast(ra AS DOUBLE) * cast(rb AS DOUBLE)) AS sab
        FROM lagged GROUP BY lag
    )
    SELECT cast(lag AS BIGINT) AS lag_days,
           cast(n AS BIGINT) AS n_days,
           round((n * sab - sa * sb)
                 / (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb)),
                 6) AS xcorr
    FROM s ORDER BY 1
    """,
)
def w_lagged_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag Pearson cross-correlation between the BUILDING and
    MACHINERY segments' daily revenue series at lags 0..7 days — the
    "does one segment lead the other" diagnostic behind demand-transfer
    and cannibalization analyses (corr(A_t, B_{t−ℓ}) per ℓ).

    Scale shape: rows collapse to two |days|-sized daily rollups in one
    join+groupBy; the 8 lags come from an EXPLODE of a literal array
    (no cross join operator, no BNLJ) and each lag realigns via one
    key-partitioned join on the shifted date; correlations come from
    per-lag sufficient statistics. Daily sums are EXACT integer cents,
    so both engines feed identical doubles into the closed form; days
    missing from either series drop from that lag's n (inner-join
    semantics, mirrored in the oracle)."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    o = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderdate").cast("date").alias("d"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )
    a = o.filter(F.col("seg") == "BUILDING").groupBy("d").agg(
        F.sum("cents").alias("ra")
    )
    b = (
        o.filter(F.col("seg") == "MACHINERY")
        .groupBy("d")
        .agg(F.sum("cents").alias("rb"))
        .select(F.col("d").alias("bd"), "rb")
    )
    lags = a.select(
        "d",
        "ra",
        F.explode(F.array([F.lit(i) for i in range(8)])).alias("lag"),
    ).withColumn("d_b", F.date_sub(F.col("d"), F.col("lag")))
    j = lags.join(b, lags["d_b"] == b["bd"]).select("lag", "ra", "rb")
    s = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("ra").cast("double").alias("sa"),
        F.sum("rb").cast("double").alias("sb"),
        F.sum(F.col("ra").cast("double") * F.col("ra").cast("double")).alias("saa"),
        F.sum(F.col("rb").cast("double") * F.col("rb").cast("double")).alias("sbb"),
        F.sum(F.col("ra").cast("double") * F.col("rb").cast("double")).alias("sab"),
    )
    n, sa, sb = F.col("n"), F.col("sa"), F.col("sb")
    saa, sbb, sab = F.col("saa"), F.col("sbb"), F.col("sab")
    return s.select(
        F.col("lag").cast("bigint").alias("lag_days"),
        n.cast("bigint").alias("n_days"),
        F.round(
            (n * sab - sa * sb)
            / (F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)),
            6,
        ).alias("xcorr"),
    ).orderBy("lag_days")


# ---------------------------------------------------------------------------
# Positional delete files (Iceberg-v2 MoR, the (file, pos) flavor)
# ---------------------------------------------------------------------------


@query(
    "lake_position_deletes",
    """
    WITH base AS (
        SELECT cast(c_custkey AS BIGINT) AS k, c_mktsegment, c_acctbal
        FROM customer
    ),
    final AS (
        SELECT * FROM base
        WHERE k % 2 = 0 AND c_acctbal >= 0 AND c_mktsegment <> 'BUILDING'
        UNION ALL
        SELECT * FROM base
        WHERE k % 2 = 1 AND c_acctbal < 0 AND c_mktsegment <> 'BUILDING'
    )
    SELECT c_mktsegment AS segment, count(*) AS n_rows,
           round(sum(c_acctbal), 2) AS total_bal
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def lake_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-v2 POSITIONAL deletes (sources/posdelete.py): tombstones
    address (data-file path, row ordinal), the complementary MoR flavor
    to ``lake_mor_equality_deletes``. The fixture proves the defining
    property — file-scoped tombstones need NO sequence-era rule:
    commit 1 lands the even keys, delete 1 tombstones negative
    balances, commit 2 RE-INSERTS rows that match delete 1's predicate
    (odd keys with negative balances) into new files — and they
    survive, because a positional tombstone can never name a file
    written after it. Delete 2 ('BUILDING') then spans files of both
    commits. In-query gates RAISE unless both deletes tombstoned rows
    AND the predicate-matching re-inserts survived. The oracle derives
    the same final state from the source table in closed form."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_posdel_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"),
        "c_mktsegment",
        "c_acctbal",
    )
    k = F.col("k")
    c1 = base.filter(k % 2 == 0).withColumn("grp", (k % 4).cast("long"))
    posdelete.write_data(spark, c1, path, "grp", "k")
    n1 = posdelete.position_delete(spark, path, F.col("c_acctbal") < 0)
    c2 = (
        base.filter((k % 2 == 1) & (F.col("c_acctbal") < 0))
        .withColumn("grp", (k % 4).cast("long"))
    )
    posdelete.write_data(spark, c2, path, "grp", "k")
    n2 = posdelete.position_delete(
        spark, path, F.col("c_mktsegment") == "BUILDING"
    )
    if n1 == 0 or n2 == 0:
        raise AssertionError(
            f"fixture drift: both deletes must tombstone rows (n1={n1}, "
            f"n2={n2})"
        )
    final = posdelete.read_mor(spark, path)
    reinserted = final.filter(k % 2 == 1).count()
    if reinserted == 0:
        raise AssertionError(
            "fixture drift: no delete-predicate-matching re-inserts "
            "survived — the file-scoped tombstone property went unexercised"
        )
    return (
        final.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Brandes single-source betweenness dependencies
# ---------------------------------------------------------------------------

_BTW_N = 250
_BTW_SRC = 1
_BTW_CAP = 12


@query(
    "graph_betweenness_source",
    f"""
    WITH RECURSIVE edges AS (
        SELECT i AS u, (3 * i + 1) % {_BTW_N} AS v FROM range({_BTW_N}) t(i)
        UNION ALL
        SELECT i, (3 * i + 2) % {_BTW_N} FROM range({_BTW_N}) t(i)
    ),
    walk(node, d, path) AS (
        SELECT {_BTW_SRC}, 0, CAST('' AS VARCHAR)
        UNION ALL
        SELECT e.v, w.d + 1,
               CASE WHEN w.d = 0 THEN ''
                    WHEN w.path = '' THEN CAST(w.node AS VARCHAR)
                    ELSE w.path || ',' || CAST(w.node AS VARCHAR) END
        FROM walk w JOIN edges e ON e.u = w.node
        WHERE w.d < {_BTW_CAP}
    ),
    md AS (SELECT node, min(d) AS dist FROM walk GROUP BY 1),
    sp AS (
        SELECT w.node AS t, w.path FROM walk w
        JOIN md m ON w.node = m.node AND w.d = m.dist
    ),
    np AS (SELECT t, count(*) AS sigma FROM sp GROUP BY t),
    inter AS (
        SELECT cast(s.part AS BIGINT) AS v, sp.t
        FROM sp, unnest(string_split(sp.path, ',')) AS s(part)
        WHERE sp.path <> ''
    ),
    dep AS (
        SELECT v, sum(1.0 / np.sigma) AS delta
        FROM inter JOIN np USING (t) GROUP BY v
    )
    SELECT cast(m.node AS BIGINT) AS node,
           cast(m.dist AS BIGINT) AS dist,
           cast(np.sigma AS BIGINT) AS npaths,
           round(coalesce(dep.delta, 0.0), 6) AS dependency
    FROM md m JOIN np ON np.t = m.node
    LEFT JOIN dep ON dep.v = m.node
    ORDER BY 1
    """,
)
def graph_betweenness_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brandes single-source betweenness dependencies
    (operators/graph.py:betweenness_from_source): the forward layered
    BFS computes σ(s,v) (graph_shortest_path_counts' machinery), then
    the backward pass walks the SAME layer boundaries deepest-first
    accumulating δ(u) = σ(u)·Σ (1+δ(v))/σ(v) over shortest-path-DAG
    edges — summing δ over a source set is exact betweenness
    centrality, and each per-source pass is this primitive. The oracle
    computes δ a completely different way: a depth-capped recursive
    walk enumerates EVERY shortest path with an explicit interior-node
    string and charges each interior node 1/σ(t) (oracle-scale luxury;
    bounded: out-degree 2, cap {_BTW_CAP} → ≤ 2^{_BTW_CAP}+ walks). An
    in-query gate RAISES if any distance reaches the walk cap. Fixture:
    the tripling graph i → {{3i+1, 3i+2}} mod {_BTW_N} from source
    {_BTW_SRC}."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        betweenness_from_source,
    )

    ids = spark.range(_BTW_N)
    edges = ids.select(
        F.col("id").alias("u"), ((F.col("id") * 3 + 1) % _BTW_N).alias("v")
    ).unionAll(
        ids.select(
            F.col("id").alias("u"),
            ((F.col("id") * 3 + 2) % _BTW_N).alias("v"),
        )
    )
    out = betweenness_from_source(edges, _BTW_SRC)
    dmax = out.agg(F.max("dist")).collect()[0][0]
    if dmax is None or dmax >= _BTW_CAP:
        raise AssertionError(
            f"fixture drift: max distance {dmax} reaches the oracle walk "
            f"cap {_BTW_CAP} — dependencies would diverge"
        )
    return out.select(
        "node",
        "dist",
        "npaths",
        F.round("dependency", 6).alias("dependency"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# bucket(N, col) partition transform with metadata pruning
# ---------------------------------------------------------------------------


@query(
    "lake_bucket_partition_prune",
    """
    SELECT count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders WHERE o_custkey = 7
    """,
)
def lake_bucket_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg's ``bucket(N, col)`` partition transform, expressed as a
    stored computed column over the snapshot-table machinery
    (sources/lake.py:write_snapshot + read_snapshot_spec_pruned): the
    table is committed partitioned on an 8-way md5 bucket of the
    customer key, and an equality probe on the NATURAL key prunes to
    the probe's bucket by metadata alone — the transform maps the probe
    value through the same hash, so pruning needs no file opens and no
    value index, exactly why Iceberg buckets high-cardinality join/probe
    keys. In-query gates RAISE unless files were really pruned
    (n_read < n_total) AND the kept files came from the spec path (the
    observability counter read_snapshot_spec_pruned returns). The
    residual row filter still applies (other keys share the bucket).
    The oracle reads the plain table — pruning must be result-neutral."""
    import hashlib
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import lake

    probe = 7
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_bktprune_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    df = orders.withColumn("o_bucket", _hash_mod(F.col("o_custkey"), 8))
    lake.write_snapshot(spark, df, path, partition_by=["o_bucket"])
    # the probe value routes through the SAME transform, python-side —
    # mirrors _hash_mod's md5-of-string-cast exactly
    b = int(hashlib.md5(str(probe).encode()).hexdigest()[:15], 16) % 8
    pruned, n_read, n_total, n_spec = lake.read_snapshot_spec_pruned(
        spark, path, "o_bucket", b
    )
    if not (0 < n_read < n_total) or n_spec < 1:
        raise AssertionError(
            f"bucket pruning failed: read {n_read}/{n_total} files, "
            f"spec-kept {n_spec} — the transform probe must prune"
        )
    return pruned.filter(F.col("o_custkey") == probe).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER join — the unconverted-clicks feed
# ---------------------------------------------------------------------------


@query(
    "stream_outer_join_unconverted",
    """
    WITH c AS (
        SELECT event_id AS cid, user_id, ts FROM events
        WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    conv AS (
        SELECT DISTINCT c.cid FROM c
        JOIN p ON p.user_id = c.user_id
              AND p.ts >= c.ts
              AND p.ts <= c.ts + INTERVAL 24 HOUR
    )
    SELECT (SELECT count(*) FROM c) AS n_clicks,
           (SELECT count(*) FROM conv) AS n_converted,
           (SELECT count(*) FROM c) - (SELECT count(*) FROM conv)
               AS n_unconverted,
           round((SELECT count(*) FROM conv)
                 / (1.0 * (SELECT count(*) FROM c)), 6) AS conversion_rate
    """,
)
def stream_outer_join_unconverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 extension — stream-stream LEFT OUTER join
    (streaming/joins.py:attribution_join_left_outer): every click
    joined to same-user purchases in the following 24 h, with
    null-padded rows for clicks that never convert — the abandonment
    feed an inner join structurally cannot produce, and the join mode
    where Structured Streaming's watermark does REAL work (an unmatched
    verdict requires the watermark to close the click's window before
    the null row may be emitted; state on both sides stays
    lookahead-bounded per key). Evaluated in batch here so DuckDB can
    hash-check the semantics; tests/test_streaming.py drains the SAME
    function over watermarked file streams across micro-batches — with
    a watermark-advancing sentinel to flush trailing nulls — and pins
    streamed == batch.

    Scale shape: one key-partitioned equi-join with the band as a
    post-condition; the rollup distinct-counts converted clicks without
    a second scan."""
    from glamira_end_to_end_data_pipeline_spark.streaming import (
        attribution_join_left_outer,
    )

    ev = read_table(spark, sf_dir, "events")
    out = attribution_join_left_outer(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        lookahead="24 hours",
    )
    agg = out.agg(
        F.countDistinct("click_id").alias("n_clicks"),
        F.countDistinct(
            F.when(F.col("purchase_id").isNotNull(), F.col("click_id"))
        ).alias("n_converted"),
    )
    return agg.select(
        "n_clicks",
        "n_converted",
        (F.col("n_clicks") - F.col("n_converted")).alias("n_unconverted"),
        F.round(F.col("n_converted") / (1.0 * F.col("n_clicks")), 6).alias(
            "conversion_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Multi-clause MERGE INTO (full Delta/Iceberg surface)
# ---------------------------------------------------------------------------


@query(
    "lake_merge_multi_clause",
    """
    WITH o AS (
        SELECT cast(o_orderkey AS BIGINT) AS k, o_totalprice AS p,
               o_orderpriority AS pr
        FROM orders
    ),
    src AS (
        SELECT k, CASE WHEN k % 4 = 0 THEN p + 5000 ELSE p - 5000 END AS sp,
               pr
        FROM o WHERE k % 2 = 0
    ),
    tgt AS (SELECT k, p, pr FROM o WHERE k % 3 = 0),
    final AS (
        SELECT t.k, CASE WHEN s.sp > t.p THEN s.sp ELSE t.p END AS p, t.pr
        FROM tgt t JOIN src s USING (k)
        WHERE s.sp > t.p OR NOT (t.p < 50000)
        UNION ALL
        SELECT s.k, s.sp, s.pr FROM src s LEFT JOIN tgt t USING (k)
        WHERE t.k IS NULL AND s.sp > 100000
        UNION ALL
        SELECT t.k, t.p, t.pr FROM tgt t LEFT JOIN src s USING (k)
        WHERE s.k IS NULL AND t.pr <> '5-LOW'
    )
    SELECT pr AS priority, count(*) AS n_rows, round(sum(p), 2) AS total
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def lake_merge_multi_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multi-clause MERGE INTO (sources/lake.py:
    merge_into_multi_clause) — the complete Delta/Iceberg surface in
    one statement, exercising every clause against the orders table:
    WHEN MATCHED AND the source price rose THEN UPDATE (first-true-wins
    ordering), WHEN MATCHED AND the target row is small THEN DELETE,
    WHEN NOT MATCHED AND the insert is large THEN INSERT, and WHEN NOT
    MATCHED BY SOURCE AND priority = '5-LOW' THEN DELETE (the
    target-only clause that forces the full-base scan — the cost Delta
    documents and the reason the clause wants a partition-predicate
    scope). The merge REDUCES the clause verdicts to a compact CDC feed
    and delegates to apply_cdc_partitioned, sharing the copy-on-write
    core with the other merge flavors. The oracle replays the same
    clause order in closed form from the source table."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import lake

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_mergemc_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderpriority").alias("pr"),
    )
    k = F.col("k")
    tgt = o.filter(k % 3 == 0)
    lake.write_partitioned(tgt, path, ["pr"])
    src = o.filter(k % 2 == 0).select(
        "k",
        F.when(k % 4 == 0, F.col("p") + 5000)
        .otherwise(F.col("p") - 5000)
        .alias("p"),
        "pr",
    )
    lake.merge_into_multi_clause(
        spark,
        path,
        src,
        key_cols=["k"],
        partition_col="pr",
        when_matched=[
            ("s.p > t.p", "update"),
            ("t.p < 50000", "delete"),
        ],
        when_not_matched="s.p > 100000",
        when_not_matched_by_source_delete="t.pr = '5-LOW'",
    )
    final = lake.read_partitioned(spark, path)
    return (
        final.groupBy(F.col("pr").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("p"), 2).alias("total"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Source-batched Brandes betweenness (pivot sampling shape)
# ---------------------------------------------------------------------------

_BTB_SRCS = (1, 5, 11)


@query(
    "graph_betweenness_batched",
    f"""
    WITH RECURSIVE edges AS (
        SELECT i AS u, (3 * i + 1) % {_BTW_N} AS v FROM range({_BTW_N}) t(i)
        UNION ALL
        SELECT i, (3 * i + 2) % {_BTW_N} FROM range({_BTW_N}) t(i)
    ),
    srcs AS (SELECT unnest([{", ".join(str(s) for s in _BTB_SRCS)}]) AS s),
    walk(src, node, d, path) AS (
        SELECT s, s, 0, CAST('' AS VARCHAR) FROM srcs
        UNION ALL
        SELECT w.src, e.v, w.d + 1,
               CASE WHEN w.d = 0 THEN ''
                    WHEN w.path = '' THEN CAST(w.node AS VARCHAR)
                    ELSE w.path || ',' || CAST(w.node AS VARCHAR) END
        FROM walk w JOIN edges e ON e.u = w.node
        WHERE w.d < {_BTW_CAP}
    ),
    md AS (SELECT src, node, min(d) AS dist FROM walk GROUP BY 1, 2),
    sp AS (
        SELECT w.src, w.node AS t, w.path FROM walk w
        JOIN md m ON w.src = m.src AND w.node = m.node AND w.d = m.dist
    ),
    np AS (SELECT src, t, count(*) AS sigma FROM sp GROUP BY 1, 2),
    inter AS (
        SELECT sp.src, cast(s.part AS BIGINT) AS v, sp.t
        FROM sp, unnest(string_split(sp.path, ',')) AS s(part)
        WHERE sp.path <> ''
    ),
    dep AS (
        SELECT inter.src, v, sum(1.0 / np.sigma) AS delta
        FROM inter JOIN np ON np.src = inter.src AND np.t = inter.t
        GROUP BY 1, 2
    ),
    agg AS (SELECT v, sum(delta) AS btw FROM dep GROUP BY v)
    SELECT cast(i AS BIGINT) AS node,
           round(coalesce(agg.btw, 0.0), 6) AS betweenness
    FROM range({_BTW_N}) t(i) LEFT JOIN agg ON agg.v = i
    ORDER BY 1
    """,
)
def graph_betweenness_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-BATCHED Brandes betweenness
    (operators/graph.py:betweenness_batched) — the Brandes–Pich pivot-
    sampling shape: forward σ/levels and backward dependency
    accumulation for THREE sources run simultaneously under a
    (source, node) composite key, so the batch pays one source's
    per-layer shuffle count with 3× the rows per shuffle — the
    scheduling-latency trade a large cluster wants for small frontiers.
    Betweenness(v) = Σ_src δ_src(v). The oracle enumerates every
    shortest path per source with interior-node strings (≤ 3·2^
    {_BTW_CAP} walks) and sums 1/σ charges — a completely independent
    derivation. Same tripling-graph fixture and walk-cap gate as
    ``graph_betweenness_source``."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        betweenness_batched,
    )

    ids = spark.range(_BTW_N)
    edges = ids.select(
        F.col("id").alias("u"), ((F.col("id") * 3 + 1) % _BTW_N).alias("v")
    ).unionAll(
        ids.select(
            F.col("id").alias("u"),
            ((F.col("id") * 3 + 2) % _BTW_N).alias("v"),
        )
    )
    btw = betweenness_batched(
        edges, list(_BTB_SRCS), assert_diameter_below=_BTW_CAP
    )
    full = spark.range(_BTW_N).select(F.col("id").alias("node"))
    out = full.join(btw, "node", "left").select(
        "node",
        F.round(F.coalesce(F.col("betweenness"), F.lit(0.0)), 6).alias(
            "betweenness"
        ),
    )
    return out.orderBy("node")


# ---------------------------------------------------------------------------
# Kneser–Ney smoothed bigram language model
# ---------------------------------------------------------------------------

_KN_D = 0.75


@query(
    "text_kneser_ney_bigram",
    f"""
    WITH tl AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ),
    bg AS (
        SELECT toks[i] AS w1, toks[i+1] AS w2
        FROM tl, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
    ),
    bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    lc AS (
        SELECT w1, sum(c12) AS c1, count(*) AS n1p_fw FROM bc GROUP BY 1
    ),
    rc AS (SELECT w2, count(*) AS n1p_bw FROM bc GROUP BY 1),
    tt AS (SELECT count(*) AS n_types FROM bc),
    top AS (
        SELECT w1, w2, c12 FROM bc
        ORDER BY c12 DESC, w1, w2 LIMIT 15
    )
    SELECT top.w1 AS w1, top.w2 AS w2, cast(top.c12 AS BIGINT) AS n_bigram,
           round(
               (greatest(top.c12 - {_KN_D}, 0.0) / lc.c1)
               + ({_KN_D} * lc.n1p_fw / lc.c1)
                 * (rc.n1p_bw / (1.0 * tt.n_types)),
               6) AS p_kn
    FROM top
    JOIN lc ON lc.w1 = top.w1
    JOIN rc ON rc.w2 = top.w2
    CROSS JOIN tt
    ORDER BY n_bigram DESC, top.w1, top.w2
    """,
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995,
    discount D=0.75) for the corpus's 15 most frequent bigrams:
    P_KN(w2|w1) = max(c(w1,w2) − D, 0)/c(w1) + λ(w1)·P_cont(w2), with
    λ(w1) = D·N1+(w1,·)/c(w1) and the continuation probability
    P_cont(w2) = N1+(·,w2)/|bigram types| — the smoothing that scores
    "novel continuation" mass by how PROMISCUOUS a word's left contexts
    are, not by raw frequency (the reason KN beats add-k for LM-based
    quality scoring; complements text_bigram_lm_score's raw LM and
    text_bigram_pmi's association view over the same counts table).

    Scale shape: bigrams zip map-side from each document's token array
    (no self-join); every KN term is a grouped count off the ONE bigram
    count table (left totals, forward/backward continuation type counts
    — three partial aggregates); the type total rides a one-row
    broadcast; top-15 selection is count-ordered (integer-deterministic)
    via TakeOrderedAndProject. All inputs to the float closed form are
    exact BIGINTs, mirrored term-for-term in the oracle."""
    from pyspark import StorageLevel

    from glamira_end_to_end_data_pipeline_spark.caching import tracked_persist
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        normalized_tokens,
    )

    docs = read_table(spark, sf_dir, "documents")
    tl = docs.select(normalized_tokens("text").alias("toks"))
    n = F.size("toks")
    bg = (
        tl.select(
            F.slice(F.col("toks"), 1, n - 1).alias("xs"),
            F.slice(F.col("toks"), 2, n - 1).alias("ys"),
        )
        .select(F.explode(F.arrays_zip("xs", "ys")).alias("p"))
        .select(F.col("p.xs").alias("w1"), F.col("p.ys").alias("w2"))
    )
    bc = tracked_persist(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")),
        StorageLevel.MEMORY_AND_DISK,
    )
    lc = bc.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_fw")
    )
    rc = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bw"))
    tt = bc.agg(F.count(F.lit(1)).alias("n_types"))
    top = bc.orderBy(F.desc("c12"), "w1", "w2").limit(15)
    return (
        top.join(lc, "w1")
        .join(rc, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("n_bigram"),
            F.round(
                (
                    F.greatest(F.col("c12") - _KN_D, F.lit(0.0))
                    / F.col("c1")
                )
                + (_KN_D * F.col("n1p_fw") / F.col("c1"))
                * (F.col("n1p_bw") / (1.0 * F.col("n_types"))),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.desc("n_bigram"), "w1", "w2")
    )


# ---------------------------------------------------------------------------
# Market-basket association rules (frequent-pair mining)
# ---------------------------------------------------------------------------


@query(
    "a_market_basket_rules",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    nb AS (SELECT count(DISTINCT o) AS n_baskets FROM items),
    isup AS (SELECT p, count(*) AS sup FROM items GROUP BY p),
    pairs AS (
        SELECT a.p AS pa, b.p AS pb, count(*) AS sup_ab
        FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 3
    ),
    top AS (
        SELECT pa, pb, sup_ab FROM pairs
        ORDER BY sup_ab DESC, pa, pb LIMIT 15
    )
    SELECT cast(top.pa AS BIGINT) AS part_a,
           cast(top.pb AS BIGINT) AS part_b,
           cast(top.sup_ab AS BIGINT) AS support,
           round(top.sup_ab / (1.0 * sa.sup), 6) AS confidence_ab,
           round((1.0 * top.sup_ab * nb.n_baskets)
                 / (1.0 * sa.sup * sb.sup), 6) AS lift
    FROM top
    JOIN isup sa ON sa.p = top.pa
    JOIN isup sb ON sb.p = top.pb
    CROSS JOIN nb
    ORDER BY support DESC, part_a, part_b
    """,
)
def a_market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-pair association rules over order baskets (the Apriori
    k=2 pass): support(a,b) counts orders containing both parts,
    confidence(a→b) = supp(ab)/supp(a), lift = supp(ab)·N/
    (supp(a)·supp(b)) — the market-basket screen behind co-purchase
    recommendations, with min-support 3 pruning the pair tail before
    any rule math (Apriori's monotonicity argument).

    Scale shape: basket items dedup in one exchange; candidate pairs
    come from a SELF-JOIN KEYED ON THE BASKET id with a < inequality as
    post-condition — per-basket work is C(|basket|, 2) (bounded by
    basket size, ~7 here), never corpus-quadratic, and the hot-basket
    risk is the dedup.py hub-cap story (a pathological mega-basket
    would be capped in production; TPC-H baskets are ≤7 items). Item
    supports and the basket total are partial aggregates off the same
    items table; top-15 selection is integer-deterministic
    (support desc, then pair ids)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    items = li.distinct()
    nb = items.agg(F.countDistinct("o").alias("n_baskets"))
    isup = items.groupBy("p").agg(F.count(F.lit(1)).alias("sup"))
    a = items.select(F.col("o"), F.col("p").alias("pa"))
    b = items.select(F.col("o").alias("ob"), F.col("p").alias("pb"))
    pairs = (
        a.join(b, (a["o"] == b["ob"]) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup_ab"))
        .filter(F.col("sup_ab") >= 3)
    )
    top = pairs.orderBy(F.desc("sup_ab"), "pa", "pb").limit(15)
    return (
        top.join(isup.select(F.col("p").alias("pa"), F.col("sup").alias("sa")), "pa")
        .join(isup.select(F.col("p").alias("pb"), F.col("sup").alias("sb")), "pb")
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("pa").cast("bigint").alias("part_a"),
            F.col("pb").cast("bigint").alias("part_b"),
            F.col("sup_ab").cast("bigint").alias("support"),
            F.round(F.col("sup_ab") / (1.0 * F.col("sa")), 6).alias(
                "confidence_ab"
            ),
            F.round(
                (F.lit(1.0) * F.col("sup_ab") * F.col("n_baskets"))
                / (F.lit(1.0) * F.col("sa") * F.col("sb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
    )


# ---------------------------------------------------------------------------
# Cramér's V — effect-size for categorical association
# ---------------------------------------------------------------------------


@query(
    "dq_cramers_v",
    """
    WITH cells AS (
        SELECT o_orderpriority AS r, o_orderstatus AS c, count(*) AS o
        FROM orders GROUP BY 1, 2
    ),
    rm AS (SELECT r, sum(o) AS nr FROM cells GROUP BY r),
    cm AS (SELECT c, sum(o) AS nc FROM cells GROUP BY c),
    tot AS (
        SELECT sum(o) AS n, count(DISTINCT r) AS nrows,
               count(DISTINCT c) AS ncols
        FROM cells
    ),
    grid AS (
        SELECT rm.r, cm.c, rm.nr, cm.nc, coalesce(cells.o, 0) AS o
        FROM rm CROSS JOIN cm
        LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c
    ),
    chi AS (
        SELECT sum(pow(o - (1.0 * nr * nc) / t.n, 2)
                   / ((1.0 * nr * nc) / t.n)) AS chi2,
               any_value(t.nrows) AS nrows, any_value(t.ncols) AS ncols,
               any_value(t.n) AS n
        FROM grid, tot t
    )
    SELECT cast(n AS BIGINT) AS n_rows,
           cast((nrows - 1) * (ncols - 1) AS BIGINT) AS dof,
           round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (n * (least(nrows, ncols) - 1))), 6)
               AS cramers_v
    FROM chi
    """,
)
def dq_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between order priority and order status — the
    normalized-to-[0,1] effect size on the χ² contingency table, the
    association number a drift dashboard can threshold where raw χ²
    only grows with N (complements dq_chi2_categorical_drift's test
    and a_mutual_information_terms' information view).

    Scale shape: rows collapse to the (priority × status) cell rollup
    in one exchange; expected counts come from the marginals over the
    BOUNDED dense grid (≤ 5×3 cells, zero-observed cells included —
    they still contribute their expectation to χ²); the scalar totals
    ride a one-row broadcast. Every input to the float form is an
    exact BIGINT."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c")
    )
    cells = o.groupBy("r", "c").agg(F.count(F.lit(1)).alias("o"))
    rm = cells.groupBy("r").agg(F.sum("o").alias("nr"))
    cm = cells.groupBy("c").agg(F.sum("o").alias("nc"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("r").alias("nrows"),
        F.countDistinct("c").alias("ncols"),
    )
    grid = (
        rm.crossJoin(F.broadcast(cm))
        .join(cells, ["r", "c"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
    )
    e = (F.lit(1.0) * F.col("nr") * F.col("nc")) / F.col("n")
    chi = (
        grid.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"),
            F.first("nrows").alias("nrows"),
            F.first("ncols").alias("ncols"),
            F.first("n").alias("n"),
        )
    )
    return chi.select(
        F.col("n").cast("bigint").alias("n_rows"),
        ((F.col("nrows") - 1) * (F.col("ncols") - 1))
        .cast("bigint")
        .alias("dof"),
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least(F.col("nrows"), F.col("ncols")) - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Dynamic partition pruning (runtime star-join partition elimination)
# ---------------------------------------------------------------------------


@query(
    "j_dynamic_partition_pruning",
    """
    SELECT strftime(o_orderdate, '%Y%m') AS om,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE strftime(o_orderdate, '%Y') = '1995'
      AND cast(strftime(o_orderdate, '%m') AS INT) BETWEEN 4 AND 6
    GROUP BY 1 ORDER BY 1
    """,
)
def j_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION PRUNING — the star-schema scale feature where
    Catalyst prunes the FACT's partitions at RUNTIME from the filtered
    dimension's join keys (the dim filter 'quarter = 1995Q2' can't be
    pushed to the fact statically because the fact only stores the
    month key; DPP reuses the dim's broadcast as a partition filter, so
    the 100 TB fact opens only the ~3 matching month directories
    instead of all ~80). An in-query gate RAISES unless the optimized
    plan really carries the dynamicpruning subquery on the fact scan —
    the green grade is an execution-shape proof, not just a value
    match. The oracle computes the same quarter directly from the
    source table (pruning must be result-neutral).

    Scale shape: one hive-partitioned write (fixture), then a broadcast
    star join whose fact scan is runtime-pruned; the aggregate runs on
    the surviving ~3 partitions."""
    import os
    import shutil
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_dpp_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyyMM").alias("om"),
    )
    o.write.mode("overwrite").partitionBy("om").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        read_table(spark, sf_dir, "orders")
        .select(F.date_format("o_orderdate", "yyyyMM").alias("dm"))
        .distinct()
        .withColumn(
            "quarter",
            F.concat(
                F.substring("dm", 1, 4),
                F.lit("Q"),
                F.ceil(F.substring("dm", 5, 2).cast("int") / 3).cast("string"),
            ),
        )
    )
    dimf = dim.filter(F.col("quarter") == "1995Q2")
    res = (
        fact.join(F.broadcast(dimf), fact["om"] == dimf["dm"])
        .groupBy("om")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("om")
    )
    plan = res._jdf.queryExecution().toString()
    if "dynamicpruning" not in plan.lower():
        raise AssertionError(
            "dynamic partition pruning did not fire: the fact scan "
            "carries no dynamicpruning partition filter"
        )
    return res


# ---------------------------------------------------------------------------
# Exact trailing-window distinct users (bounded-explode sliding distinct)
# ---------------------------------------------------------------------------


@query(
    "w_sliding_distinct_users",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, cast(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    win AS (
        SELECT days.d, count(DISTINCT ud.user_id) AS u7
        FROM days JOIN ud
          ON ud.d <= days.d AND ud.d >= days.d - 6
        GROUP BY days.d
    )
    SELECT d AS day, cast(u7 AS BIGINT) AS distinct_users_7d
    FROM win ORDER BY 1 LIMIT 60
    """,
)
def w_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct users per day — the sliding
    distinct that neither a running window (distinct doesn't subtract)
    nor the first-seen trick (that gives CUMULATIVE distinct,
    w_cumulative_distinct) can express. The scalable shape is a BOUNDED
    EXPLODE: dedup to (user, active-day) pairs, fan each pair out to
    the ≤7 window-anchor days it can serve (sequence + explode — fan-out
    bounded by the window length, never by the data), then one distinct
    count per anchor day. A 100 TB event stream pays |user-days|·7
    intermediate rows — linear, key-partitioned, no day×user cross join
    (the oracle, at oracle scale, does exactly that cross join). Anchor
    days are restricted to days that actually occur (mirrored in the
    oracle); output capped at the first 60 days for a bounded grade."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    ud = ev.distinct()
    days = ud.select("d").distinct()
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), 6), F.expr("interval 1 day")
            )
        ).alias("anchor"),
    )
    win = (
        fan.join(days, fan["anchor"] == days["d"])
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("u7"))
    )
    return (
        win.select(
            F.col("anchor").alias("day"),
            F.col("u7").cast("bigint").alias("distinct_users_7d"),
        )
        .orderBy("day")
        .limit(60)
    )


# ---------------------------------------------------------------------------
# Delta-method CI for ratio metrics (revenue per order, per segment)
# ---------------------------------------------------------------------------


@query(
    "a_ratio_metric_delta_ci",
    """
    WITH per_cust AS (
        SELECT c.c_mktsegment AS seg, o.o_custkey AS k,
               count(*) AS n_ord,
               sum(cast(round(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT seg,
               count(*) AS n,
               cast(sum(cents) AS DOUBLE) AS sx,
               cast(sum(n_ord) AS DOUBLE) AS sy,
               sum(cast(cents AS DOUBLE) * cast(cents AS DOUBLE)) AS sxx,
               cast(sum(n_ord * n_ord) AS DOUBLE) AS syy,
               sum(cast(cents AS DOUBLE) * n_ord) AS sxy
        FROM per_cust GROUP BY seg
    )
    SELECT seg AS segment, cast(n AS BIGINT) AS n_customers,
           round((sx / sy) / 100.0, 4) AS revenue_per_order,
           round(sqrt(greatest(
                     (sxx / n - (sx / n) * (sx / n))
                     + ((sx / sy) * (sx / sy))
                       * (syy / n - (sy / n) * (sy / n))
                     - 2 * (sx / sy)
                       * (sxy / n - (sx / n) * (sy / n)), 0.0))
                 / ((sy / n) * sqrt(n)) / 100.0, 4) AS ci_half_width
    FROM m ORDER BY 1
    """,
)
def a_ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (revenue per
    order, per segment) with the customer as the randomization unit —
    the A/B-experimentation statistic a naive per-order t-test gets
    WRONG because orders within a customer are correlated (Deng et al.
    2018, the ratio-metric delta method): Var(X̄/Ȳ) ≈ (σ²_x + r²σ²_y −
    2rσ_xy)/(n·Ȳ²) with r = Σx/Σy, all moments over per-customer
    totals. Complements a_ttest_ab (plain mean metric).

    Scale shape: one join + per-customer groupBy (the randomization-
    unit rollup — the one data-sized exchange), then a 5-segment moment
    aggregate; every moment is an exact BIGINT (integer cents) cast to
    double only for the closed form, mirrored expression-for-expression
    in the oracle. 1.0 ≈ z is omitted (half-width reported at 1·SE;
    callers scale by their z)."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_ord"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            ),
        )
    )
    m = per.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("double").alias("sx"),
        F.sum("n_ord").cast("double").alias("sy"),
        # cents² overflows BIGINT at scale (silently, with ANSI off) —
        # second moments accumulate in double; the ±ulp summation-order
        # noise is ~1e-13 relative on the variance, far under round(4).
        F.sum(F.col("cents").cast("double") * F.col("cents").cast("double")).alias("sxx"),
        F.sum(F.col("n_ord") * F.col("n_ord")).cast("double").alias("syy"),
        F.sum(F.col("cents").cast("double") * F.col("n_ord")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    r = sx / sy
    var = (
        (sxx / n - (sx / n) * (sx / n))
        + (r * r) * (syy / n - (sy / n) * (sy / n))
        - 2 * r * (sxy / n - (sx / n) * (sy / n))
    )
    return m.select(
        F.col("seg").alias("segment"),
        n.cast("bigint").alias("n_customers"),
        F.round(r / 100.0, 4).alias("revenue_per_order"),
        F.round(
            F.sqrt(F.greatest(var, F.lit(0.0))) / ((sy / n) * F.sqrt(n)) / 100.0,
            4,
        ).alias("ci_half_width"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Pointer-jumping transitive closure (O(log depth) hierarchy flattening)
# ---------------------------------------------------------------------------

_PJ_N = 2000


@query(
    "graph_pointer_jump_roots",
    f"""
    WITH RECURSIVE pr AS (
        SELECT i AS node,
               CASE WHEN i = 1 THEN 1
                    WHEN i <= 1000 THEN i - 1
                    ELSE i // 2 END AS parent
        FROM range(1, {_PJ_N + 1}) t(i)
    ),
    walk(node, cur, d) AS (
        SELECT node, node, 0 FROM pr
        UNION ALL
        SELECT w.node, p.parent, w.d + 1
        FROM walk w JOIN pr p ON p.node = w.cur
        WHERE w.cur <> 1
    ),
    res AS (SELECT node, max(d) AS depth FROM walk GROUP BY node)
    SELECT cast(node AS BIGINT) AS node,
           cast(1 AS BIGINT) AS root,
           cast(depth AS BIGINT) AS depth
    FROM res ORDER BY 1
    """,
)
def graph_pointer_jump_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy flattening by POINTER JUMPING
    (operators/graph.py:pointer_jump_roots): every node's root and
    exact depth in a 1000-deep parent chain (plus a tree grafted onto
    it) via path doubling — p ← p∘p per round, so the closure lands in
    ~11 self-joins where per-level iteration (the recursive-CTE shape
    the oracle runs at oracle scale) steps 1000 times. THE pattern for
    deep hierarchies at scale: org charts, BOM explosions, symlink
    resolution. An in-query gate RAISES unless the doubling pass
    resolved the 1000-deep chain within 14 rounds — the log₂-round
    count IS the algorithm's signature, so the green grade is an
    execution-shape proof (the hybrid local fast path runs the SAME
    doubling composition with the SAME round count — two-path equality
    incl. rounds pinned in tests/test_graph.py — so the gate holds on
    either path). Fixture: nodes 2..1000 chain to their
    predecessor, nodes 1001..2000 attach at i div 2; root 1."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        pointer_jump_roots,
    )

    ids = spark.range(1, _PJ_N + 1)
    parents = ids.select(
        F.col("id").alias("node"),
        F.when(F.col("id") == 1, F.lit(1))
        .when(F.col("id") <= 1000, F.col("id") - 1)
        .otherwise(F.expr("id div 2"))
        .cast("long")
        .alias("parent"),
    )
    out, rounds = pointer_jump_roots(parents)
    if rounds > 14:
        raise AssertionError(
            f"pointer jumping took {rounds} rounds for a 1000-deep chain — "
            "doubling degenerated to single stepping"
        )
    return out.orderBy("node")


# ---------------------------------------------------------------------------
# Retractable incremental view maintenance for aggregates
# ---------------------------------------------------------------------------


@query(
    "stream_ivm_retractable_agg",
    """
    WITH o AS (
        SELECT cast(o_orderkey AS BIGINT) AS k, o_orderpriority AS pr,
               cast(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    survivors AS (
        SELECT * FROM o WHERE k % 8 = 4 OR k % 8 = 1 OR k % 4 = 2
    )
    SELECT pr AS priority, count(*) AS n_rows,
           round(sum(cents) / 100.0, 2) AS total
    FROM survivors GROUP BY 1 ORDER BY 1
    """,
)
def stream_ivm_retractable_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a grouped aggregate under
    RETRACTIONS (the Materialize/Flink changelog algebra): the
    maintained per-priority (count, sum) absorbs each CDC batch as
    maintained ⊕ Σinserts ⊖ Σdeletes — one bounded merge per batch,
    never a recompute — and groups whose count reaches zero LEAVE the
    view (the retraction case an insert-only rollup never faces).
    Count/sum/avg are retractable; min/max are NOT (a retracted
    maximum needs the runner-up, i.e. a re-scan) — which is exactly
    why engines keep changelog state per aggregate kind. Three batches
    run here: base load, insert+delete, insert+delete; an in-query
    gate RAISES unless the maintained view EQUALS a full recompute
    from the surviving rows (complements stream_delta_join_view's
    join-side IVM). The oracle derives the survivors in closed form.

    Scale shape: each batch collapses to a per-group delta aggregate
    (partial map-side), the merge is a bounded |groups|-row full-outer
    join, and the gate is one anti-join-style comparison — the raw
    table is scanned once per batch, never re-aggregated."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("pr"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    k = F.col("k")

    def agg_delta(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("pr").agg(
            (F.lit(sign) * F.count(F.lit(1))).alias("dn"),
            (F.lit(sign) * F.sum("cents")).alias("dc"),
        )

    def merge(view: DataFrame, delta: DataFrame) -> DataFrame:
        v = view.select(F.col("pr"), F.col("n"), F.col("c"))
        d = delta.select(F.col("pr").alias("dpr"), "dn", "dc")
        return (
            v.join(d, v["pr"] == d["dpr"], "full_outer")
            .select(
                F.coalesce(F.col("pr"), F.col("dpr")).alias("pr"),
                (
                    F.coalesce(F.col("n"), F.lit(0))
                    + F.coalesce(F.col("dn"), F.lit(0))
                ).alias("n"),
                (
                    F.coalesce(F.col("c"), F.lit(0))
                    + F.coalesce(F.col("dc"), F.lit(0))
                ).alias("c"),
            )
            .filter(F.col("n") > 0)
        )

    base = o.filter(k % 4 == 0)
    view = agg_delta(base, 1).select(
        "pr", F.col("dn").alias("n"), F.col("dc").alias("c")
    )
    # batch 1: insert k%4==1, delete k%8==0 (half the base)
    view = merge(view, agg_delta(o.filter(k % 4 == 1), 1))
    view = merge(view, agg_delta(o.filter(k % 8 == 0), -1))
    # batch 2: insert k%4==2, delete k%8==5 (half of batch 1's inserts)
    view = merge(view, agg_delta(o.filter(k % 4 == 2), 1))
    view = merge(view, agg_delta(o.filter(k % 8 == 5), -1))
    # gate: maintained view == full recompute over surviving rows
    survivors = o.filter((k % 8 == 4) | (k % 8 == 1) | (k % 4 == 2))
    recomputed = survivors.groupBy("pr").agg(
        F.count(F.lit(1)).alias("rn"), F.sum("cents").alias("rc")
    )
    cmp = view.join(recomputed, "pr", "full_outer").filter(
        (F.col("n") != F.col("rn"))
        | (F.col("c") != F.col("rc"))
        | F.col("n").isNull()
        | F.col("rn").isNull()
    )
    if cmp.count() != 0:
        raise AssertionError(
            "IVM drift: the retractable-merge view disagrees with the "
            "full recompute over surviving rows"
        )
    return view.select(
        F.col("pr").alias("priority"),
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("c") / 100.0, 2).alias("total"),
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# AQE skew-join split (runtime hot-partition mitigation)
# ---------------------------------------------------------------------------


@query(
    "j_aqe_skew_join_split",
    """
    WITH fact AS (
        SELECT CASE WHEN l_orderkey % 10 < 9 THEN 7
                    ELSE l_orderkey % 1000 END AS key,
               l_quantity AS qty
        FROM lineitem CROSS JOIN range(8) r(i)
    ),
    dim AS (SELECT i AS dkey, i % 7 AS grp FROM range(1000) t(i))
    SELECT grp, count(*) AS n_rows, round(sum(qty), 2) AS total_qty
    FROM fact JOIN dim ON fact.key = dim.dkey
    GROUP BY grp ORDER BY grp
    """,
)
def j_aqe_skew_join_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAPTIVE skew-join mitigation — AQE's OptimizeSkewedJoin
    splitting the hot partition at RUNTIME: 90% of the fact rides one
    join key (the power-law reality manual salting pre-empts in
    j_skew_salted; AQE is the zero-code-change counterpart that reads
    ACTUAL partition sizes from the shuffle map stage and splits the
    oversized partition into parallel sub-reads, duplicating the tiny
    matching build side). The join is hinted sort-merge (a broadcast
    would dodge the skew machinery) and the skew thresholds are scoped
    DOWN for the fixture-sized shuffle, then restored — runtime-settable
    session confs only, exactly how a production job would scope them
    per-stage. An in-query gate RAISES unless the final adaptive plan
    carries a skew=true sort-merge join — the green grade proves the
    split executed, not just that values matched. The oracle computes
    the same aggregate skew-blind."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        # splitting is legal here (the downstream grp aggregate reshuffles
        # anyway); force past AQE's conservative extra-shuffle veto
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved: dict[str, str | None] = {}
    for kk, vv in confs.items():
        try:
            saved[kk] = spark.conf.get(kk)
        except Exception:
            saved[kk] = None
        spark.conf.set(kk, vv)
    try:
        li = (
            read_table(spark, sf_dir, "lineitem")
            .select(
                F.when(F.col("l_orderkey") % 10 < 9, F.lit(7))
                .otherwise(F.col("l_orderkey") % 1000)
                .cast("long")
                .alias("key"),
                F.col("l_quantity").alias("qty"),
                # x8 literal inflation so the hot shuffle partition clears
                # the (scoped-down) skew threshold even at sf0.001 —
                # mirrored as CROSS JOIN range(8) in the oracle
                F.explode(F.array([F.lit(i) for i in range(8)])).alias("rep"),
            )
            .drop("rep")
            # many map tasks: OptimizeSkewedJoin splits a skewed REDUCE
            # partition along MAP-output block boundaries — a fact read
            # as one small parquet split gives one block, which cannot
            # be split no matter how skewed (empirically pinned: the
            # same join with a 1-task fact never shows skew=true)
            .repartition(32)
        )
        dim = spark.range(1000).select(
            F.col("id").alias("dkey"), (F.col("id") % 7).alias("grp")
        )
        j = (
            li.join(dim.hint("merge"), li["key"] == dim["dkey"])
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("qty"), 2).alias("total_qty"),
            )
            .orderBy("grp")
        )
        rows = j.collect()
        plan = j._jdf.queryExecution().toString()
        if "skew=true" not in plan:
            raise AssertionError(
                "AQE did not split the skewed partition: no skew=true "
                "sort-merge join in the final adaptive plan"
            )
        return spark.createDataFrame(rows, j.schema)
    finally:
        for kk, vv in saved.items():
            if vv is None:
                spark.conf.unset(kk)
            else:
                spark.conf.set(kk, vv)


# ---------------------------------------------------------------------------
# Bucket-pruned scan (catalog bucketing as a point-lookup index)
# ---------------------------------------------------------------------------


@query(
    "s_bucket_pruned_scan",
    """
    SELECT count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders WHERE o_custkey = 7
    """,
)
def s_bucket_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUCKET PRUNING on a catalog-bucketed table: an equality probe on
    the bucket column reads 1 bucket file-group out of 8 — Spark maps
    the probe value through the bucket hash and skips the other 7 at
    planning time, turning the bucketed layout into a free point-lookup
    index (the scan-side payoff of the same layout whose join-side
    payoff is j_bucketed_colocated's zero-Exchange join; the file-level
    sibling is lake_bucket_partition_prune over the snapshot manifests).
    Production nuance, empirically pinned here: with the default
    autoBucketedScan=true Spark DISCARDS the bucketed layout for scans
    with no downstream join/agg that exploits clustering — which also
    forfeits pruning — so the conf is scoped off and restored, exactly
    the per-query toggle a production point-lookup would use. An
    in-query gate parses ``SelectedBucketsCount: s out of t`` from the
    executed plan and RAISES unless s < t. The oracle reads the plain
    table (pruning must be result-neutral)."""
    import os
    import re
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources.bucketing import (
        write_bucketed,
    )

    probe = 7
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    table = f"bktprune_orders_{tag}"
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_{table}")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(orders, table, path, ["o_custkey"], n_buckets=8)
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    saved = spark.conf.get(conf, None)
    spark.conf.set(conf, "false")
    try:
        res = (
            spark.table(table)
            .filter(F.col("o_custkey") == probe)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            )
        )
        rows = res.collect()
        plan = res._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        if not m or not (int(m.group(1)) < int(m.group(2))):
            raise AssertionError(
                f"bucket pruning did not fire: {m.group(0) if m else 'no SelectedBucketsCount in plan'}"
            )
        return spark.createDataFrame(rows, res.schema)
    finally:
        if saved is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, saved)


# ---------------------------------------------------------------------------
# SCD2 late-arriving splice (affected-keys-only history repair)
# ---------------------------------------------------------------------------


@query(
    "scd2_late_arriving_splice",
    """
    WITH ordered AS (
        SELECT o_custkey AS k, o_orderpriority AS seg,
               o_orderdate AS ts, o_orderkey AS tb,
               lag(o_orderpriority) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev
        FROM orders
    ),
    changed AS (
        SELECT k, seg, ts, tb FROM ordered
        WHERE prev IS NULL OR prev <> seg
    ),
    starts AS (
        SELECT k, seg, ts FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY k, ts ORDER BY tb DESC) AS rn
            FROM changed
        ) WHERE rn = 1
    ),
    v AS (
        SELECT k, seg,
               (lead(ts) OVER (PARTITION BY k ORDER BY ts) IS NULL)
                   AS is_current
        FROM starts
    )
    SELECT seg AS segment,
           count(*) AS n_versions,
           cast(sum(is_current::INT) AS BIGINT) AS n_current
    FROM v GROUP BY 1 ORDER BY 1
    """,
)
def scd2_late_arriving_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-ARRIVING change repair for an SCD2 dimension
    (operators/scd.py:scd2_versions): a batch of out-of-order changes
    (here 1/7 of the stream, withheld by key hash) lands AFTER the
    dimension was built — version intervals of the affected keys are
    WRONG retroactively (their valid_from/valid_to straddle the late
    events). The scale-honest repair re-windows ONLY the affected keys
    (one semi-join to pull their full history, one per-key rebuild) and
    stitches them back beside the untouched keys — the full-dimension
    rebuild a 100 TB dim cannot afford nightly. An in-query gate RAISES
    unless the spliced dimension EQUALS the from-scratch rebuild row
    for row (key, version_no, segment, validity, currency flag). The
    oracle rebuilds the final history in closed form — late vs on-time
    is invisible in the end state, which is exactly the repair's
    contract."""
    from glamira_end_to_end_data_pipeline_spark.operators.scd import scd2_versions

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderpriority").alias("seg"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tb"),
    )
    late = o.filter(F.col("tb") % 7 == 3)
    on_time = o.filter(F.col("tb") % 7 != 3)
    dim_v1 = scd2_versions(on_time, "k", "seg", "ts", "tb")
    affected = late.select("k").distinct()
    rebuilt = scd2_versions(
        o.join(affected, "k", "left_semi"), "k", "seg", "ts", "tb"
    )
    spliced = dim_v1.join(affected, "k", "left_anti").unionByName(rebuilt)
    full = scd2_versions(o, "k", "seg", "ts", "tb")
    cols = ["k", "version_no", "segment", "valid_from", "valid_to", "is_current"]
    mismatches = (
        spliced.select(*cols)
        .exceptAll(full.select(*cols))
        .unionByName(full.select(*cols).exceptAll(spliced.select(*cols)))
        .count()
    )
    if mismatches:
        raise AssertionError(
            f"splice drift: {mismatches} version rows differ from the "
            "from-scratch rebuild"
        )
    return (
        spliced.groupBy(F.col("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum(F.col("is_current").cast("int"))
            .cast("bigint")
            .alias("n_current"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Write-time CHECK constraints (Delta table-constraint semantics)
# ---------------------------------------------------------------------------


@query(
    "lake_check_constraint_commit",
    """
    SELECT c_mktsegment AS segment, count(*) AS n_rows,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer WHERE c_acctbal >= -1000
    GROUP BY 1 ORDER BY 1
    """,
)
def lake_check_constraint_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time CHECK constraints (sources/lake.py:
    write_snapshot_checked — Delta's ALTER TABLE ADD CONSTRAINT
    semantics): a batch commits ONLY if every row passes the boolean
    SQL constraint; a violating batch raises and leaves NO trace — no
    version, no files, the table head untouched (enforce-on-write is
    what lets every reader skip re-validation). The fixture commits a
    conforming batch, then attempts a violating one and GATES that (a)
    it raised, (b) the head version did not move, and (c) a
    NULL-evaluating constraint row counts as a violation (the
    three-valued-logic loophole closed). The oracle reproduces the
    conforming batch's aggregate."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import lake

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_chk_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    good = cust.filter(F.col("c_acctbal") >= -1000)
    v1 = lake.write_snapshot_checked(
        spark, good, path, "c_acctbal >= -1000"
    )
    # The NULL probe is built from rows that ALREADY satisfy the
    # constraint (c_acctbal >= 0) with only some balances NULLed — so
    # if this batch is refused, the refusal can have come ONLY from
    # NULL-constraint handling, not from plain negative balances
    # sneaking in alongside.
    passing = cust.filter(F.col("c_acctbal") >= 0)
    n_nulled = passing.filter(F.col("c_custkey") % 50 == 0).count()
    if n_nulled == 0:
        raise AssertionError(
            "NULL probe is vacuous at this SF — no rows would be NULLed"
        )
    for bad_batch, label in (
        (cust, "negative balances"),
        (
            passing.withColumn(
                "c_acctbal",
                F.when(F.col("c_custkey") % 50 == 0, F.lit(None)).otherwise(
                    F.col("c_acctbal")
                ),
            ),
            "NULL constraint results",
        ),
    ):
        try:
            lake.write_snapshot_checked(
                spark, bad_batch, path, "c_acctbal >= 0"
            )
            raise AssertionError(
                f"violating batch ({label}) committed — CHECK not enforced"
            )
        except lake.CheckConstraintViolation:
            pass
    if lake.latest_snapshot_version(spark, path) != v1:
        raise AssertionError(
            "table head moved after refused commits — rejected batches "
            "must leave no version behind"
        )
    return (
        lake.read_snapshot(spark, path)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Z-order pruning effectiveness vs single-column sort (measured gate)
# ---------------------------------------------------------------------------


@query(
    "lake_zorder_prune_effectiveness",
    """
    SELECT count(*) AS n_rows,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal >= 4000 AND c_acctbal <= 4500
    """,
)
def lake_zorder_prune_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER pruning effectiveness, MEASURED against the layout it
    beats: the same customer rows land twice — linearly range-sorted on
    the key (so every file's BALANCE stats span the full range) and
    Morton-interleaved on (key, balance) (so each file covers a compact
    2-D rectangle) — both committed with per-file column metrics
    (write_snapshot(stats_cols=...)). The same balance-range probe then
    plans through read_snapshot_pruned on both, and an in-query gate
    RAISES unless the Z-ordered table opens STRICTLY fewer files than
    the linear one AND genuinely prunes (read < total) — the measured
    counter proof behind the lake_zorder_codes claim that a single-
    column sort leaves the second dimension scattered. Pruning is
    result-neutral: the returned aggregate comes from the pruned read
    and the oracle scans the raw table."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import lake

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_zeff_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        # Morton inputs must be non-negative ints: cents shifted above 0
        (F.round(F.col("c_acctbal") * 100, 0).cast("long") + 100000).alias(
            "bal_key"
        ),
    )
    lin = cust.repartitionByRange(8, "c_custkey").sortWithinPartitions(
        "c_custkey"
    )
    lake.write_snapshot(
        spark, lin, f"{base}/linear", stats_cols=["c_acctbal"]
    )
    z = (
        cust.withColumn("__z", lake.morton_code("c_custkey", "bal_key", 20))
        .repartitionByRange(8, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    lake.write_snapshot(spark, z, f"{base}/zorder", stats_cols=["c_acctbal"])
    lo, hi = 4000.0, 4500.0
    df_l, read_l, tot_l = lake.read_snapshot_pruned(
        spark, f"{base}/linear", "c_acctbal", lo, hi
    )
    df_z, read_z, tot_z = lake.read_snapshot_pruned(
        spark, f"{base}/zorder", "c_acctbal", lo, hi
    )
    if not (read_z < read_l and read_z < tot_z):
        raise AssertionError(
            f"z-order pruning ineffective: zorder read {read_z}/{tot_z} "
            f"files vs linear {read_l}/{tot_l} — the 2-D clustering must "
            "beat the single-column sort on the scattered dimension"
        )
    return df_z.filter(
        (F.col("c_acctbal") >= lo) & (F.col("c_acctbal") <= hi)
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier survival estimator (right-censored durations)
# ---------------------------------------------------------------------------


@query(
    "a_kaplan_meier_survival",
    """
    WITH d AS (
        SELECT date_diff('day', cast(o.o_orderdate AS DATE),
                         cast(l.l_shipdate AS DATE)) AS t,
               (l.l_orderkey % 5 <> 0) AS observed
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    r AS (
        SELECT t,
               sum(observed::INT) AS dd,
               count(*) AS cnt
        FROM d GROUP BY t
    ),
    c AS (
        SELECT t, dd,
               (SELECT count(*) FROM d) -
               coalesce(sum(cnt) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n_risk
        FROM r
    ),
    s AS (
        SELECT t, dd, n_risk,
               exp(sum(ln(1.0 - dd / (1.0 * n_risk))) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)) AS surv
        FROM c WHERE dd < n_risk
    )
    SELECT cast(t AS BIGINT) AS t_days,
           cast(n_risk AS BIGINT) AS n_at_risk,
           cast(dd AS BIGINT) AS d_events,
           round(surv, 6) AS survival
    FROM s ORDER BY t LIMIT 15
    """,
)
def a_kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier product-limit survival estimator over RIGHT-
    CENSORED durations (order→ship fulfilment days; a deterministic 20%
    of items are censored): S(t) = ∏_{u≤t} (1 − d(u)/n(u)) with d =
    observed events at u and n = at-risk count — THE estimator for
    time-to-event under censoring (delivery SLAs, churn, failure
    analysis), where a naive mean over observed durations is biased
    low.

    Scale shape: durations collapse to a per-distinct-time rollup in
    one exchange; the at-risk count n(t) = N − (# durations < t) comes
    from operators/exact_stats.exclusive_prefix_over_values (the
    bucket-partitioned prefix primitive shared with MW/Spearman/KS);
    the product-limit runs as exp∘cumsum∘ln over the BOUNDED distinct-
    times rollup (≤ |fulfilment-day domain| ≈ 130 rows — allow-listed
    unpartitioned window). d and n are exact BIGINTs, the float chain
    is evaluated in cumulative order identically by both engines, and
    times where d = n (survival hits exact 0, ln −∞) are excluded in
    both."""
    from glamira_end_to_end_data_pipeline_spark.operators.exact_stats import (
        exclusive_prefix_over_values,
    )

    li0 = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    ords = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = li0.join(ords, li0["l_orderkey"] == ords["o_orderkey"]).select(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("t"),
        (F.col("l_orderkey") % 5 != 0).alias("observed"),
    )
    r = li.groupBy("t").agg(
        F.sum(F.col("observed").cast("long")).alias("dd"),
        F.count(F.lit(1)).alias("cnt"),
    )
    tot = r.agg(F.sum("cnt").alias("n_total"))
    pre = exclusive_prefix_over_values(r, "t", "cnt", 16.0)
    c = pre.crossJoin(F.broadcast(tot)).select(
        "t",
        "dd",
        (F.col("n_total") - F.col("prior")).alias("n_risk"),
    ).filter(F.col("dd") < F.col("n_risk"))
    win = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    s = c.withColumn(
        "surv",
        F.exp(
            F.sum(F.log(1.0 - F.col("dd") / (1.0 * F.col("n_risk")))).over(win)
        ),
    )
    return (
        s.select(
            F.col("t").cast("bigint").alias("t_days"),
            F.col("n_risk").cast("bigint").alias("n_at_risk"),
            F.col("dd").cast("bigint").alias("d_events"),
            F.round("surv", 6).alias("survival"),
        )
        .orderBy("t_days")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes beta-binomial shrinkage of per-group rates
# ---------------------------------------------------------------------------


@query(
    "a_beta_binomial_shrinkage",
    """
    WITH li AS (
        SELECT s.s_nationkey AS g, (l.l_returnflag = 'R')::INT AS is_r
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    per AS (SELECT g, count(*) AS n, sum(is_r) AS r FROM li GROUP BY g),
    mom AS (
        SELECT sum(r) / (1.0 * sum(n)) AS m,
               avg(pow(r / (1.0 * n) - (SELECT sum(r) / (1.0 * sum(n))
                                        FROM per), 2)) AS s2
        FROM per
    ),
    pri AS (
        SELECT m, s2,
               (m * (1 - m) / s2 - 1) * m AS alpha,
               (m * (1 - m) / s2 - 1) * (1 - m) AS beta
        FROM mom
    )
    SELECT cast(g AS BIGINT) AS nationkey,
           cast(n AS BIGINT) AS n_items,
           round(r / (1.0 * n), 6) AS raw_rate,
           round((r + alpha) / (n + alpha + beta), 6) AS shrunk_rate
    FROM per, pri ORDER BY 1
    """,
)
def a_beta_binomial_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes BETA-BINOMIAL SHRINKAGE of per-nation return
    rates (Robbins/Efron–Morris): fit a Beta(α, β) prior to the
    cross-group rate distribution by method of moments (α+β =
    m(1−m)/s² − 1), then report each group's posterior-mean rate
    (r+α)/(n+α+β) — small groups shrink hard toward the global mean,
    big groups barely move, which is what makes league tables of
    small-n groups honest (the ranking dq_bh_fdr_proportions tests,
    this entry ESTIMATES). An in-query gate RAISES unless the fitted
    prior is proper (s² > 0, α > 0, β > 0) — MoM degenerates when the
    groups are under-dispersed.

    Scale shape: one broadcast dim join + one groupBy to the 25-row
    per-nation rollup; the prior fit is a two-pass aggregate over that
    bounded rollup (mean, then centered second moment) and rides a
    one-row broadcast back onto it. All counts exact BIGINTs; the
    float closed form is mirrored term-for-term."""
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_returnflag")
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    per = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("r"),
        )
    )
    gm = per.agg((F.sum("r") / (1.0 * F.sum("n"))).alias("m"))
    mom = (
        per.crossJoin(F.broadcast(gm))
        .agg(
            F.first("m").alias("m"),
            F.avg(
                F.pow(F.col("r") / (1.0 * F.col("n")) - F.col("m"), 2)
            ).alias("s2"),
        )
    )
    pri = mom.select(
        "m",
        "s2",
        ((F.col("m") * (1 - F.col("m")) / F.col("s2") - 1) * F.col("m")).alias(
            "alpha"
        ),
        (
            (F.col("m") * (1 - F.col("m")) / F.col("s2") - 1)
            * (1 - F.col("m"))
        ).alias("beta"),
    )
    prow = pri.collect()[0]
    if not (prow["s2"] > 0 and prow["alpha"] > 0 and prow["beta"] > 0):
        raise AssertionError(
            f"method-of-moments Beta fit degenerated: {prow} — "
            "shrinkage undefined"
        )
    return (
        per.crossJoin(F.broadcast(pri))
        .select(
            F.col("g").cast("bigint").alias("nationkey"),
            F.col("n").cast("bigint").alias("n_items"),
            F.round(F.col("r") / (1.0 * F.col("n")), 6).alias("raw_rate"),
            F.round(
                (F.col("r") + F.col("alpha"))
                / (F.col("n") + F.col("alpha") + F.col("beta")),
                6,
            ).alias("shrunk_rate"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Exact Pareto concentration (the 80/20 analysis, no global sort)
# ---------------------------------------------------------------------------


@query(
    "a_pareto_concentration",
    """
    WITH pc AS (
        SELECT o_custkey AS k,
               sum(cast(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents DESC, k) AS rn,
               sum(cents) OVER (ORDER BY cents DESC, k) AS cum
        FROM pc
    ),
    tot AS (SELECT count(*) AS n, sum(cents) AS r FROM pc),
    k80 AS (
        SELECT min(rn) AS k_needed FROM ranked, tot
        WHERE 5 * cum >= 4 * r
    ),
    top10 AS (
        SELECT sum(cents) AS toprev
        FROM ranked, tot WHERE rn <= (n + 9) // 10
    )
    SELECT cast(n AS BIGINT) AS n_customers,
           cast(k_needed AS BIGINT) AS k_for_80pct,
           ((2 * k_needed * 10000 + n) // (2 * n)) / 10000.0
               AS pct_cust_for_80pct,
           round(toprev / (1.0 * r), 6) AS top_decile_share
    FROM tot, k80, top10
    """,
)
def a_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Pareto concentration of customer revenue — the 80/20
    read-out (how few customers carry 80% of revenue; what share the
    top decile holds) WITHOUT the global sort the naive cumulative-share
    query needs: revenue ties collapse to a per-distinct-value rollup,
    the descending prefix runs through
    operators/exact_stats.exclusive_prefix_over_values on the NEGATED
    value, the 80% crossing is cross-multiplied integer math (5·cum ≥
    4·R, within-tie remainder by integer ceil-division), and the top-
    decile boundary value comes from values_at_ranks at rank ⌈N/10⌉ —
    every quantity an exact BIGINT until the two final ratios. The
    oracle affords the full row_number sort. The within-tie counts are
    rank-deterministic because tied customers contribute identical
    values — any tie order yields the same k and the same top-decile
    sum (the oracle's k,-tiebreak is value-neutral)."""
    from glamira_end_to_end_data_pipeline_spark.operators.exact_stats import (
        exclusive_prefix_over_values,
        values_at_ranks,
    )

    pc = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
        .select("k", "cents", (-F.col("cents")).alias("neg"))
    )
    rv = pc.groupBy("neg").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("vsum")
    )
    # two prefixes over the same rollup, both through the bucket-
    # partitioned primitive (a bare single-partition window here would
    # be a data-sized sort in disguise — |distinct revenues| ≈ |customers|):
    # customer-count prefix locates k, revenue prefix locates the 80% line
    pre = exclusive_prefix_over_values(rv, "neg", "cnt", 1000000.0)
    tot = rv.agg(
        F.sum("cnt").alias("n"), F.sum("vsum").alias("r")
    )
    pre2 = exclusive_prefix_over_values(
        pre, "neg", "vsum", 1000000.0, out="rprior"
    )
    cross = (
        pre2.crossJoin(F.broadcast(tot))
        .filter(
            (5 * F.col("rprior") < 4 * F.col("r"))
            & (5 * (F.col("rprior") + F.col("vsum")) >= 4 * F.col("r"))
        )
        .select(
            "neg",
            "cnt",
            "vsum",
            "prior",
            "rprior",
            "n",
            "r",
            (
                F.expr(
                    "prior + cast((4 * r - 5 * rprior + 5 * (-neg) - 1) "
                    "div (5 * (-neg)) as bigint)"
                )
            ).alias("k_needed"),
        )
    )
    m_rank = tot.select(
        F.lit("all").alias("g"),
        F.lit("m").alias("label"),
        F.expr("cast((n + 9) div 10 as bigint)").alias("rk"),
        "n",
        "r",
    )
    at = values_at_ranks(
        pc.select(F.lit("all").alias("g"), F.col("neg").alias("x")),
        "g",
        "x",
        m_rank.select("g", "label", "rk"),
        bucket_width=1000000.0,
    )
    top10 = at.crossJoin(F.broadcast(m_rank.select("n", "r"))).select(
        (
            -F.col("sum_lt") + (F.col("rk") - F.col("cnt_lt")) * (-F.col("x_at"))
        ).alias("toprev"),
        "n",
        "r",
    )
    out = cross.select("k_needed", "n", "r").crossJoin(
        F.broadcast(top10.select("toprev"))
    )
    return out.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("k_needed").cast("bigint").alias("k_for_80pct"),
        (
            F.expr("(2 * k_needed * 10000 + n) div (2 * n)") / 10000.0
        ).alias("pct_cust_for_80pct"),
        F.round(F.col("toprev") / (1.0 * F.col("r")), 6).alias(
            "top_decile_share"
        ),
    )


# ---------------------------------------------------------------------------
# A/B experiment read-out panel (capstone over the rank-stats family)
# ---------------------------------------------------------------------------


@query(
    "dq_experiment_readout_panel",
    """
    WITH pc AS (
        SELECT o_custkey AS k,
               ('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::BIGINT % 2
                   AS s,
               sum(cast(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    m AS (
        SELECT s, count(*) AS n,
               cast(sum(cents) AS DOUBLE) AS sx,
               sum(cast(cents AS DOUBLE) * cast(cents AS DOUBLE)) AS sxx
        FROM pc GROUP BY s
    ),
    welch AS (
        SELECT (a.sx / a.n - b.sx / b.n)
               / sqrt(((a.sxx - a.sx * a.sx / a.n) / (a.n - 1)) / a.n
                      + ((b.sxx - b.sx * b.sx / b.n) / (b.n - 1)) / b.n)
                   AS t
        FROM m a, m b WHERE a.s = 0 AND b.s = 1
    ),
    g AS (
        SELECT cents,
               sum((s = 0)::INT) AS ca, sum((s = 1)::INT) AS cb
        FROM pc GROUP BY cents
    ),
    c AS (
        SELECT ca, cb,
               coalesce(sum(ca + cb) OVER (
                   ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS prior,
               sum(ca) OVER (ORDER BY cents) AS fa,
               sum(cb) OVER (ORDER BY cents) AS fb
        FROM g
    ),
    t2 AS (
        SELECT cast(sum(ca) AS BIGINT) AS na,
               cast(sum(cb) AS BIGINT) AS nb,
               cast(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
                    AS BIGINT) AS tie
        FROM g
    ),
    r2 AS (
        SELECT cast(sum(ca * (2 * prior + ca + cb + 1)) AS BIGINT) AS r2
        FROM c
    ),
    mw AS (
        SELECT ((r2 - na * (na + 1)) / 2.0 - na * nb / 2.0)
               / sqrt(na * nb / 12.0
                      * ((na + nb + 1)
                         - tie / (1.0 * (na + nb) * (na + nb - 1)))) AS z
        FROM r2, t2
    ),
    ks AS (
        SELECT max(abs(fa / (SELECT 1.0 * na FROM t2)
                      - fb / (SELECT 1.0 * nb FROM t2))) AS d,
               1.3581 * sqrt((SELECT na + nb FROM t2)
                             / (1.0 * (SELECT na FROM t2)
                                * (SELECT nb FROM t2))) AS crit
        FROM c
    )
    SELECT * FROM (
        SELECT 'ks_d' AS test_name,
               round((SELECT d FROM ks), 6) AS statistic,
               (SELECT d FROM ks) > (SELECT crit FROM ks) AS reject_05
        UNION ALL
        SELECT 'mann_whitney_z', round((SELECT z FROM mw), 6),
               abs((SELECT z FROM mw)) > 1.96
        UNION ALL
        SELECT 'welch_t', round((SELECT t FROM welch), 6),
               abs((SELECT t FROM welch)) > 1.96
    ) ORDER BY test_name
    """,
)
def dq_experiment_readout_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B EXPERIMENT READ-OUT PANEL — the capstone over this round's
    rank-statistics family: one md5 coin flip assigns each CUSTOMER
    (the randomization unit) to an arm, per-customer revenue is the
    metric, and THREE tests read the same per-customer rollup — Welch's
    t (mean shift), tie-corrected Mann–Whitney (rank shift), and
    two-sample KS (any distributional difference) — the panel a real
    experimentation platform renders per metric, and a sound A/A split
    like this one should NOT reject on any of them (normal-approximate
    α=0.05 throughout, documented).

    Scale shape: ONE per-customer exchange feeds everything; the Welch
    moments are a 2-row rollup (second moments in double — the
    a_ratio_metric_delta_ci overflow lesson); MW and KS share one
    per-distinct-value rollup whose prefix runs through
    exclusive_prefix_over_values (bucket-partitioned; the bounded
    offset window is allow-listed); the three verdict rows assemble
    from one-row broadcasts. Each statistic is mirrored
    expression-for-expression in the oracle."""
    from glamira_end_to_end_data_pipeline_spark.operators.exact_stats import (
        exclusive_prefix_over_values,
    )

    pc = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
        .withColumn("s", _hash_mod(F.col("k"), 2))
    )
    m = pc.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("double").alias("sx"),
        F.sum(
            F.col("cents").cast("double") * F.col("cents").cast("double")
        ).alias("sxx"),
    )
    a = m.filter(F.col("s") == 0).select(
        F.col("n").alias("n0"), F.col("sx").alias("sx0"), F.col("sxx").alias("sxx0")
    )
    b = m.filter(F.col("s") == 1).select(
        F.col("n").alias("n1"), F.col("sx").alias("sx1"), F.col("sxx").alias("sxx1")
    )
    welch = a.crossJoin(F.broadcast(b)).select(
        (
            (F.col("sx0") / F.col("n0") - F.col("sx1") / F.col("n1"))
            / F.sqrt(
                (
                    (F.col("sxx0") - F.col("sx0") * F.col("sx0") / F.col("n0"))
                    / (F.col("n0") - 1)
                )
                / F.col("n0")
                + (
                    (F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1"))
                    / (F.col("n1") - 1)
                )
                / F.col("n1")
            )
        ).alias("t")
    )
    g = pc.groupBy("cents").agg(
        F.sum((F.col("s") == 0).cast("long")).alias("ca"),
        F.sum((F.col("s") == 1).cast("long")).alias("cb"),
    ).withColumn("cnt", F.col("ca") + F.col("cb"))
    pre = exclusive_prefix_over_values(g, "cents", "cnt", 1000000.0)
    tots = g.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie"),
    )
    r2 = pre.agg(
        F.sum(
            F.col("ca") * (2 * F.col("prior") + F.col("cnt") + 1)
        ).alias("r2")
    )
    na, nb, tie = F.col("na"), F.col("nb"), F.col("tie")
    u = (F.col("r2") - na * (na + 1)) / 2.0
    mw = r2.crossJoin(F.broadcast(tots)).select(
        (
            (u - na * nb / 2.0)
            / F.sqrt(
                na * nb / 12.0
                * ((na + nb + 1) - tie / (1.0 * (na + nb) * (na + nb - 1)))
            )
        ).alias("z")
    )
    # KS over the same per-value rollup: inclusive CDFs from the
    # exclusive prefix + the row's own counts (per-arm prefixes derive
    # from the shared count prefix by a second pair of prefix calls)
    pre_a = exclusive_prefix_over_values(g, "cents", "ca", 1000000.0, out="pa")
    pre_ab = exclusive_prefix_over_values(
        pre_a, "cents", "cb", 1000000.0, out="pb"
    )
    ks = (
        pre_ab.crossJoin(F.broadcast(tots))
        .select(
            F.abs(
                (F.col("pa") + F.col("ca")) / (1.0 * na)
                - (F.col("pb") + F.col("cb")) / (1.0 * nb)
            ).alias("dd"),
            na,
            nb,
        )
        .groupBy("na", "nb")
        .agg(F.max("dd").alias("d"))
        .select(
            "d",
            (
                1.3581 * F.sqrt((na + nb) / (1.0 * na * nb))
            ).alias("crit"),
        )
    )
    panel = (
        ks.select(
            F.lit("ks_d").alias("test_name"),
            F.round(F.col("d"), 6).alias("statistic"),
            (F.col("d") > F.col("crit")).alias("reject_05"),
        )
        .unionByName(
            mw.select(
                F.lit("mann_whitney_z").alias("test_name"),
                F.round(F.col("z"), 6).alias("statistic"),
                (F.abs(F.col("z")) > 1.96).alias("reject_05"),
            )
        )
        .unionByName(
            welch.select(
                F.lit("welch_t").alias("test_name"),
                F.round(F.col("t"), 6).alias("statistic"),
                (F.abs(F.col("t")) > 1.96).alias("reject_05"),
            )
        )
    )
    return panel.orderBy("test_name")


# ---------------------------------------------------------------------------
# VARIANT semi-structured extraction (Spark 4 open variant type)
# ---------------------------------------------------------------------------


@query(
    "f_variant_semistructured",
    """
    SELECT event_type,
           count(json_extract(props, '$.k')) AS n_with_k,
           cast(sum(cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           cast(max(cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def f_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's open VARIANT type:
    the event ``props`` JSON parses ONCE into a binary variant
    (``parse_json``) and typed paths come out via ``try_variant_get`` —
    the schema-on-read path for ragged payloads that beats per-access
    ``get_json_object`` re-parsing (variant decodes the document a
    single time into a navigable binary, the Delta/Iceberg-adopted
    open format) while staying NULL-safe on missing paths
    (``try_`` semantics mirror the oracle's json_extract NULLs).

    Scale shape: map-only — parse + path extraction fuse into the scan
    projection under whole-stage codegen, then one bounded per-type
    rollup; nothing shuffles but the 5-row aggregate. The oracle reads
    the same paths with DuckDB's JSON extraction."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    ex = ev.select(
        "event_type",
        F.try_variant_get(F.col("v"), "$.k", "long").alias("k"),
    )
    return (
        ex.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Brandes FULL-betweenness capstone — every node a source
# ---------------------------------------------------------------------------

_BTC_N = 60
_BTC_CAP = 10


@query(
    "graph_betweenness_capstone",
    f"""
    WITH RECURSIVE edges AS (
        SELECT i AS u, (3 * i + 1) % {_BTC_N} AS v FROM range({_BTC_N}) t(i)
        UNION ALL
        SELECT i, (3 * i + 2) % {_BTC_N} FROM range({_BTC_N}) t(i)
    ),
    walk(src, node, d, path) AS (
        SELECT i, i, 0, CAST('' AS VARCHAR) FROM range({_BTC_N}) t(i)
        UNION ALL
        SELECT w.src, e.v, w.d + 1,
               CASE WHEN w.d = 0 THEN ''
                    WHEN w.path = '' THEN CAST(w.node AS VARCHAR)
                    ELSE w.path || ',' || CAST(w.node AS VARCHAR) END
        FROM walk w JOIN edges e ON e.u = w.node
        WHERE w.d < {_BTC_CAP}
    ),
    md AS (SELECT src, node, min(d) AS dist FROM walk GROUP BY 1, 2),
    sp AS (
        SELECT w.src, w.node AS t, w.path FROM walk w
        JOIN md m ON w.src = m.src AND w.node = m.node AND w.d = m.dist
        WHERE w.src <> w.node
    ),
    np AS (SELECT src, t, count(*) AS sigma FROM sp GROUP BY 1, 2),
    inter AS (
        SELECT sp.src, cast(s.part AS BIGINT) AS v, sp.t
        FROM sp, unnest(string_split(sp.path, ',')) AS s(part)
        WHERE sp.path <> ''
    ),
    dep AS (
        SELECT inter.src, v, sum(1.0 / np.sigma) AS delta
        FROM inter JOIN np ON np.src = inter.src AND np.t = inter.t
        GROUP BY 1, 2
    ),
    agg AS (SELECT v, sum(delta) AS btw FROM dep GROUP BY v)
    SELECT cast(i AS BIGINT) AS node,
           round(coalesce(agg.btw, 0.0), 6) AS betweenness,
           round(coalesce(agg.btw, 0.0)
                 / (({_BTC_N} - 1.0) * ({_BTC_N} - 2.0)), 6) AS btw_norm
    FROM range({_BTC_N}) t(i) LEFT JOIN agg ON agg.v = i
    ORDER BY 1
    """,
)
def graph_betweenness_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL Brandes betweenness — EVERY node a source — through the
    same source-batched machinery as ``graph_betweenness_batched``
    (operators/graph.py:betweenness_batched): one batch of {_BTC_N}
    sources pays a single source's per-layer shuffle count with N× the
    rows per shuffle, which is exactly how exact betweenness is
    computed at scale (and the Brandes–Pich estimator is the same plan
    with K sampled sources scaled by n/K). The capstone pins the
    END-TO-END contract the single-source and 3-source entries cannot:
    the all-sources accumulation Σ_src δ_src(v), multiple-shortest-path
    tie handling (σ-weighted 1/σ charges summed over every source), and
    the directed normalization btw/((n−1)(n−2)). Oracle enumerates all
    ≤ 2^{_BTC_CAP} walks per source with interior-node path strings —
    a derivation sharing no code with the layered-BSP implementation.

    Scale shape: forward and backward passes are per-layer joins keyed
    on (src, node); the (src × frontier) row volume is the batch's
    only cost multiplier; lineage cut per layer; no node-count
    broadcast anywhere (the r10 PPR lesson)."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        betweenness_batched,
    )

    ids = spark.range(_BTC_N)
    edges = ids.select(
        F.col("id").alias("u"), ((F.col("id") * 3 + 1) % _BTC_N).alias("v")
    ).unionAll(
        ids.select(
            F.col("id").alias("u"),
            ((F.col("id") * 3 + 2) % _BTC_N).alias("v"),
        )
    )
    btw = betweenness_batched(
        edges, list(range(_BTC_N)), assert_diameter_below=_BTC_CAP
    )
    full = spark.range(_BTC_N).select(F.col("id").alias("node"))
    raw = F.coalesce(F.col("betweenness"), F.lit(0.0))
    return (
        full.join(btw, "node", "left")
        .select(
            "node",
            F.round(raw, 6).alias("betweenness"),
            F.round(raw / ((_BTC_N - 1.0) * (_BTC_N - 2.0)), 6).alias(
                "btw_norm"
            ),
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# VARIANT shredded read — typed subcolumns at scan time, no JSON re-parse
# ---------------------------------------------------------------------------


@query(
    "f_variant_shredded_read",
    """
    SELECT event_type,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS n_with_k,
           cast(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS sum_k,
           cast(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS max_k
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def f_variant_shredded_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT SHREDDING — the storage-side half of the semi-structured
    story (``f_variant_semistructured`` is the compute-side half):
    commonly-accessed typed paths are extracted ONCE at write time into
    typed parquet subcolumns (struct field ``v.k``), with the original
    document kept as a residual spill field (``v.raw``) — the layout
    Spark 4 / Iceberg / Delta variant shredding converges on. Readers
    project the typed subcolumn AT SCAN TIME: Parquet's columnar layout
    plus Spark's nested-schema pruning mean the query reads ONLY the
    shredded column — no JSON parse, no residual-field IO. Two
    execution-shape gates make the green grade a proof: (a) the scan's
    ReadSchema carries the pruned ``v`` struct containing ``k`` but NOT
    the ``raw`` spill field; (b) no JSON-parsing expression appears
    anywhere in the read-side optimized plan.

    Scale shape: the write is one map-only pass (parse each document
    exactly once — the entire point of shredding); the read is a pruned
    columnar scan + one enum-bounded rollup. At 100 TB the typed column
    is a few percent of the document bytes, so the read-side win is
    roughly the shred ratio."""
    import os
    import shutil
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_shred_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.struct(
            F.try_variant_get(
                F.parse_json(F.col("props")), "$.k", "long"
            ).alias("k"),
            F.col("props").alias("raw"),
        ).alias("v"),
    )
    ev.write.mode("overwrite").parquet(path)

    rd = spark.read.parquet(path).select(
        "event_type", F.col("v.k").alias("k")
    )
    out = (
        rd.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    low = plan.lower()
    for banned in ("parse_json", "get_json_object", "from_json", "jsontostructs"):
        if banned in low:
            raise AssertionError(
                f"shredded read re-parses JSON ({banned} in plan) — the "
                "typed subcolumn must come straight off the scan"
            )
    exec_plan = out._jdf.queryExecution().executedPlan().toString()
    rs = [ln for ln in exec_plan.splitlines() if "ReadSchema" in ln]
    if not rs or "k:bigint" not in rs[0].replace(" ", ""):
        raise AssertionError(
            f"scan ReadSchema missing the shredded typed path: {rs}"
        )
    if "raw" in rs[0]:
        raise AssertionError(
            "nested-schema pruning failed — the residual spill field is "
            f"being read: {rs[0]}"
        )
    return out


# ---------------------------------------------------------------------------
# Deletion vectors — Iceberg-v3 / Delta DV parity over positional deletes
# ---------------------------------------------------------------------------


@query(
    "lake_deletion_vectors",
    """
    WITH base AS (
        SELECT cast(c_custkey AS BIGINT) AS k, c_mktsegment, c_acctbal
        FROM customer
    ),
    final AS (
        SELECT * FROM base
        WHERE k % 2 = 0 AND c_acctbal >= 0 AND c_mktsegment <> 'BUILDING'
              AND NOT (c_mktsegment = 'MACHINERY' AND c_acctbal < 5000)
        UNION ALL
        SELECT * FROM base
        WHERE k % 2 = 1 AND c_acctbal < 0
              AND NOT (c_mktsegment = 'MACHINERY' AND c_acctbal < 5000)
    )
    SELECT c_mktsegment AS segment, count(*) AS n_rows,
           round(sum(c_acctbal), 2) AS total_bal
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def lake_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION VECTORS (sources/posdelete.py:compact_to_deletion_
    vectors / read_mor_dv) — the Iceberg-v3 / Delta evolution of
    positional deletes: the pile of per-delete (file, pos) tombstone
    files folds into ONE vector row per data file, stored as word-
    index → 64-bit-mask BITMAP entries, so the MoR read pays one
    O(1) element_at + bit test per row instead of a growing
    anti-join, and tombstone metadata stops scaling with the number of
    delete COMMITS. The fixture drives the full lifecycle: commit 1,
    two predicate deletes, COMPACT to vectors (gates: >0 vectors, the
    deletes/ dir is gone), commit 2 re-inserting rows matching delete
    1's predicate (file-scoped tombstones must not touch them), then a
    post-compaction delete 3 that lands as residual (file, pos) rows —
    so the graded read exercises the merged vector+residual path.
    Oracle derives the same final state in closed form."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import posdelete

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_dv_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"),
        "c_mktsegment",
        "c_acctbal",
    )
    k = F.col("k")
    c1 = base.filter(k % 2 == 0).withColumn("grp", (k % 4).cast("long"))
    posdelete.write_data(spark, c1, path, "grp", "k")
    n1 = posdelete.position_delete(spark, path, F.col("c_acctbal") < 0)
    n2 = posdelete.position_delete(
        spark, path, F.col("c_mktsegment") == "BUILDING"
    )
    n_dv = posdelete.compact_to_deletion_vectors(spark, path)
    if n1 == 0 or n2 == 0 or n_dv == 0:
        raise AssertionError(
            f"fixture drift: deletes/vectors empty (n1={n1}, n2={n2}, "
            f"dv={n_dv})"
        )
    if os.path.isdir(os.path.join(path, "deletes")):
        raise AssertionError(
            "compaction left the per-row tombstone directory behind"
        )
    c2 = (
        base.filter((k % 2 == 1) & (F.col("c_acctbal") < 0))
        .withColumn("grp", (k % 4).cast("long"))
    )
    posdelete.write_data(spark, c2, path, "grp", "k")
    n3 = posdelete.position_delete(
        spark,
        path,
        (F.col("c_mktsegment") == "MACHINERY") & (F.col("c_acctbal") < 5000),
    )
    if n3 == 0:
        raise AssertionError("fixture drift: post-compaction delete empty")
    if not os.path.isdir(os.path.join(path, "deletes")):
        raise AssertionError(
            "post-compaction delete should land as residual (file, pos) "
            "rows — the graded read must exercise vector+residual merge"
        )
    final = posdelete.read_mor_dv(spark, path)
    if final.filter(k % 2 == 1).limit(1).count() == 0:
        raise AssertionError(
            "fixture drift: no delete-predicate-matching re-inserts "
            "survived the vectors"
        )
    return (
        final.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# SCD Type 4 — current/history table pair
# ---------------------------------------------------------------------------


@query(
    "scd4_current_history_pair",
    """
    WITH base AS (
        SELECT cast(c_custkey AS BIGINT) AS k, c_mktsegment AS seg
        FROM customer
    ),
    s1 AS (
        SELECT k, CASE WHEN k % 7 = 0 THEN 'SEG_A' ELSE seg END AS seg,
               seg AS seg0 FROM base
    ),
    s2 AS (
        SELECT k, CASE WHEN k % 2 = 0 THEN 'BUILDING' ELSE seg END AS seg,
               seg0, seg AS seg1 FROM s1
    ),
    s3 AS (
        SELECT k, CASE WHEN k % 14 = 0 THEN 'SEG_C' ELSE seg END AS seg,
               seg0, seg1, seg AS seg2 FROM s2
    ),
    hist AS (
        SELECT seg0 AS seg FROM s1 WHERE k % 7 = 0 AND seg0 <> 'SEG_A'
        UNION ALL
        SELECT seg1 FROM s2 WHERE k % 2 = 0 AND seg1 <> 'BUILDING'
        UNION ALL
        SELECT seg2 FROM s3 WHERE k % 14 = 0 AND seg2 <> 'SEG_C'
    ),
    h AS (SELECT seg, count(*) AS n_superseded FROM hist GROUP BY 1),
    c AS (SELECT seg, count(*) AS n_current FROM s3 GROUP BY 1)
    SELECT coalesce(c.seg, h.seg) AS segment,
           cast(coalesce(c.n_current, 0) AS BIGINT) AS n_current,
           cast(coalesce(h.n_superseded, 0) AS BIGINT) AS n_superseded
    FROM c FULL OUTER JOIN h ON c.seg = h.seg
    ORDER BY 1
    """,
)
def scd4_current_history_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE 4 (operators/scd.py:scd4_apply) — the current/history
    TABLE PAIR, completing the SCD family (Type 1 dedup-to-latest,
    Type 2 validity intervals, Type 3 previous-value column inside
    Type 6, Type 6 hybrid): the current table stays narrow and
    validity-free (the hot fact-load join target), superseded versions
    append to a cold history table stamped with their supersession
    timestamp. Three change batches drive the pair: batch 1 moves the
    k%7 keys to SEG_A; batch 2 moves all even keys to BUILDING — a
    REAL change only where the current state differs (rows already
    BUILDING are no-ops, exercising null-safe no-op suppression);
    batch 3 moves the k%14 keys (which batch 2 just made BUILDING) to
    SEG_C. The result reconciles BOTH tables — per segment, current
    row count and superseded version count — so a drifting history
    append or a missed current swap breaks the hash. Oracle replays
    the three batches as layered CASE expressions.

    Plan shape per batch: one key-keyed join decides real-vs-no-op;
    history appends change-sized rows; the current table swaps via
    write-new-dir + FS rename (copy-on-write, never overwriting a
    directory a live plan might scan)."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.operators.scd import scd4_apply

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_scd4_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    cur_path = os.path.join(root, "current")
    hist_path = os.path.join(root, "history")
    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"),
        F.col("c_mktsegment").alias("seg"),
    )
    base.write.parquet(cur_path)
    k = F.col("k")
    batches = (
        (base.filter(k % 7 == 0), "SEG_A", "2020-01-01 00:00:00"),
        (base.filter(k % 2 == 0), "BUILDING", "2020-02-01 00:00:00"),
        (base.filter(k % 14 == 0), "SEG_C", "2020-03-01 00:00:00"),
    )
    n_hist_total = 0
    for rows, new_seg, ts in batches:
        ch = rows.select(
            "k",
            F.lit(new_seg).alias("seg"),
            F.lit(ts).cast("timestamp").alias("effective_ts"),
        )
        n_hist, n_cur = scd4_apply(
            spark, cur_path, hist_path, ch, "k", "seg"
        )
        n_hist_total += n_hist
    n_base = base.count()
    if n_cur != n_base:
        raise AssertionError(
            f"current table cardinality drifted: {n_cur} != {n_base} — "
            "Type 4's current table must stay exactly one row per key"
        )
    if n_hist_total == 0:
        raise AssertionError("fixture drift: no versions superseded")
    cur = spark.read.parquet(cur_path)
    hist = spark.read.parquet(hist_path)
    c = cur.groupBy("seg").agg(F.count(F.lit(1)).alias("n_current"))
    h = hist.groupBy("seg").agg(F.count(F.lit(1)).alias("n_superseded"))
    return (
        c.join(h, "seg", "full_outer")
        .select(
            F.col("seg").alias("segment"),
            F.coalesce(F.col("n_current"), F.lit(0))
            .cast("bigint")
            .alias("n_current"),
            F.coalesce(F.col("n_superseded"), F.lit(0))
            .cast("bigint")
            .alias("n_superseded"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Exact isotonic regression (classifier-score calibration)
# ---------------------------------------------------------------------------


@query(
    "text_isotonic_calibration",
    """
    WITH d AS (
        SELECT least(n_chars // 50, 19) AS b,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    g AS (SELECT b, count(*) AS n, sum(y) AS s FROM d GROUP BY 1),
    p AS (
        SELECT b, n, s,
               sum(n) OVER (ORDER BY b) AS ni,
               sum(s) OVER (ORDER BY b) AS si
        FROM g
    ),
    jx AS (SELECT b AS j, ni - n AS nxj, si - s AS sxj FROM p),
    kx AS (SELECT b AS k, ni AS nk, si AS sk FROM p),
    t AS (
        SELECT p.b AS i, jx.j, kx.k,
               (kx.sk - jx.sxj) AS num, (kx.nk - jx.nxj) AS den,
               (kx.sk - jx.sxj) * 1.0 / (kx.nk - jx.nxj) AS frac
        FROM p JOIN jx ON jx.j <= p.b JOIN kx ON kx.k >= p.b
    ),
    m1 AS (
        SELECT i, j, min(frac) AS fmin,
               arg_min(num, frac) AS mnum, arg_min(den, frac) AS mden
        FROM t GROUP BY 1, 2
    ),
    m2 AS (
        SELECT i, max(fmin) AS fmax,
               arg_max(mnum, fmin) AS wnum, arg_max(mden, fmin) AS wden
        FROM m1 GROUP BY 1
    )
    SELECT g.b AS bucket, cast(g.n AS BIGINT) AS n_docs,
           cast((2000000 * g.s + g.n) // (2 * g.n) AS BIGINT) AS raw_ppm,
           cast((2000000 * m2.wnum + m2.wden) // (2 * m2.wden) AS BIGINT)
               AS iso_ppm
    FROM g JOIN m2 ON m2.i = g.b ORDER BY 1
    """,
)
def text_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT isotonic regression — the calibration step every
    quality-classifier pipeline needs (scores in, monotone
    probabilities out; Zadrozny & Elkan 2002): fit the monotone
    least-squares step function of P(label | score bucket) over the
    bounded score-bucket rollup using the MINIMAX characterization of
    PAVA, iso_i = max_{j<=i} min_{k>=i} mean(y over buckets j..k) —
    which turns the inherently sequential pool-adjacent-violators
    stack into pure declarative relational algebra: prefix sums over
    the rollup, two bounded inequality joins enumerating (i, j, k)
    triples, min_by/max_by argmin selection. The winning block means
    travel as exact integer (numerator, denominator) pairs and are
    rounded half-up in integer parts-per-million, so the output grid
    never touches double rounding (doubles order the comparisons only;
    equal-valued fraction ties are ppm-identical by construction).
    An in-query gate RAISES unless the fit is monotone non-decreasing
    — the defining property, checked on every grade.

    Scale shape: the raw scan reduces to a ≤20-row rollup in one
    exchange; everything after is O(|buckets|^3) ≈ 8k rows of bounded
    metadata (the unpartitioned prefix window and the two broadcast
    inequality joins are over the rollup, never data — allow-listed
    with this justification). Integer headroom: 2e6·s overflows past
    ~4.6e12 label-positives per block — note and switch to decimal
    beyond that."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.least(F.floor(F.col("n_chars") / 50), F.lit(19)).alias("b"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    g = docs.groupBy("b").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").cast("long").alias("s")
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    p = g.select(
        "b",
        "n",
        "s",
        F.sum("n").over(w).alias("ni"),
        F.sum("s").over(w).alias("si"),
    )
    jx = p.select(
        F.col("b").alias("j"),
        (F.col("ni") - F.col("n")).alias("nxj"),
        (F.col("si") - F.col("s")).alias("sxj"),
    )
    kx = p.select(
        F.col("b").alias("k"),
        F.col("ni").alias("nk"),
        F.col("si").alias("sk"),
    )
    t = (
        p.select(F.col("b").alias("i"))
        .join(F.broadcast(jx), F.col("j") <= F.col("i"))
        .join(F.broadcast(kx), F.col("k") >= F.col("i"))
        .select(
            "i",
            "j",
            "k",
            (F.col("sk") - F.col("sxj")).alias("num"),
            (F.col("nk") - F.col("nxj")).alias("den"),
            (
                (F.col("sk") - F.col("sxj"))
                / (F.col("nk") - F.col("nxj"))
            ).alias("frac"),
        )
    )
    m1 = t.groupBy("i", "j").agg(
        F.min("frac").alias("fmin"),
        F.min_by("num", "frac").alias("mnum"),
        F.min_by("den", "frac").alias("mden"),
    )
    m2 = m1.groupBy("i").agg(
        F.max_by("mnum", "fmin").alias("wnum"),
        F.max_by("mden", "fmin").alias("wden"),
    )
    out = (
        g.join(m2, g["b"] == m2["i"])
        .select(
            F.col("b").alias("bucket"),
            F.col("n").cast("bigint").alias("n_docs"),
            F.expr("CAST((2000000 * s + n) DIV (2 * n) AS BIGINT)").alias(
                "raw_ppm"
            ),
            F.expr(
                "CAST((2000000 * wnum + wden) DIV (2 * wden) AS BIGINT)"
            ).alias("iso_ppm"),
        )
        .orderBy("bucket")
    )
    fit = out.select("bucket", "iso_ppm").collect()  # bounded: ≤20 rows
    vals = [r.iso_ppm for r in sorted(fit, key=lambda r: r.bucket)]
    if any(a > b for a, b in zip(vals, vals[1:])):
        raise AssertionError(
            f"isotonic fit is not monotone non-decreasing: {vals}"
        )
    return out


# ---------------------------------------------------------------------------
# Minimum spanning tree — Borůvka (distributed) vs unrolled Prim (oracle)
# ---------------------------------------------------------------------------

_MST_N = 60


def _mst_oracle_sql() -> str:
    """Unrolled sequential PRIM over the same fixture: 59 chained CTE
    steps, each carrying (intree list, mst list) in ONE row and picking
    the minimum edge leaving the tree via a LATERAL ORDER BY w LIMIT 1.
    Each step references its predecessor exactly once (DuckDB inlines
    CTEs — a multi-reference step would explode the plan
    exponentially). Prim's greedy invariant is a genuinely different
    derivation from Borůvka's per-component minimum: with distinct
    weights both must produce the unique MST."""
    edges = f"""
    base AS (
        SELECT i AS a, (i + 1) % {_MST_N} AS b FROM range({_MST_N}) t(i)
        UNION ALL
        SELECT i, (i * 7 + 3) % {_MST_N} FROM range({_MST_N}) t(i)
        UNION ALL
        SELECT i, (i * 13 + 5) % {_MST_N} FROM range({_MST_N}) t(i)
    ),
    ed AS (
        SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
        FROM base WHERE a <> b
    ),
    wed AS (
        SELECT u, v,
               ('0x' || substr(md5('mst:' || u || ':' || v), 1, 15))::BIGINT
                   % 1000000 AS w
        FROM ed
    ),
    und AS (
        SELECT u, v, w FROM wed UNION ALL SELECT v, u, w FROM wed
    ),
    s0 AS (
        SELECT [CAST(0 AS BIGINT)] AS intree,
               CAST([] AS STRUCT(u BIGINT, v BIGINT, w BIGINT)[]) AS mst
    )"""
    steps = "".join(
        f""",
    s{i} AS (
        SELECT list_append(s.intree, e.v) AS intree,
               list_append(s.mst,
                   {{'u': least(e.u, e.v), 'v': greatest(e.u, e.v),
                     'w': e.w}}) AS mst
        FROM s{i - 1} s, LATERAL (
            SELECT d.u, d.v, d.w FROM und d
            WHERE list_contains(s.intree, d.u)
              AND NOT list_contains(s.intree, d.v)
            ORDER BY d.w LIMIT 1) e
    )"""
        for i in range(1, _MST_N)
    )
    return (
        "WITH "
        + edges
        + steps
        + f"""
    SELECT e.u AS u, e.v AS v, cast(e.w AS BIGINT) AS w
    FROM (SELECT unnest(mst) AS e FROM s{_MST_N - 1})
    ORDER BY w, u, v
    """
    )


@query("graph_mst_boruvka", _mst_oracle_sql())
def graph_mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning tree by BORŮVKA (operators/graph.py:
    boruvka_mst) — the log-round distributed MST: every round each
    component picks its minimum outgoing edge in ONE grouped min,
    picked edges merge components through the pointer-jumping
    contraction, components at least halve per round. The fixture is a
    60-node ring + two chord families with md5-derived DISTINCT edge
    weights (distinctness gated in-query — it is what makes the MST
    unique and the struct-min pick total); a second gate RAISES if the
    run needed more than ⌈log2 N⌉ + 1 rounds (the halving argument is
    the algorithm's entire scale claim). The oracle builds the SAME
    weighted graph and runs sequential PRIM unrolled over 59
    single-reference CTE steps — a greedy-invariant derivation sharing
    nothing with the per-component formulation; distinct weights force
    both to the unique MST, edge for edge.

    Scale shape: per round two node-keyed label joins + one grouped
    min + an O(log) pointer-jump contraction over the component map —
    rounds logarithmic in |V| where Prim/Kruskal are |V|-sequential;
    this is why Borůvka (not Prim) is the 100 TB MST."""
    import math

    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        boruvka_mst,
    )

    ids = spark.range(_MST_N).select(F.col("id").alias("i"))
    base = (
        ids.select("i", ((F.col("i") + 1) % _MST_N).alias("b"))
        .unionAll(ids.select("i", ((F.col("i") * 7 + 3) % _MST_N).alias("b")))
        .unionAll(ids.select("i", ((F.col("i") * 13 + 5) % _MST_N).alias("b")))
        .filter(F.col("i") != F.col("b"))
    )
    ed = base.select(
        F.least("i", "b").alias("u"), F.greatest("i", "b").alias("v")
    ).distinct()
    wed = ed.select(
        "u",
        "v",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mst:"),
                            F.col("u").cast("string"),
                            F.lit(":"),
                            F.col("v").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        ).alias("w"),
    )
    stats = wed.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("w").alias("nw"),
    ).collect()[0]
    if stats.n != stats.nw:
        raise AssertionError(
            "fixture drift: edge weights collide — the MST is not unique"
        )
    mst, rounds = boruvka_mst(wed)
    bound = math.ceil(math.log2(_MST_N)) + 1
    if rounds > bound:
        raise AssertionError(
            f"Borůvka used {rounds} rounds > ⌈log2 {_MST_N}⌉+1 = {bound} — "
            "component halving broke"
        )
    n_mst = mst.count()
    if n_mst != _MST_N - 1:
        raise AssertionError(
            f"MST has {n_mst} edges, expected {_MST_N - 1} (connected ring)"
        )
    return mst.select(
        "u", "v", F.col("w").cast("bigint").alias("w")
    ).orderBy("w", "u", "v")


# ---------------------------------------------------------------------------
# Logistic regression by IRLS/Newton sufficient statistics
# ---------------------------------------------------------------------------

_GLM_ITERS = 3


def _glm_oracle_sql() -> str:
    """Three unrolled Newton iterations; each CTE block computes the
    3x3 Hessian / gradient sufficient statistics (rounded to 4dp — the
    cross-engine pin: double-sum order noise is ~1e-9 absolute, five
    orders below the rounding grid) and solves the symmetric system by
    Cramer's rule written with the IDENTICAL expression tree the Spark
    side uses, so given equal rounded aggregates every downstream
    double op is bit-identical."""
    base = """
    d AS (
        SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END AS y,
               c_acctbal / 10000.0 AS x1,
               (c_custkey % 97) / 97.0 AS x2
        FROM customer
    ),
    it0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"""
    block = """,
    p{k} AS (
        SELECT d.y, d.x1, d.x2,
               1.0 / (1.0 + exp(-(w.w0 + w.w1 * d.x1 + w.w2 * d.x2))) AS p
        FROM d, it{j} w
    ),
    a{k} AS (
        SELECT round(sum(p * (1.0 - p)), 4) AS h00,
               round(sum(p * (1.0 - p) * x1), 4) AS h01,
               round(sum(p * (1.0 - p) * x2), 4) AS h02,
               round(sum(p * (1.0 - p) * x1 * x1), 4) AS h11,
               round(sum(p * (1.0 - p) * x1 * x2), 4) AS h12,
               round(sum(p * (1.0 - p) * x2 * x2), 4) AS h22,
               round(sum(y - p), 4) AS g0,
               round(sum((y - p) * x1), 4) AS g1,
               round(sum((y - p) * x2), 4) AS g2
        FROM p{k}
    ),
    it{k} AS (
        SELECT round(w.w0 + (g0 * (h11 * h22 - h12 * h12)
                     - h01 * (g1 * h22 - h12 * g2)
                     + h02 * (g1 * h12 - h11 * g2))
                   / (h00 * (h11 * h22 - h12 * h12)
                     - h01 * (h01 * h22 - h12 * h02)
                     + h02 * (h01 * h12 - h11 * h02)), 6) AS w0,
               round(w.w1 + (h00 * (g1 * h22 - g2 * h12)
                     - g0 * (h01 * h22 - h12 * h02)
                     + h02 * (h01 * g2 - g1 * h02))
                   / (h00 * (h11 * h22 - h12 * h12)
                     - h01 * (h01 * h22 - h12 * h02)
                     + h02 * (h01 * h12 - h11 * h02)), 6) AS w1,
               round(w.w2 + (h00 * (h11 * g2 - h12 * g1)
                     - h01 * (h01 * g2 - g1 * h02)
                     + g0 * (h01 * h12 - h11 * h02))
                   / (h00 * (h11 * h22 - h12 * h12)
                     - h01 * (h01 * h22 - h12 * h02)
                     + h02 * (h01 * h12 - h11 * h02)), 6) AS w2
        FROM a{k}, it{j} w
    )"""
    blocks = "".join(
        block.format(k=k, j=k - 1) for k in range(1, _GLM_ITERS + 1)
    )
    return (
        "WITH"
        + base
        + blocks
        + f"""
    SELECT t.term AS term, t.coef AS coef
    FROM (
        SELECT 'intercept' AS term, w0 AS coef FROM it{_GLM_ITERS}
        UNION ALL SELECT 'x1_acctbal', w1 FROM it{_GLM_ITERS}
        UNION ALL SELECT 'x2_keyfrac', w2 FROM it{_GLM_ITERS}
    ) t
    ORDER BY term
    """
    )


@query("a_logistic_irls_glm", _glm_oracle_sql())
def a_logistic_irls_glm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed LOGISTIC REGRESSION by IRLS/Newton over SUFFICIENT
    STATISTICS — the classifier-training shape that actually runs at
    100 TB (and the GLM sibling of ``a_ols_sufficient_stats``): each
    Newton iteration is ONE partial-aggregated pass computing the nine
    sufficient statistics of the weighted normal equations (the
    symmetric 3x3 Hessian X'SX and gradient X'(y−p)); the solve is
    3x3 Cramer over that one-row aggregate — model state never exceeds
    p² driver metadata, the data is never iterated row-wise, and
    adding executors scales each pass linearly. Three iterations are
    unrolled with the weight row carried as a one-row broadcast
    (never a driver float — both engines do ALL math in their SQL
    expression trees, written token-for-token identically).

    Cross-engine determinism pins: the aggregates are rounded to 4dp
    before the solve (sum-order noise ~1e-9 absolute vs the 5e-5
    rounding grid) and the weights to 6dp between iterations, so the
    trajectory is a pure function of the rounded statistics; libm exp
    differences (~1 ulp/row) vanish into the same grid. An in-query
    gate RAISES on a singular system."""
    d = read_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1.0)
        .otherwise(0.0)
        .alias("y"),
        (F.col("c_acctbal") / 10000.0).alias("x1"),
        ((F.col("c_custkey") % 97) / 97.0).alias("x2"),
    )
    w = spark.createDataFrame([(0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double")
    for _ in range(_GLM_ITERS):
        p = d.crossJoin(F.broadcast(w)).select(
            "y",
            "x1",
            "x2",
            (
                1.0
                / (
                    1.0
                    + F.exp(
                        -(
                            F.col("w0")
                            + F.col("w1") * F.col("x1")
                            + F.col("w2") * F.col("x2")
                        )
                    )
                )
            ).alias("p"),
        )
        s = F.col("p") * (1.0 - F.col("p"))
        a = p.agg(
            F.round(F.sum(s), 4).alias("h00"),
            F.round(F.sum(s * F.col("x1")), 4).alias("h01"),
            F.round(F.sum(s * F.col("x2")), 4).alias("h02"),
            F.round(F.sum(s * F.col("x1") * F.col("x1")), 4).alias("h11"),
            F.round(F.sum(s * F.col("x1") * F.col("x2")), 4).alias("h12"),
            F.round(F.sum(s * F.col("x2") * F.col("x2")), 4).alias("h22"),
            F.round(F.sum(F.col("y") - F.col("p")), 4).alias("g0"),
            F.round(
                F.sum((F.col("y") - F.col("p")) * F.col("x1")), 4
            ).alias("g1"),
            F.round(
                F.sum((F.col("y") - F.col("p")) * F.col("x2")), 4
            ).alias("g2"),
        )
        det = (
            "(h00 * (h11 * h22 - h12 * h12)"
            " - h01 * (h01 * h22 - h12 * h02)"
            " + h02 * (h01 * h12 - h11 * h02))"
        )
        sing = a.select(F.expr(f"{det} = 0").alias("z")).collect()[0].z
        if sing:
            raise AssertionError("singular IRLS system — fixture drift")
        w = a.crossJoin(F.broadcast(w)).select(
            F.expr(
                "round(w0 + (g0 * (h11 * h22 - h12 * h12)"
                " - h01 * (g1 * h22 - h12 * g2)"
                " + h02 * (g1 * h12 - h11 * g2))"
                f" / {det}, 6)"
            ).alias("w0"),
            F.expr(
                "round(w1 + (h00 * (g1 * h22 - g2 * h12)"
                " - g0 * (h01 * h22 - h12 * h02)"
                " + h02 * (h01 * g2 - g1 * h02))"
                f" / {det}, 6)"
            ).alias("w1"),
            F.expr(
                "round(w2 + (h00 * (h11 * g2 - h12 * g1)"
                " - h01 * (h01 * g2 - g1 * h02)"
                " + g0 * (h01 * h12 - h11 * h02))"
                f" / {det}, 6)"
            ).alias("w2"),
        )
    return (
        w.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("intercept").alias("term"),
                        F.col("w0").alias("coef"),
                    ),
                    F.struct(
                        F.lit("x1_acctbal").alias("term"),
                        F.col("w1").alias("coef"),
                    ),
                    F.struct(
                        F.lit("x2_keyfrac").alias("term"),
                        F.col("w2").alias("coef"),
                    ),
                )
            ).alias("t")
        )
        .select("t.term", "t.coef")
        .orderBy("term")
    )
