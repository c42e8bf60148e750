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
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
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


# ---------------------------------------------------------------------------
# Dense monthly revenue spine (shared by the time-series entries below)
# ---------------------------------------------------------------------------


def _dense_monthly_revenue(spark: SparkSession, sf_dir: str, unit: str):
    """(n_name, t, x) — per-nation monthly revenue on a DENSE month
    spine (missing months zero-filled, so window frames align with the
    calendar): t = year*12+month, x = revenue as an exact BIGINT in
    ``unit`` ('cents' | 'dollars'). One shuffled aggregate builds the
    series; the spine is nation × month range (dimension-sized at any
    SF — it grows with the calendar, not the data), seeded by a
    one-row min/max broadcast (the q11/q15 scalar crossJoin)."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    scale = 100.0 if unit == "cents" else 1.0
    monthly = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("t"),
        )
        .agg(
            F.round(F.sum("o_totalprice") * scale, 0)
            .cast("long")
            .alias("x")
        )
    )
    bounds = monthly.agg(F.min("t").alias("tmin"), F.max("t").alias("tmax"))
    spine = (
        nation.select("n_name")
        .crossJoin(F.broadcast(bounds))
        .select(
            "n_name",
            F.explode(F.sequence(F.col("tmin"), F.col("tmax"))).alias("t"),
        )
    )
    return spine.join(monthly, ["n_name", "t"], "left").select(
        "n_name", "t", F.coalesce("x", F.lit(0)).alias("x")
    )


_DENSE_MONTHLY_SQL = """
    monthly AS (
        SELECT n.n_name,
               (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS t,
               cast(round(sum(o.o_totalprice) * {scale}, 0) AS BIGINT) AS x
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ),
    bounds AS (SELECT min(t) AS tmin, max(t) AS tmax FROM monthly),
    spine AS (
        SELECT n.n_name, b.tmin + g.u AS t
        FROM nation n
        CROSS JOIN bounds b
        CROSS JOIN unnest(generate_series(0, b.tmax - b.tmin)) AS g(u)
    ),
    dense AS (
        SELECT s.n_name, s.t, coalesce(m.x, 0) AS x
        FROM spine s LEFT JOIN monthly m ON m.n_name = s.n_name AND m.t = s.t
    )
"""


# ---------------------------------------------------------------------------
# Classical seasonal decomposition — per-nation seasonal indices
# ---------------------------------------------------------------------------


@query(
    "w_seasonal_decompose",
    "WITH "
    + _DENSE_MONTHLY_SQL.format(scale="100.0")
    + """,
    ma AS (
        SELECT n_name, t, x,
               sum(x) OVER (PARTITION BY n_name ORDER BY t
                            ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS s1,
               count(*) OVER (PARTITION BY n_name ORDER BY t
                              ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS c1,
               sum(x) OVER (PARTITION BY n_name ORDER BY t
                            ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS s2,
               count(*) OVER (PARTITION BY n_name ORDER BY t
                              ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) AS c2
        FROM dense
    ),
    detr AS (
        SELECT n_name, ((t - 1) % 12) + 1 AS month_of_year,
               24 * x - (s1 + s2) AS d24
        FROM ma WHERE c1 = 12 AND c2 = 12
    )
    SELECT n_name, month_of_year,
           cast(count(*) AS BIGINT) AS n_obs,
           round(sum(d24) / (24.0 * 100.0 * count(*)), 4) AS seasonal_index
    FROM detr GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def w_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition per nation: detrend
    the dense monthly revenue series with the textbook CENTERED 2×12
    moving average (the two offset 12-month sums — trend estimate at t
    = (Σ₋₆..₊₅ + Σ₋₅..₊₆)/24), then the seasonal index for each
    month-of-year is the mean detrended value (Macaulay's classical
    decomposition; what STL approximates robustly). Months outside a
    full 13-month neighborhood are excluded exactly as classical
    decomposition prescribes.

    Exactness: revenue is cast to BIGINT cents FIRST, the 2×12 trend
    is kept as the INTEGER 24-weighted sum (never divided), and the
    detrended series 24·x − (s1+s2) stays integer through the final
    aggregate — both engines divide once, at the end, by the same
    exact integers, so there is no float-accumulation divergence to
    round away. Scale shape: one shuffled aggregate to (nation ×
    month), a dimension-sized spine join, nation-PARTITIONED running
    windows (bounded partitions, no global sort), one 300-group
    aggregate."""
    dense = _dense_monthly_revenue(spark, sf_dir, "cents")
    from pyspark.sql import Window

    w1 = (
        Window.partitionBy("n_name").orderBy("t").rowsBetween(-6, 5)
    )
    w2 = (
        Window.partitionBy("n_name").orderBy("t").rowsBetween(-5, 6)
    )
    ma = dense.select(
        "n_name",
        "t",
        "x",
        F.sum("x").over(w1).alias("s1"),
        F.count(F.lit(1)).over(w1).alias("c1"),
        F.sum("x").over(w2).alias("s2"),
        F.count(F.lit(1)).over(w2).alias("c2"),
    )
    detr = ma.filter((F.col("c1") == 12) & (F.col("c2") == 12)).select(
        "n_name",
        (((F.col("t") - 1) % 12) + 1).alias("month_of_year"),
        (24 * F.col("x") - (F.col("s1") + F.col("s2"))).alias("d24"),
    )
    return (
        detr.groupBy("n_name", "month_of_year")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(
                F.sum("d24") / (24.0 * 100.0 * F.count(F.lit(1))), 4
            ).alias("seasonal_index"),
        )
        .orderBy("n_name", "month_of_year")
    )


# ---------------------------------------------------------------------------
# Exact autocorrelation function from integer sufficient sums
# ---------------------------------------------------------------------------


@query(
    "w_autocorrelation",
    "WITH "
    + _DENSE_MONTHLY_SQL.format(scale="1.0")
    + """,
    led AS (
        SELECT n_name, x,
               lead(x, 1) OVER w AS x1,
               lead(x, 2) OVER w AS x2,
               lead(x, 3) OVER w AS x3
        FROM dense
        WINDOW w AS (PARTITION BY n_name ORDER BY t)
    ),
    suf AS (
        SELECT n_name,
               cast(count(*) AS BIGINT) AS n,
               sum(x) AS s, sum(x * x) AS q,
               sum(CASE WHEN x1 IS NOT NULL THEN x * x1 END) AS a1,
               sum(CASE WHEN x1 IS NOT NULL THEN x END) AS h1,
               sum(x1) AS t1,
               sum(CASE WHEN x2 IS NOT NULL THEN x * x2 END) AS a2,
               sum(CASE WHEN x2 IS NOT NULL THEN x END) AS h2,
               sum(x2) AS t2,
               sum(CASE WHEN x3 IS NOT NULL THEN x * x3 END) AS a3,
               sum(CASE WHEN x3 IS NOT NULL THEN x END) AS h3,
               sum(x3) AS t3
        FROM led GROUP BY 1
    )
    SELECT n_name, n AS n_months,
           round((a1 - (s * (h1 + t1)) / cast(n AS DOUBLE)
                  + (n - 1) * (s / cast(n AS DOUBLE)) * (s / cast(n AS DOUBLE)))
                 / (q - (s * s) / cast(n AS DOUBLE)), 6) AS acf_lag1,
           round((a2 - (s * (h2 + t2)) / cast(n AS DOUBLE)
                  + (n - 2) * (s / cast(n AS DOUBLE)) * (s / cast(n AS DOUBLE)))
                 / (q - (s * s) / cast(n AS DOUBLE)), 6) AS acf_lag2,
           round((a3 - (s * (h3 + t3)) / cast(n AS DOUBLE)
                  + (n - 3) * (s / cast(n AS DOUBLE)) * (s / cast(n AS DOUBLE)))
                 / (q - (s * s) / cast(n AS DOUBLE)), 6) AS acf_lag3
    FROM suf ORDER BY n_name
    """,
)
def w_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sample autocorrelation (ACF lags 1–3) of each nation's
    dense monthly revenue signal — the seasonality/momentum probe a
    forecasting pipeline runs before picking model order (Box–Jenkins
    identification). r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)² expanded
    into INTEGER sufficient sums: with A_k = Σ x_t·x_{t+k}, H_k/T_k
    the head/tail sums of each lag-k pair window, S = Σx, Q = Σx²,
    the numerator is A_k − S(H_k+T_k)/n + (n−k)(S/n)² — every term a
    BIGINT (revenue in whole dollars; Q ≤ ~1e16·84 stays in range
    through SF 1) until ONE final double expression both engines
    evaluate identically from identical integers.

    Scale shape: the lag pairing is a nation-partitioned ``lead``
    window over the dimension-sized series (bounded partitions), the
    sufficient sums are one 25-group aggregate, and nothing data-sized
    crosses an exchange after the monthly rollup."""
    dense = _dense_monthly_revenue(spark, sf_dir, "dollars")
    from pyspark.sql import Window

    w = Window.partitionBy("n_name").orderBy("t")
    led = dense.select(
        "n_name",
        "x",
        F.lead("x", 1).over(w).alias("x1"),
        F.lead("x", 2).over(w).alias("x2"),
        F.lead("x", 3).over(w).alias("x3"),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    ]
    for k in (1, 2, 3):
        xk = F.col(f"x{k}")
        aggs += [
            F.sum(F.when(xk.isNotNull(), F.col("x") * xk)).alias(f"a{k}"),
            F.sum(F.when(xk.isNotNull(), F.col("x"))).alias(f"h{k}"),
            F.sum(xk).alias(f"t{k}"),
        ]
    suf = led.groupBy("n_name").agg(*aggs)
    nd = F.col("n").cast("double")
    mu = F.col("s") / nd
    denom = F.col("q") - (F.col("s") * F.col("s")) / nd
    cols = [F.col("n_name"), F.col("n").alias("n_months")]
    for k in (1, 2, 3):
        num = (
            F.col(f"a{k}")
            - (F.col("s") * (F.col(f"h{k}") + F.col(f"t{k}"))) / nd
            + (F.col("n") - k) * mu * mu
        )
        cols.append(F.round(num / denom, 6).alias(f"acf_lag{k}"))
    return suf.select(*cols).orderBy("n_name")


# ---------------------------------------------------------------------------
# HITS hubs/authorities on the bipartite customer->part purchase graph
# ---------------------------------------------------------------------------


@query(
    "graph_hits_scores",
    """
    WITH e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    auth1 AS (SELECT p, cast(count(*) AS BIGINT) AS a1 FROM e GROUP BY 1),
    hub1 AS (
        SELECT e.c, sum(a.a1) AS h1
        FROM e JOIN auth1 a ON a.p = e.p GROUP BY 1
    ),
    auth2 AS (
        SELECT e.p, sum(h.h1) AS a2
        FROM e JOIN hub1 h ON h.c = e.c GROUP BY 1
    )
    SELECT a2.p AS part_id,
           cast(a1.a1 AS BIGINT) AS n_buyers,
           cast(a2.a2 AS BIGINT) AS authority2
    FROM auth2 a2 JOIN auth1 a1 ON a1.p = a2.p
    ORDER BY authority2 DESC, part_id ASC LIMIT 20
    """,
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) on the bipartite
    customer→part purchase graph: with h⁰ ≡ 1, the authority update is
    a(p) = Σ_{c→p} h(c) and the hub update h(c) = Σ_{c→p} a(p) — two
    unrolled rounds yield a¹(p) = in-degree (distinct buyers) and
    a²(p) = Σ_buyers Σ_{their parts} a¹ — "parts bought by customers
    who buy popular parts", the co-demand centrality PageRank's
    random-surfer model doesn't express (it follows ALL walks;
    HITS separates the two node roles). Scores stay INTEGER (no
    per-round normalization — rankings are scale-invariant), so both
    engines agree exactly and overflow is bounded by Σdeg² ≪ 2⁶³.

    Scale shape: edge build is one orderkey equi-join + DISTINCT (the
    only fact-sized exchanges); each HITS round is a key-partitioned
    join + map-side-combined sum — no |V|-sized broadcast anywhere, so
    the plan survives a billion-node graph unchanged (the escape-hatch
    design the degree-broadcast family needed is simply not needed
    here). Top-20 rides TakeOrderedAndProject with a total tiebreak."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    e = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    auth1 = e.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("a1"))
    hub1 = (
        e.join(auth1, "p")
        .groupBy("c")
        .agg(F.sum("a1").alias("h1"))
    )
    auth2 = (
        e.join(hub1, "c")
        .groupBy("p")
        .agg(F.sum("h1").alias("a2"))
    )
    return (
        auth2.join(auth1, "p")
        .select(
            F.col("p").alias("part_id"),
            F.col("a1").cast("long").alias("n_buyers"),
            F.col("a2").cast("long").alias("authority2"),
        )
        .orderBy(F.desc("authority2"), F.asc("part_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Distributed OLS from map-side integer sufficient statistics
# ---------------------------------------------------------------------------


@query(
    "a_ols_sufficient_stats",
    """
    WITH obs AS (
        SELECT l_returnflag AS grp,
               cast(l_quantity AS BIGINT) AS x1,
               cast(round(l_discount * 100.0, 0) AS BIGINT) AS x2,
               cast(round(l_extendedprice, 0) AS BIGINT) AS y
        FROM lineitem
    ),
    suf AS (
        SELECT grp,
               cast(count(*) AS BIGINT) AS n,
               cast(sum(x1) AS DOUBLE) AS sx1, cast(sum(x2) AS DOUBLE) AS sx2,
               cast(sum(y) AS DOUBLE) AS sy,
               cast(sum(x1 * x1) AS DOUBLE) AS s11,
               cast(sum(x2 * x2) AS DOUBLE) AS s22,
               cast(sum(x1 * x2) AS DOUBLE) AS s12,
               cast(sum(x1 * y) AS DOUBLE) AS s1y,
               cast(sum(x2 * y) AS DOUBLE) AS s2y,
               cast(sum(y * y) AS DOUBLE) AS syy
        FROM obs GROUP BY 1
    ),
    solved AS (
        SELECT grp, n, sy, s1y, s2y, syy,
               cast(n AS DOUBLE) * (s11 * s22 - s12 * s12)
                 - sx1 * (sx1 * s22 - s12 * sx2)
                 + sx2 * (sx1 * s12 - s11 * sx2) AS det,
               sy * (s11 * s22 - s12 * s12)
                 - sx1 * (s1y * s22 - s12 * s2y)
                 + sx2 * (s1y * s12 - s11 * s2y) AS det0,
               cast(n AS DOUBLE) * (s1y * s22 - s12 * s2y)
                 - sy * (sx1 * s22 - s12 * sx2)
                 + sx2 * (sx1 * s2y - s1y * sx2) AS det1,
               cast(n AS DOUBLE) * (s11 * s2y - s1y * s12)
                 - sx1 * (sx1 * s2y - s1y * sx2)
                 + sy * (sx1 * s12 - s11 * sx2) AS det2
        FROM suf
    )
    SELECT grp AS l_returnflag, n AS n_obs,
           round(det0 / det, 6) AS beta0,
           round(det1 / det, 6) AS beta1,
           round(det2 / det, 6) AS beta2,
           round(1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
                        - (det2 / det) * s2y)
                     / (syy - (sy / cast(n AS DOUBLE)) * sy), 6) AS r2
    FROM solved ORDER BY 1
    """,
)
def a_ols_sufficient_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ordinary least squares per return flag — fit
    price ~ β₀ + β₁·quantity + β₂·discount in ONE pass by reducing the
    data to its sufficient statistics: the 9 co-moment sums of the
    normal equations XᵀXβ = Xᵀy, built MAP-SIDE as exact BIGINT sums
    over integer-cast features (quantity, discount in hundredths,
    price in whole dollars), then solved per group by Cramer's rule on
    the 3×3 system in a single closed-form expression. This is how a
    training pipeline fits calibration/quality regressions at 100 TB:
    the exchange carries 10 numbers per group, never rows, and the
    "solve" is O(groups) driver-free column math. R² comes from the
    same sums (SSE = Syy − βᵀXᵀy).

    Exactness: every sum both engines aggregate is INTEGER (order-
    independent); the float work is one identical expression tree over
    identical integers, so the rounded coefficients match bit-exactly
    — the graph_pagerank determinism contract. Overflow bound:
    Σ(x1·y) ≤ 50·8e6·rows keeps every co-moment ≪ 2⁶³ through SF 1."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    )
    obs = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100.0, 0).cast("long").alias("x2"),
        F.round("l_extendedprice", 0).cast("long").alias("y"),
    )
    suf = obs.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx1, sx2, sy = (F.col(c) for c in ("n", "sx1", "sx2", "sy"))
    s11, s22, s12, s1y, s2y, syy = (
        F.col(c) for c in ("s11", "s22", "s12", "s1y", "s2y", "syy")
    )
    nd = n.cast("double")
    det = (
        nd * (s11 * s22 - s12 * s12)
        - sx1 * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s12 - s11 * sx2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - sx1 * (s1y * s22 - s12 * s2y)
        + sx2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        nd * (s1y * s22 - s12 * s2y)
        - sy * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s2y - s1y * sx2)
    )
    det2 = (
        nd * (s11 * s2y - s1y * s12)
        - sx1 * (sx1 * s2y - s1y * sx2)
        + sy * (sx1 * s12 - s11 * sx2)
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    r2 = 1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y) / (
        syy - (sy / nd) * sy
    )
    return suf.select(
        F.col("grp").alias("l_returnflag"),
        F.col("n").alias("n_obs"),
        F.round(b0, 6).alias("beta0"),
        F.round(b1, 6).alias("beta1"),
        F.round(b2, 6).alias("beta2"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Metadata compaction: delete-checkpoint manifests (Iceberg
# rewrite_manifests)
# ---------------------------------------------------------------------------
# Timeline (k = c_custkey):
#   v1 append  evens          (k%2==0)
#   v2 delete  k%4==0
#   v3 append  odds           (k%2==1)
#   v4 delete  k%3==0
#   v5 rewrite_manifests      (metadata-only delete checkpoint)
#   v6 append  k%12==0, bal 333   (re-insert of keys both deletes hit)
# Final survivors: evens with k%4!=0 and k%3!=0; odds with k%3!=0;
# every k%12==0 at 333 (era 6 outranks both deletes).


@query(
    "lake_rewrite_manifests",
    """
    WITH base AS (
        SELECT cast(c_custkey AS BIGINT) AS k, c_mktsegment, c_acctbal
        FROM customer
    ),
    final AS (
        SELECT k, c_mktsegment, c_acctbal FROM base
        WHERE k % 2 = 0 AND k % 4 <> 0 AND k % 3 <> 0
        UNION ALL
        SELECT k, c_mktsegment, c_acctbal FROM base
        WHERE k % 2 = 1 AND k % 3 <> 0
        UNION ALL
        SELECT k, c_mktsegment, 333.0 AS c_acctbal FROM base
        WHERE k % 12 = 0
    )
    SELECT c_mktsegment, count(*) AS n_rows,
           round(sum(c_acctbal), 2) AS total_bal
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def lake_rewrite_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA compaction on a merge-on-read table (sources/lake.py:
    rewrite_manifests / _collect_deletes): after two appends and two
    equality-delete commits, a ``rewrite_manifests`` commit
    consolidates the whole delete history into one delete-checkpoint
    manifest — zero data moved, one JSON written — so every later MoR
    read stops its manifest walk AT the checkpoint instead of
    descending to v1 (Iceberg's rewrite_manifests procedure: bound the
    METADATA cost; compaction bounds the file count). A later append
    re-inserts keys both deletes hit; they survive because their era
    outranks the checkpoint's carried versions.

    THREE in-query gates RAISE on drift, so the green grade is an
    execution proof, not just a value match: (1) the checkpoint
    consolidated exactly the 2 delete groups, (2) the post-checkpoint
    walk reads exactly 2 manifests (head + checkpoint) where the
    unchecked table would read 6, (3) the MoR view is row-identical
    across the checkpoint commit. The oracle derives the final state
    in closed form."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import lake

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_rwm_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"),
        "c_mktsegment",
        "c_acctbal",
    )
    k = F.col("k")
    lake.write_snapshot(spark, base.filter(k % 2 == 0), path)  # v1
    lake.delete_snapshot(spark, base.filter(k % 4 == 0).select("k"), path, ["k"])  # v2
    lake.write_snapshot(spark, base.filter(k % 2 == 1), path)  # v3
    lake.delete_snapshot(spark, base.filter(k % 3 == 0).select("k"), path, ["k"])  # v4
    pre_n = lake.read_snapshot_mor(spark, path).count()
    out = lake.rewrite_manifests(spark, path)  # v5
    if out["version"] != 5 or out["consolidated_deletes"] != 2:
        raise AssertionError(f"fixture drift: unexpected checkpoint {out}")
    post_n = lake.read_snapshot_mor(spark, path).count()
    if pre_n != post_n:
        raise AssertionError(
            f"metadata compaction changed the table: {pre_n} -> {post_n}"
        )
    lake.write_snapshot(
        spark,
        base.filter(k % 12 == 0).select(
            "k", "c_mktsegment", F.lit(333.0).alias("c_acctbal")
        ),
        path,
    )  # v6
    _dels, walked = lake._collect_deletes(spark, path, 6)
    if walked != 2:
        raise AssertionError(
            f"checkpoint did not bound the MoR walk: read {walked} manifests"
        )
    return (
        lake.read_snapshot_mor(spark, path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Exact distributed weighted quantiles — two-phase bucket + recount
# ---------------------------------------------------------------------------


@query(
    "a_weighted_quantiles_exact",
    """
    WITH rows_ AS (
        SELECT l_returnflag AS g, l_extendedprice AS x,
               cast(l_quantity AS BIGINT) AS wt
        FROM lineitem
    ),
    vx AS (SELECT g, x, sum(wt) AS wt FROM rows_ GROUP BY 1, 2),
    tot AS (SELECT g, sum(wt) AS w FROM vx GROUP BY 1),
    c AS (
        SELECT g, x, sum(wt) OVER (PARTITION BY g ORDER BY x) AS cw
        FROM vx
    )
    SELECT c.g AS l_returnflag,
           cast(t.w AS BIGINT) AS total_weight,
           round(min(CASE WHEN 2 * cw >= t.w THEN x END), 2) AS w_p50,
           round(min(CASE WHEN 10 * cw >= 9 * t.w THEN x END), 2) AS w_p90
    FROM c JOIN tot t ON t.g = c.g
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def a_weighted_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted quantiles (lower weighted median / p90 of price,
    weighted by quantity) per return flag WITHOUT a global sort — the
    two-phase bucket-locate-recount pattern (the same family as the
    Misra–Gries recount and the KS prefix sum): (1) collapse ties to
    (group, value) weights, (2) roll up to coarse value BUCKETS and
    run the cumulative-weight window over the BOUNDED bucket table to
    locate, per quantile, the one bucket containing the threshold
    T_q = smallest x with cumweight ≥ q·W, (3) recount ONLY inside
    the located buckets, seeding each in-bucket cumulative window with
    the bucket's carried-in prior weight. Every window is partitioned
    ((group) over buckets; (group, quantile) over one bucket's
    values), thresholds compare as INTEGERS (2·cw ≥ W, 10·cw ≥ 9·W) —
    no float rank math — and the answer is exact at any scale while a
    naive solution sorts the whole group. Weighted quantiles are the
    data-mixing primitive (token-budget cutoffs over quality scores
    weighted by document length). The oracle computes the same
    definition with one flat cumulative window — affordable at oracle
    scale, the thing the two-phase plan avoids at 100 TB."""
    from glamira_end_to_end_data_pipeline_spark.operators.exact_stats import (
        weighted_quantiles_two_phase,
    )

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    picked = weighted_quantiles_two_phase(
        li,
        "l_returnflag",
        "l_extendedprice",
        "l_quantity",
        [("w_p50", 1, 2), ("w_p90", 9, 10)],
    )
    return (
        picked.groupBy("g")
        .agg(
            F.max("w").cast("long").alias("total_weight"),
            F.round(F.min(F.when(F.col("q") == "w_p50", F.col("xq"))), 2).alias("w_p50"),
            F.round(F.min(F.when(F.col("q") == "w_p90", F.col("xq"))), 2).alias("w_p90"),
        )
        .select(
            F.col("g").alias("l_returnflag"), "total_weight", "w_p50", "w_p90"
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Incremental join-view maintenance (the first-order delta rule)
# ---------------------------------------------------------------------------


@query(
    "stream_delta_join_view",
    """
    SELECT c.c_mktsegment,
           cast(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_rev
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_delta_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-VIEW maintenance — the first-order delta rule
    every IVM engine (DBSP/Materialize, Delta Live Tables) applies:
    with both sides split into an initial batch and a delta
    (R = R₁∪ΔR, S = S₁∪ΔS), the maintained view advances by
    V₂ = V₁ ∪ (ΔR⋈S₁) ∪ (R₁⋈ΔS) ∪ (ΔR⋈ΔS) — three joins whose inputs
    are churn-sized (|Δ|·|S| keyed lookups), never a recompute of
    R⋈S. An in-query gate RAISES unless the incrementally-maintained
    view is row-count-identical to the full recompute, so the green
    grade certifies the delta algebra, and the oracle grades the full
    join the increments must reconstitute. At 100 TB this is the
    pattern that turns a daily 3-hour join rebuild into minutes of
    delta work; all three delta joins broadcast the dimension side
    and shuffle only the churn."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    r1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    dr = orders.filter(F.col("o_orderkey") % 2 == 1)
    s1 = cust.filter(F.col("c_custkey") % 2 == 0)
    ds = cust.filter(F.col("c_custkey") % 2 == 1)

    def j(r, s):
        return r.join(s, r["o_custkey"] == s["c_custkey"])

    v1 = j(r1, s1)
    v2 = (
        v1.unionByName(j(dr, s1))
        .unionByName(j(r1, ds))
        .unionByName(j(dr, ds))
    )
    # equivalence gate: the maintained view must equal the recompute
    n_inc = v2.count()
    n_full = j(orders, cust).count()
    if n_inc != n_full:
        raise AssertionError(
            f"delta-join maintenance diverged: incremental {n_inc} rows, "
            f"full recompute {n_full}"
        )
    return (
        v2.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_rev"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Landmark harmonic closeness via per-source BFS
# ---------------------------------------------------------------------------

_CLOSE_N = 300
_CLOSE_SOURCES = (0, 97, 151, 202)
# LCM(1..12): every 27720/d is an exact integer for hop counts ≤ 12,
# so the harmonic sum stays integer-exact on both engines.
_HARMONIC_SCALE = 27720


@query(
    "graph_closeness_landmarks",
    f"""
    WITH RECURSIVE edges AS (
        SELECT i AS u, (2 * i) % {_CLOSE_N} AS v FROM range({_CLOSE_N}) t(i)
        UNION ALL
        SELECT i, (2 * i + 1) % {_CLOSE_N} FROM range({_CLOSE_N}) t(i)
    ),
    walk(src, node, d) AS (
        SELECT * FROM (VALUES (0, 0, 0), (97, 97, 0), (151, 151, 0),
                              (202, 202, 0)) s(src, node, d)
        UNION
        SELECT w.src, e.v, w.d + 1 FROM walk w JOIN edges e ON e.u = w.node
        WHERE w.d < 12
    ),
    md AS (SELECT src, node, min(d) AS d FROM walk GROUP BY 1, 2)
    SELECT cast(node AS BIGINT) AS node,
           cast(count(CASE WHEN d > 0 THEN 1 END) AS BIGINT) AS n_landmarks,
           cast(sum(CASE WHEN d > 0 THEN {_HARMONIC_SCALE} / d END) AS BIGINT)
               AS harmonic_scaled
    FROM md GROUP BY 1
    ORDER BY harmonic_scaled DESC, node ASC LIMIT 25
    """,
)
def graph_closeness_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-based harmonic closeness (operators/graph.py:
    bfs_distances_per_source): exact hop distances from each of 4
    landmarks kept SEPARATELY — the (src, node)-keyed Pregel loop —
    then harmonic centrality c(v) = Σ_landmarks 1/d(s,v) over reached
    pairs (Boldi–Vigna's axiom-clean centrality; landmarks make it
    O(|S|·|E|) instead of all-pairs). The harmonic sum is computed at
    the LCM(1..12)=27720 scale so every term is an exact integer —
    no float summation order to diverge between engines — and an
    in-query gate RAISES if any distance exceeds 12 (the oracle's
    recursive-CTE depth cap). Fixture: the doubling graph
    i → {{2i, 2i+1}} mod 300; ``local_threshold=0`` forces the live
    distributed loop under the grade (the graph family's standing
    proof pattern). Top-25 rides a total-order TakeOrderedAndProject."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        bfs_distances_per_source,
    )

    ids = spark.range(_CLOSE_N)
    edges = ids.select(
        F.col("id").alias("u"), (F.col("id") * 2 % _CLOSE_N).alias("v")
    ).unionAll(
        ids.select(
            F.col("id").alias("u"),
            ((F.col("id") * 2 + 1) % _CLOSE_N).alias("v"),
        )
    )
    d = bfs_distances_per_source(
        edges, _CLOSE_SOURCES, batch0=8, local_threshold=0
    )
    dmax = d.agg(F.max("dist")).collect()[0][0]
    if dmax is None or dmax > 12:
        raise AssertionError(
            f"fixture drift: max hop distance {dmax} exceeds the exact-"
            f"integer harmonic bound (LCM scale covers d ≤ 12)"
        )
    pos = d.filter(F.col("dist") > 0)
    return (
        pos.groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_landmarks"),
            F.sum(F.lit(_HARMONIC_SCALE) / F.col("dist"))
            .cast("long")
            .alias("harmonic_scaled"),
        )
        .orderBy(F.desc("harmonic_scaled"), F.asc("node"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# l-diversity privacy audit (beside the k-anonymity entry)
# ---------------------------------------------------------------------------


@query(
    "dq_l_diversity",
    """
    WITH s AS (
        SELECT c_nationkey, c_mktsegment,
               cast(floor(c_acctbal / 1000.0) AS BIGINT) AS sens
        FROM customer
    )
    SELECT c_nationkey, c_mktsegment,
           cast(count(*) AS BIGINT) AS group_size,
           cast(count(DISTINCT sens) AS BIGINT) AS l_distinct
    FROM s
    GROUP BY 1, 2
    HAVING count(DISTINCT sens) < 5
    ORDER BY 1, 2
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY audit (Machanavajjhala et al. 2007) — the privacy
    check k-anonymity (the sibling ``dq_k_anonymity`` entry) cannot
    express: a quasi-identifier group can be large (k-anonymous) yet
    still leak if every member shares the SAME sensitive value, so the
    release gate is the number of DISTINCT sensitive values per QI
    group. Sensitive attribute: the account-balance band; QI =
    (nation, market segment). Emits every group below l = 5 with its
    size — the worklist an anonymization pass must generalize or
    suppress before the table ships to a training corpus. One
    distinct-aggregate exchange, the same shape Spark plans for A2."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("sens"),
    )
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.countDistinct("sens").cast("long").alias("l_distinct"),
        )
        .filter(F.col("l_distinct") < 5)
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Shortest-path counts (the sigma half of Brandes' betweenness)
# ---------------------------------------------------------------------------

_SPC_N = 300
_SPC_SRC = 0
_SPC_CAP = 12


@query(
    "graph_shortest_path_counts",
    f"""
    WITH RECURSIVE edges AS (
        SELECT i AS u, (2 * i) % {_SPC_N} AS v FROM range({_SPC_N}) t(i)
        UNION ALL
        SELECT i, (2 * i + 1) % {_SPC_N} FROM range({_SPC_N}) t(i)
    ),
    walk(node, d) AS (
        SELECT {_SPC_SRC}, 0
        UNION ALL
        SELECT e.v, w.d + 1 FROM walk w JOIN edges e ON e.u = w.node
        WHERE w.d < {_SPC_CAP}
    ),
    md AS (SELECT node, min(d) AS dist FROM walk GROUP BY 1)
    SELECT cast(m.node AS BIGINT) AS node,
           cast(m.dist AS BIGINT) AS dist,
           cast(count(*) AS BIGINT) AS npaths
    FROM walk w JOIN md m ON w.node = m.node AND w.d = m.dist
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def graph_shortest_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shortest-path counts σ(s,v) from a single source
    (operators/graph.py:bfs_path_counts) — the forward pass of
    Brandes' betweenness algorithm, distributed as a layered BFS whose
    per-layer join SUMS path counts across the layer boundary and
    anti-joins the settled set. The oracle counts the same quantity a
    completely different way: a depth-capped UNION ALL recursive walk
    enumerates EVERY walk from the source (bounded here: out-degree 2,
    cap 12 → ≤ 2¹³ rows) and counts walks whose length equals the
    node's min distance — walk enumeration is the oracle-scale luxury
    the distributed layer-sum avoids. An in-query gate RAISES if any
    distance reaches the oracle's depth cap. Fixture: the doubling
    graph i → {2i, 2i+1} mod 300 from source 0."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import bfs_path_counts

    ids = spark.range(_SPC_N)
    edges = ids.select(
        F.col("id").alias("u"), (F.col("id") * 2 % _SPC_N).alias("v")
    ).unionAll(
        ids.select(
            F.col("id").alias("u"),
            ((F.col("id") * 2 + 1) % _SPC_N).alias("v"),
        )
    )
    out = bfs_path_counts(edges, _SPC_SRC)
    dmax = out.agg(F.max("dist")).collect()[0][0]
    if dmax is None or dmax >= _SPC_CAP:
        raise AssertionError(
            f"fixture drift: max distance {dmax} reaches the oracle walk "
            f"cap {_SPC_CAP} — counts would diverge"
        )
    return out.orderBy("node")


# ---------------------------------------------------------------------------
# SCD Type-6 hybrid dimension (Type 2 history + Type 1 current overlay
# + Type 3 previous column)
# ---------------------------------------------------------------------------


@query(
    "scd2_type6_hybrid",
    """
    WITH ordered AS (
        SELECT o_custkey AS custkey, o_orderpriority AS segment,
               o_orderdate AS ts, o_orderkey AS tb,
               lag(o_orderpriority) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev_seg
        FROM orders
    ),
    changed AS (
        SELECT custkey, segment, ts AS valid_from, tb
        FROM ordered WHERE prev_seg IS NULL OR prev_seg <> segment
    ),
    starts AS (
        SELECT custkey, segment, valid_from
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY custkey, valid_from ORDER BY tb DESC
                   ) AS rn
            FROM changed
        ) WHERE rn = 1
    ),
    v AS (
        SELECT custkey, segment, valid_from,
               lead(valid_from) OVER w AS valid_to,
               cast(row_number() OVER w AS int) AS version_no,
               (lead(valid_from) OVER w IS NULL) AS is_current,
               lag(segment) OVER w AS prev_segment
        FROM starts
        WINDOW w AS (PARTITION BY custkey ORDER BY valid_from)
    ),
    cur AS (SELECT custkey, segment AS current_segment FROM v WHERE is_current)
    SELECT v.custkey, v.version_no, v.segment, v.prev_segment,
           c.current_segment, v.valid_from, v.valid_to, v.is_current
    FROM v JOIN cur c ON c.custkey = v.custkey
    ORDER BY v.custkey, v.version_no
    """,
)
def scd2_type6_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-6 hybrid dimension (Kimball's 1+2+3): the Type-2
    version history (operators/scd.py:scd2_versions over the
    order-priority change feed), PLUS the Type-1 overlay — every
    historical row carries the key's CURRENT value, so "as was vs as
    is" reporting is one predicate, no self-join at query time — PLUS
    the Type-3 ``prev_segment`` column (the immediately preceding
    version's value). This is the dimension shape BI teams actually
    ship when analysts ask both "what was true then" and "group
    history by today's segment."

    Scale shape: scd2_versions' lag/dedup/lead windows share one
    custkey exchange; the current overlay is a second key-partitioned
    window family (is_current row joined back on the same key), output
    is |version rows|, never |orders|. Reference parity: the dbt star
    models snapshot Type-2 only (7.dtv); Type 6 is the engine-side
    extension."""
    from glamira_end_to_end_data_pipeline_spark.operators.scd import scd2_versions
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
    )
    v = scd2_versions(
        orders, "custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("custkey").orderBy("valid_from")
    v = v.withColumn("prev_segment", F.lag("segment").over(w))
    cur = v.filter(F.col("is_current")).select(
        "custkey", F.col("segment").alias("current_segment")
    )
    return (
        v.join(cur, "custkey")
        .select(
            "custkey",
            "version_no",
            "segment",
            "prev_segment",
            "current_segment",
            "valid_from",
            "valid_to",
            "is_current",
        )
        .orderBy("custkey", "version_no")
    )


# ---------------------------------------------------------------------------
# Exact distributed Gini index — two-phase bucket rank reconstruction
# ---------------------------------------------------------------------------


@query(
    "a_gini_index_exact",
    """
    WITH obs AS (
        SELECT l_returnflag AS g,
               cast(round(l_extendedprice, 0) AS BIGINT) AS xi
        FROM lineitem
    ),
    r AS (
        SELECT g, xi,
               row_number() OVER (PARTITION BY g ORDER BY xi) AS rn
        FROM obs
    ),
    s AS (
        SELECT g, cast(count(*) AS BIGINT) AS n, sum(xi) AS sx,
               sum(rn * xi) AS srx
        FROM r GROUP BY 1
    )
    SELECT g AS l_returnflag, n AS n_obs, cast(sx AS BIGINT) AS total_amt,
           round((2.0 * srx) / (cast(n AS DOUBLE) * sx)
                 - (n + 1) / cast(n AS DOUBLE), 6) AS gini
    FROM s ORDER BY 1
    """,
)
def a_gini_index_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Gini concentration index per return flag WITHOUT a global
    sort: G = 2·Σᵢ rᵢxᵢ / (n·Σx) − (n+1)/n needs every value's exact
    RANK, which the two-phase bucket trick reconstructs distributively
    — bucket counts give each bucket's carried-in rank offset (a
    cumulative window over the BOUNDED bucket rollup), ranks inside a
    bucket come from (group, bucket)-PARTITIONED row_number windows,
    and Σ rᵢxᵢ decomposes exactly as Σ_b offset_b·(Σx in b) +
    Σ in-bucket rn·x. Every sum is a BIGINT over integer dollars
    (order-independent; bounds hold through SF 1), the final expression
    is one identical float formula on both engines, and tied values
    are safe because a tie group's rank-sum is fixed regardless of
    internal order. Gini-by-slice is the inequality/concentration
    screen data-mixing pipelines run on token budgets per domain. The
    oracle ranks with one flat window — the oracle-scale luxury."""
    from glamira_end_to_end_data_pipeline_spark.operators.exact_stats import (
        gini_index_exact,
    )

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_extendedprice", 0).cast("long").alias("amt"),
    )
    out = gini_index_exact(li, "l_returnflag", "amt")
    return out.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").alias("n_obs"),
        F.col("sx").alias("total_amt"),
        F.round("gini", 6).alias("gini"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Mutual information between two categorical columns — per-cell terms
# ---------------------------------------------------------------------------


@query(
    "a_mutual_information_terms",
    """
    WITH joint AS (
        SELECT c_nationkey AS x, c_mktsegment AS y,
               cast(count(*) AS BIGINT) AS n_xy
        FROM customer GROUP BY 1, 2
    ),
    mx AS (SELECT x, sum(n_xy) AS n_x FROM joint GROUP BY 1),
    my AS (SELECT y, sum(n_xy) AS n_y FROM joint GROUP BY 1),
    tot AS (SELECT sum(n_xy) AS n FROM joint)
    SELECT j.x AS c_nationkey, j.y AS c_mktsegment, j.n_xy,
           round(
               (j.n_xy / cast(t.n AS DOUBLE))
               * ln((j.n_xy * t.n) / (cast(m1.n_x AS DOUBLE) * m2.n_y)),
               8
           ) AS mi_term
    FROM joint j
    JOIN mx m1 ON m1.x = j.x
    JOIN my m2 ON m2.y = j.y
    CROSS JOIN tot t
    ORDER BY 1, 2
    """,
)
def a_mutual_information_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual-information decomposition between two
    categorical columns (nation × market segment): each contingency
    cell's exact contribution (p̂_xy)·ln(p̂_xy/(p̂_x·p̂_y)) to the
    mutual information I(X;Y) — the dependence screen feature
    selection and leakage audits run before training (a near-zero
    column pair is safe to treat independently; a fat term is a
    leaking join key). Emitting PER-CELL terms keeps every float
    computed by ONE identical expression from exact integer counts on
    both engines — a single summed MI total would accumulate in
    engine-specific order (the dq_chi2 family's established design);
    the consumer's final Σ is over the bounded cell table.

    Scale shape: one (x,y) count exchange (map-side combined), margins
    re-aggregated from the BOUNDED cell table (never the raw rows),
    scalar total via one-row broadcast. Everything after the first
    exchange is O(|X|·|Y|)."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("x"), F.col("c_mktsegment").alias("y")
    )
    joint = cust.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    mx = joint.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = joint.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = joint.agg(F.sum("n_xy").alias("n"))
    term = (F.col("n_xy") / F.col("n").cast("double")) * F.log(
        (F.col("n_xy") * F.col("n"))
        / (F.col("n_x").cast("double") * F.col("n_y"))
    )
    return (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("x").alias("c_nationkey"),
            F.col("y").alias("c_mktsegment"),
            "n_xy",
            F.round(term, 8).alias("mi_term"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Optimistic-concurrency conditional commit (CAS on the table head)
# ---------------------------------------------------------------------------
# Timeline (k = c_custkey):
#   v1 append  k%3==0              (the base table)
#   -- writer A prepares an append of k%3==1 against expected head v1 --
#   v2 append  k%3==2              (an interleaved writer commits first)
#   -- A's CAS commit RAISES CommitConflictError; A retries against v2 --
#   v3 append  k%3==1              (A's retry lands)
# Final state: the whole customer table, every row exactly once; A's
# failed first attempt left orphan data files that GC must reclaim.


@query(
    "lake_conditional_commit",
    """
    SELECT c_mktsegment,
           cast(count(*) AS BIGINT) AS n_rows,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY 1 ORDER BY 1
    """,
)
def lake_conditional_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency COMMIT LOOP (sources/lake.py:
    write_snapshot_cas / CommitConflictError): a writer prepares its
    data files against head v1, an interleaved commit moves the head
    to v2, and the writer's conditional commit must RAISE — then its
    RETRY against the new head lands as v3 with no duplicated and no
    lost rows, and the failed attempt's orphaned data files are
    reclaimed by GC without touching a committed byte. This is the
    Iceberg/Delta multi-writer protocol (CommitFailedException →
    refresh → reapply) expressed on the manifest lake.

    FOUR in-query gates RAISE on drift: the conflict must fire, the
    retry must land at v3, GC must reclaim ≥1 orphan file from the
    failed attempt, and the post-GC table must equal the pre-GC table
    row-for-row. The oracle is the full customer rollup — exactly-once
    across the conflict is the graded property."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import lake

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_cas_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"),
        "c_mktsegment",
        "c_acctbal",
    )
    k = F.col("k")
    lake.write_snapshot(spark, base.filter(k % 3 == 0), path)  # v1
    # interleaved writer wins the race to v2
    lake.write_snapshot(spark, base.filter(k % 3 == 2), path)  # v2
    conflicted = False
    try:
        lake.write_snapshot_cas(
            spark, base.filter(k % 3 == 1), path, expected_version=1
        )
    except lake.CommitConflictError:
        conflicted = True
    if not conflicted:
        raise AssertionError(
            "CAS commit against a moved head did not raise"
        )
    v3 = lake.write_snapshot_cas(
        spark, base.filter(k % 3 == 1), path, expected_version=2
    )
    if v3 != 3:
        raise AssertionError(f"retry landed at v{v3}, expected v3")
    pre = lake.read_snapshot(spark, path).count()
    removed = lake.gc_orphan_files(spark, path)
    if removed < 1:
        raise AssertionError(
            "the failed attempt left no orphans for GC to reclaim"
        )
    post = lake.read_snapshot(spark, path).count()
    if pre != post:
        raise AssertionError(
            f"GC changed the committed table: {pre} -> {post}"
        )
    return (
        lake.read_snapshot(spark, path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )
