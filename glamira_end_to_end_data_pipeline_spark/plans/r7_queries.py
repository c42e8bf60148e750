"""Round-7 additions: row-level snapshot CDF (the change feed a
``replace`` commit or rollback needs, which the append-only
incremental read cannot express), a tolerance-bounded as-of join (the
feature-store point-in-time shape), a mergeable-histogram percentile
rollup (the fixed-bin sibling of the HLL rollup — deterministic, so
the differential grades VALUES, not an envelope), robust MAD outlier
detection, exact repeated-span duplication stats (Lee et al. 2022's
per-document metric at span granularity), and filtered ANN (metadata
predicate pushed into the scan UNDER the IVF prune — the
Qdrant/Milvus filtered-search shape on plain parquet). Batch 2:
gaps-and-islands streaks (Tabibitosan anchor, one shuffle), perceptual-
hash image near-dup via the generalized banded Hamming join, and
WebDataset-style deterministic shard packing.

Registered after r6_queries; every entry lands inside the round-7
grading window behind the front-loaded changed-code re-grades (see
plans/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.operators import dedup, similarity
from glamira_end_to_end_data_pipeline_spark.plans.northstar_queries import (
    CORPUS_CTE,
    TOKENS_SQL,
    _COS_SQL,
    _docs,
    _emb,
    _grams_sql,
    corpus_with_dups,
)
from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.sources import read_table


@query(
    "lake_snapshot_diff",
    """
    WITH base AS (
        SELECT cast(c_custkey AS BIGINT) AS c_custkey,
               c_mktsegment, c_acctbal
        FROM customer
    ),
    v2 AS (
        SELECT c_custkey, c_mktsegment, c_acctbal FROM base
        WHERE c_custkey % 10 <> 0 AND c_custkey % 10 <> 5
        UNION ALL
        SELECT c_custkey, c_mktsegment, 999.99 FROM base
        WHERE c_custkey % 10 = 5
        UNION ALL
        SELECT c_custkey + 10000000, c_mktsegment, 42.0 FROM base
        WHERE c_custkey % 100 = 7
    ),
    diff AS (
        SELECT CASE WHEN a.c_custkey IS NULL THEN 'I'
                    WHEN b.c_custkey IS NULL THEN 'D'
                    WHEN (a.c_mktsegment, a.c_acctbal) IS DISTINCT FROM
                         (b.c_mktsegment, b.c_acctbal) THEN 'U'
               END AS change_type,
               coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
               CASE WHEN b.c_custkey IS NULL THEN a.c_mktsegment
                    ELSE b.c_mktsegment END AS c_mktsegment,
               CASE WHEN b.c_custkey IS NULL THEN a.c_acctbal
                    ELSE b.c_acctbal END AS c_acctbal
        FROM base a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey
    )
    SELECT change_type, c_mktsegment,
           count(*) AS n_rows,
           cast(sum(c_custkey) AS BIGINT) AS sum_keys,
           round(sum(c_acctbal), 2) AS total_bal
    FROM diff WHERE change_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def lake_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change data feed between two snapshot versions
    (sources/lake.py:snapshot_diff — Delta CDF / Iceberg changelog
    computed retroactively from plain manifests): v1 is the full
    customer state, v2 a REPLACE commit (write_snapshot(replace=True),
    Iceberg's overwrite snapshot) with every %10==0 key deleted,
    every %10==5 key's balance flattened, and sparse new keys
    inserted at +10,000,000. The diff is ONE full-outer shuffle on
    the key with each side's compare columns folded into a struct
    (null-safe struct equality = the per-row change test); unchanged
    keys — the overwhelming mass at real churn rates — die in the
    join's filter before anything else moves. The graded output is
    the per-(change_type, segment) rollup; the oracle derives the
    same diff from the source table directly."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import lake

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_snapdiff_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    cust = read_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_mktsegment",
        "c_acctbal",
    )
    key = F.col("c_custkey")
    v2 = (
        base.filter((key % 10 != 0) & (key % 10 != 5))
        .unionByName(
            base.filter(key % 10 == 5).select(
                "c_custkey", "c_mktsegment", F.lit(999.99).alias("c_acctbal")
            )
        )
        .unionByName(
            base.filter(key % 100 == 7).select(
                (key + 10000000).alias("c_custkey"),
                "c_mktsegment",
                F.lit(42.0).alias("c_acctbal"),
            )
        )
    )
    lake.write_snapshot(spark, base, path)
    lake.write_snapshot(spark, v2, path, replace=True)
    diff = lake.snapshot_diff(spark, path, 1, 2, ["c_custkey"])
    return (
        diff.groupBy("change_type", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c_custkey").cast("bigint").alias("sum_keys"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("change_type", "c_mktsegment")
    )


@query(
    "j_asof_tolerance",
    """
    WITH states AS (
        SELECT user_id, ts, max(value) AS sval
        FROM events WHERE event_id % 7 = 0 GROUP BY 1, 2
    ),
    j AS (
        SELECT p.event_type, p.ts AS pts, s.ts AS sts, s.sval
        FROM events p ASOF LEFT JOIN states s
          ON p.user_id = s.user_id AND p.ts >= s.ts
    ),
    c AS (
        SELECT event_type,
               CASE WHEN sts IS NOT NULL
                         AND cast(floor(epoch(pts)) AS BIGINT)
                             - cast(floor(epoch(sts)) AS BIGINT) <= 21600
                    THEN sval END AS carried
        FROM j
    )
    SELECT event_type, count(*) AS n_probes,
           count(carried) AS n_fresh,
           round(coalesce(sum(carried), 0), 2) AS sum_fresh_value
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def j_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE (operators/scd.py:
    asof_join(tolerance=) — pandas merge_asof's tolerance, the
    point-in-time-correct feature join every feature store runs): each
    event picks up its user's latest prior state value, but a state
    older than 6 h at the probe instant is discarded rather than
    served stale. Same union-window plan as the plain as-of (ONE
    key shuffle, no range join) — the matched state's timestamp rides
    the same last(ignorenulls) window inside a struct, so the
    tolerance test is a map-side filter, not a second join. States
    are the sparse event_id%7 subset collapsed to max(value) per
    (user, ts) so equal-timestamp ties are deterministic in both
    engines; the oracle is DuckDB's native ASOF LEFT JOIN plus the
    same integer-second staleness gate."""
    from glamira_end_to_end_data_pipeline_spark.operators.scd import asof_join

    ev = read_table(spark, sf_dir, "events")
    states = (
        ev.filter(F.col("event_id") % 7 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("sval"))
    )
    probes = ev.select("user_id", "ts", "event_type")
    joined = asof_join(
        probes,
        states,
        key_col="user_id",
        probe_ts_col="ts",
        state_ts_col="ts",
        value_col="sval",
        tolerance=21600,
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.count("sval").alias("n_fresh"),
            F.round(F.coalesce(F.sum("sval"), F.lit(0.0)), 2).alias(
                "sum_fresh_value"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "a_histogram_rollup_merge",
    """
    WITH daily AS (
        SELECT date_trunc('week', o_orderdate) AS week,
               o_orderdate AS day,
               cast(least(floor(o_totalprice / 25000), 19) AS INT) AS bin,
               count(*) AS n
        FROM orders GROUP BY 1, 2, 3
    ),
    weekly AS (
        SELECT week, bin, sum(n) AS n FROM daily GROUP BY 1, 2
    ),
    hb AS (
        SELECT week, bin, n,
               coalesce(sum(n) OVER (PARTITION BY week ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_before,
               sum(n) OVER (PARTITION BY week) AS total
        FROM weekly
    ),
    sel AS (
        SELECT week,
               cast(round((bin * 25000
                    + 25000.0 * (total * 0.5 - cum_before) / n) * 100,
                    0) AS BIGINT) AS est_c
        FROM hb
        WHERE cum_before < total * 0.5 AND cum_before + n >= total * 0.5
    ),
    ex AS (
        SELECT date_trunc('week', o_orderdate) AS week,
               cast(round(quantile_cont(
                        cast(round(o_totalprice * 100, 0) AS BIGINT), 0.5),
                    0) AS BIGINT) AS exact_c
        FROM orders GROUP BY 1
    )
    SELECT strftime(ex.week, '%Y-%m-%d') AS week,
           ex.exact_c / 100.0 AS exact_p50,
           sel.est_c / 100.0 AS est_p50,
           abs(ex.exact_c - sel.est_c) / 100.0 AS abs_err
    FROM ex JOIN sel USING (week) ORDER BY week
    """,
)
def a_histogram_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin HISTOGRAM rollup — the percentile sibling of
    ``a_hll_rollup_merge``: daily 20-bin histograms of order totals are
    the persisted state, the weekly grain MERGES them by bin-wise
    addition (the reaggregability contract exact percentiles
    fundamentally lack), and the weekly P50 is read off the merged
    histogram by linear interpolation inside the crossing bin. Unlike
    the HLL entry, every step is DETERMINISTIC integer/double
    arithmetic, so the differential grades the estimated VALUES
    themselves, not an error envelope — exact P50 and interpolation
    error ride alongside. At 100 TB the raw table is scanned once at
    the daily grain; every coarser rollup (week/month/all-time) moves
    only (bin, count) pairs — kilobytes per grain, the
    Druid/Pinot serving-layer percentile shape. The per-week cumsum
    window runs over ≤20 bin rows. The exact P50 interpolates over
    INTEGER CENTS: midpoints of two int64s are exactly representable
    doubles, so Spark's ``percentile`` and DuckDB's ``quantile_cont``
    agree bit-for-bit (on raw doubles their interpolation arithmetic
    differs by an ULP exactly at the .5-cent rounding boundary an
    even-count median of 2-decimal values always lands on)."""
    orders = read_table(spark, sf_dir, "orders")
    wk = F.date_trunc("week", F.col("o_orderdate"))
    bin_ = F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(19)).cast(
        "int"
    )
    daily = orders.groupBy(
        wk.alias("week"), F.col("o_orderdate").alias("day"), bin_.alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    weekly = daily.groupBy("week", "bin").agg(F.sum("n").alias("n"))
    w_all = Window.partitionBy("week")
    w_cum = (
        Window.partitionBy("week")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hb = weekly.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w_cum), F.lit(0))
    ).withColumn("total", F.sum("n").over(w_all))
    target = F.col("total") * 0.5
    est = (
        F.col("bin") * 25000
        + 25000.0 * (target - F.col("cum_before")) / F.col("n")
    )
    sel = hb.filter(
        (F.col("cum_before") < target)
        & (F.col("cum_before") + F.col("n") >= target)
    ).select("week", F.round(est * 100, 0).cast("bigint").alias("est_c"))
    exact = orders.groupBy(wk.alias("week")).agg(
        F.round(
            F.expr(
                "percentile(cast(round(o_totalprice * 100, 0) AS BIGINT), 0.5)"
            ),
            0,
        )
        .cast("bigint")
        .alias("exact_c")
    )
    # All rounding happens at SCALE 0 on identically-computed doubles
    # (integer-tie rounding agrees across engines); the dollar outputs
    # are exact-cents divisions — no scale-2 round, whose
    # string-vs-binary half-cent behavior differs between engines.
    return (
        exact.join(sel, "week")
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            (F.col("exact_c") / 100.0).alias("exact_p50"),
            (F.col("est_c") / 100.0).alias("est_p50"),
            (F.abs(F.col("exact_c") - F.col("est_c")) / 100.0).alias(
                "abs_err"
            ),
        )
        .orderBy("week")
    )


@query(
    "dq_outlier_mad",
    """
    WITH cents AS (
        SELECT c_mktsegment,
               cast(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
        FROM customer
    ),
    med AS (
        SELECT c_mktsegment, quantile_cont(bal_c, 0.5) AS med_c,
               count(*) AS n
        FROM cents GROUP BY 1
    ),
    mad AS (
        SELECT c.c_mktsegment,
               quantile_cont(cast(abs(c.bal_c - m.med_c) * 2 AS BIGINT),
                             0.5) AS mad2
        FROM cents c JOIN med m USING (c_mktsegment) GROUP BY 1
    )
    SELECT m.c_mktsegment,
           cast(m.n AS BIGINT) AS n_rows,
           round(m.med_c / 100.0, 2) AS median_bal,
           round(d.mad2 / 200.0, 2) AS mad,
           cast(sum(CASE WHEN abs(c.bal_c - m.med_c) * 2 > 7.413 * d.mad2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM cents c
    JOIN med m USING (c_mktsegment)
    JOIN mad d USING (c_mktsegment)
    GROUP BY 1, 2, 3, 4 ORDER BY 1
    """,
)
def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via MEDIAN ABSOLUTE DEVIATION — the DQ
    suite's distribution-shape leg (schema/volume/freshness/PSI cover
    the other failure modes): per segment, flag balances more than
    5 robust sigmas (5·1.4826·MAD = 7.413·MAD, the normal-consistency
    constant) from the median. Mean/stddev outlier rules break exactly
    when needed most — the outliers drag the mean; the median/MAD pair
    has a 50% breakdown point (Hampel's rule, the standard robust
    fence). Exact medians need two dependent passes (MAD is a median
    OF deviations from the median), so the plan is three lean
    aggregations over the dim with the tiny per-segment stats
    broadcast between them — the honest exact shape for a dimension
    table; a 100 TB FACT would swap in sketch quantiles
    (a_approx_sketches / a_histogram_rollup_merge) for passes 1-2.
    All medians interpolate over INTEGER CENTS (×2 for the deviation
    median, so half-cent deviations stay integral) — midpoints of
    int64s are exact doubles, the only way Spark ``percentile`` and
    DuckDB ``quantile_cont`` agree bit-for-bit at the rounding
    boundary an even-count median always lands on."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_c"),
    )
    med = cust.groupBy("c_mktsegment").agg(
        F.expr("percentile(bal_c, 0.5)").alias("med_c"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    with_med = cust.join(F.broadcast(med), "c_mktsegment")
    mad = with_med.groupBy("c_mktsegment").agg(
        F.expr(
            "percentile(cast(abs(bal_c - med_c) * 2 AS BIGINT), 0.5)"
        ).alias("mad2")
    )
    return (
        with_med.join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.round(F.max("med_c") / 100.0, 2).alias("median_bal"),
            F.round(F.max("mad2") / 200.0, 2).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("bal_c") - F.col("med_c")) * 2
                    > 7.413 * F.col("mad2")
                ).cast("long")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "dedup_exact_spans",
    f"""
    WITH {CORPUS_CTE.strip()},
    shingled AS (
        SELECT doc_id, {TOKENS_SQL} AS toks FROM corpus
    ),
    spans AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(s), 1, 15))::BIGINT
                   % {dedup.MINHASH_P} AS span_x
        FROM (
            SELECT doc_id, unnest({_grams_sql(16)}) AS s
            FROM shingled
        )
    ),
    freq AS (SELECT span_x, count(*) AS nd FROM spans GROUP BY 1)
    SELECT s.doc_id,
           count(*) AS n_spans,
           cast(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           round(cast(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_frac
    FROM spans s JOIN freq f USING (span_x)
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
)
def dedup_exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-span duplication stats (operators/dedup.py:
    span_duplication_stats — Lee et al. 2022's per-document
    duplicated-text fraction at 16-token span granularity): every
    OVERLAPPING stride-1 span is hashed, a span present in ≥2 distinct
    documents is corpus duplication, and the graded output is each
    document's duplicated-span fraction — the number the drop/trim
    decision keys on. Catches verbatim repeats at ANY alignment
    (dedup_segment_boilerplate's fixed segments miss straddling/
    shifted copies; winnowing recovers them only probabilistically
    after fingerprint selection). Spans hash to 31-bit ints before any
    shuffle; document frequency is one map-side-combined count; the
    exact-duplicate (%7) corpus copies must surface with dup_frac
    1.0."""
    return dedup.span_duplication_stats(
        corpus_with_dups(_docs(spark, sf_dir)), n=16
    ).orderBy("doc_id")


@query(
    "emb_filtered_ann_topk",
    f"""
    WITH cent AS (
        SELECT vec_id AS ccid, embedding AS cvec
        FROM embeddings WHERE vec_id >= 10 AND label = 2
        ORDER BY vec_id LIMIT 8
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec
          FROM embeddings WHERE vec_id >= 10 AND label = 2),
    q AS (SELECT vec_id AS query_id, embedding AS q_vec
          FROM embeddings WHERE vec_id < 10),
    c_cell AS (
        SELECT neighbor_id, c_vec, ccid AS cell FROM (
            SELECT c.neighbor_id, c.c_vec, cent.ccid,
                   row_number() OVER (
                       PARTITION BY c.neighbor_id
                       ORDER BY {_COS_SQL.format(a="c_vec", b="cvec")} DESC,
                                cent.ccid) AS rn
            FROM c, cent) t WHERE rn = 1
    ),
    q_cell AS (
        SELECT query_id, q_vec, ccid AS cell FROM (
            SELECT q.query_id, q.q_vec, cent.ccid,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_COS_SQL.format(a="q_vec", b="cvec")} DESC,
                                cent.ccid) AS rn
            FROM q, cent) t WHERE rn <= 2
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               {_COS_SQL.format(a="q_vec", b="c_vec")} AS cosine_sim
        FROM c_cell JOIN q_cell USING (cell)
    )
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def emb_filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED approximate nearest-neighbor — top-5 under a metadata
    predicate (label = 2), the filtered-search shape every production
    vector store exposes (Qdrant/Milvus/pgvector WHERE + ANN): the
    predicate restricts the corpus BEFORE cell assignment, so it rides
    the parquet scan as an ordinary pushed filter UNDER the IVF prune
    — pre-filtering, never the post-filter-k-until-enough loop
    (which under selective predicates returns < k or re-probes
    unboundedly). Cell assignment is per-vector (argmax-cosine to a
    fixed centroid set), so filtering first changes WHICH vectors are
    indexed, not how — the composition is exact, and the quantizer
    seeds derive from the filtered corpus in both engines. Catalyst
    does the heavy lifting: the label predicate lands in the scan's
    PushedFilters (pinned in tests/test_plans.py), the probe join
    stays a broadcast on the cell key."""
    emb = _emb(spark, sf_dir)
    return similarity.ivf_topk(
        emb.filter(F.col("vec_id") < 10),
        emb.filter((F.col("vec_id") >= 10) & (F.col("label") == 2)),
        k=5,
        n_cells=8,
        nprobe=2,
    )


@query(
    "w_gaps_islands",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    r AS (
        SELECT user_id, d,
               row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
        FROM days
    ),
    runs AS (
        SELECT user_id, d - cast(rn AS INT) AS anchor, count(*) AS run_len
        FROM r GROUP BY 1, 2
    )
    SELECT user_id,
           cast(sum(run_len) AS BIGINT) AS n_days,
           count(*) AS n_islands,
           cast(max(run_len) AS BIGINT) AS max_run
    FROM runs GROUP BY user_id ORDER BY user_id
    """,
)
def w_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — contiguous active-day runs per user (the
    classic streak/retention primitive: "longest consecutive-day
    streak", churn-gap detection): the Tabibitosan anchor trick, date
    minus per-user row_number, turns every consecutive run into one
    constant group key, so islands fall out of a plain groupBy — no
    self-join, no iterative gap chasing. Engine shape: the distinct,
    the row_number window, and both rollups all share ONE shuffle on
    user_id (Catalyst reuses the partitioning); per-user day counts
    are bounded (≤ days in the retention horizon), so the window is
    skew-safe at any user count."""
    ev = read_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    runs = (
        days.withColumn("rn", F.row_number().over(w))
        .select("user_id", F.date_sub(F.col("d"), F.col("rn")).alias("anchor"))
        .groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.sum("run_len").cast("bigint").alias("n_days"),
            F.count(F.lit(1)).alias("n_islands"),
            F.max("run_len").cast("bigint").alias("max_run"),
        )
        .orderBy("user_id")
    )


PHASH_BUCKET_CAP = 24
# 60-bit constant fingerprint for the planted boilerplate cluster (a
# default thumbnail re-encoded 40× — all copies hash identically).
PHASH_HOT = (1 << 59) | 0x5A5A5A5A5A5A5A


@query(
    "mm_phash_near_dup",
    f"""
    WITH ids AS (SELECT unnest(generate_series(0, 511)) AS media_id),
    ph0 AS (
        SELECT media_id,
               ('0x' || substr(md5(upper(repeat(md5(media_id::VARCHAR), 4))),
                               1, 15))::BIGINT AS phash
        FROM ids
    ),
    ph AS (
        SELECT media_id, phash FROM ph0
        UNION ALL
        SELECT media_id + 100000,
               xor(phash, (1::BIGINT << cast(media_id % 60 AS INT)))
        FROM ph0 WHERE media_id % 5 = 0
        UNION ALL
        SELECT 200000 + t.i, {PHASH_HOT}::BIGINT FROM range(40) t(i)
    ),
    slices AS (
        SELECT media_id, c.chunk_id,
               (phash >> (c.chunk_id * 15)) & 32767 AS chunk
        FROM ph, (VALUES (0), (1), (2), (3)) c(chunk_id)
    ),
    keep AS (
        SELECT chunk_id, chunk FROM slices
        GROUP BY chunk_id, chunk HAVING count(*) <= {PHASH_BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT l.media_id AS a, r.media_id AS b
        FROM slices l
        JOIN keep k ON l.chunk_id = k.chunk_id AND l.chunk = k.chunk
        JOIN slices r ON l.chunk_id = r.chunk_id AND l.chunk = r.chunk
        WHERE l.media_id < r.media_id
    )
    SELECT c.a, c.b,
           cast(bit_count(xor(pa.phash, pb.phash)) AS INT) AS hamming
    FROM cand c
    JOIN ph pa ON pa.media_id = c.a
    JOIN ph pb ON pb.media_id = c.b
    WHERE bit_count(xor(pa.phash, pb.phash)) <= 3
    ORDER BY a, b
    """,
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup detection — the visual half of
    corpus dedup (re-encoded/resized copies of one image share a pHash
    within a few bits while cryptographic hashes diverge completely):
    a 60-bit fingerprint per asset (md5-derived stand-in over the
    payload bytes, since real pHash needs a decoder — the banding math
    is identical for a DCT pHash), then the SHARED banded Hamming join
    (operators/dedup.py:hamming_near_dups_int, the simhash machinery
    generalized): 4×15-bit slices, pigeonhole guarantees every pair
    within 3 flips collides on a slice, exact bit_count(xor) verifies
    candidates. Fixture plants (a) single-bit-flipped copies of every
    5th asset and (b) a 40-copy boilerplate cluster sharing ONE
    constant pHash — the default-thumbnail hub that fans D² candidate
    rows onto one shuffle key at scale. The banded join runs with
    max_bucket_size=PHASH_BUCKET_CAP (< 40), so every hub slice is
    dropped before the self-join and the 780 intra-hub pairs are never
    surfaced; the oracle reproduces the slices / keep-cap / candidate /
    verify chain exactly, so the cap semantics themselves are
    hash-checked cross-engine. Only (id, int64) rows ever shuffle."""
    from glamira_end_to_end_data_pipeline_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, 512)
    ph0 = media.select(
        "media_id",
        F.conv(F.substring(F.md5(F.hex("payload")), 1, 15), 16, 10)
        .cast("long")
        .alias("phash"),
    )
    flipped = ph0.filter(F.col("media_id") % 5 == 0).select(
        (F.col("media_id") + 100000).alias("media_id"),
        F.col("phash")
        .bitwiseXOR(
            F.expr("shiftleft(cast(1 AS BIGINT), cast(media_id % 60 AS INT))")
        )
        .alias("phash"),
    )
    hot = spark.range(40).select(
        (F.col("id") + 200000).alias("media_id"),
        F.lit(PHASH_HOT).cast("long").alias("phash"),
    )
    ph = ph0.unionByName(flipped).unionByName(hot)
    return (
        dedup.hamming_near_dups_int(
            ph,
            id_col="media_id",
            hash_col="phash",
            max_hamming=3,
            chunks=4,
            max_bucket_size=PHASH_BUCKET_CAP,
        )
        .select("a", "b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("a", "b")
    )


@query(
    "mm_shard_pack",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 511)) AS media_id),
    m AS (
        SELECT media_id,
               CASE media_id % 3 WHEN 0 THEN 'image'
                                 WHEN 1 THEN 'audio'
                                 ELSE 'video' END AS modality,
               cast(media_id // 128 AS INT) AS batch,
               cast((media_id % 997) * 64 + 64 AS BIGINT) AS size_bytes
        FROM ids
    ),
    packed AS (
        SELECT *, cast(floor(coalesce(sum(size_bytes) OVER (
                   PARTITION BY modality, batch ORDER BY media_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) / 1048576.0) AS INT) AS shard_id
        FROM m
    )
    SELECT modality, batch, shard_id,
           count(*) AS n_items,
           cast(sum(size_bytes) AS BIGINT) AS shard_bytes
    FROM packed GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def mm_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard packing (operators/multimodal.py:
    pack_shards): multimodal records pack sequentially into ~1 MiB
    shards within (modality, macro-batch) groups — the layout step
    between a curated corpus and the training dataloader, where
    deterministic membership (resumable builds) and bounded shard
    size (capped read amplification per worker) are the contract.
    shard_id is the exclusive running payload size over the budget —
    a pure function of the input, zero RNG, zero task-order
    dependence. The window partitions on (modality, batch): the
    macro-batch bounds every group (WebDataset packs per input chunk
    for exactly this reason), so no 3-value modality-only hot key
    exists at any corpus size. Payload sizes are synthesized from the
    id (the 64-byte stub payload scaled) so the packing math, not the
    stub codec, is what's graded."""
    from glamira_end_to_end_data_pipeline_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, 512).select(
        "media_id",
        "modality",
        (F.col("media_id") / 128).cast("int").alias("batch"),
        ((F.col("media_id") % 997) * 64 + F.length("payload"))
        .cast("long")
        .alias("size_bytes"),
    )
    packed = mm.pack_shards(
        media,
        size_col="size_bytes",
        budget=1 << 20,
        group_cols=["modality", "batch"],
        order_col="media_id",
    )
    return (
        packed.groupBy("modality", "batch", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("size_bytes").cast("bigint").alias("shard_bytes"),
        )
        .orderBy("modality", "batch", "shard_id")
    )


# Two components processed in parallel rounds: cycles bridged 3->10
# (condensation ordering: 10's SCC resolves only after 0's leaves),
# and a separate chain with an embedded 2-cycle (singletons 20/22,
# SCC {21,23}). Outer rounds assign ALL current roots at once, so the
# flat condensation keeps the round count at 3 — the fixture stresses
# multi-node SCCs, singletons, and DAG ordering without paying one
# driver-loop round per component.
_SCC_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),      # 4-cycle  -> SCC {0,1,2,3}
    (10, 11), (11, 12), (12, 10),        # 3-cycle  -> SCC {10,11,12}
    (3, 10),                             # bridge (condensation DAG)
    (20, 21), (21, 22),                  # chain    -> singletons 20, 22
    (21, 23), (23, 21),                  # 2-cycle  -> SCC {21,23}
] + [
    # long trivial chain off the 4-cycle: 13 singleton SCCs that the
    # TRIM pre-pass must peel through the cheap path (pre-trim, the
    # coloring loop assigned ONE chain node per expensive outer round)
    (3, 30), *[(30 + i, 31 + i) for i in range(12)],
]

_SCC_EDGES_SQL = ", ".join(f"({u}, {v})" for u, v in _SCC_EDGES)


@query(
    "graph_scc_exact",
    f"""
    WITH RECURSIVE edges(u, v) AS (
        SELECT * FROM (VALUES {_SCC_EDGES_SQL}) t(u, v)
    ),
    reach(s, t) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.s, e.v FROM reach r JOIN edges e ON r.t = e.u
    ),
    nodes AS (
        SELECT u AS node FROM edges UNION SELECT v FROM edges
    ),
    mutual AS (
        SELECT a.s AS node, a.t AS peer
        FROM reach a JOIN reach b ON a.s = b.t AND a.t = b.s
    )
    SELECT cast(n.node AS BIGINT) AS node,
           cast(least(n.node, coalesce(min(m.peer), n.node)) AS BIGINT)
               AS scc_id
    FROM nodes n LEFT JOIN mutual m ON m.node = n.node
    GROUP BY n.node ORDER BY node
    """,
)
def graph_scc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components to the fixed point
    (operators/graph.py:scc_exact — the coloring / forward-backward
    algorithm, the BSP-parallel SCC family since Tarjan's stack cannot
    distribute): forward min-coloring converges on a one-row Σlabel
    aggregate (labels only decrease), the backward sweep flags each
    color root's component along class-internal edges only (sound AND
    complete — a smaller-colored intermediate would have recolored
    the class), and every outer round assigns at least each root, so
    rounds are bounded by the SCC count. Fixture: two directed cycles
    bridged through a chain with an embedded 2-cycle — exercising
    multi-node SCCs, singletons, and the condensation DAG ordering in
    one graph. The oracle is the ground-truth definition itself:
    DuckDB's recursive transitive closure, mutual reachability, min
    peer id."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import scc_exact

    edges = spark.createDataFrame(_SCC_EDGES, "u long, v long")
    # Probe-schedule seeds from the fixture's KNOWN depths (overshoot
    # is a no-op): the 13-node trivial chain trims in ~14 peel steps,
    # the post-trim coloring diameter is ~6, the backward flag wave ~4.
    return scc_exact(
        edges, trim_batch0=8, fwd_batch0=8, bwd_batch0=4
    ).orderBy("node")


@query(
    "a_decimal_money_sum",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           sum(cast(o_totalprice AS DECIMAL(18, 2))) AS total_price,
           max(cast(o_totalprice AS DECIMAL(18, 2))) AS max_price
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def a_decimal_money_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money aggregation — the ledger-grade arithmetic
    surface a warehouse cannot fake with doubles (a float sum of 100 M
    prices drifts in the cents; a DECIMAL(18,2) sum is exact or it
    overflows loudly): totals cast to decimal AT THE SCAN and summed
    under Spark's decimal aggregation (Tungsten's unscaled-long fast
    path while the values fit, widening precision per SQL rules).
    Engine-exact by definition — no rounding, no ULP envelope, the
    hash compare is on exact decimal values in both engines."""
    orders = read_table(spark, sf_dir, "orders")
    money = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money).alias("total_price"),
            F.max(money).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )
