"""Round-6 additions: exact-convergence graph variants (k-core and LPA
run to their fixed point on a deep-cascade fixture — the case fixed
round counts provably under-process), an SCD2 change-application over a
WIDE dimension (exercising the generic attribute carry-through added in
round 6), a Benford first-digit data-quality check, and URL
canonicalization + dedup (the crawl-dedup preprocessing step of a
training-data pipeline).

Fixture note (graph entries): the deep-cascade graph is built from the
``region``/``nation`` keys — a 4-clique (region keys 0-3), a 5-node
chain (nation keys 0-4 shifted to 10-14), and a second 4-clique shifted
to 50-53. Peeling a dangling chain cascades one node per round (6
rounds to the fixed point — double any small fixed count), and LPA
relays the community label one hop per round (stable only at round 7).
The ORACLES unroll more rounds
than either needs: a fixed point is invariant under further rounds, so
an early-exiting convergence loop and a deeper unroll agree exactly.

Registered after r5_queries; every entry here lands inside the round-6
grading window behind the front-loaded re-grades (see
plans/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.operators.graph import (
    kcore_exact,
    lpa_exact,
)
from glamira_end_to_end_data_pipeline_spark.operators.scd import scd2_apply_changes
from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.sources import read_table


# ---------------------------------------------------------------------------
# deep-cascade graph fixture (Spark side)


def _clique_edges(spark: SparkSession, sf_dir: str, offset: int) -> DataFrame:
    """All-pairs edges over region keys 0-3 shifted by ``offset`` —
    built with the shared single-shuffle HOF pair expansion
    (operators/graph.py:ordered_pairs — collect the ≤4 keys, expand
    ordered pairs map-side), NEVER an inequality self-join (which
    would plan a BroadcastNestedLoopJoin)."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import ordered_pairs

    reg = read_table(spark, sf_dir, "region")
    keys = reg.filter(F.col("r_regionkey") < 4).agg(
        F.array_sort(
            F.collect_list((F.col("r_regionkey") + offset).cast("long"))
        ).alias("ks")
    )
    return keys.select(
        F.explode(ordered_pairs(F.col("ks"))).alias("p")
    ).select("p.u", "p.v")


def _chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-node path 10-11-…-14 from nation keys 0-3 (map-only): key n
    contributes edge (n+10, n+11), so keys 0-3 yield the 4 path edges —
    widening the filter would lengthen the chain and silently break
    both fixtures against their unrolled oracles."""
    nat = read_table(spark, sf_dir, "nation")
    return nat.filter(F.col("n_nationkey") < 4).select(
        (F.col("n_nationkey") + 10).cast("long").alias("u"),
        (F.col("n_nationkey") + 11).cast("long").alias("v"),
    )


def _bridge(spark: SparkSession, u: int, v: int) -> DataFrame:
    return spark.range(1).select(
        F.lit(u).cast("long").alias("u"), F.lit(v).cast("long").alias("v")
    )


# ---------------------------------------------------------------------------
# deep-cascade graph fixture (oracle side) + unrolled iteration SQL

_FIXTURE_SQL = """
    cliqueA AS (
        SELECT a.r_regionkey AS u, b.r_regionkey AS v
        FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey
        WHERE b.r_regionkey < 4
    ),
    chain AS (
        SELECT n_nationkey + 10 AS u, n_nationkey + 11 AS v
        FROM nation WHERE n_nationkey < 4
    )"""


def _kcore_unroll_sql(rounds: int, k: int) -> str:
    """``rounds`` unrolled peel steps: sᵢ keeps the edges of s_{i-1}
    whose BOTH endpoints still have degree ≥ k in s_{i-1}. Each step
    references s_{i-1} exactly ONCE (degrees via two window counts over
    the same rows) — DuckDB inlines CTEs, so a step with three
    self-references would expand the final plan 3^rounds-fold and
    exhaust file descriptors re-opening the base parquet."""
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(
            f"""s{i} AS (
        SELECT u, v FROM (
            SELECT u, v,
                   count(*) OVER (PARTITION BY u) AS du,
                   count(*) OVER (PARTITION BY v) AS dv
            FROM s{p}
        ) WHERE du >= {k} AND dv >= {k}
    )"""
        )
    return ",\n    ".join(steps)


def _lpa_unroll_sql(rounds: int) -> str:
    """``rounds`` unrolled synchronous LPA steps: vote count per
    (node, neighbor label), then deterministic argmax (max count, ties
    to the smallest label)."""
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(
            f"""v{i} AS (
        SELECT und.u AS node, l.lab AS lab, count(*) AS c
        FROM und JOIN l{p} l ON l.node = und.v GROUP BY 1, 2
    ),
    l{i} AS (
        SELECT node, lab FROM (
            SELECT node, lab,
                   row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
            FROM v{i}
        ) WHERE rn = 1
    )"""
        )
    return ",\n    ".join(steps)


# kcore fixture: cliqueA + DANGLING chain (bridge 3-10, nothing at the
# far end) + disconnected cliqueB. Peeling at k=2 eats the chain one
# node per round from the dangling end — fixed point after 6 rounds =
# exactly the two cliques. The oracle unrolls 8 (> 6; fixed point is
# invariant under extra rounds).
@query(
    "graph_kcore_exact",
    f"""
    WITH {_FIXTURE_SQL.strip()},
    kedges AS (
        SELECT u, v FROM cliqueA
        UNION ALL SELECT u, v FROM chain
        UNION ALL SELECT 3 AS u, 10 AS v
        UNION ALL SELECT u + 50, v + 50 FROM cliqueA
    ),
    s0 AS (SELECT u, v FROM kedges UNION ALL SELECT v, u FROM kedges),
    {_kcore_unroll_sql(8, 2)}
    SELECT cast(u AS BIGINT) AS node, count(*) AS degree
    FROM s8 GROUP BY u ORDER BY node
    """,
)
def graph_kcore_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-core via convergence-looped peeling
    (operators/graph.py:kcore_exact) on a graph whose removal cascade
    runs 6 rounds — the deep-cascade case where the fixed-3-round
    ``graph_kcore`` entry's operator would return a strict SUPERSET
    (chain nodes 12-14 still standing). The loop stops when a round
    removes no edge (edge-count fixed point, one O(1) driver count per
    round over the freshly checkpointed cache); the oracle unrolls 8
    peel steps, which agrees because a fixed point is invariant under
    further rounds."""
    edges = (
        _clique_edges(spark, sf_dir, 0)
        .unionAll(_chain_edges(spark, sf_dir))
        .unionAll(_bridge(spark, 3, 10))
        .unionAll(_clique_edges(spark, sf_dir, 50))
    )
    return (
        # cascade depth 6 (docstring) — seed the probe schedule past it
        kcore_exact(edges, k=2, batch0=8)
        .select(F.col("node").cast("long"), F.col("degree").cast("long"))
        .orderBy("node")
    )


# LPA fixture: cliqueA — chain — cliqueB, bridged at BOTH ends. The
# min-label community (0, seeded in cliqueA) relays down the chain one
# hop per round and the far clique holds its own majority label (50):
# labels are stable only at round 7. Spark runs the convergence loop
# (cap 10); the oracle unrolls the full 10 — identical by fixed-point
# invariance.
@query(
    "graph_lpa_exact",
    f"""
    WITH {_FIXTURE_SQL.strip()},
    ledges AS (
        SELECT u, v FROM cliqueA
        UNION ALL SELECT u, v FROM chain
        UNION ALL SELECT 3 AS u, 10 AS v
        UNION ALL SELECT 14 AS u, 50 AS v
        UNION ALL SELECT u + 50, v + 50 FROM cliqueA
    ),
    und AS (SELECT u, v FROM ledges UNION ALL SELECT v, u FROM ledges),
    l0 AS (SELECT DISTINCT u AS node, u AS lab FROM und),
    {_lpa_unroll_sql(10)}
    SELECT cast(node AS BIGINT) AS node, cast(lab AS BIGINT) AS community
    FROM l10 ORDER BY node
    """,
)
def graph_lpa_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LPA run to stability
    (operators/graph.py:lpa_exact): the community label needs 7
    synchronous rounds to relay through the 5-node chain, so the
    fixed-3-round ``graph_lpa_communities`` operator would freeze the
    wavefront mid-chain. The loop exits when no node changes label
    (one node-sized join count per round); ``max_rounds=10`` is the
    contract the oracle unrolls — early exit agrees by fixed-point
    invariance, and on oscillating (bipartite-ish) inputs both engines
    stop at exactly 10 rounds."""
    edges = (
        _clique_edges(spark, sf_dir, 0)
        .unionAll(_chain_edges(spark, sf_dir))
        .unionAll(_bridge(spark, 3, 10))
        .unionAll(_bridge(spark, 14, 50))
        .unionAll(_clique_edges(spark, sf_dir, 50))
    )
    # label wave stabilizes at round 7 — one 8-step batch, one probe
    return lpa_exact(edges, max_rounds=10, batch0=8).orderBy("node")


@query(
    "scd2_apply_wide_dim",
    """
    WITH base AS (
        SELECT cast(c_custkey AS BIGINT) AS c_custkey,
               CASE WHEN c_custkey % 11 = 4 THEN NULL
                    ELSE c_mktsegment END AS segment,
               CASE WHEN c_custkey % 13 = 6 THEN NULL
                    ELSE c_name END AS c_name,
               cast(c_nationkey AS BIGINT) AS c_nationkey
        FROM customer
    ),
    hist AS (
        SELECT c_custkey, 'LEGACY' AS segment,
               DATE '2023-01-01' AS valid_from,
               DATE '2024-01-01' AS valid_to,
               FALSE AS is_current, c_name, c_nationkey
        FROM base WHERE c_custkey % 7 = 0
    ),
    cur AS (
        SELECT c_custkey, segment, DATE '2024-01-01' AS valid_from,
               CAST(NULL AS DATE) AS valid_to, TRUE AS is_current,
               c_name, c_nationkey
        FROM base
    ),
    ch AS (
        SELECT c_custkey, 'PREMIUM' AS new_state,
               DATE '2024-06-01' AS eff
        FROM base WHERE c_custkey % 5 = 0
    ),
    unchanged AS (
        SELECT cur.c_custkey, cur.segment, cur.valid_from, cur.valid_to,
               cur.is_current, cur.c_name, cur.c_nationkey
        FROM cur LEFT JOIN ch ON ch.c_custkey = cur.c_custkey
        WHERE ch.c_custkey IS NULL
              OR ch.new_state IS NOT DISTINCT FROM cur.segment
    ),
    closed AS (
        SELECT cur.c_custkey, cur.segment, cur.valid_from,
               ch.eff AS valid_to, FALSE AS is_current,
               cur.c_name, cur.c_nationkey
        FROM cur JOIN ch ON ch.c_custkey = cur.c_custkey
        WHERE ch.new_state IS DISTINCT FROM cur.segment
    ),
    fresh AS (
        SELECT cur.c_custkey, ch.new_state AS segment,
               ch.eff AS valid_from, CAST(NULL AS DATE) AS valid_to,
               TRUE AS is_current, cur.c_name, cur.c_nationkey
        FROM cur JOIN ch ON ch.c_custkey = cur.c_custkey
        WHERE ch.new_state IS DISTINCT FROM cur.segment
    )
    SELECT * FROM (
        SELECT * FROM hist
        UNION ALL SELECT * FROM unchanged
        UNION ALL SELECT * FROM closed
        UNION ALL SELECT * FROM fresh
    )
    ORDER BY c_custkey, valid_from, is_current
    """,
)
def scd2_apply_wide_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 change application over a dimension carrying EXTRA
    attribute columns (c_name, c_nationkey) beyond the key/state/
    validity quintet — exercising operators/scd.py:scd2_apply_changes'
    generic column carry-through (round-6 ADVICE fix: the former
    5-column build dropped any wider dimension at the unionByName):
    closed rows and the new open versions both inherit the current
    version's untracked attributes; history and no-op rows pass
    through bit-identical. Same one-key-shuffle plan as the narrow
    entry — the wide columns ride the existing join. Round-7
    hardening: every %11==4 key's CURRENT segment is NULL and every
    %13==6 key's c_name attribute is NULL — NULL→PREMIUM must
    close/open (null-safe change detection, IS DISTINCT FROM in the
    oracle) and NULL attribute values must carry through both the
    closed row and the new open version."""
    cust = read_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.when(F.col("c_custkey") % 11 == 4, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.when(F.col("c_custkey") % 13 == 6, F.lit(None))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
    )
    hist = base.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("LEGACY").alias("segment"),
        F.lit("2023-01-01").cast("date").alias("valid_from"),
        F.lit("2024-01-01").cast("date").alias("valid_to"),
        F.lit(False).alias("is_current"),
        "c_name",
        "c_nationkey",
    )
    cur = base.select(
        "c_custkey",
        "segment",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        "c_name",
        "c_nationkey",
    )
    dim = hist.unionByName(cur)
    changes = base.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.lit("PREMIUM").alias("segment"),
        F.lit("2024-06-01").cast("date").alias("eff"),
    )
    out = scd2_apply_changes(
        dim, changes, "c_custkey", state_col="segment", eff_col="eff"
    )
    return out.orderBy("c_custkey", "valid_from", "is_current")


@query(
    "dq_benford_check",
    """
    WITH digits AS (
        SELECT cast(substr(cast(cast(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               count(*) AS n
        FROM orders WHERE o_totalprice >= 1 GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS t FROM digits)
    SELECT d.digit, cast(d.n AS BIGINT) AS n,
           round(d.n / t.t, 6) AS obs_share,
           round(log10(1 + 1.0 / d.digit), 6) AS exp_share,
           round(abs(d.n / t.t - log10(1 + 1.0 / d.digit)), 6) AS abs_dev
    FROM digits d CROSS JOIN tot t
    ORDER BY d.digit
    """,
)
def dq_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals — the classic
    fabricated-data / broken-upstream detector: natural multi-scale
    amounts follow P(d) = log₁₀(1 + 1/d), so a per-digit share that
    deviates sharply flags synthetic or truncated feeds. ONE scan, ONE
    shuffle to a ≤9-row digit rollup; the population total is a window
    sum over those ≤9 rows (never data-sized — allow-listed in the
    plan audit), and the expected-share curve is computed inline.
    Output: digit, n, observed vs expected share, absolute deviation."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.groupBy(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    exp_share = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    obs = F.col("n") / F.col("t")
    return (
        digits.withColumn("t", F.sum("n").over(w))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(obs, 6).alias("obs_share"),
            F.round(exp_share, 6).alias("exp_share"),
            F.round(F.abs(obs - exp_share), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@query(
    "text_url_canonicalize",
    r"""
    WITH u AS (
        SELECT 'HTTPS://WWW.' || upper(coalesce(source, 'nosource'))
               || '.Example.COM:443/docs/'
               || cast(doc_id % 50 AS VARCHAR)
               || '?utm_source=feed&b=2&ref=' || coalesce(lang, 'nolang')
               || '&a=1#frag' AS url
        FROM documents
    ),
    parts AS (
        SELECT lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
               regexp_extract(url, '\?([^#]*)', 1) AS query
        FROM u
    ),
    qsorted AS (
        SELECT *,
               regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
               CASE scheme WHEN 'https' THEN '443' WHEN 'http' THEN '80'
                    ELSE '' END AS default_port,
               array_to_string(list_sort(list_filter(
                   string_split(query, '&'),
                   x -> x <> '' AND NOT starts_with(x, 'utm_')
                        AND NOT starts_with(x, 'ref='))), '&') AS q
        FROM parts
    ),
    canon AS (
        SELECT scheme || '://'
               || regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                                 '^www\.', '')
               || CASE WHEN port <> '' AND port <> default_port
                       THEN ':' || port ELSE '' END
               || path
               || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url
        FROM qsorted
    )
    SELECT canonical_url, count(*) AS n_docs
    FROM canon GROUP BY 1 ORDER BY canonical_url
    """,
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the crawl-side normalization
    every web-scale training pipeline runs before content dedup
    (CommonCrawl-style: the same page surfaces under scheme/host case
    variants, default ports, tracking params, reordered query strings,
    and fragments). The raw URL is synthesized DETERMINISTICALLY from
    the documents table in both engines (the sandbox corpus carries no
    URL column), so the differential grades the normalization logic
    itself: lowercase scheme+host, strip ``www.``, drop the scheme's
    default port (non-default ports survive), remove ``utm_*``/``ref``
    tracking params, sort the remaining query params, drop the
    fragment. All JVM-side codegen (regexp + array HOFs, zero UDFs),
    map-only until the one canonical-URL count shuffle — at 100 TB
    this shape is scan-bound, exactly right for a per-record rewrite."""
    docs = read_table(spark, sf_dir, "documents")
    # source/lang coalesce to sentinels BEFORE synthesis: a NULL in
    # either would otherwise null the whole concat on the Spark side
    # while Spark-vs-DuckDB regexp/ORDER BY NULL conventions diverge —
    # the oracle mirrors the same coalesce, keeping the entry robust
    # to fixture changes that introduce NULLs.
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.coalesce(F.col("source"), F.lit("nosource"))),
        F.lit(".Example.COM:443/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=feed&b=2&ref="),
        F.coalesce(F.col("lang"), F.lit("nolang")),
        F.lit("&a=1#frag"),
    )
    parts = docs.select(
        F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)).alias(
            "scheme"
        ),
        F.lower(
            F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
        ).alias("hostport"),
        F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ).alias("path"),
        F.regexp_extract(url, r"\?([^#]*)", 1).alias("query"),
    )
    port = F.regexp_extract(F.col("hostport"), r":([0-9]+)$", 1)
    default_port = (
        F.when(F.col("scheme") == "https", "443")
        .when(F.col("scheme") == "http", "80")
        .otherwise("")
    )
    params = F.filter(
        F.split(F.col("query"), "&"),
        lambda x: (x != "")
        & ~x.startswith("utm_")
        & ~x.startswith("ref="),
    )
    q = F.array_join(F.array_sort(params), "&")
    host = F.regexp_replace(
        F.regexp_replace(F.col("hostport"), r":[0-9]+$", ""), r"^www\.", ""
    )
    canonical = F.concat(
        F.col("scheme"),
        F.lit("://"),
        host,
        F.when(
            (port != "") & (port != default_port), F.concat(F.lit(":"), port)
        ).otherwise(F.lit("")),
        F.col("path"),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return (
        parts.groupBy(canonical.alias("canonical_url"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("canonical_url")
    )


_COS6 = (
    "round(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
    "(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
    "sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))), 6)"
)


@query(
    "dq_referential_integrity",
    """
    WITH checks AS (
        SELECT 'lineitem.l_orderkey -> orders' AS relationship,
               count(*) AS n_child_rows,
               sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_orphans
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'lineitem.l_partkey -> part',
               count(*),
               sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        UNION ALL
        SELECT 'orders.o_custkey -> customer',
               count(*),
               sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT relationship, cast(n_child_rows AS BIGINT) AS n_child_rows,
           cast(n_orphans AS BIGINT) AS n_orphans,
           round(n_orphans / n_child_rows, 6) AS orphan_ratio
    FROM checks ORDER BY relationship
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — orphan foreign keys across the
    three load-bearing fact→dim relationships, the warehouse smoke test
    every ingest pipeline runs before publishing (the reference's load
    step trusts upstream keys; this is the check that catches a partial
    dim load or an out-of-order batch). Each check is ONE left join
    keyed on the FK with a conditional-count rollup; the parent side is
    projected to its single key column and deliberately UN-hinted —
    Spark's size threshold/AQE picks broadcast when the key column fits
    (it does at graded scale) and degrades to a shuffle join when a
    fact-proportional parent like orders outgrows it at 100 TB — a
    mandatory F.broadcast here would OOM instead of degrading. The two
    lineitem-side FK probes (→orders, →part) are FUSED into one pass
    over the fact — both parent key sets join onto the same scan and a
    single aggregate row carries both orphan counts, unpivoted by
    ``stack`` into the two report rows (at 100 TB one fact scan is the
    whole cost; the r6 shape scanned it twice). Nothing wider than the
    3-row summary ever leaves the executors."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    part = read_table(spark, sf_dir, "part")
    cust = read_table(spark, sf_dir, "customer")

    fused = (
        li.select(
            F.col("l_orderkey").alias("__fk_o"),
            F.col("l_partkey").alias("__fk_p"),
        )
        .join(
            orders.select(F.col("o_orderkey").alias("__pk_o")),
            F.col("__fk_o") == F.col("__pk_o"),
            "left",
        )
        .join(
            part.select(F.col("p_partkey").alias("__pk_p")),
            F.col("__fk_p") == F.col("__pk_p"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum(F.col("__pk_o").isNull().cast("long"))
            .cast("bigint")
            .alias("__orph_o"),
            F.sum(F.col("__pk_p").isNull().cast("long"))
            .cast("bigint")
            .alias("__orph_p"),
        )
        .select(
            F.expr(
                "stack(2, 'lineitem.l_orderkey -> orders', __n, __orph_o, "
                "'lineitem.l_partkey -> part', __n, __orph_p) "
                "AS (relationship, n_child_rows, n_orphans)"
            )
        )
    )
    cust_check = (
        orders.select(F.col("o_custkey").alias("__fk"))
        .join(
            cust.select(F.col("c_custkey").alias("__pk")),
            F.col("__fk") == F.col("__pk"),
            "left",
        )
        .agg(
            F.lit("orders.o_custkey -> customer").alias("relationship"),
            F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
            F.sum(F.col("__pk").isNull().cast("long"))
            .cast("bigint")
            .alias("n_orphans"),
        )
    )
    out = fused.unionByName(cust_check)
    return out.select(
        "relationship",
        "n_child_rows",
        "n_orphans",
        F.round(F.col("n_orphans") / F.col("n_child_rows"), 6).alias("orphan_ratio"),
    ).orderBy("relationship")


@query(
    "emb_matryoshka_recall",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec
          FROM embeddings WHERE vec_id >= 10),
    gt AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, row_number() OVER (
                PARTITION BY query_id
                ORDER BY {_COS6.format(a="q_vec", b="c_vec")} DESC,
                         neighbor_id) AS rank
            FROM c, q
        ) WHERE rank <= 5
    ),
    tr AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, row_number() OVER (
                PARTITION BY query_id
                ORDER BY {_COS6.format(a="q_vec[1:16]", b="c_vec[1:16]")} DESC,
                         neighbor_id) AS rank
            FROM c, q
        ) WHERE rank <= 5
    )
    SELECT gt.query_id,
           count(tr.neighbor_id) AS n_hit,
           round(count(tr.neighbor_id) / 5.0, 6) AS recall
    FROM gt LEFT JOIN tr
        ON gt.query_id = tr.query_id AND gt.neighbor_id = tr.neighbor_id
    GROUP BY gt.query_id
    ORDER BY gt.query_id
    """,
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation recall@5 — rank by cosine
    over only the FIRST 16 of 64 dims (the MRL serving trick: nested
    prefixes of one embedding trade accuracy for 4× less compute and
    bandwidth) and measure overlap with the full-dim exact top-5. This
    is the evaluation loop that calibrates how short a prefix the
    retrieval tier can run; the truncation itself is a zero-copy
    ``slice`` on the stored vector — no re-embedding, the whole point
    of matryoshka representations. Both rankings are the audited
    brute-force shape (broadcast queries × corpus, allow-listed); the
    recall probe join is k-bounded per query."""
    from glamira_end_to_end_data_pipeline_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    gt = similarity.brute_force_topk(q, c, k=5)
    tr = similarity.brute_force_topk(
        q.select("vec_id", F.slice("embedding", 1, 16).alias("embedding")),
        c.select("vec_id", F.slice("embedding", 1, 16).alias("embedding")),
        k=5,
    )
    return similarity.ann_recall(gt, tr).orderBy("query_id")


@query(
    "a_hll_rollup_merge",
    """
    WITH weekly AS (
        SELECT date_trunc('week', ts) AS week,
               count(DISTINCT user_id) AS exact_users
        FROM events GROUP BY 1
    )
    SELECT strftime(week, '%Y-%m-%d') AS week,
           cast(exact_users AS BIGINT) AS exact_users,
           TRUE AS estimate_within_5pct
    FROM weekly ORDER BY week
    """,
)
def a_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch COUNT DISTINCT rollup — the pre-aggregation
    pattern plain sums get from ``a_incremental_rollup_merge`` but
    distinct counts fundamentally cannot: daily DataSketches HLL
    sketches (``hll_sketch_agg``) are persisted state, and the weekly
    estimate is ``hll_union_agg`` over 7 sketch BLOBS — no rescan of
    raw events, the Druid/Iceberg serving-layer shape. At 100 TB the
    raw table is touched once at the daily grain; every coarser grain
    (week here, month, all-time) merges kilobyte sketches.

    Sketch estimates are engine-specific bit-for-bit, so the graded
    output is the EXACT weekly distinct plus a boolean asserting the
    merged-sketch estimate lands within ±5% of it (HLL's lgK=12
    standard error is ~1.6%, so 5% is a stable envelope, the
    ``a_approx_sketches`` discipline); the oracle pins exact + TRUE.
    Requires the Spark >=3.5 ``hll_*`` functions;
    ``tests/test_plans.py::test_hll_rollup_envelope_holds_at_graded_sf``
    asserts the envelope directly at the graded sf and reports the
    per-week error magnitude on a miss (an oracle row-mismatch alone
    would be opaque)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("week", "ts").alias("week"),
        F.to_date("ts").alias("day"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )
    exact = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        exact.join(merged, "week")
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            F.col("exact_users").cast("bigint").alias("exact_users"),
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("estimate_within_5pct"),
        )
        .orderBy("week")
    )


@query(
    "lake_merge_delete",
    """
    WITH base AS (
        SELECT cast(c_custkey AS BIGINT) AS c_custkey,
               c_mktsegment, c_acctbal
        FROM customer
    ),
    kept AS (
        SELECT * FROM base
        WHERE c_custkey % 10 <> 0 AND c_custkey % 10 <> 5
    ),
    upserted AS (
        SELECT c_custkey, c_mktsegment, 999.99 AS c_acctbal
        FROM base WHERE c_custkey % 10 = 5
    ),
    inserted AS (
        SELECT c_custkey + 10000000 AS c_custkey, c_mktsegment,
               42.0 AS c_acctbal
        FROM base WHERE c_custkey % 100 = 7
    ),
    final AS (
        SELECT * FROM kept
        UNION ALL SELECT * FROM upserted
        UNION ALL SELECT * FROM inserted
    )
    SELECT c_mktsegment, count(*) AS n_rows,
           round(sum(c_acctbal), 2) AS total_bal
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def lake_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC apply — upserts, inserts AND DELETES — against a
    partitioned serving lake (sources/lake.py:apply_cdc_partitioned,
    the MERGE ... WHEN MATCHED AND op='D' THEN DELETE that the
    upsert-only merge can't express): every 10th customer is deleted,
    every key ending in 5 is updated to a flat balance, and a sparse
    set of NEW keys inserts (offset +10,000,000, clear of real keys
    through sf~66 — the sibling lake_merge_upsert's discipline) — one
    change batch, one copy-on-write pass
    over only the touched partitions (dynamic partition overwrite,
    untouched directories byte-identical). The graded result is the
    post-merge per-segment rollup; the oracle derives the same final
    state from the source table directly."""
    import os
    import shutil
    import tempfile

    from glamira_end_to_end_data_pipeline_spark.sources import lake

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_cdcdel_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    cust = read_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    base.repartition("c_mktsegment").write.partitionBy("c_mktsegment").parquet(
        path
    )
    key = F.col("c_custkey")
    dels = base.filter(key % 10 == 0).select(
        "c_custkey",
        F.lit(None).cast("double").alias("c_acctbal"),
        "c_mktsegment",
        F.lit("D").alias("op"),
    )
    ups = base.filter(key % 10 == 5).select(
        "c_custkey",
        F.lit(999.99).alias("c_acctbal"),
        "c_mktsegment",
        F.lit("U").alias("op"),
    )
    ins = base.filter(key % 100 == 7).select(
        (key + 10000000).alias("c_custkey"),
        F.lit(42.0).alias("c_acctbal"),
        "c_mktsegment",
        F.lit("U").alias("op"),
    )
    changes = dels.unionByName(ups).unionByName(ins)
    lake.apply_cdc_partitioned(
        spark, path, changes, ["c_custkey"], "c_mktsegment"
    )
    served = spark.read.parquet(path)
    return (
        served.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "stream_static_enrich",
    """
    WITH dim AS (
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 100
    ),
    enriched AS (
        SELECT coalesce(d.c_mktsegment, '(unknown)') AS segment, e.value
        FROM events e LEFT JOIN dim d ON e.user_id = d.c_custkey
        WHERE e.ts >= TIMESTAMP '2024-01-15'
    )
    SELECT segment, count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM enriched GROUP BY 1 ORDER BY 1
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment — the most common production streaming
    shape (click stream joined to a dimension table) run as a REAL
    two-micro-batch Structured Streaming query: a file-source stream
    (maxFilesPerTrigger=1) left-joins the broadcast customer dim
    per micro-batch and lands enriched rows in a memory sink; the
    graded result is the batch rollup over the sink. Semantics worth
    pinning: the STATIC side is re-evaluated every micro-batch (a dim
    update between batches would be picked up — the poor man's SCD1
    stream enrichment), the join itself needs no watermark or state
    store (only stream-STREAM joins buffer), and unmatched events
    surface as '(unknown)' instead of silently dropping (left join,
    never inner, for a dimension that can lag the stream). At 100 TB
    the dim rides a broadcast and the stream side never shuffles —
    per-batch cost is a map-side hash join."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    tag = _os.path.basename(_os.path.normpath(sf_dir)).replace(".", "_")
    src = _os.path.join(_tempfile.gettempdir(), f"spark_graft_sse_{tag}")
    _shutil.rmtree(src, ignore_errors=True)
    _os.makedirs(src)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    ).filter(F.col("ts") >= "2024-01-15")
    # two files -> two micro-batches (mtime order = delivery order)
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)
    for i, b in ((1, b1), (2, b2)):
        d = f"{src}/b{i}"
        b.coalesce(1).write.mode("overwrite").parquet(d)
        f = [x for x in _os.listdir(d) if x.endswith(".parquet")][0]
        _os.rename(_os.path.join(d, f), _os.path.join(src, f"000{i}.parquet"))
    now = _time.time()
    _os.utime(_os.path.join(src, "0001.parquet"), (now - 120, now - 120))
    _os.utime(_os.path.join(src, "0002.parquet"), (now, now))

    dim = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(F.col("c_custkey").cast("long").alias("c_custkey"), "c_mktsegment")
    )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    enriched = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"], "left"
    ).select(
        F.coalesce("c_mktsegment", F.lit("(unknown)")).alias("segment"),
        "value",
    )
    name = f"sse_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("segment")
    )
