"""Round-8 additions — the data-mixing / sketch / LM-filter block of
the LLM-pipeline surface plus a BFS entry exercising the round's new
adaptive-doubling iteration machinery:

- ``sample_mix_stratified`` — deterministic per-source rate sampling
  (the DoReMi/Pile-style mixture reweighting step): keep decisions are
  integer hash thresholds, so the mix is a pure function of the data
  (resumable, engine-portable, no RNG).
- ``a_kmv_distinct_merge`` — K-minimum-values distinct sketches built
  at the daily grain and MERGED to weekly (the third mergeable-sketch
  family after HLL and fixed-bin histograms; KMV merge = k smallest of
  the union, so re-aggregation never rescans raw data).
- ``text_bigram_lm_score`` — add-one-smoothed bigram LM trained on the
  corpus scoring probe documents by mean log-likelihood (the
  KenLM/CCNet perplexity-filter shape).
- ``graph_bfs_distances`` — multi-source BFS hop distances to the
  fixed point on the doubling probe schedule (operators/graph.py).
- ``text_seq_pack_split`` — GPT-style sequence packing where documents
  CONCATENATE within a pack group and SPLIT across fixed token
  windows (the sample-packing step between dedup and tokenization);
  all-integer window math, bit-exact cross-engine.

Registered after r7_queries; every entry lands inside the round-8
grading window behind the front-loaded changed-code re-grades (see
plans/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.plans.northstar_queries import (
    TOKENS_SQL,
    _docs,
    _grams_sql,
)
from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.sources import read_table


def _hash_mod(col, mod: int):
    """Portable integer hash bucket: first 15 md5 hex chars (60 bits,
    exact in a long) mod ``mod`` — the shingle_to_int discipline.
    DuckDB twin: ``('0x'||substr(md5(x::VARCHAR),1,15))::BIGINT % m``."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
        % mod
    )


@query(
    "sample_mix_stratified",
    """
    WITH rated AS (
        SELECT source, n_chars,
               25 * (cast(substr(source, 4) AS INT) % 4 + 1) AS rate_pct,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100
                   AS bucket
        FROM documents
    )
    SELECT source,
           any_value(rate_pct) AS rate_pct,
           count(*) AS n_total,
           sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS n_kept,
           sum(CASE WHEN bucket < rate_pct THEN n_chars ELSE 0 END)
               AS kept_chars
    FROM rated GROUP BY source ORDER BY source
    """,
)
def sample_mix_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified rate sampling — the data-mixing step a
    pretraining pipeline runs after dedup/quality filtering (DoReMi /
    The Pile: each source gets a target sampling rate; here rates
    cycle 25/50/75/100% by source index). The keep decision is an
    integer threshold on a 60-bit md5 bucket of the doc id — a pure
    function of the row, so the mix is reproducible across runs,
    partitionings, and engines (no RNG seed to ship), membership is
    stable under corpus growth (a new doc never flips an old doc's
    decision), and at 100 TB it is a map-only filter: no shuffle at
    all until the per-source audit aggregation, which moves one row
    per source."""
    docs = read_table(spark, sf_dir, "documents")
    rate = (
        F.lit(25)
        * (F.substring("source", 4, 10).cast("int") % 4 + 1)
    ).alias("rate_pct")
    keep = F.col("bucket") < F.col("rate_pct")
    return (
        docs.select(
            "source", "n_chars", rate, _hash_mod(F.col("doc_id"), 100).alias("bucket")
        )
        .groupBy("source")
        .agg(
            F.first("rate_pct").alias("rate_pct"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(keep.cast("bigint")).alias("n_kept"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(F.lit(0))).alias(
                "kept_chars"
            ),
        )
        .orderBy("source")
    )


_KMV_K = 64
_KMV_P = 2147483647  # 2^31 - 1: hash values exact in doubles


@query(
    "a_kmv_distinct_merge",
    f"""
    WITH hashed AS (
        SELECT date_trunc('day', ts)::DATE AS day,
               date_trunc('week', ts)::DATE AS week,
               ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
                   % {_KMV_P} AS h,
               user_id
        FROM events
    ),
    daily AS (
        SELECT day, any_value(week) AS week,
               (list_sort(list(DISTINCT h)))[1:{_KMV_K}] AS sk
        FROM hashed GROUP BY day
    ),
    merged AS (
        SELECT week, count(DISTINCT day) AS n_days,
               (list_sort(list(DISTINCT v)))[1:{_KMV_K}] AS sk
        FROM (SELECT day, week, unnest(sk) AS v FROM daily)
        GROUP BY week
    ),
    exact AS (
        SELECT week, count(DISTINCT user_id) AS exact_distinct
        FROM hashed GROUP BY week
    )
    SELECT m.week, m.n_days,
           round(CASE WHEN len(m.sk) < {_KMV_K} THEN len(m.sk)::DOUBLE
                      ELSE {float(_KMV_K - 1) * _KMV_P} / m.sk[{_KMV_K}]
                 END, 4) AS est_distinct,
           e.exact_distinct
    FROM merged m JOIN exact e ON e.week = m.week
    ORDER BY m.week
    """,
)
def a_kmv_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketches with rollup MERGE — the third
    mergeable-sketch family in the engine (HLL: a_hll_rollup_merge;
    fixed-bin histograms: a_histogram_rollup_merge). Daily sketches
    keep the k smallest 31-bit hashes of user_id; the weekly grain is
    built by merging sketches (k smallest of the union), never by
    rescanning raw events — the serving-layer property that makes
    sketch columns storable in a rollup table. Estimator is the
    classic (k-1)·M / h_(k) (Bar-Yossef et al. 2002), exact when a
    merged sketch holds fewer than k values. Unlike HLL's
    engine-specific registers, KMV over a deterministic md5-derived
    hash is REPRODUCIBLE cross-engine, so the differential grades the
    estimate's VALUE, not an error envelope; 31-bit hashes stay exact
    in doubles, so the final division is bit-identical IEEE math in
    both engines. Scale shape: the k-array per group is bounded
    metadata (k·8 bytes); daily sketches partial-aggregate map-side;
    the weekly merge moves only (day, k-array) rows."""
    ev = read_table(spark, sf_dir, "events")
    hashed = ev.select(
        F.to_date("ts").alias("day"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        _hash_mod(F.col("user_id"), _KMV_P).alias("h"),
        "user_id",
    )
    daily = hashed.groupBy("day").agg(
        F.first("week").alias("week"),
        F.slice(F.array_sort(F.collect_set("h")), 1, _KMV_K).alias("sk"),
    )
    merged = (
        daily.select("week", "day", F.explode("sk").alias("v"))
        .groupBy("week")
        .agg(
            F.countDistinct("day").alias("n_days"),
            F.slice(F.array_sort(F.collect_set("v")), 1, _KMV_K).alias("sk"),
        )
    )
    exact = hashed.groupBy("week").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    kth = F.element_at("sk", _KMV_K).cast("double")
    est = F.when(
        F.size("sk") < _KMV_K, F.size("sk").cast("double")
    ).otherwise(F.lit(float(_KMV_K - 1) * _KMV_P) / kth)
    return (
        merged.join(exact, "week")
        .select(
            "week",
            "n_days",
            F.round(est, 4).alias("est_distinct"),
            "exact_distinct",
        )
        .orderBy("week")
    )


@query(
    "text_bigram_lm_score",
    f"""
    WITH tokd AS (
        SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
    ),
    uni AS (SELECT doc_id, unnest(toks) AS w FROM tokd),
    c1 AS (SELECT w AS w1, count(*) AS c1 FROM uni GROUP BY w),
    v AS (SELECT count(DISTINCT w) AS v FROM uni),
    bg AS (
        SELECT doc_id, unnest({_grams_sql(2)}) AS g
        FROM tokd WHERE len(toks) >= 2
    ),
    c2 AS (SELECT g, count(*) AS c2 FROM bg GROUP BY g),
    probe AS (
        SELECT doc_id, g, split_part(g, ' ', 1) AS w1
        FROM bg WHERE doc_id % 17 = 0
    )
    SELECT p.doc_id,
           count(*) AS n_bigrams,
           round(avg(ln((c2.c2 + 1.0) / (c1.c1 + v.v))), 6) AS avg_logprob
    FROM probe p
    JOIN c2 ON c2.g = p.g
    JOIN c1 ON c1.w1 = p.w1
    CROSS JOIN v
    GROUP BY p.doc_id ORDER BY p.doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring — the KenLM/CCNet perplexity
    filter every pretraining pipeline runs to rank documents by
    fluency: train add-one-smoothed bigram probabilities
    p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V) on the full corpus, score probe
    docs by mean log-likelihood over their bigrams (low = gibberish /
    boilerplate → drop). Scale shape: the model IS two count tables —
    bigram counts shuffle once on the gram key (partial-aggregated
    map-side), unigram counts on the token key; scoring joins each
    probe bigram to its counts on the same keys and the vocabulary
    size rides a one-row broadcast cross-join (allow-listed scalar).
    Nothing quadratic, no UDFs — ln/avg are codegen'd; the oracle
    twin rounds the mean to 6 dp (the repo-wide float-compare
    discipline: tfidf/PMI/PSI precedent)."""
    docs = _docs(spark, sf_dir)
    tokd = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks")
    )
    uni = tokd.select("doc_id", F.explode("toks").alias("w"))
    c1 = uni.groupBy(F.col("w").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    v = uni.agg(F.countDistinct("w").alias("v"))
    bg = tokd.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat_ws(' ', toks[i-1], toks[i]))"
            )
        ).alias("g"),
    )
    c2 = bg.groupBy("g").agg(F.count(F.lit(1)).alias("c2"))
    probe = bg.filter(F.col("doc_id") % 17 == 0).select(
        "doc_id", "g", F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1")
    )
    return (
        probe.join(c2, "g")
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_BFS_N = 300
_BFS_SOURCES = (0, 97)


@query(
    "graph_bfs_distances",
    f"""
    WITH RECURSIVE edges AS (
        SELECT i AS u, (2 * i) % {_BFS_N} AS v FROM range({_BFS_N}) t(i)
        UNION ALL
        SELECT i, (2 * i + 1) % {_BFS_N} FROM range({_BFS_N}) t(i)
    ),
    walk(node, d) AS (
        SELECT * FROM (VALUES (0, 0), (97, 0)) s(node, d)
        UNION
        SELECT e.v, w.d + 1 FROM walk w JOIN edges e ON e.u = w.node
        WHERE w.d < 12
    )
    SELECT cast(node AS BIGINT) AS node, cast(min(d) AS BIGINT) AS dist
    FROM walk GROUP BY node ORDER BY node
    """,
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distances to the fixed point
    (operators/graph.py:bfs_distances — unweighted SSSP, the Pregel
    canonical loop) on the round's adaptive-doubling probe schedule:
    reached-count and Σdist are both monotone, so one two-value probe
    per 1,2,4,… batched propagation steps proves convergence. Fixture
    is the doubling graph i → {{2i, 2i+1}} mod {_BFS_N} (diameter 8
    from the seeds — deep enough to exercise several doublings); the
    oracle walks the same graph with a depth-capped recursive CTE and
    takes min(d) per node."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import bfs_distances

    ids = spark.range(_BFS_N)
    edges = ids.select(
        F.col("id").alias("u"), (F.col("id") * 2 % _BFS_N).alias("v")
    ).unionAll(
        ids.select(
            F.col("id").alias("u"), ((F.col("id") * 2 + 1) % _BFS_N).alias("v")
        )
    )
    return bfs_distances(edges, _BFS_SOURCES).orderBy("node")


_PACK_W = 1024
_PACK_SHARDS = 8


@query(
    "text_seq_pack_split",
    f"""
    WITH tokd AS (
        SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
               len({TOKENS_SQL}) AS n_tok
        FROM documents
    ),
    placed AS (
        SELECT doc_id, shard, n_tok,
               coalesce(sum(n_tok) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum
        FROM tokd
    ),
    spans AS (
        SELECT shard, doc_id, n_tok, cum,
               cast(floor(cum / {_PACK_W}.0) AS BIGINT) AS start_w,
               cast(floor((cum + n_tok - 1) / {_PACK_W}.0) AS BIGINT) AS end_w
        FROM placed
    ),
    exploded AS (
        SELECT shard, doc_id, cum, n_tok, start_w,
               unnest(generate_series(start_w, end_w)) AS w
        FROM spans
    )
    SELECT shard, w AS window_id,
           count(*) AS n_docs,
           sum(least((w + 1) * {_PACK_W}, cum + n_tok)
               - greatest(w * {_PACK_W}, cum)) AS n_tokens,
           sum(CASE WHEN w > start_w THEN 1 ELSE 0 END) AS n_carryover
    FROM exploded GROUP BY shard, w ORDER BY shard, window_id
    """,
)
def text_seq_pack_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing WITH document splitting — the sample
    -packing step between cleaning and tokenization: documents
    concatenate in a deterministic order inside each pack group and
    are chopped into fixed {_PACK_W}-token training windows, a long
    document spanning as many windows as it needs (the
    concat-then-chunk regime most pretraining corpora use, vs.
    mm_shard_pack's no-split WebDataset regime and
    text_pack_sequences' whole-doc greedy packing). Per (shard,
    window): how many docs contribute, exact token occupancy (always
    {_PACK_W} except each shard's tail window — the no-padding
    property packing exists for), and how many docs carried over a
    window boundary (attention-mask discontinuities a loader must
    handle). All-integer window arithmetic from ONE per-shard
    running sum — bit-exact cross-engine; the exclusive-cumsum +
    explode(sequence) shape is mm_shard_pack's, generalized to
    splitting. At 100 TB the pack group would be (shard, macro-batch)
    so every window group stays bounded; no global ordering
    anywhere."""
    docs = _docs(spark, sf_dir)
    tokd = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).cast("long").alias(
            "n_tok"
        ),
    )
    win = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = tokd.withColumn(
        "cum", F.coalesce(F.sum("n_tok").over(win), F.lit(0)).cast("long")
    )
    spans = placed.select(
        "shard",
        "doc_id",
        "n_tok",
        "cum",
        F.floor(F.col("cum") / _PACK_W).cast("long").alias("start_w"),
        F.floor((F.col("cum") + F.col("n_tok") - 1) / _PACK_W)
        .cast("long")
        .alias("end_w"),
    )
    exploded = spans.select(
        "shard",
        "doc_id",
        "cum",
        "n_tok",
        "start_w",
        F.explode(F.sequence("start_w", "end_w")).alias("w"),
    )
    occupancy = F.least(
        (F.col("w") + 1) * _PACK_W, F.col("cum") + F.col("n_tok")
    ) - F.greatest(F.col("w") * _PACK_W, F.col("cum"))
    return (
        exploded.groupBy("shard", F.col("w").alias("window_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(occupancy).alias("n_tokens"),
            F.sum((F.col("w") > F.col("start_w")).cast("bigint")).alias(
                "n_carryover"
            ),
        )
        .orderBy("shard", "window_id")
    )
