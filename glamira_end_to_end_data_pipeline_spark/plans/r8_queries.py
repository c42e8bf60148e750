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
           CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN bucket < rate_pct THEN n_chars ELSE 0 END)
               AS BIGINT) AS kept_chars
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
    # local_threshold=0 DELIBERATELY forces the distributed Pregel
    # loop so the driver keeps grading a live BSP convergence loop
    # (the kcore/lpa/scc fixtures exercise the hybrid's local-finish
    # path; pytest pins the two paths equal on every fixture).
    # diameter 8 from the seeds — one 8-step batch + one equal probe.
    return bfs_distances(
        edges, _BFS_SOURCES, batch0=8, local_threshold=0
    ).orderBy("node")


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
           CAST(sum(least((w + 1) * {_PACK_W}, cum + n_tok)
               - greatest(w * {_PACK_W}, cum)) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN w > start_w THEN 1 ELSE 0 END)
               AS BIGINT) AS n_carryover
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


# ---------------------------------------------------------------------------
# Round-8 batch 2: content-defined chunk dedup, KMV set operations,
# JVM-side audio windowing.
# ---------------------------------------------------------------------------


@query(
    "dedup_cdc_chunks",
    f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS t FROM documents
        WHERE trim(text) <> ''
    ),
    sz AS (SELECT doc_id, t, len(t) AS n FROM toks),
    cutp AS (
        SELECT doc_id, t, n,
               list_filter(generate_series(1, n - 1),
                   i -> ('0x' || substr(md5(t[i]), 1, 15))::BIGINT % 8 = 0)
                   AS cuts
        FROM sz
    ),
    se AS (
        SELECT doc_id, t,
               list_prepend(1, list_transform(cuts, c -> c + 1)) AS starts,
               list_append(cuts, n) AS ends
        FROM cutp
    ),
    chx AS (
        SELECT doc_id, t, starts, ends,
               unnest(generate_series(1, len(starts))) AS i
        FROM se
    ),
    ch AS (
        SELECT doc_id, i - 1 AS chunk_idx,
               ends[i] - starts[i] + 1 AS n_tok,
               md5(array_to_string(t[starts[i]:ends[i]], ' ')) AS h
        FROM chx
    ),
    occ AS (SELECT h, count(*) AS n_occ FROM ch GROUP BY h)
    SELECT c.doc_id,
           count(*) AS n_chunks,
           cast(sum(c.n_tok) AS BIGINT) AS n_tokens,
           cast(sum(CASE WHEN o.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_chunks,
           cast(sum(CASE WHEN o.n_occ > 1 THEN c.n_tok ELSE 0 END) AS BIGINT)
               AS dup_tokens,
           round(sum(CASE WHEN o.n_occ > 1 THEN c.n_tok ELSE 0 END)
                 / sum(c.n_tok)::DOUBLE, 6) AS dup_token_frac
    FROM ch c JOIN occ o USING (h)
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking duplication profile
    (operators/dedup.py::cdc_chunk_stats) — the LBFS/FastCDC storage-
    dedup shape at token granularity: chunk boundaries are a pure
    function of local content (token-hash ≡ 0 mod 8), so insertions
    shift no downstream chunk and identical suffixes of revised
    documents still dedup — the granularity revision-heavy corpora
    (wiki histories, re-crawls) need, complementing fixed windows
    (dedup_segment_boilerplate) and stride-1 spans (dedup_exact_spans).
    Per doc: chunk/token totals and the duplicated-token fraction
    against corpus-wide exact chunk occurrence. Boundary selection and
    slicing are map-only array expressions; only 128-bit chunk hashes
    shuffle (once, map-side combined)."""
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        cdc_chunk_stats,
    )

    return cdc_chunk_stats(_docs(spark, sf_dir), boundary_mod=8).orderBy(
        "doc_id"
    )


@query(
    "a_kmv_setops",
    f"""
    WITH hashed AS (
        SELECT event_type,
               ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
                   % {_KMV_P} AS h,
               user_id
        FROM events
    ),
    sk AS (
        SELECT event_type,
               (list_sort(list(DISTINCT h)))[1:{_KMV_K}] AS sk,
               count(DISTINCT user_id) AS n_exact
        FROM hashed GROUP BY event_type
    ),
    du AS (SELECT DISTINCT event_type, user_id FROM events),
    ex AS (
        SELECT x.event_type AS et_a, y.event_type AS et_b,
               count(*) AS exact_intersection
        FROM du x JOIN du y
          ON x.user_id = y.user_id AND x.event_type < y.event_type
        GROUP BY 1, 2
    ),
    p AS (
        SELECT a.event_type AS et_a, b.event_type AS et_b,
               a.sk AS sk_a, b.sk AS sk_b,
               a.n_exact AS na, b.n_exact AS nb
        FROM sk a JOIN sk b ON a.event_type < b.event_type
    ),
    est AS (
        SELECT et_a, et_b, na, nb,
               list_sort(list_distinct(sk_a || sk_b))[1:{_KMV_K}] AS merged,
               list_intersect(sk_a, sk_b) AS inter
        FROM p
    ),
    est2 AS (
        SELECT et_a, et_b, na, nb, merged, inter,
               CASE WHEN len(merged) < {_KMV_K} THEN {_KMV_P}
                    ELSE merged[{_KMV_K}] END AS kth,
               least({_KMV_K}, len(merged)) AS denom
        FROM est
    ),
    est3 AS (
        SELECT et_a, et_b, na, nb,
               len(list_filter(inter, v -> v <= kth))::DOUBLE / denom
                   AS jac_raw,
               CASE WHEN len(merged) < {_KMV_K} THEN len(merged)::DOUBLE
                    ELSE {float(_KMV_K - 1) * _KMV_P} / kth::DOUBLE
               END AS union_raw
        FROM est2
    )
    SELECT e.et_a, e.et_b,
           round(jac_raw, 6) AS est_jaccard,
           round(union_raw, 4) AS est_union,
           round(jac_raw * union_raw, 4) AS est_intersection,
           round(coalesce(x.exact_intersection, 0)
                 / (e.na + e.nb - coalesce(x.exact_intersection, 0))::DOUBLE,
                 6) AS exact_jaccard,
           cast(coalesce(x.exact_intersection, 0) AS BIGINT)
               AS exact_intersection
    FROM est3 e LEFT JOIN ex x USING (et_a, et_b)
    ORDER BY et_a, et_b
    """,
)
def a_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS over KMV sketches — the fourth
    mergeable-sketch capability (after HLL / histogram / KMV distinct
    merge): audience-overlap estimation between segments WITHOUT
    rescanning raw data. Per event-type pair: the KMV union sketch is
    the k smallest of the two sketches' union, θ is its k-th value,
    and |A∩B| is estimated as (|{{common hashes ≤ θ}}| / k) · |A∪B|̂
    (Dasgupta et al., the Theta framework) — the exact math a serving
    layer runs on STORED per-segment sketch columns. Exact
    jaccard/intersection computed alongside, so the driver grades the
    estimator's value AND its input discipline cross-engine
    (deterministic md5-derived 31-bit hashes, bit-exact IEEE division).
    Scale: sketches are k·8-byte bounded metadata built in one
    map-side-combined pass; the pairwise stage is |segments|² over
    BROADCAST sketch rows (allow-listed BNLJ — segment counts are
    small by construction); the exact baseline joins distinct
    (segment, user) pairs on the user key only."""
    ev = read_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        _hash_mod(F.col("user_id"), _KMV_P).alias("h"),
        "user_id",
    )
    sk = hashed.groupBy("event_type").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, _KMV_K).alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    a = sk.select(
        F.col("event_type").alias("et_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_exact").alias("na"),
    )
    b = sk.select(
        F.col("event_type").alias("et_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_exact").alias("nb"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("et_a") < F.col("et_b"))
    merged = F.slice(
        F.array_sort(F.array_union("sk_a", "sk_b")), 1, _KMV_K
    ).alias("merged")
    est = pairs.select(
        "et_a",
        "et_b",
        "na",
        "nb",
        merged,
        F.array_intersect("sk_a", "sk_b").alias("inter"),
    )
    msz = F.size("merged")
    kth = F.when(msz < _KMV_K, F.lit(_KMV_P)).otherwise(
        F.element_at("merged", _KMV_K)
    )
    est = est.withColumn("kth", kth).withColumn(
        "denom", F.least(F.lit(_KMV_K), msz)
    )
    jac_raw = (
        F.size(
            F.filter(F.col("inter"), lambda v: v <= F.col("kth"))
        ).cast("double")
        / F.col("denom")
    )
    union_raw = F.when(msz < _KMV_K, msz.cast("double")).otherwise(
        F.lit(float(_KMV_K - 1) * _KMV_P) / F.col("kth").cast("double")
    )
    est = est.withColumn("jac_raw", jac_raw).withColumn(
        "union_raw", union_raw
    )
    du = ev.select("event_type", "user_id").distinct()
    x = du.select(F.col("event_type").alias("et_a"), "user_id")
    y = du.select(F.col("event_type").alias("et_b"), "user_id")
    ex = (
        x.join(y, "user_id")
        .filter(F.col("et_a") < F.col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    exact_i = F.coalesce("exact_intersection", F.lit(0))
    return (
        est.join(ex, ["et_a", "et_b"], "left")
        .select(
            "et_a",
            "et_b",
            F.round("jac_raw", 6).alias("est_jaccard"),
            F.round("union_raw", 4).alias("est_union"),
            F.round(F.col("jac_raw") * F.col("union_raw"), 4).alias(
                "est_intersection"
            ),
            F.round(
                exact_i
                / (F.col("na") + F.col("nb") - exact_i).cast("double"),
                6,
            ).alias("exact_jaccard"),
            exact_i.cast("long").alias("exact_intersection"),
        )
        .orderBy("et_a", "et_b")
    )


@query(
    "mm_audio_energy",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 511)) AS media_id),
    au AS (
        SELECT media_id, upper(repeat(md5(media_id::VARCHAR), 4)) AS hx
        FROM ids WHERE media_id % 3 = 1
    ),
    w AS (
        SELECT media_id, hx,
               unnest(generate_series(0, length(hx) // 32 - 1)) AS window_idx
        FROM au
    ),
    e AS (
        SELECT media_id, window_idx,
               cast(list_sum(list_transform(generate_series(0, 15),
                   i -> ('0x' || substr(hx, window_idx * 32 + i * 2 + 1, 2))
                            ::BIGINT)) AS BIGINT) AS energy
        FROM w
    )
    SELECT media_id, window_idx, window_idx * 16 AS start_byte, energy,
           round(energy / 16.0, 4) AS mean_level,
           energy < 1900 AS is_silence
    FROM e ORDER BY media_id, window_idx
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing + energy/silence profile
    (operators/multimodal.py::audio_energy_windows) — the third
    modality's first-class op beside image resize/pHash and video
    frame sampling: payloads cut into fixed 16-byte windows, per-
    window energy (byte-value sum — amplitude sum for 8-bit PCM) and
    a silence flag, the VAD pre-filter that gates expensive ASR.
    Distinct from every other mm_* entry: ZERO Python — hex/substr/
    transform/aggregate keep binary → scalar extraction JVM-side and
    map-only (the HOF lambdas evaluate interpreted over a fixed 16
    elements per window — see the operator docstring for why that
    beats a per-byte explode), proving opaque-payload byte math
    doesn't need even an Arrow batch. The oracle regenerates the
    deterministic md5-derived fixture payloads hex-side."""
    from glamira_end_to_end_data_pipeline_spark.operators.multimodal import (
        audio_energy_windows,
        synthetic_media,
    )

    media = synthetic_media(spark, 512).filter(F.col("modality") == "audio")
    return audio_energy_windows(media, window_bytes=16).orderBy(
        "media_id", "window_idx"
    )


# ---------------------------------------------------------------------------
# Round-8 batch 3: priority sampling, deterministic Poisson bootstrap,
# exact rolling median.
# ---------------------------------------------------------------------------

_PRI_K = 200
_PRI_SCALE = 2147483648.0  # 2^31: w * 2^31 exact in a double for w <= ~4e6


def priority_sample(docs: DataFrame, k: int) -> DataFrame:
    """Deterministic Duffield–Lund–Thorup priority sample of exactly
    ``min(n, k)`` rows from a (doc_id, source, n_chars) frame — the
    engine half of ``sample_priority_weighted`` (see its docstring for
    the estimator and scale arguments), extracted so properties can
    drive it with adversarial frames.

    Tie-at-tau discipline: classic DLT keeps ``priority > tau`` and
    silently under-fills the sample when the k-th and (k+1)-th
    priorities are EQUAL — impossible with real uniforms, but our u is
    a 31-bit hash, so equal (weight, hash) pairs collide exactly. The
    cut is therefore the full ORDER KEY (priority DESC, doc_id ASC):
    a row is sampled iff it sorts strictly before the (k+1)-th row,
    which keeps exactly min(n, k) rows under any tie pattern while
    leaving the no-tie behavior bit-identical (tau = the (k+1)-th
    priority either way)."""
    pri = (
        F.col("n_chars").cast("double")
        * F.lit(_PRI_SCALE)
        / (_hash_mod(F.col("doc_id"), 2147483647) + 1).cast("double")
    ).alias("priority")
    # k+1 rows via per-partition heaps (TakeOrderedAndProject — never
    # a global sort; pinned by the plan test). The bounded frame is
    # recomputed by the cut aggregates and the final filter — three
    # heap passes beat materializing state for a k-row result.
    top = (
        docs.select("doc_id", "source", "n_chars", pri)
        .orderBy(F.desc("priority"), "doc_id")
        .limit(k + 1)
    )
    # DLT n<=k regime: fewer than k+1 rows means the whole corpus is
    # the sample and there is no discard row — tau = 0, w_hat = w
    # (the estimator is exact). Detected from the bounded frame's own
    # count, no extra corpus-wide action.
    stats = top.agg(
        F.count(F.lit(1)).alias("n"), F.min("priority").alias("cut_p")
    )
    cut = (
        top.crossJoin(F.broadcast(stats))
        .groupBy("n", "cut_p")
        .agg(
            # the (k+1)-th row under (priority DESC, doc_id ASC) is the
            # max doc_id among the min-priority rows of the top-(k+1)
            F.max(
                F.when(F.col("priority") == F.col("cut_p"), F.col("doc_id"))
            ).alias("cut_d")
        )
    )
    keep = (
        (F.col("n") <= k)
        | (F.col("priority") > F.col("cut_p"))
        | (
            (F.col("priority") == F.col("cut_p"))
            & (F.col("doc_id") < F.col("cut_d"))
        )
    )
    tau = F.when(F.col("n") == k + 1, F.col("cut_p")).otherwise(F.lit(0.0))
    return (
        top.crossJoin(F.broadcast(cut))
        .filter(keep)
        .select(
            "doc_id",
            "source",
            "n_chars",
            "priority",
            F.greatest(F.col("n_chars").cast("double"), tau).alias("w_hat"),
        )
        .orderBy(F.desc("priority"), "doc_id")
    )


@query(
    "sample_priority_weighted",
    f"""
    WITH pr AS (
        SELECT doc_id, source, n_chars,
               (n_chars * {_PRI_SCALE}) /
               (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                    % 2147483647 + 1) AS priority
        FROM documents
    ),
    top AS (
        SELECT * FROM pr ORDER BY priority DESC, doc_id LIMIT {_PRI_K + 1}
    ),
    cut AS (
        SELECT priority AS cut_p, doc_id AS cut_d,
               (SELECT count(*) FROM top) AS n
        FROM top ORDER BY priority ASC, doc_id DESC LIMIT 1
    )
    SELECT doc_id, source, n_chars, priority,
           greatest(n_chars::DOUBLE,
                    CASE WHEN n = {_PRI_K + 1} THEN cut_p ELSE 0 END) AS w_hat
    FROM top, cut
    WHERE n <= {_PRI_K} OR priority > cut_p
       OR (priority = cut_p AND doc_id < cut_d)
    ORDER BY priority DESC, doc_id
    """,
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup) — weighted sampling
    WITHOUT replacement with an unbiased subset-sum estimator, the
    principled way to draw a size-capped weighted eval/debug corpus:
    each doc gets priority q = w/u (w = n_chars, u uniform in (0,1]),
    the top-k by priority are the sample, and with tau = the (k+1)-th
    priority each sampled doc's weight estimate w_hat = max(w, tau)
    makes sum(w_hat) an unbiased estimate of total corpus chars.
    Determinism discipline: u's numerator is the 60-bit md5 of the doc
    id mod (2^31-1), so q = (w·2^31)/(h+1) is one IEEE division of two
    exactly-representable integers — bit-identical on any engine, no
    RNG seed to ship, membership reproducible under re-runs and
    repartitioning.

    Scale shape: priorities are map-only; the top-(k+1) is
    TakeOrderedAndProject (per-partition heaps, k+1 rows to the
    driver-side merge — never a global sort); the cut row is a ONE-ROW
    broadcast back onto the k+1 survivors. At 100 TB nothing but
    (k+1) rows ever leaves the scan stage. Exact priority ties at tau
    break on doc_id so the sample is always exactly min(n, k) rows —
    see :func:`priority_sample` (Hypothesis-pinned in
    tests/test_properties.py on all-tied inputs)."""
    docs = read_table(spark, sf_dir, "documents")
    return priority_sample(docs, _PRI_K)


# Poisson(1) CDF at 0..8, as decimal literals both engines parse to the
# SAME doubles: replicate weight = #{j : cdf_j <= u}, capped at 9.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999897508033253",
    "0.999998874797402",
)
_BOOT_B = 32

# Affine fan-out family across replicates — dedup.minhash_coeffs'
# exact formula (operators/dedup.py::minhash_coeffs), re-derived here
# so the oracle embeds the same constants.
_BOOT_COEFFS = [
    ((b * 2_654_435_761 + 1) % 2147483647, (b * 40_503 + 17) % 2147483647)
    for b in range(_BOOT_B)
]


def _boot_oracle() -> str:
    coeffs = ", ".join(f"({b}, {a}::BIGINT, {c}::BIGINT)" for b, (a, c) in enumerate(_BOOT_COEFFS))
    w = "(" + " + ".join(f"(u >= {c})::INT" for c in _POIS_CDF) + ")"
    return f"""
    WITH co(b, ca, cc) AS (VALUES {coeffs}),
    rows_x AS (
        SELECT event_type,
               ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT
                   % 2147483647 AS x,
               cast(round(value * 100.0) AS BIGINT) AS cents
        FROM events
    ),
    uu AS (
        SELECT event_type, b, cents,
               ((x * ca + cc) % 2147483647) / 2147483647.0 AS u
        FROM rows_x, co
    ),
    wts AS (SELECT event_type, b, cents, {{w}} AS w FROM uu),
    bm AS (
        SELECT event_type, b,
               (cast(sum(w * cents) AS DOUBLE) / 100.0) / sum(w) AS m
        FROM wts GROUP BY event_type, b
        HAVING sum(w) > 0
    ),
    arr AS (
        SELECT event_type, list_sort(list(m)) AS ms FROM bm
        GROUP BY event_type
    ),
    ex AS (
        SELECT event_type, count(*) AS n_events,
               (cast(sum(cents) AS DOUBLE) / 100.0) / count(*) AS exact_mean
        FROM rows_x GROUP BY event_type
    )
    SELECT e.event_type, e.n_events, e.exact_mean,
           a.ms[16] AS boot_median_lo,
           a.ms[2] AS ci_lo, a.ms[{{hi}}] AS ci_hi
    FROM ex e JOIN arr a USING (event_type)
    ORDER BY event_type
    """.replace("{w}", w).replace("{hi}", str(_BOOT_B - 1))


@query("a_poisson_bootstrap_ci", _boot_oracle())
def a_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap — per-segment mean with a
    resampling confidence interval in ONE pass over the raw data, the
    significance machinery an eval/AB pipeline needs at scale
    (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams"): each row's weight in replicate b is a Poisson(1) draw,
    so a replicate is a resample-with-replacement WITHOUT
    materializing resamples. The draw is inverse-CDF over
    u_b = ((x·a_b + c_b) mod P)/P where x is ONE 60-bit md5 of the row
    id reduced mod P = 2^31-1 and (a_b, c_b) is the same
    affine-permutation family the MinHash signatures use
    (operators/dedup.py::minhash_coeffs formula): md5 scrambles the
    row dimension once, the affine family fans it out across the 32
    replicates with two integer ops each. Products stay under 2^62 so
    the modular math is exact BIGINT on any engine; the CDF thresholds
    are decimal literals; money moves as exact cents longs — every
    replicate mean is bit-identical cross-engine.

    Scale shape: the replicate fan-out is a posexplode of the
    32-element zipped literal coefficient array feeding DIRECTLY into
    a map-side-combined (segment, b) partial aggregate — generated
    rows never shuffle (the exchange moves two longs per (segment,
    replicate) per task), and the CI is element_at over the sorted
    32-long replicate-mean array. The alternative 64-wide-column
    no-explode form was measured SLOWER (3.5 s vs 1.6 s at sf0.1):
    its ~300-node expression tree costs more in per-invocation
    Catalyst analysis + codegen size (1 MB task binaries) than the
    bounded fan-out costs in execution — wide-expression plans are a
    driver-side scale hazard of their own."""
    ev = read_table(spark, sf_dir, "events")
    x = _hash_mod(F.col("event_id"), 2147483647)
    cents = F.round(F.col("value") * 100.0).cast("long")
    base = ev.select("event_type", cents.alias("cents"), x.alias("x"))
    ca = F.array(*[F.lit(a) for a, _ in _BOOT_COEFFS])
    cc = F.array(*[F.lit(c) for _, c in _BOOT_COEFFS])
    fan = base.select(
        "event_type",
        "cents",
        "x",
        F.posexplode(F.arrays_zip(ca.alias("a"), cc.alias("c"))).alias(
            "b", "__ac"
        ),
    )
    u = (
        (F.col("x") * F.col("__ac.a") + F.col("__ac.c")) % 2147483647
    ) / F.lit(2147483647.0)
    w = None
    for c in _POIS_CDF:
        term = (u >= float(c)).cast("int")
        w = term if w is None else w + term
    bm = (
        fan.select("event_type", "b", "cents", w.alias("w"))
        .groupBy("event_type", "b")
        .agg(
            F.when(
                F.sum("w") > 0,
                (F.sum(F.col("w") * F.col("cents")).cast("double") / 100.0)
                / F.sum("w"),
            ).alias("m")
        )
        # a (segment, replicate) whose rows all drew weight 0 (prob
        # e^-m per segment) yields no mean: drop it EXPLICITLY so both
        # engines index the same sorted replicate array (Spark's
        # collect_list drops NULLs, DuckDB's list() keeps them — the
        # oracle's HAVING sum(w) > 0 is this same filter).
        .filter(F.col("m").isNotNull())
    )
    arr = bm.groupBy("event_type").agg(
        F.array_sort(F.collect_list("m")).alias("__ms")
    )
    exact = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.sum("cents").cast("double") / 100.0) / F.count(F.lit(1))
        ).alias("exact_mean"),
    )
    return (
        exact.join(arr, "event_type")
        .select(
            "event_type",
            "n_events",
            "exact_mean",
            F.element_at("__ms", _BOOT_B // 2).alias("boot_median_lo"),
            F.element_at("__ms", 2).alias("ci_lo"),
            F.element_at("__ms", _BOOT_B - 1).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


@query(
    "w_rolling_median",
    """
    WITH daily AS (
        SELECT event_type, cast(ts AS DATE) AS day,
               cast(sum(cast(value AS DECIMAL(18, 2))) AS DOUBLE) AS rev
        FROM events GROUP BY event_type, cast(ts AS DATE)
    ),
    w AS (
        SELECT event_type, day, rev,
               list_sort(list(rev) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        FROM daily
    )
    SELECT event_type, day, rev,
           len(arr) AS n_in_window,
           CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
                ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2.0
           END AS roll_median
    FROM w ORDER BY event_type, day
    """,
)
def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-row EXACT rolling median of daily revenue per
    segment (seven OBSERVED days — a ROWS frame over the daily rollup;
    the calendar-interval RANGE variant is w4's shape, and the spine
    join of w6 densifies gaps when calendar semantics are required) —
    the robust-trend sibling of w4's rolling mean: medians
    resist the spike days that drag a mean, which is why monitoring /
    anomaly baselines prefer them; no Spark builtin gives an exact
    windowed median, so the frame's values are collected per the
    ROWS BETWEEN frame (bounded: ≤7 values), sorted, and the middle
    element(s) extracted — array math stays in codegen, and even-count
    frames average the two middle values exactly (daily revs are
    DECIMAL sums cast to exact doubles; their sum and half are
    exact-rounded, bit-identical cross-engine).

    Scale shape: the raw scan reduces to one row per (segment, day)
    with map-side partial aggregation BEFORE any window; the window
    then shuffles only daily rows partitioned by segment with a
    7-element bounded frame — no unpartitioned window, no growing
    state. At 100 TB the windowed stage's input is |segments|·|days|
    rows regardless of event volume."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("rev").over(win))
    n = F.size("__arr")
    mid_odd = F.element_at("__arr", ((n + 1) / 2).cast("int"))
    mid_even = (
        F.element_at("__arr", (n / 2).cast("int"))
        + F.element_at("__arr", (n / 2).cast("int") + 1)
    ) / 2.0
    return (
        daily.withColumn("__arr", arr)
        .select(
            "event_type",
            "day",
            "rev",
            n.cast("bigint").alias("n_in_window"),
            F.when(n % 2 == 1, mid_odd).otherwise(mid_even).alias(
                "roll_median"
            ),
        )
        .orderBy("event_type", "day")
    )
