"""Similarity search over embedding columns (north-star, BASELINE.json).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random-hyperplane sign bits) is the scale path: candidates are
restricted to same-bucket vectors, turning the O(N·Q) cross join into a
bucket-local join whose shuffle keys are small ints.

All math is pure column expressions over ``array<float>`` upcast to
double (``zip_with`` + ``aggregate`` fold) — JVM-side, codegen'd,
bit-deterministic (sequential fold order), no UDF.

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


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential dot product (index order ⇒ engine-portable bits).

    With ``dim`` given, expands to an explicit left-associated sum of
    ``a[i]*b[i]`` terms — whole-stage-codegen-able, ~10-100× faster than
    the higher-order-function fold (HOFs evaluate interpreted). Bit-
    identical to the fold: IEEE ``0.0 + x == x`` and both add strictly
    left-to-right. Without ``dim``, falls back to the fold (any length).
    """
    if dim is not None:
        terms = [
            F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
            for i in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(
        dot(a, a, dim)
        if dim is not None
        else F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine: cross join + per-query
    window. Deterministic: similarity rounded to 6dp, id tiebreak.
    Plans as BroadcastNestedLoopJoin with the (small) query side
    broadcast — the corpus streams once, no shuffle of vectors."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec"), dim), 6).alias("cosine_sim"),
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
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within bucket. Recall < 1 by design;
    the bucket count (2^n_bits) is the recall/throughput dial."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec"), dim), 6).alias("cosine_sim"),
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
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket join (same-hyperplane-sign
    candidates) then cosine ≥ threshold verify. High-cosine pairs agree
    on most sign bits, so bucket-equality keeps recall high for
    threshold ≈ 1 while cutting candidates ~2^n_bits-fold."""
    v = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    a = v.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("vec_a"), "bucket"
    )
    b = v.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vec_b"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b"), dim), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
