"""Skew-aware join (SURVEY §4 scale techniques): explicit hot-key
salting, for the joins AQE's skew splitting can't fix.

AQE skew-join (on in the session factory) splits oversized *partitions*
after a shuffle materializes — it helps a sort-merge join, but the
skewed shuffle still happens, and a single pathological key (the null
user, the default session, the bot IP — 10%+ of a clickstream) still
hashes to one reducer on the build side. Salting removes the hotspot
*before* the shuffle: the big side spreads each hot key across
``n_salts`` synthetic sub-keys, the small side replicates its matching
rows once per sub-key, and the join keys on (key, salt). Cold keys pay
nothing (salt 0, no replication).

The salt is deterministic (``xxhash64`` of caller-chosen columns, not
``rand()``), so retried tasks and replayed batches salt identically —
a requirement for exactly-once sinks downstream.

Result-set equivalence with the plain join is exact (each big-side row
meets each matching small-side row exactly once), which is what lets
the oracle gate hash-compare against an unsalted SQL join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT_B = "__salt_big"
_SALT_S = "__salt_small"


def detect_hot_keys(
    df: DataFrame, key_col: str, min_frac: float = 0.05
) -> list:
    """Keys holding ≥ ``min_frac`` of the rows — at most 1/min_frac of
    them by construction, so the collect is bounded regardless of table
    size.

    Single pass over ``df``: the grouped (key, count) table is built
    once, its one-row grand total is broadcast back onto it, and the
    ≥min_frac filter runs distributed — no step ever moves the full
    distinct-key table into one task (an unpartitioned window here
    would single-reduce |distinct keys| rows, which at 100 TB join-key
    cardinalities is its own skew problem). The grouped shuffle appears
    in both branches and is deduplicated by Spark's exchange reuse; the
    collect stays bounded by 1/min_frac regardless of table size."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__cnt"))
    total = counts.agg(F.sum("__cnt").alias("__total"))
    rows = (
        counts.join(F.broadcast(total))
        .filter(F.col("__cnt") >= F.lit(min_frac) * F.col("__total"))
        .select(key_col)
        .collect()
    )
    return [r[0] for r in rows]


def salted_agg(
    df: DataFrame,
    key_col: str,
    agg_exprs: dict[str, str],
    n_salts: int = 8,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation for skewed group keys: stage 1
    aggregates on (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers — stage 2 merges the ``n_salts`` partials per
    key (tiny shuffle: |keys|·n_salts rows).

    ``agg_exprs`` maps output column → 'count' | 'sum:<col>' |
    'min:<col>' | 'max:<col>' — the decomposable aggregates (partial
    merges with sum/sum/min/max respectively). Non-decomposable
    aggregates (exact median) can't two-stage; use sketches instead.

    Note Spark's hash aggregate already does map-side partials, which
    handles *moderate* skew; explicit salting matters when a hot key's
    post-partial row count per map task still floods one reducer
    (billions of rows per key at 100 TB) or the agg carries wide state."""
    merge_fn = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    salt_cols = [F.col(c) for c in (salt_from or df.columns)]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int")
    )

    partials, finals = [], []
    for out, spec in agg_exprs.items():
        op, _, col = spec.partition(":")
        part = F.count(F.lit(1)) if op == "count" else getattr(F, op)(col)
        partials.append(part.alias(f"__p_{out}"))
        finals.append(merge_fn[op](f"__p_{out}").alias(out))
    return (
        salted.groupBy(key_col, "__salt")
        .agg(*partials)
        .groupBy(key_col)
        .agg(*finals)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    hot_keys: Sequence,
    n_salts: int = 8,
    salt_from: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big.big_key = small.small_key`` with hot keys spread
    over ``n_salts`` sub-keys.

    ``salt_from`` names big-side columns whose hash spreads a hot key's
    rows (default: all big-side columns). Shuffle profile at scale: the
    big side's hot key occupies ``n_salts`` reducers instead of one; the
    small side grows by ``len(hot_keys) × (n_salts-1)`` rows — noise for
    a dimension table."""
    hot = F.array(*[F.lit(k) for k in hot_keys])
    salt_cols = [F.col(c) for c in (salt_from or big.columns)]

    is_hot_b = F.array_contains(hot, F.col(big_key))
    big_s = big.withColumn(
        _SALT_B,
        F.when(is_hot_b, F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    is_hot_s = F.array_contains(hot, F.col(small_key))
    small_s = (
        small.withColumn(
            "__salts",
            F.when(is_hot_s, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
                F.array(F.lit(0))
            ),
        )
        .withColumn(_SALT_S, F.explode("__salts"))
        .drop("__salts")
    )
    cond: Column = (big_s[big_key] == small_s[small_key]) & (
        big_s[_SALT_B] == small_s[_SALT_S]
    )
    return big_s.join(small_s, cond, how).drop(_SALT_B, _SALT_S)
