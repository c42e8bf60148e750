"""Count-min sketch as DataFrame aggregation — the mergeable
frequency-sketch family member beside Spark's built-in HLL/KLL
(``a_approx_sketches``): a d×w integer grid answering "roughly how
often did X occur?" in O(d·w) memory regardless of stream size, with a
one-sided error (never under-counts; over-counts by collision mass
≈ N/w per row, take the min over d rows — Cormode & Muthukrishnan 2005).

Spark-first shape: the sketch IS a (row, cell) → count aggregation —
map-side partial aggregation collapses the token stream to ≤ d·w rows
per task before anything shuffles, so building it costs one tiny
exchange however large the input; two sketches merge by adding grids
(the same reaggregability contract ``a_incremental_rollup_merge``
grades for sums). Point queries join the probe's d computed cells
against the grid and take the min.

Hashing reuses the engine's portable md5→31-bit scheme and affine
family (operators/dedup.py: shingle_to_int / minhash_coeffs), so the
DuckDB oracle reproduces the grid bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
    MINHASH_P,
    minhash_coeffs,
    shingle_to_int,
)


def countmin_build(
    items: DataFrame, item_col: str = "token", d: int = 4, w: int = 1024
) -> DataFrame:
    """The d×w grid: one count row per touched (sketch_row, cell).

    Each input row contributes to exactly ``d`` cells; the explode is
    map-side and the count partial-aggregates, so the shuffle carries
    at most d·w rows per map task."""
    x = shingle_to_int(F.col(item_col))
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("sketch_row"),
                ((F.lit(a) * x + F.lit(b)) % MINHASH_P % w).alias("cell"),
            )
            for i, (a, b) in enumerate(minhash_coeffs(d))
        ]
    )
    return (
        items.select(F.explode(cells).alias("rc"))
        .groupBy("rc.sketch_row", "rc.cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_query(
    sketch: DataFrame, probes: DataFrame, item_col: str = "token", d: int = 4, w: int = 1024
) -> DataFrame:
    """Point estimates for ``probes[item_col]``: min over the d rows of
    the probe's cell counts. The sketch side is ≤ d·w rows — broadcast;
    the probe side computes its cells map-side, so the lookup is d
    broadcast-hash probes per item, no wide shuffle."""
    x = shingle_to_int(F.col(item_col))
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("sketch_row"),
                ((F.lit(a) * x + F.lit(b)) % MINHASH_P % w).alias("cell"),
            )
            for i, (a, b) in enumerate(minhash_coeffs(d))
        ]
    )
    probe_cells = probes.select(
        F.col(item_col), F.explode(cells).alias("rc")
    ).select(item_col, "rc.sketch_row", "rc.cell")
    return (
        probe_cells.join(F.broadcast(sketch), ["sketch_row", "cell"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cm_estimate"))
    )


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries heavy-hitter CANDIDATES: each task
    folds its rows through the classic (k-1)-counter summary (increment
    a held key; admit while slots remain; otherwise decrement ALL — one
    shared "charge" against every held key) and emits only its
    surviving keys. The MG guarantee composes across partitions: any
    key with GLOBAL frequency > n/k has per-partition frequency
    > n_p/k in at least one partition (averaging), and MG never evicts
    a key whose local count exceeds local_n/k — so the union of
    per-partition survivors is a SUPERSET of the true global heavy
    hitters no matter how rows are distributed or ordered. Output size
    is bounded by (k-1) × partitions (driver/broadcast-scale metadata),
    which is what makes exact heavy hitters affordable over a
    high-cardinality column at 100 TB: a full groupBy shuffles every
    distinct key; MG + an exact recount of the bounded candidate set
    shuffles almost nothing (Misra & Gries 1982; the phase-1/phase-2
    recount pattern of MAD-lib / Algebird TopK).

    Arrow-batched ``mapInPandas`` (one Python fold per partition, never
    per-row UDF rows); candidate ``mg_count`` values are local lower
    bounds for diagnostics only — the exact recount is the contract."""
    import pandas as pd  # noqa: PLC0415

    def fold(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k - 1:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {col: list(counters.keys()), "mg_count": list(counters.values())}
        )

    return df.select(col).mapInPandas(fold, f"{col} string, mg_count long")
