"""Round-14 additions — closing the r13 verdict's named gaps:

- ``emb_ivf_incremental_refresh`` — the Lloyd-refresh arm of
  incremental IVF maintenance under a DRIVER GRADE: round 13's
  ``emb_ivf_incremental`` gates the refresh on per-cell drift, but
  natural appends never trip it at graded SFs (measured floor 0.40 vs
  threshold 0.25), so the expensive arm was exercised only by a unit
  test. This entry injects a deterministic, SQL-replayable drifted
  batch — copies of the NEGATED CENTROID MEAN, anti-aligned with the
  whole quantizer by construction — asserts the drift gate trips, runs
  the SHARED refresh helper (``r13_queries._ivf_refresh_rebuild``),
  and hash-checks the post-refresh reassignment + probe against the
  DuckDB replay of the identical Lloyd iteration.
- ``graph_pagerank_incremental`` — incremental maintenance for the
  graph family (the one missing member of the r13 incremental theme):
  persisted ranks survive an edge-append batch via delta propagation
  from the touched frontier only, runtime-gated that the converged
  recompute was NOT re-run from scratch; oracle = the full recompute.
- ``lake_merge_mor`` — MERGE in merge-on-read flavor: matched rows
  become deletion-vector bits and inserts append NEW files, composing
  the existing positional-delete/DV machinery; gated that no
  pre-existing data file is rewritten. Oracle = the copy-on-write
  MERGE result on the same input.

Reference parity: all three extend engine families the reference
pipeline exercises only in full-rebuild form (``load_to_bigquery.py``
re-loads whole collections; the dbt models materialize as views —
SURVEY §2.9/§3.1); incremental maintenance is what those shapes need
at 100 TB.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.plans.northstar_queries import (
    _COS_SQL,
)
from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.plans.r13_queries import (
    _DRIFT_REFRESH_COS,
    _ivf_refresh_rebuild,
)
from glamira_end_to_end_data_pipeline_spark.sources import read_table

# ---------------------------------------------------------------------------
# IVF incremental maintenance: the DRIFT-TRIPPED refresh arm, graded
# ---------------------------------------------------------------------------

# how many copies of the drifted vector the batch carries — enough to
# visibly pull the receiving cell's centroid in one Lloyd pass at
# sf0.001 (cells have ~12 members there) while staying O(1) metadata
_N_DRIFT_BATCH = 16


@query(
    "emb_ivf_incremental_refresh",
    f"""
    WITH cent0 AS (
        SELECT vec_id AS ccid, embedding::DOUBLE[] AS cvec
        FROM embeddings WHERE vec_id >= 10
        ORDER BY vec_id LIMIT 8
    ),
    dims AS (SELECT unnest(generate_series(1, 64)) AS i),
    sumc AS (
        SELECT d.i, sum(c.cvec[d.i]) AS sv
        FROM cent0 c CROSS JOIN dims d GROUP BY d.i
    ),
    batchvec AS (SELECT list(-sv / 8 ORDER BY i) AS bvec FROM sumc),
    batch AS (
        SELECT 100000 + g.k AS vec_id, b.bvec AS embedding
        FROM batchvec b,
             (SELECT unnest(generate_series(0, {_N_DRIFT_BATCH - 1})) AS k) g
    ),
    c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec
        FROM embeddings WHERE vec_id >= 10
        UNION ALL
        SELECT vec_id AS neighbor_id, embedding AS c_vec FROM batch
    ),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
          FROM embeddings WHERE vec_id < 10),
    assign0 AS (
        SELECT neighbor_id, c_vec, ccid AS cell FROM (
            SELECT c.neighbor_id, c.c_vec, cent0.ccid,
                   row_number() OVER (
                       PARTITION BY c.neighbor_id
                       ORDER BY {_COS_SQL.format(a="c_vec", b="cvec")} DESC,
                                cent0.ccid) AS rn
            FROM c, cent0) t WHERE rn = 1
    ),
    means AS (
        SELECT cell, list(avg_v ORDER BY i) AS mvec
        FROM (
            SELECT a.cell, d.i, avg(a.c_vec[d.i]) AS avg_v
            FROM assign0 a CROSS JOIN dims d
            GROUP BY a.cell, d.i
        ) GROUP BY cell
    ),
    cent1 AS (
        SELECT c0.ccid, coalesce(m.mvec, c0.cvec) AS cvec
        FROM cent0 c0 LEFT JOIN means m ON c0.ccid = m.cell
    ),
    c_cell AS (
        SELECT neighbor_id, c_vec, ccid AS cell FROM (
            SELECT c.neighbor_id, c.c_vec, cent1.ccid,
                   row_number() OVER (
                       PARTITION BY c.neighbor_id
                       ORDER BY {_COS_SQL.format(a="c_vec", b="cvec")} DESC,
                                cent1.ccid) AS rn
            FROM c, cent1) t WHERE rn = 1
    ),
    q_cell AS (
        SELECT query_id, q_vec, ccid AS cell FROM (
            SELECT q.query_id, q.q_vec, cent1.ccid,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_COS_SQL.format(a="q_vec", b="cvec")} DESC,
                                cent1.ccid) AS rn
            FROM q, cent1) t WHERE rn <= 2
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
def emb_ivf_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REFRESH arm of incremental IVF maintenance, driver-graded
    (r13 verdict: ``_DRIFT_REFRESH_COS = 0.25`` never trips at graded
    SFs, so the Lloyd-refresh branch of ``emb_ivf_incremental`` had no
    hash check). The appended batch here is a representation shift BY
    CONSTRUCTION: 16 copies of the negated centroid MEAN −s/8 (s =
    element-wise sum of the 8 stored centroids). Whatever cell the
    batch lands in, its batch-mean IS −s/8, and cos(c_k, −s) ≈
    −|c_k|/(√8·|c|) on this isotropic corpus — every receiving cell's
    drift cosine is NEGATIVE, provably below the 0.25 threshold
    (measured: −0.25/−0.24/−0.19 at sf0.001/0.01/0.1, vs the natural
    append's +0.40 floor). The entry RAISES if the gate does not trip,
    so a green grade proves the refresh ran.

    The refresh itself is the SHARED helper
    (``r13_queries._ivf_refresh_rebuild`` — the same code the
    steady-state entry gates): one Lloyd pass over the stored layout
    (assignment map-only via literal centroids, per-cell per-dim means
    as ONE K×dim-bounded shuffle), then full reassignment and a
    cell-partitioned rewrite. The graded result is the refreshed
    index's 2-cell-probe top-5, hash-checked against the DuckDB
    replay of the identical iteration (assign → per-(cell,dim) avg →
    rebuilt centroid list with empty cells keeping seeds → reassign →
    probe). Scale shape: the batch is O(1) driver metadata; the
    refresh pays one corpus scan for means + one for the rewrite —
    the known, drift-gated worst case of the incremental design, paid
    only when the representation actually shifts."""
    from glamira_end_to_end_data_pipeline_spark.operators.similarity import (
        _dbl,
        _pair_cosine,
        _side,
        ivf_cell_bulk,
        ivf_centroids,
        ivf_drift_min_cos,
        ivf_probe_cells,
    )

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_ivfrefresh_{tag}"
    )
    shutil.rmtree(path, ignore_errors=True)

    emb = read_table(spark, sf_dir, "embeddings")
    init = emb.filter(F.col("vec_id") >= 10)

    # initial build: deterministic lowest-id quantizer, cell layout.
    # c_vec is stored DOUBLE (an exact float32→float64 widening) so
    # the drifted batch — natively double — appends with an identical
    # parquet schema.
    cents = ivf_centroids(init, n_cells=8)
    init_side = _side(
        init, "vec_id", "embedding", "neighbor_id", "c_vec", "c_norm"
    ).withColumn("c_vec", _dbl(F.col("c_vec")))
    c_init = init_side.withColumn(
        "cell", ivf_cell_bulk(F.col("c_vec"), F.col("c_norm"), cents)
    )
    c_init.repartition("cell").write.partitionBy("cell").parquet(path)

    # DRIFTED append batch: copies of −s/8, anti-aligned with every
    # stored centroid (sum in cid order — the oracle's unordered sum
    # differs by at most an ulp, absorbed by the 6dp rounding every
    # comparison applies)
    dim = len(cents[0][1])
    neg = [-(sum(vec[i] for _cid, vec, _n in cents)) / 8.0 for i in range(dim)]
    batch = spark.createDataFrame(
        [(100000 + k, neg) for k in range(_N_DRIFT_BATCH)],
        "vec_id long, embedding array<double>",
    )
    b_side = _side(
        batch, "vec_id", "embedding", "neighbor_id", "c_vec", "c_norm"
    )
    c_app = b_side.withColumn(
        "cell", ivf_cell_bulk(F.col("c_vec"), F.col("c_norm"), cents)
    )
    c_app.repartition("cell").write.mode("append").partitionBy(
        "cell"
    ).parquet(path)

    # the gate the steady-state entry never trips MUST trip here — a
    # green grade is proof the refresh arm executed
    min_cos = ivf_drift_min_cos(c_app, cents)
    if min_cos >= _DRIFT_REFRESH_COS:
        raise AssertionError(
            f"drifted fixture failed to trip the refresh gate: per-cell "
            f"drift {min_cos:.3f} >= {_DRIFT_REFRESH_COS}"
        )
    full_side = init_side.unionByName(b_side)
    cents = _ivf_refresh_rebuild(spark, path, full_side, cents)

    # query through the REFRESHED index: 2-cell probe, partition-pruned
    qs = _side(
        emb.filter(F.col("vec_id") < 10),
        "vec_id",
        "embedding",
        "query_id",
        "q_vec",
        "q_norm",
    ).withColumn(
        "cell",
        F.explode(ivf_probe_cells(F.col("q_vec"), F.col("q_norm"), cents, 2)),
    )
    probed = sorted(r["cell"] for r in qs.select("cell").distinct().collect())
    lake_read = spark.read.parquet(path).filter(F.col("cell").isin(probed))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        lake_read.join(F.broadcast(qs), "cell")
        .select("query_id", "neighbor_id", _pair_cosine().alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
