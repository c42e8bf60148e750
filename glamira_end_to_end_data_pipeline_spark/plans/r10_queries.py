"""Round-10 additions — execution-path evidence for the graph hybrid,
plus new analytics/lake/sampling surfaces:

- ``graph_scc_hybrid_live`` — an SCC fixture sized so the driver grade
  EXERCISES both hybrid paths: ≥1 live distributed FW-BW round AND the
  driver-local Tarjan finish, gated in-query on the operator's stats
  (the r9 VERDICT's ask: at sf0.01 the other graph fixtures resolve
  entirely in the sequential finish, so their green no longer proves
  the BSP machinery runs under the driver).

Design note (whole file): every entry keeps the registry's scale
discipline — map-only or single-exchange plans, bounded driver
metadata, no RNG state, Arrow-only Python. Reference citations use the
SURVEY §0 shorthand (5.dcs = 5.data-collection-storage, 6.dps =
6.data-pipeline-storage, 7.dtv = 7.data-transformation-visualization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.plans.queries import query
from glamira_end_to_end_data_pipeline_spark.sources import read_table

# ---------------------------------------------------------------------------
# Batch 1: graph hybrid-path evidence
# ---------------------------------------------------------------------------

# 200 blocks of 2 nodes, each block a 2-cycle (one SCC per block), plus
# ONE bridge edge block0 -> block1. 401 edges > the entry's 200-edge
# local_threshold, so the operator MUST open with distributed FW-BW
# machinery; the forward coloring floods block 1 with block 0's label
# (the bridge), so round 1's backward sweep assigns every block EXCEPT
# block 1 (reached from root 0, cannot reach back), leaving a 2-node /
# 2-edge remainder that finishes driver-local — both hybrid paths in
# one deterministic fixture, with the SCC ground truth in closed form
# (scc_id = the block start, bridges never merge components). L = 2
# keeps the BSP step count minimal (min-label crosses a cycle in L-1
# hops; EVERY step is a real shuffle round, the entry's dominant cost
# — what this entry grades is the execution path, not graph richness,
# which graph_scc_exact's condensation fixture already covers).
_SCC_LIVE_BLOCKS = 200
_SCC_LIVE_L = 2


@query(
    "graph_scc_hybrid_live",
    f"""
    SELECT cast(r.range AS BIGINT) AS node,
           cast((r.range // {_SCC_LIVE_L}) * {_SCC_LIVE_L} AS BIGINT) AS scc_id
    FROM range({_SCC_LIVE_BLOCKS * _SCC_LIVE_L}) r
    ORDER BY node
    """,
)
def graph_scc_hybrid_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC with BOTH hybrid paths live under the driver's grade
    (operators/graph.py:scc_exact, the Hong et al. 2013 FW-BW +
    local-finish shape): the fixture's 401 edges exceed the entry's
    200-edge local_threshold, forcing ≥1 distributed forward-color /
    backward-flag round, and round 1 strands exactly one 2-node block
    (bridged INTO, so colored by a foreign root it cannot reach back)
    whose remainder finishes with driver-local Tarjan. The operator's
    ``stats`` out-param records which paths executed and the query
    RAISES unless both did — a green driver grade is therefore a proof
    artifact that the BSP rounds and the sequential finish both ran,
    not just that the labels are right. Oracle: the closed-form ground
    truth (each block is one 2-cycle = one SCC; the bridge is a
    condensation-DAG edge and merges nothing)."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import scc_exact

    n = _SCC_LIVE_BLOCKS * _SCC_LIVE_L
    base = spark.range(n)
    cycle = base.select(
        F.col("id").alias("u"),
        (
            (F.col("id") / _SCC_LIVE_L).cast("long") * _SCC_LIVE_L
            + (F.col("id") % _SCC_LIVE_L + 1) % _SCC_LIVE_L
        ).alias("v"),
    )
    bridge = spark.createDataFrame([(0, _SCC_LIVE_L)], "u long, v long")
    stats: dict = {}
    out = scc_exact(
        cycle.unionAll(bridge),
        # fixture-known depths: coloring crosses the bridge then one
        # cycle (2 steps), the flag wave one hop — seed the doubling
        # schedules to land in 2 probes each.
        trim_batch0=1,
        fwd_batch0=2,
        bwd_batch0=1,
        local_threshold=200,
        stats=stats,
    )
    # materialize BEFORE gating: scc_exact's loop has already run by
    # return time (its convergence probes are actions), so stats is
    # complete here — the gate is on the EXECUTION PATH, not the data.
    if stats["bsp_rounds"] < 1 or not stats["local_finish"]:
        raise RuntimeError(
            f"graph_scc_hybrid_live: expected >=1 distributed round AND a "
            f"local finish, got {stats} — the hybrid fixture no longer "
            "exercises both paths"
        )
    return out.orderBy("node")
