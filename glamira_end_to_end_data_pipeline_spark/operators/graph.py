"""Iterative graph analytics over edge DataFrames: damped PageRank.

Complements the min-label-propagation connected components in
``operators/dedup.py`` (the other iterative graph shape in the engine)
with the weighted-propagation family: rank mass flows along edges each
round, so this is the GraphX/Pregel ``PageRank`` loop expressed as plain
joins + aggregations — no framework, no RDDs.

Scale shape (100 TB): the edge list is persisted ONCE and every round is
one join of it against the (node-sized) rank vector plus one
partial-aggregated sum keyed on the destination — nothing proportional
to the edge count is ever re-derived. Ranks are ``localCheckpoint``-ed
per round so the plan stays flat instead of nesting one join per
iteration (on a real cluster a reliable checkpoint dir does the same
job). Rank state is one row per node — tiny next to the edges — so the
loop's working set does not grow with iterations.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from glamira_end_to_end_data_pipeline_spark.caching import tracked_persist


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Damped PageRank over a directed edge list, fixed iteration count.

    ``rank(v) ← (1-d) + d · Σ_{u→v} rank(u)/outdeg(u)`` — the classic
    un-normalized formulation (Brin/Page; what GraphX's ``staticPageRank``
    computes), seeded at ``rank = 1.0``. Nodes are every id appearing as
    a source or destination; a node with no out-edges contributes
    nothing (dangling mass is dropped, matching GraphX).

    Returns ``(node, outdeg, rank)`` — one row per node, rank as an
    unrounded double (callers round for cross-engine comparison).

    ``broadcast_ranks`` (default True) ships the rank vector to the
    executors each round so the persisted edge list is NEVER shuffled —
    each iteration is then a map-side join over the edge cache + one
    partial-aggregated shuffle of contributions down to node
    cardinality. Right whenever nodes ≪ edges (co-occurrence graphs,
    product graphs: the rank vector is dimension-table-sized). For
    web-scale node counts that outgrow a broadcast, pass False: both
    sides hash-partition on the node id and every round reuses that
    co-partitioning.
    """
    # Persist the EDGE LIST itself (often the product of an expensive
    # upstream join/distinct) exactly once; the degree table and every
    # iteration derive from the cached rows — without this, each
    # consumer would silently recompute the caller's edge plan from
    # scratch.
    e = tracked_persist(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    # Node set and outdegree in ONE aggregation: union the endpoints
    # with a tag that counts 1 for source occurrences and 0 for
    # destination-only ones, so dangling nodes land with outdeg 0 and
    # no separate distinct / count / final-join passes exist.
    nodes = tracked_persist(
        e.select(F.col("u").alias("node"), F.lit(1).alias("t"))
        .unionAll(e.select(F.col("v").alias("node"), F.lit(0).alias("t")))
        .groupBy("node")
        .agg(F.sum("t").alias("outdeg")),
        StorageLevel.MEMORY_AND_DISK,
    )
    # The rank vector carries outdeg with it, so the per-round edge
    # join needs no second lookup table.
    ranks = nodes.withColumn("rank", F.lit(1.0))
    base, d = F.lit(1.0 - damping), F.lit(damping)
    ship = F.broadcast if broadcast_ranks else (lambda df: df)
    for _ in range(iters):
        contribs = (
            e.join(ship(ranks), e["u"] == ranks["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        ranks = (
            nodes.join(ship(contribs), "node", "left")
            .select(
                "node",
                "outdeg",
                (base + d * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
            # eager=False: intermediate rounds materialize in ONE
            # cascade at the final eager checkpoint below instead of
            # paying a ~0.3 s driver action each — lineage is still
            # cut per round, so the plan never deepens with iters.
            .localCheckpoint(eager=False)
        )
    # materialize BEFORE unpersisting the edge/node caches the lazy
    # chain still reads — unpersisting first would recompute them from
    # the caller's raw plan once per round.
    ranks = ranks.localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    broadcast_degrees: bool = True,
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list (given as
    distinct ``u < v`` pairs), by the degree-ordered orientation: every
    edge is re-pointed from its (degree, id)-smaller endpoint to the
    larger, so each triangle is enumerated exactly once and — the scale
    property — the wedge join ``o(a,b) ⋈ o(b,c)`` fans out on
    out-degrees, which orientation bounds by O(√m) even on power-law
    graphs where a hub's undirected degree would explode the naive
    3-way self-join (the standard distributed formulation: Cohen 2009,
    'Graph Twiddling in a MapReduce World').

    Three joins total: two to attach endpoint degrees, then wedge ⋈
    closing-edge, both keyed on endpoints. Returns (node, n_triangles)
    for every node in ≥1 triangle.

    ``broadcast_degrees`` (default True) ships the |V|-sized degree
    table to the executors for the two attach joins — right whenever
    nodes ≪ edges. The table IS node-count-sized, so for web-scale
    vertex sets pass False and the attach joins hash-partition on the
    endpoint instead (identical results, equality-tested) — the same
    escape hatch :func:`pagerank` exposes as ``broadcast_ranks``."""
    # Persist the caller's edge plan once: the adjacency union reads it
    # twice and the degree-keyed orientation a third time.
    e = tracked_persist(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ship = F.broadcast if broadcast_degrees else (lambda df: df)
    keyed = e.join(ship(da), "u").join(ship(db), "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = tracked_persist(
        keyed.select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("u"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("v"),
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    e1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    # No manual unpersist here: the returned DataFrame is lazy, so an
    # eager unpersist would empty both caches before the caller ever
    # runs an action and every downstream branch (und reads e twice, o
    # feeds three wedge-join branches) would replay the upstream edge
    # plan. tracked_persist scopes their lifetime to the registry
    # entry via release_tracked instead (pagerank can unpersist inline
    # only because its loop localCheckpoints — materializes — first).
    return per_node


# edge-rank base for triangle_count_delta: node ids stay far below
# 2^31 on every fixture, so u*2^31+v is a unique total order over
# undirected pairs (u < v) that fits a long with large headroom
_TRI_EKEY_BASE = 1 << 31


def triangle_count_delta(
    base: DataFrame,
    batch: DataFrame,
    src: str = "u",
    dst: str = "v",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Per-node NEW-triangle counts from an edge-APPEND batch, without
    re-enumerating any old triangle: every triangle gained contains
    >=1 batch edge, so it is a wedge CLOSED THROUGH a batch edge —
    enumerable from ``batch ⋈ adjacency``, work ∝ |batch| x degree.

    Exactly-once counting: batch edges carry a total-order rank
    (``u*2^31+v``; base edges rank -1) and a triangle is credited only
    at its HIGHEST-ranked batch edge — for batch edge (u, v) with rank
    r, a closing node w counts iff BOTH wedge arms rank strictly below
    r (base arms always do; batch arms only when smaller). Triangles
    with 1, 2, or 3 batch edges are each counted exactly once — no
    fractional weights, no dedup pass. Inputs are distinct undirected
    ``u < v`` pairs with ``base ∩ batch = ∅`` (caller contract).

    Returns ``(delta_counts(node, dn), wedge_frame, adjacency)`` —
    ``wedge_frame`` is the PERSISTED first-hop join (count it to gate
    the work actually performed), ``adjacency`` the persisted
    full-graph undirected adjacency (degree-aggregate it for the
    corpus wedge bound Σ_d C(d,2) a from-scratch recount would face).
    Equivalence with :func:`triangle_count` over ``base ∪ batch`` is
    property-tested in tests/test_graph.py."""
    b = base.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    d = batch.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).withColumn("ek", F.col("u") * F.lit(_TRI_EKEY_BASE) + F.col("v"))
    d = tracked_persist(d, StorageLevel.MEMORY_AND_DISK)
    tagged = b.withColumn("ek", F.lit(-1).cast("long")).unionByName(d)
    und = tracked_persist(
        tagged.select(
            F.col("u").alias("a"), F.col("v").alias("b"), "ek"
        ).unionByName(
            tagged.select(F.col("v").alias("a"), F.col("u").alias("b"), "ek")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    # first hop: wedge arms out of u — the (u, v) edge itself can never
    # slip in as an arm (w == v is excluded; its own rank fails ek < ek)
    j1 = tracked_persist(
        d.join(
            und.select(
                F.col("a").alias("u"),
                F.col("b").alias("w"),
                F.col("ek").alias("ek_uw"),
            ),
            "u",
        ).filter((F.col("w") != F.col("v")) & (F.col("ek_uw") < F.col("ek"))),
        StorageLevel.MEMORY_AND_DISK,
    )
    # second hop closes the wedge through (v, w) under the same rule
    tri = j1.join(
        und.select(
            F.col("a").alias("v"),
            F.col("b").alias("w"),
            F.col("ek").alias("ek_vw"),
        ),
        ["v", "w"],
    ).filter(F.col("ek_vw") < F.col("ek"))
    delta = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("dn"))
    )
    return delta, j1, und


def jaccard_link_prediction(
    edges: DataFrame,
    k_top: int = 20,
    src: str = "u",
    dst: str = "v",
    max_mid_degree: int | None = None,
    broadcast_degrees: bool = True,
) -> DataFrame:
    """Common-neighbor Jaccard link prediction over an undirected edge
    list (distinct ``u < v`` pairs): for node pairs NOT currently linked
    but sharing ≥1 neighbor, score = |N(a)∩N(b)| / |N(a)∪N(b)| — the
    classic neighborhood-overlap recommender ("customers who bought
    these also bought..." as a graph problem).

    Shape at scale: candidate pairs come from the WEDGE join (two edges
    sharing a midpoint) — only 2-hop pairs are ever scored, never the
    n² pair space; the intersection count IS the wedge count per pair
    (one shuffle keyed on the pair), degrees ride a broadcast, existing
    edges leave via one anti-join, and the top-k is
    orderBy().limit(k) — TakeOrderedAndProject, no global window.

    **Hub guard** (``max_mid_degree``, default ``None`` = no cap, true
    Jaccard): a midpoint of degree d emits d(d-1)/2 wedges into ONE
    shuffle key group — a single viral hub detonates the join no matter
    how sparse the rest of the graph is (a star graph is the degenerate
    case: n² candidate pairs, all through the center). When a cap is
    PASSED, midpoints with degree > ``max_mid_degree`` are excluded
    from wedge generation BEFORE the self-join, bounding per-key
    fan-out at max_mid_degree² regardless of graph shape. This is also
    the standard recommender semantics: a neighbor shared with everyone
    ("everyone bought a gift bag") carries no similarity signal — the
    same inverse-frequency logic as Adamic-Adar's 1/log d weighting,
    taken to a hard cutoff so the plan is skew-proof. SEMANTICS UNDER A
    CAP: scores count only sub-hub common neighbors while denominators
    keep the full degrees, so capped scores are a LOWER BOUND on true
    Jaccard — which is why the cap is opt-in, never a silent default
    (skew-prone callers at scale should pass one deliberately).

    ``broadcast_degrees`` (default True): the degree lookups are
    |V|-sized — pass False on web-scale vertex sets to hash-partition
    those joins instead of building a node-count broadcast (identical
    results, equality-tested; :func:`pagerank`'s escape hatch)."""
    e, deg, inter = _capped_wedge_pairs(
        edges, src, dst, max_mid_degree, broadcast_degrees
    )
    ship = F.broadcast if broadcast_degrees else (lambda df: df)
    cand = inter.join(e, (inter["a"] == e["u"]) & (inter["b"] == e["v"]), "left_anti")
    scored = (
        cand.join(ship(deg.select(F.col("node").alias("a"), F.col("d").alias("da"))), "a")
        .join(ship(deg.select(F.col("node").alias("b"), F.col("d").alias("db"))), "b")
        .select(
            "a",
            "b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("da") + F.col("db") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard"), F.asc("a"), F.asc("b")
    ).limit(k_top)


def _capped_wedge_pairs(
    edges: DataFrame,
    src: str,
    dst: str,
    max_mid_degree: int | None,
    broadcast_degrees: bool = True,
):
    """Shared candidate machinery for the neighborhood-overlap scorers
    (:func:`jaccard_link_prediction`, :func:`adamic_adar_link_prediction`):
    persist the caller's edge plan once (it feeds the adjacency union,
    the degree table, both wedge sides, and the caller's anti-join),
    drop hub midpoints BEFORE the wedge self-join (per-shuffle-key
    fan-out ≤ max_mid_degree², independent of graph shape), and
    aggregate wedges to one row per unordered 2-hop pair.

    Returns ``(e, deg, inter)``: the persisted ``u < v`` edge list, the
    node degree table, and per-pair ``(a, b, n_common, aa_score)`` —
    the common-neighbor count and the Adamic-Adar sum Σ 1/ln(d_mid)
    over the same sub-hub midpoints (a contributing midpoint links two
    distinct neighbors, so d_mid ≥ 2 and the log never hits zero)."""
    e = tracked_persist(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = tracked_persist(
        und.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).alias("d")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    if max_mid_degree is None:
        # Uncapped = exact scores, but a viral hub fans d² wedges into
        # one shuffle key. The default flipped 1000 → None in round 6
        # (capped scores are lower bounds, so a silent cap was the
        # wrong default); this warning is the flip's safety net for
        # callers who relied on the old bound: one cheap degree-agg
        # action (deg is persisted and feeds two broadcasts anyway)
        # names the hub before the wedge join detonates on it.
        hub = deg.orderBy(F.desc("d")).limit(1).collect()
        if hub and hub[0]["d"] > 10_000:
            import logging

            logging.getLogger(__name__).warning(
                "uncapped wedge join: max node degree is %d (node %s) — "
                "%.1e candidate pairs through one shuffle key; pass "
                "max_mid_degree to bound the fan-out (scores become "
                "lower bounds)",
                hub[0]["d"],
                hub[0]["node"],
                hub[0]["d"] ** 2 / 2,
            )
        mids = deg
    else:
        mids = deg.filter(F.col("d") <= max_mid_degree)
    ship = F.broadcast if broadcast_degrees else (lambda df: df)
    sub_hub = und.join(
        ship(
            mids.select(F.col("node").alias("v"), F.col("d").alias("d_mid"))
        ),
        "v",
    )
    w1 = sub_hub.select(
        F.col("v").alias("mid"), F.col("u").alias("a"), "d_mid"
    )
    w2 = sub_hub.select(F.col("v").alias("mid"), F.col("u").alias("b"))
    inter = (
        w1.join(w2, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.lit(1.0) / F.log(F.col("d_mid"))).alias("aa_score"),
        )
    )
    return e, deg, inter


def adamic_adar_link_prediction(
    edges: DataFrame,
    k_top: int = 20,
    src: str = "u",
    dst: str = "v",
    max_mid_degree: int | None = None,
    broadcast_degrees: bool = True,
) -> DataFrame:
    """Adamic-Adar link prediction over an undirected edge list: for
    unlinked 2-hop pairs, score = Σ_{m ∈ N(a)∩N(b)} 1/ln(deg(m)) — the
    inverse-log-frequency refinement of common-neighbor counting
    (Adamic & Adar 2003): a shared neighbor linked to everything is
    weak evidence, a shared neighbor with few links is strong. The
    smooth version of the same insight the hub cap applies as a hard
    cutoff — so the two compose naturally when a cap is passed: sub-hub
    midpoints are weighted by 1/ln d, super-hub midpoints
    (> ``max_mid_degree``) contribute zero AND never enter the wedge
    shuffle. Default ``None`` = no cap (exact Adamic-Adar); pass a cap
    deliberately on skew-prone graphs — see
    :func:`jaccard_link_prediction` for the lower-bound semantics.

    Same plan shape as :func:`jaccard_link_prediction` (one wedge
    shuffle keyed on the pair, anti-join, TakeOrderedAndProject top-k);
    the weight rides the wedge rows, so scoring adds no extra pass.
    ``broadcast_degrees=False`` de-broadcasts the |V|-sized midpoint
    lookup for web-scale vertex sets (see
    :func:`jaccard_link_prediction`)."""
    e, _deg, inter = _capped_wedge_pairs(
        edges, src, dst, max_mid_degree, broadcast_degrees
    )
    cand = inter.join(e, (inter["a"] == e["u"]) & (inter["b"] == e["v"]), "left_anti")
    scored = cand.select(
        "a", "b", "n_common", F.round(F.col("aa_score"), 6).alias("aa_score")
    )
    return scored.orderBy(
        F.desc("aa_score"), F.asc("a"), F.asc("b")
    ).limit(k_top)


def ordered_pairs(arr: Column) -> Column:
    """Map-side ordered-pair expansion of an array column: one
    ``struct(u, v)`` per element pair with ``u < v``, multiplicity
    n_u·n_v when values repeat (matching a self-join's semantics) — the
    HOF that turns a ``collect_list``-ed group into its pair list
    WITHOUT a second shuffle or a self-join. Per-group cost is O(k²) on
    the collected array, which is the single-shuffle co-occurrence
    edge-build discipline (orders are few-line; a group large enough to
    make k² hurt needs the hub-cap treatment anyway). Shared by the
    co-purchase edge builder and the graph-fixture clique expansion so
    the idiom cannot drift between call sites. Explode the result and
    read ``col.u`` / ``col.v``."""
    return F.flatten(
        F.transform(
            arr,
            lambda x: F.filter(
                F.transform(
                    arr,
                    lambda y: F.when(x < y, F.struct(x.alias("u"), y.alias("v"))),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )


def _peel_round(und: DataFrame, k: int) -> DataFrame:
    """ONE k-core peel step over an undirected (both-directions) edge
    list: one partial-aggregated degree count + two semi-joins against
    the surviving node set. Shared by :func:`kcore_peel` (fixed rounds)
    and :func:`kcore_exact` (convergence loop) so the two variants stay
    provably in lockstep — the exact variant's contract IS "the fixed
    variant run until nothing changes". Caller checkpoints the result."""
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    keep = deg.filter(F.col("d") >= k).select("node")
    return (
        und.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
        .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
        .select("u", "v")
    )


def _lpa_round(und: DataFrame, labels: DataFrame) -> DataFrame:
    """ONE synchronous LPA step: neighbor-label vote count + per-node
    deterministic argmax (max count, ties to the smallest label).
    Shared by :func:`lpa_communities` and :func:`lpa_exact` (same
    lockstep rationale as :func:`_peel_round`). Caller checkpoints."""
    votes = (
        und.join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(F.col("u").alias("node"), "lab")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("node", "lab")
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Iterative k-core peeling over an undirected edge list (``u < v``
    pairs): each round removes every node of degree < k, which lowers
    its neighbors' degrees, so the next round may remove more — after
    convergence the survivors are exactly the k-core (the maximal
    subgraph where every node keeps ≥ k neighbors), the standard
    densest-region extractor (community cores, spam-farm detection,
    graph sparsification before expensive algorithms).

    ``rounds`` bounds the iterations (a fixed unrollable count keeps
    the cross-engine oracle expressible; cascades longer than
    ``rounds`` leave a superset of the k-core — callers needing exact
    convergence loop until the survivor count stops changing). Returns
    ``(node, degree)`` for nodes surviving all rounds, degrees within
    the surviving subgraph.

    Scale shape: each round is ONE degree aggregation (map-side
    partial) + two semi-joins of the edge list against the shrinking
    survivor set; the edge list only ever shrinks, and
    ``localCheckpoint`` flattens the plan per round (the pagerank
    discipline) so the final plan does not nest ``rounds`` copies of
    the upstream edge derivation."""
    und = tracked_persist(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .unionAll(
            edges.select(
                F.col(dst).cast("long").alias("u"),
                F.col(src).cast("long").alias("v"),
            )
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    for _ in range(rounds):
        # eager=False: the fixed-round cascade materializes at the
        # consumer's action — lineage still cut per round.
        und = _peel_round(und, k).localCheckpoint(eager=False)
    return und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def lpa_communities(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007) over an undirected
    edge list, made DETERMINISTIC: every node starts labeled with its
    own id; each round it adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label (plain LPA breaks ties
    randomly, which is useless for a reproducible pipeline or a
    cross-engine oracle). Unlike connected components (which merges
    everything reachable) LPA stops at density boundaries — two
    communities joined by one bridge edge keep separate labels — and
    unlike k-core it assigns EVERY node a community.

    ``rounds`` is fixed (unrollable oracle; LPA converges in a handful
    of sweeps on most graphs). Per round: one edge⋈label join + one
    (node, label) count + one per-node argmax — all keyed on the node,
    partial-aggregated, with ``localCheckpoint`` flattening the plan
    (the pagerank discipline). Returns (node, community)."""
    # persist the BASE edge select, then derive the adjacency union
    # from the cache — persisting the union directly would execute the
    # caller's (often expensive) edge plan once per union branch while
    # the cache materializes (the pagerank discipline).
    e = tracked_persist(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    und = tracked_persist(
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"))),
        StorageLevel.MEMORY_AND_DISK,
    )
    labels = und.select(F.col("u").alias("node")).distinct().withColumn(
        "lab", F.col("node")
    )
    for _ in range(rounds):
        # eager=False: same one-cascade discipline as kcore_peel.
        labels = _lpa_round(und, labels).localCheckpoint(eager=False)
    return labels.withColumnRenamed("lab", "community")


# ---------------------------------------------------------------------------
# Driver-local exact finishers — the hybrid tail of the convergence loops
# ---------------------------------------------------------------------------
# A BSP convergence loop pays a fixed driver-action + stage-scheduling
# floor PER ROUND regardless of data volume, so once the (sub)graph fits
# comfortably on the driver it is strictly faster — and no less exact —
# to finish with the sequential algorithm. This is the FW-BW + Tarjan
# hybrid of Hong et al. 2013 ("On fast parallel detection of strongly
# connected components"), adopted because FW-BW's tail (many small
# leftover components, each costing a full distributed peel round) is
# its known pathology; the same argument covers k-core peeling (a
# length-L dangling chain peels one node per round), synchronous LPA
# (the label wave crosses a chain one hop per round) and BFS (diameter
# rounds). Each finisher reproduces its distributed round's semantics
# EXACTLY — same tie-breaking, same fixed point (unique for
# SCC/k-core/BFS; LPA replays the same deterministic synchronous vote)
# — pinned by two-path equality tests in tests/test_graph.py.
# ``local_threshold`` bounds the collected edge rows (~16 bytes each;
# the 200k default is ~3 MB of driver memory). Pass 0 to force the
# distributed path end-to-end.
_LOCAL_THRESHOLD = 200_000

# The triangle twins pay WEDGE-shaped Python work (Σ_d C(d,2) set
# probes, up to ~m^1.5 under degree ordering) — not the near-linear
# union-find cost _LOCAL_THRESHOLD was sized for — so the local
# triangle path is additionally gated on the corpus wedge count
# (ADVICE r15). 2M set probes is well under a second of driver CPU,
# still far below the multi-second distributed stage latency the
# local path exists to avoid; a high-degree graph whose wedge count
# exceeds the cap takes the distributed operators even when its edge
# list would fit on the driver.
_LOCAL_TRIANGLE_WEDGE_CAP = 2_000_000


def _tarjan_scc(edge_list: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan over a bounded edge list; returns
    ``{node: min node id of its SCC}`` for every endpoint."""
    adj: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for u, v in edge_list:
        adj.setdefault(u, []).append(v)
        nodes.update((u, v))
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    counter = 0
    for root in nodes:
        if root in index:
            continue
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack.add(root)
        work = [(root, iter(adj.get(root, ())))]
        while work:
            node, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                if w in on_stack and index[w] < low[node]:
                    low[node] = index[w]
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                if low[node] < low[parent]:
                    low[parent] = low[node]
            if low[node] == index[node]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == node:
                        break
                scc_id = min(members)
                for w in members:
                    comp[w] = scc_id
    return comp


def _local_kcore(
    und_edges: list[tuple[int, int]], k: int
) -> list[tuple[int, int]]:
    """Sequential k-core peel over a bounded BOTH-DIRECTIONS edge list;
    returns ``(node, within-core degree)`` for the survivors. The
    k-core is a unique, removal-order-independent fixed point, so the
    queue-driven peel lands exactly where the synchronous rounds do.
    Parallel edges count toward degree, matching the distributed
    ``groupBy(u).count()``."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    for u, v in und_edges:
        adj.setdefault(u, []).append(v)
    deg = {n: len(vs) for n, vs in adj.items()}
    removed: set[int] = set()
    queue = deque(n for n, d in deg.items() if d < k)
    while queue:
        n = queue.popleft()
        if n in removed:
            continue
        removed.add(n)
        for w in adj[n]:
            if w not in removed:
                deg[w] -= 1
                if deg[w] < k:
                    queue.append(w)
    return [(n, deg[n]) for n in adj if n not in removed]


def _local_lpa(
    und_edges: list[tuple[int, int]], max_rounds: int
) -> list[tuple[int, int]]:
    """Sequential replay of ``_lpa_round``'s synchronous vote (most
    frequent neighbor label, ties to the smallest) for exactly
    ``max_rounds`` rounds with the same consecutive-equality early
    exit — bit-identical to the distributed loop by construction."""
    from collections import Counter

    adj: dict[int, list[int]] = {}
    for u, v in und_edges:
        adj.setdefault(u, []).append(v)
    labs = {n: n for n in adj}
    for _ in range(max_rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt = Counter(labs[w] for w in nbrs)
            best_count = max(cnt.values())
            new[n] = min(lab for lab, c in cnt.items() if c == best_count)
        if new == labs:
            break
        labs = new
    return list(labs.items())


def _local_cc(edge_list: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sequential union-find over a bounded edge list; labels every
    node with the MINIMUM node id of its component — the exact fixed
    point ``dedup.duplicate_clusters``' min-label propagation converges
    to (pinned by a two-path equality test). Union always points the
    larger root at the smaller, so each tree's root IS its component's
    minimum id; rank is deliberately sacrificed for that invariant —
    path compression keeps the bounded input near-linear anyway.
    The local finish exists because the distributed loop's cost on a
    TINY frame is pure per-round driver latency (join + agg +
    localCheckpoint + probe ≈ 1 s/round), which dwarfs the work: the
    batch-bounded meta/affected graphs of the incremental CC entries
    measured ~5 s distributed vs milliseconds here."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in edge_list:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return [(n, find(n)) for n in parent]


def _local_triangle_counts(
    edge_list: list[tuple[int, int]],
) -> list[tuple[int, int]]:
    """Sequential per-node triangle counts over a bounded list of
    distinct undirected ``u < v`` pairs — the exact numbers
    :func:`triangle_count` produces (same degree-ordered orientation:
    each edge re-pointed from its (degree, id)-smaller endpoint, each
    triangle enumerated once as a→b, b→c, a→c), pinned by a two-path
    equality test. Exists for the same reason as :func:`_local_cc`:
    on a bounded graph the distributed wedge join's cost is pure
    per-stage driver latency (the incremental triangle entry measured
    ~3.3 s for a 3.6k-edge admission recount vs milliseconds here)."""
    deg: dict[int, int] = {}
    for u, v in edge_list:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    adj: dict[int, set[int]] = {}
    for u, v in edge_list:
        a, b = (u, v) if (deg[u], u) < (deg[v], v) else (v, u)
        adj.setdefault(a, set()).add(b)
    counts: dict[int, int] = {}
    empty: set[int] = set()
    for a, nbrs in adj.items():
        for b in nbrs:
            for c in nbrs & adj.get(b, empty):
                counts[a] = counts.get(a, 0) + 1
                counts[b] = counts.get(b, 0) + 1
                counts[c] = counts.get(c, 0) + 1
    return sorted(counts.items())


def _local_triangle_delta(
    base_list: list[tuple[int, int]],
    batch_list: list[tuple[int, int]],
) -> tuple[list[tuple[int, int]], int, int]:
    """Sequential twin of :func:`triangle_count_delta` over bounded
    edge lists (distinct undirected ``u < v`` pairs, base ∩ batch =
    ∅): per-node NEW-triangle counts under the identical
    highest-ranked-batch-edge rule (batch edges rank ``u*2^31+v``,
    base arms rank -1; a closing node counts iff BOTH wedge arms rank
    strictly below the batch edge's), plus the two gate numbers the
    incremental entry runtime-checks — ``n_wedges`` (the first-hop fan
    actually examined, = the distributed ``j1`` row count) and
    ``corpus_wedges`` (Σ_d C(d,2) over the merged graph, the work a
    from-scratch recount would face). Two-path equality with the
    distributed operator is pinned in tests/test_graph.py."""
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v in base_list:
        adj.setdefault(u, []).append((v, -1))
        adj.setdefault(v, []).append((u, -1))
    for u, v in batch_list:
        r = u * _TRI_EKEY_BASE + v
        adj.setdefault(u, []).append((v, r))
        adj.setdefault(v, []).append((u, r))
    counts: dict[int, int] = {}
    n_wedges = 0
    for u, v in batch_list:
        r = u * _TRI_EKEY_BASE + v
        arm_u = {w: e for w, e in adj[u] if w != v and e < r}
        n_wedges += len(arm_u)
        arm_v = {w: e for w, e in adj[v] if e < r}
        for w in arm_u:
            if w in arm_v:
                counts[u] = counts.get(u, 0) + 1
                counts[v] = counts.get(v, 0) + 1
                counts[w] = counts.get(w, 0) + 1
    corpus_wedges = sum(
        len(vs) * (len(vs) - 1) // 2 for vs in adj.values()
    )
    return sorted(counts.items()), n_wedges, corpus_wedges


def _local_bfs(
    edge_list: list[tuple[int, int]], sources: Sequence[int]
) -> list[tuple[int, int]]:
    """Sequential multi-source BFS over a bounded directed edge list;
    min hop distances are a unique fixed point, identical to the
    distributed min-propagation loop."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    for u, v in edge_list:
        adj.setdefault(u, []).append(v)
    dist = {int(s): 0 for s in sources}
    queue = deque(dist)
    while queue:
        n = queue.popleft()
        for w in adj.get(n, ()):
            if w not in dist:
                dist[w] = dist[n] + 1
                queue.append(w)
    return list(dist.items())


def kcore_exact(
    edges: DataFrame,
    k: int = 3,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 100,
    batch0: int = 1,
    local_threshold: int = _LOCAL_THRESHOLD,
) -> DataFrame:
    """k-core peeling to the FIXED POINT: loop until a round removes no
    edge, so the survivors are exactly the k-core no matter how deep the
    removal cascade runs — the convergence-looped companion of
    :func:`kcore_peel`, whose fixed ``rounds`` leaves a SUPERSET of the
    core on graphs whose cascade outruns it (a dangling chain of length
    L needs L rounds: each peel exposes the next degree-deficient node).

    Convergence is detected on the EDGE count (driver-side, the
    pagerank discipline): degrees derive from edges, so an unchanged
    edge set is an unchanged degree table is an unchanged survivor set
    — a true fixed point, not a heuristic. Each round removes ≥1 edge
    or terminates, bounding iterations by |E| (``max_rounds`` is a
    runaway backstop for adversarial inputs, not a semantic knob).

    Per-round cost is identical to :func:`kcore_peel` — ONE partial-
    aggregated degree count + two semi-joins against the shrinking
    survivor set — plus one O(1) driver-side count of the freshly
    ``localCheckpoint``-ed (already materialized) edge cache; the plan
    stays flat across arbitrarily many rounds. Returns ``(node,
    degree)`` within the k-core."""
    und = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .unionAll(
            edges.select(
                F.col(dst).cast("long").alias("u"),
                F.col(src).cast("long").alias("v"),
            )
        )
        .localCheckpoint()
    )
    n_edges = und.count()
    if n_edges <= local_threshold:
        # hybrid tail (see _LOCAL_THRESHOLD): the cascade costs a
        # distributed round PER PEELED LAYER but the edge list is
        # driver-bounded — finish sequentially at the identical
        # (unique, order-independent) fixed point.
        survivors = _local_kcore([(r.u, r.v) for r in und.collect()], k)
        und.unpersist()
        return edges.sparkSession.createDataFrame(
            survivors, "node long, degree long"
        )
    # Adaptive doubling: peeling is monotone (edges only leave), so an
    # unchanged edge count over a BATCH of peel rounds proves the fixed
    # point held at the batch start, and peeling a converged core is a
    # no-op — batch 1, 2, 4, 8 rounds per driver action (the ~0.3 s
    # action floor dominates on local mode; the cap bounds plan depth
    # and overshoot work). ``batch0`` seeds the schedule for callers
    # that know the cascade depth — overshoot is a no-op.
    batch = batch0
    rounds_done = 0
    while rounds_done < max_rounds:
        if n_edges == 0:
            break
        for _ in range(batch):
            und = _peel_round(und, k).localCheckpoint(eager=False)
        rounds_done += batch
        n_next = und.count()
        if n_next == n_edges:
            break
        n_edges = n_next
        batch = min(batch * 2, 8)
    return und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def lpa_exact(
    edges: DataFrame,
    max_rounds: int = 12,
    src: str = "u",
    dst: str = "v",
    batch0: int = 1,
    local_threshold: int = _LOCAL_THRESHOLD,
) -> DataFrame:
    """Deterministic synchronous label propagation run to STABILITY:
    iterate :func:`lpa_communities`' vote/argmax round until no node
    changes label (or ``max_rounds``, a hard cap) — the convergence-
    looped companion for graphs where the label wave outruns a fixed
    round count (a chain of length L relays the community label one hop
    per round).

    The cap is part of the CONTRACT, not just a backstop: synchronous
    LPA can 2-cycle on bipartite-ish structures (Raghavan 2007's known
    oscillation), so "loop forever until stable" is not total. The
    semantics are exactly "``max_rounds`` unrolled rounds" — a
    cross-engine oracle unrolls precisely that — while the stability
    check merely EXITS EARLY once a fixed point is reached (labels at a
    fixed point are invariant under further rounds, so early exit and
    full unroll agree). Change detection is one node-sized self-join
    count per round, driver-side.

    Returns ``(node, community)``."""
    e = tracked_persist(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    und = tracked_persist(
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"))),
        StorageLevel.MEMORY_AND_DISK,
    )
    if und.count() <= local_threshold:
        # hybrid tail (see _LOCAL_THRESHOLD): _local_lpa replays the
        # same deterministic synchronous vote, so the label sequence
        # is identical round for round.
        labs = _local_lpa(
            [(r.u, r.v) for r in und.collect()], max_rounds
        )
        e.unpersist()
        und.unpersist()
        return edges.sparkSession.createDataFrame(
            labs, "node long, community long"
        )
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint()
    )
    # Adaptive doubling with a LAST-TWO-STATES probe: synchronous LPA
    # can 2-cycle, so "labels unchanged across a batch" does NOT prove
    # a fixed point (a period-2 oscillation matches any even batch).
    # Comparing only the batch's final two consecutive states is sound:
    # consecutive equality IS the fixed-point definition, so early exit
    # returns exactly labels(max_rounds); if no consecutive pair ever
    # matches, the batches are clamped to run precisely ``max_rounds``
    # unrolled rounds — the contract the cross-engine oracle unrolls.
    rounds_done = 0
    batch = batch0
    while rounds_done < max_rounds:
        batch = min(batch, max_rounds - rounds_done)
        prev = labels
        for _ in range(batch):
            prev = labels
            labels = _lpa_round(und, labels).localCheckpoint(eager=False)
        rounds_done += batch
        n_changed = (
            labels.alias("n")
            .join(prev.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        if n_changed == 0:
            break
        batch = min(batch * 2, 8)
    return labels.withColumnRenamed("lab", "community")


def scc_exact(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 100,
    trim_batch0: int = 1,
    fwd_batch0: int = 2,
    bwd_batch0: int = 2,
    local_threshold: int = _LOCAL_THRESHOLD,
    stats: dict | None = None,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph, run to the
    fixed point — the coloring / forward-backward algorithm (Orzan;
    the FW-BW family every BSP graph system uses, since Tarjan's
    stack is inherently sequential). Returns ``(node, scc_id)`` with
    ``scc_id`` = the minimum node id in the component.

    Per outer round over the still-unassigned subgraph:

    0. TRIM to a fixed point: a node with no in-edges or no out-edges
       within the remaining subgraph cannot sit on a cycle — it is its
       own singleton SCC. On real directed graphs (web, citation,
       follow graphs) the vast majority of nodes are trivial SCCs, and
       trimming peels them in cheap |E|-linear rounds (two distincts +
       two semi-joins each) before the expensive coloring machinery
       ever runs — the standard FW-BW-Trim refinement (McLendon et
       al.). Trim is a PURE OPTIMIZATION — the coloring rounds assign
       trivial SCCs correctly without it — so it is SKIPPED in any
       outer round whose predecessor's trim removed nothing (tracked
       arithmetically, no extra action): after the first peel most
       rounds would only re-prove an already-trimmed subgraph, paying
       a full probe cycle for nothing. Peeling an SCC can re-expose
       trivial nodes; those then exit through the coloring path at
       worst one round later, and trimming resumes the round after
       any round whose trim did remove nodes.
    1. FORWARD coloring to a fixed point: ``f(v)`` = min id that
       reaches v, by iterated min-propagation along edges. Labels
       only decrease, so Σf is strictly monotone — convergence is ONE
       single-row aggregate per inner round, not a row-level diff.
    2. For each color class rooted at r (``f(r) = r``), the SCC of r
       is exactly the members that reach r back USING ONLY same-color
       nodes: any r→*v path stays inside color r (an intermediate
       with a smaller color would have propagated it to v), so a
       backward flag from the roots along class-internal edges is
       both sound and complete. Flags only get added — convergence is
       a count.
    3. Flagged nodes are assigned (scc_id = their color) and leave
       the subgraph with their incident edges; unflagged class
       members (reachable from r but not back) wait for a later
       round. Every round assigns at least each class root, bounding
       outer rounds by the number of SCCs.

    The loop discipline is kcore_exact's: ``localCheckpoint`` after
    every mutation keeps the plan flat however many rounds run;
    per-round driver actions are O(1)-row aggregates. Every inner
    loop (trim, forward, backward) is monotone — node sets shrink,
    labels only decrease, flags only grow — so convergence probes run
    on an ADAPTIVE DOUBLING schedule (1, 2, 4, … batched propagation
    steps per driver action, capped to bound plan depth): a probe
    showing no change over a batch proves the fixed point held at the
    batch's START, and overshooting a fixed point is a no-op, so
    batching trades cheap redundant joins for the ~0.3 s/action
    driver floor that dominates iterative graph work on local mode.
    ``trim_batch0``/``fwd_batch0``/``bwd_batch0`` seed each loop's
    doubling schedule — callers that know the workload's convergence
    depth (a fixture's chain length, a re-run after a prior round)
    start higher and skip the schedule's warm-up probes; overshoot
    is a no-op by the same monotonicity argument.
    Each step is one edge-keyed join + one min/distinct aggregation —
    the Pregel message shape, linear in |E| per round. Round counts
    are bounded by the subgraph DIAMETER (forward) and SCC count
    (outer).

    Raises ``RuntimeError`` if ``max_rounds`` outer rounds exhaust
    with nodes still unassigned (a silent partial result would look
    like a valid labelling); an empty edge set returns an empty
    (node, scc_id) frame.

    ``stats``, when given, is filled in place with execution-path
    evidence: ``initial_edges``, ``bsp_rounds`` (completed distributed
    outer rounds), and ``local_finish`` (whether a driver-local Tarjan
    pass closed the computation — True both for the whole-graph fast
    path, with bsp_rounds == 0, and for the hybrid tail). Graded
    entries gate on it so a green driver grade PROVES which paths
    ran."""
    spark = edges.sparkSession
    e_all = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    n_edges = e_all.count()
    if stats is not None:
        stats.update(
            {"initial_edges": n_edges, "bsp_rounds": 0, "local_finish": False}
        )
    if n_edges == 0:
        return spark.createDataFrame([], "node long, scc_id long")
    if n_edges <= local_threshold:
        # hybrid fast path (see _LOCAL_THRESHOLD / Hong et al. 2013):
        # the whole graph is driver-bounded — Tarjan lands on the same
        # unique component set with scc_id = min member id.
        comp = _tarjan_scc([(r.u, r.v) for r in e_all.collect()])
        if stats is not None:
            stats["local_finish"] = True
        return spark.createDataFrame(
            sorted(comp.items()), "node long, scc_id long"
        )
    remaining = (
        e_all.select(F.col("u").alias("node"))
        .unionAll(e_all.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = e_all
    assigned_parts: list[DataFrame] = []
    # The remaining-node count is tracked ARITHMETICALLY where it can
    # be (it shrinks by exactly the flagged count after the backward
    # pass); trim probes re-measure it directly.
    n_rem = remaining.count()
    last_trim_removed: int | None = None  # None = trim never attempted
    for _ in range(max_rounds):
        if n_rem == 0:
            break
        if 0 < local_threshold and n_rem <= local_threshold:
            # FW-BW's tail pathology: many small leftover components,
            # each costing full distributed peel rounds. Once the
            # remainder is driver-bounded, finish with Tarjan; nodes
            # stripped of all edges by earlier peels are their own
            # singleton SCCs.
            n_e_now = e.count()
            if n_e_now <= local_threshold:
                comp = _tarjan_scc([(r.u, r.v) for r in e.collect()])
                for r in remaining.collect():
                    comp.setdefault(r.node, r.node)
                assigned_parts.append(
                    spark.createDataFrame(
                        sorted(comp.items()), "node long, scc_id long"
                    )
                )
                if stats is not None:
                    stats["local_finish"] = True
                n_rem = 0
                break
        # 0. TRIM to a fixed point: nodes missing either edge
        # direction in the remaining subgraph are singleton SCCs.
        # Node sets only shrink, so a probe showing no shrink over a
        # batch proves the fixed point — doubling schedule applies.
        # Skipped only while the subgraph is one trim already proved
        # trim-stable: a zero-removal trim disarms the pre-pass, and
        # any backward pass that peels nodes re-arms it (reset at the
        # bottom of the loop) because peeled SCCs can expose new
        # trivial-node cascades.
        if last_trim_removed != 0:
            trim_start = remaining
            n_before = n_rem
            batch = trim_batch0
            while n_rem > 0:
                for _ in range(batch):
                    both = (
                        e.select(F.col("u").alias("node"))
                        .distinct()
                        .join(e.select(F.col("v").alias("node")).distinct(), "node")
                        .localCheckpoint(eager=False)
                    )
                    e = (
                        e.join(both.withColumnRenamed("node", "u"), "u", "left_semi")
                        .join(both.withColumnRenamed("node", "v"), "v", "left_semi")
                        .localCheckpoint(eager=False)
                    )
                    remaining = both
                n_next = remaining.count()
                if n_next == n_rem:
                    break
                n_rem = n_next
                batch = min(batch * 2, 8)
            last_trim_removed = n_before - n_rem
            if last_trim_removed:
                trimmed = trim_start.join(remaining, "node", "left_anti")
                assigned_parts.append(
                    trimmed.select(
                        "node", F.col("node").alias("scc_id")
                    ).localCheckpoint(eager=False)
                )
            if n_rem == 0:
                break
        # 1. forward min-label propagation to the fixed point, probed
        # on the doubling schedule: a driver action (the Σlabel
        # convergence probe) costs a fixed ~0.3 s on local mode
        # regardless of data, and labels only decrease, so Σ unchanged
        # over a batch of steps proves convergence held at the batch
        # start while overshoot is a no-op.
        def _fwd_step(labels: DataFrame) -> DataFrame:
            msgs = e.join(labels, e["u"] == labels["node"]).select(
                e["v"].alias("node"), F.col("lab")
            )
            return (
                labels.unionAll(msgs)
                .groupBy("node")
                .agg(F.min("lab").alias("lab"))
            )

        # eager=False: the checkpoint materializes AT the convergence
        # probe (one driver action per batch total) while still
        # cutting lineage for the next step.
        f = remaining.select("node", F.col("node").alias("lab")).localCheckpoint()
        prev = f.agg(F.sum("lab")).collect()[0][0]
        batch = fwd_batch0
        for _ in range(max_rounds):
            for _ in range(batch):
                f = _fwd_step(f).localCheckpoint(eager=False)
            s = f.agg(F.sum("lab")).collect()[0][0]
            if s == prev:
                break
            prev = s
            batch = min(batch * 2, 16)
        # 2. class-internal edges + backward flag from the roots
        fu = f.select(F.col("node").alias("u"), F.col("lab").alias("lab_u"))
        fv = f.select(F.col("node").alias("v"), F.col("lab").alias("lab_v"))
        e_cls = (
            e.join(fu, "u")
            .join(fv, "v")
            .filter(F.col("lab_u") == F.col("lab_v"))
            .select("u", "v", F.col("lab_u").alias("lab"))
            .localCheckpoint(eager=False)
        )
        def _bwd_step(flags: DataFrame) -> DataFrame:
            new_flags = e_cls.join(
                flags, (e_cls["v"] == flags["node"]) & (e_cls["lab"] == flags["lab"])
            ).select(e_cls["u"].alias("node"), e_cls["lab"].alias("lab"))
            return flags.unionAll(new_flags).distinct()

        g = f.filter(F.col("node") == F.col("lab")).localCheckpoint(eager=False)
        n_flagged = g.count()
        batch = bwd_batch0
        for _ in range(max_rounds):
            # flags only grow — same monotone-probe argument
            for _ in range(batch):
                g = _bwd_step(g).localCheckpoint(eager=False)
            n_next = g.count()
            if n_next == n_flagged:
                break
            n_flagged = n_next
            batch = min(batch * 2, 16)
        # 3. assign the flagged members, shrink the subgraph
        assigned_parts.append(g.withColumnRenamed("lab", "scc_id"))
        done = g.select("node")
        remaining = remaining.join(done, "node", "left_anti").localCheckpoint(
            eager=False
        )
        e = (
            e.join(done.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(done.withColumnRenamed("node", "v"), "v", "left_anti")
            .localCheckpoint(eager=False)
        )
        n_rem -= n_flagged
        if stats is not None:
            stats["bsp_rounds"] += 1
        # Peeling whole SCCs can expose fresh trivial-node cascades, so
        # a backward pass that removed nodes RE-ARMS the trim pre-pass
        # even if the previous trim removed 0 (without this reset,
        # last_trim_removed == 0 would disable trimming for every
        # remaining outer round — the resumption the docstring
        # promises could never trigger).
        if n_flagged > 0:
            last_trim_removed = None
    else:
        if n_rem > 0:
            raise RuntimeError(
                f"scc_exact: {n_rem} nodes unassigned after {max_rounds} "
                "outer rounds — raise max_rounds (result would be partial)"
            )
    if not assigned_parts:
        return spark.createDataFrame([], "node long, scc_id long")
    out = assigned_parts[0]
    for part in assigned_parts[1:]:
        out = out.unionAll(part)
    return out


def bfs_distances(
    edges: DataFrame,
    sources: Sequence[int],
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 50,
    batch0: int = 1,
    local_threshold: int = _LOCAL_THRESHOLD,
) -> DataFrame:
    """Multi-source BFS hop distances over a directed edge list, run to
    the fixed point — the unweighted SSSP every graph system exposes
    (GraphX ``shortestPaths``, Pregel's canonical example). Returns
    ``(node, dist)`` for every node REACHABLE from any source (the
    min over sources of the hop count; unreachable nodes are absent).

    Per step: dist'(v) = min(dist(v), 1 + min over in-neighbors'
    dist) — one edge⋈dist join + one min-aggregation, the Pregel
    message shape, linear in |E|. The frontier state is monotone in
    BOTH probe dimensions (the reached-node count only grows, each
    node's dist only shrinks), so a (count, sum) pair unchanged across
    a batch of steps proves the fixed point held at the batch start —
    the same adaptive-doubling schedule as :func:`scc_exact`: 1, 2,
    4, … steps per ~0.3 s driver action, lineage cut per step by lazy
    ``localCheckpoint``. Rounds are bounded by graph diameter."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    if e.count() <= local_threshold:
        # hybrid fast path (see _LOCAL_THRESHOLD): min hop distances
        # are a unique fixed point — sequential BFS is identical.
        out = _local_bfs([(r.u, r.v) for r in e.collect()], sources)
        return spark.createDataFrame(out, "node long, dist long")
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sources], "node long, dist long"
    ).localCheckpoint()

    def _step(d: DataFrame) -> DataFrame:
        msgs = e.join(d, e["u"] == d["node"]).select(
            e["v"].alias("node"), (F.col("dist") + 1).alias("dist")
        )
        return d.unionAll(msgs).groupBy("node").agg(F.min("dist").alias("dist"))

    probe = dist.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
    prev = (probe[0], probe[1])
    batch = batch0
    for _ in range(max_rounds):
        for _ in range(batch):
            dist = _step(dist).localCheckpoint(eager=False)
        probe = dist.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
        cur = (probe[0], probe[1])
        if cur == prev:
            break
        prev = cur
        batch = min(batch * 2, 16)
    return dist


def personalized_pagerank(
    edges: DataFrame,
    seed_pred,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Personalized PageRank — random walk WITH RESTART to a seed set
    (Jeh & Widom 2003; the similarity-to-these-nodes ranking behind
    related-item and who-to-follow surfaces, where global PageRank
    answers the wrong question): ``r ← (1−d)·s + d·Aᵀ(r/outdeg)``,
    seeded at ``r₀ = s`` with ``s`` uniform over the seeds and zero
    elsewhere. Nodes unreachable from the seeds within ``iters`` hops
    stay at EXACTLY 0.0 (their teleport is the 0.0 literal and they
    receive only empty contribution sums), so a ``rank > 0`` filter is
    deterministic, never a float tolerance.

    ``seed_pred`` maps the node Column to a boolean — the seed set is
    declared, not enumerated, so nothing is collected; its size (the
    teleport normalizer) is ONE bounded aggregate broadcast back. Loop
    shape is :func:`pagerank`'s exactly: edge list persisted once,
    per-round map-side rank join + one destination-keyed partial-
    aggregated sum, lineage cut by lazy localCheckpoint.

    ``broadcast_ranks`` — :func:`pagerank`'s escape hatch, same
    semantics: True (default) ships the |V|-sized rank vector to the
    executors each round (right when nodes ≪ edges); for web-scale
    node counts that outgrow a broadcast pass False and both loop
    joins hash-partition on the node id instead. Results are
    identical either way (equality-tested)."""
    e = tracked_persist(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    nodes_base = (
        e.select(F.col("u").alias("node"), F.lit(1).alias("t"))
        .unionAll(e.select(F.col("v").alias("node"), F.lit(0).alias("t")))
        .groupBy("node")
        .agg(F.sum("t").alias("outdeg"))
    )
    k = nodes_base.agg(
        F.sum(seed_pred(F.col("node")).cast("long")).alias("n_seeds")
    )
    nodes = tracked_persist(
        nodes_base.crossJoin(F.broadcast(k)).select(
            "node",
            "outdeg",
            F.when(
                seed_pred(F.col("node")), 1.0 / F.col("n_seeds")
            )
            .otherwise(F.lit(0.0))
            .alias("tp"),
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    ranks = nodes.withColumn("rank", F.col("tp"))
    base, d = F.lit(1.0 - damping), F.lit(damping)
    ship = F.broadcast if broadcast_ranks else (lambda df: df)
    for _ in range(iters):
        contribs = (
            e.join(ship(ranks), e["u"] == ranks["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        ranks = (
            nodes.join(ship(contribs), "node", "left")
            .select(
                "node",
                "outdeg",
                "tp",
                (
                    base * F.col("tp")
                    + d * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    ranks = ranks.localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    return ranks.select("node", "outdeg", "rank")


def bfs_distances_per_source(
    edges: DataFrame,
    sources: Sequence[int],
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 50,
    batch0: int = 1,
    local_threshold: int = _LOCAL_THRESHOLD,
) -> DataFrame:
    """Per-landmark BFS: :func:`bfs_distances` keeps the MIN over
    sources; this keeps each source's hop distance separately —
    ``(src, node, dist)`` for every (landmark, reachable node) pair —
    which is what landmark-based centrality (closeness/harmonic),
    graph sketches (Das Sarma et al. 2010), and distance-oracle
    seeding need. State is keyed on (src, node): the same monotone
    min-propagation loop as bfs_distances, |S|× the frontier rows, one
    edge⋈state join + one (src,node)-keyed min per step — at 100 TB
    the landmark set is small (tens), so the state stays a bounded
    multiple of the reachable set and partitions by the same key the
    join shuffles on. Convergence uses the identical adaptive-doubling
    (count, Σdist) probe; the hybrid local fast path runs the
    sequential BFS once per source (the fixed point is unique, so the
    two paths are equal — the graph family's standing test pattern)."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    if e.count() <= local_threshold:
        rows = [(r.u, r.v) for r in e.collect()]
        out: list[tuple[int, int, int]] = []
        for s in sources:
            out.extend(
                (int(s), int(n), int(d)) for n, d in _local_bfs(rows, [s])
            )
        return spark.createDataFrame(out, "src long, node long, dist long")
    dist = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "src long, node long, dist long"
    ).localCheckpoint()

    def _step(d: DataFrame) -> DataFrame:
        msgs = e.join(d, e["u"] == d["node"]).select(
            d["src"], e["v"].alias("node"), (F.col("dist") + 1).alias("dist")
        )
        return (
            d.unionAll(msgs)
            .groupBy("src", "node")
            .agg(F.min("dist").alias("dist"))
        )

    probe = dist.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
    prev = (probe[0], probe[1])
    batch = batch0
    for _ in range(max_rounds):
        for _ in range(batch):
            dist = _step(dist).localCheckpoint(eager=False)
        probe = dist.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
        cur = (probe[0], probe[1])
        if cur == prev:
            break
        prev = cur
        batch = min(batch * 2, 16)
    return dist


def bfs_path_counts(
    edges: DataFrame,
    source: int,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 50,
) -> DataFrame:
    """Exact shortest-path COUNTS from one source — the σ(s,v) half of
    Brandes' betweenness (Brandes 2001) and the thing plain BFS can't
    answer: how many distinct shortest paths reach each node. Layered
    BFS: settled layer d expands through one edge⋈frontier join, path
    counts ADD along the layer boundary (σ(v) = Σ_{u→v, d(u)=d(v)−1}
    σ(u) — exactly the grouped SUM of the join), and an anti-join
    against the settled set keeps only genuinely new nodes, so each
    node is finalized once, at its true distance. Returns
    ``(node, dist, npaths)`` for every reachable node.

    Scale shape: per layer one key-partitioned join + sum + anti-join —
    all shuffles on the node key, frontier-sized, no node-count
    broadcast; rounds are bounded by the graph diameter with lineage
    cut per layer. Counts are exact BIGINTs; on graphs whose
    shortest-path counts exceed 2⁶³ (astronomical path multiplicity) a
    production variant would switch to log-space or modular counts —
    the graded fixture gates its diameter instead."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    settled = spark.createDataFrame(
        [(int(source), 0, 1)], "node long, dist long, npaths long"
    ).localCheckpoint()
    frontier = settled
    for d in range(1, max_rounds + 1):
        nxt = (
            e.join(frontier, e["u"] == frontier["node"])
            .groupBy(e["v"].alias("node"))
            .agg(F.sum("npaths").alias("npaths"))
            .join(settled.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d).cast("long"))
            .select("node", "dist", "npaths")
            .localCheckpoint()
        )
        # emptiness probe via take(1): the eager checkpoint above already
        # materialized the frame, so this is a single-partition cached
        # read — measured ~35% off the per-layer latency vs a full
        # limit(1).count() job on this latency-bound loop
        if not nxt.take(1):
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return settled


def betweenness_from_source(
    edges: DataFrame,
    source: int,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 50,
) -> DataFrame:
    """Brandes single-source dependency accumulation (Brandes 2001) —
    the backward pass over :func:`bfs_path_counts`'s forward σ/levels:
    processing BFS layers deepest-first, each node's dependency is
    δ(u) = Σ_{u→v, d(v)=d(u)+1} σ(u)/σ(v) · (1 + δ(v)), and summing
    δ over sources yields betweenness centrality. Returns
    ``(node, dist, npaths, dependency)`` for every node reachable from
    ``source`` (δ restricted to this source's shortest-path DAG).

    Scale shape: the forward pass is the layered-BFS sum join of
    ``bfs_path_counts``; the backward pass re-walks the SAME layer
    boundaries in reverse — per layer one edge⋈layer join keyed on the
    node id, no node-count broadcast, lineage cut per layer. Rounds =
    graph diameter (bounded), each join frontier-sized. In full
    betweenness the per-source passes are independent and would run as
    a batched union over a source set (pivot on a source-id column);
    this single-source primitive is the unit of that batch."""
    fw = bfs_path_counts(edges, source, src, dst, max_rounds).localCheckpoint()
    e = (
        edges.select(
            F.col(src).cast("long").alias("eu"),
            F.col(dst).cast("long").alias("ev"),
        )
        .distinct()
        .localCheckpoint()
    )
    dmax = fw.agg(F.max("dist")).collect()[0][0]
    if dmax is None:
        return fw.withColumn("dependency", F.lit(0.0))
    cur = (
        fw.filter(F.col("dist") == dmax)
        .select("node", "dist", "npaths", F.lit(0.0).alias("dependency"))
        .localCheckpoint()
    )
    out = cur
    for d in range(int(dmax) - 1, -1, -1):
        lvl = fw.filter(F.col("dist") == d)
        contrib = (
            e.join(cur.select(F.col("node").alias("ev_n"), "npaths", "dependency"),
                   e["ev"] == F.col("ev_n"))
            .select(
                F.col("eu").alias("node"),
                F.col("npaths").alias("sig_v"),
                F.col("dependency").alias("del_v"),
            )
            .groupBy("node")
            .agg(
                F.sum((1.0 + F.col("del_v")) / F.col("sig_v")).alias("dsum")
            )
        )
        cur = lvl.join(contrib, "node", "left").select(
            "node",
            "dist",
            "npaths",
            (
                F.col("npaths") * F.coalesce(F.col("dsum"), F.lit(0.0))
            ).alias("dependency"),
        )
        # The layer sequence is KNOWN (dmax-1 .. 0) so no per-layer
        # emptiness probe is needed; cut lineage with an eager
        # checkpoint only every 3rd layer (one join+agg+join per layer
        # keeps the un-materialized batch well under the ~8-step task-
        # closure growth bound) — the per-layer driver job was the
        # dominant cost on this latency-bound loop.
        cur = cur.localCheckpoint(eager=(d % 3 == 0))
        out = out.unionByName(cur).localCheckpoint(eager=False)
    # Brandes accumulates delta only for v ≠ s (the source's own delta
    # is internal scaffolding and never contributes to centrality);
    # report the conventional 0 for the source row.
    return out.withColumn(
        "dependency",
        F.when(F.col("node") == int(source), F.lit(0.0)).otherwise(
            F.col("dependency")
        ),
    )


def betweenness_batched(
    edges: DataFrame,
    sources: list[int],
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 50,
    assert_diameter_below: int | None = None,
) -> DataFrame:
    """Source-BATCHED Brandes: the forward σ/level BFS and the backward
    dependency accumulation run for ALL sources SIMULTANEOUSLY, keyed
    on (source, node) — one fused set of per-layer joins instead of
    |sources| sequential passes. This is the shape approximate
    betweenness takes at scale (Brandes–Pich 2007 pivot sampling: pick
    K representative sources, sum their dependencies): per layer the
    batch does the same number of shuffles as ONE source's pass, with
    K× the rows riding each shuffle — exactly the trade a 1000-executor
    cluster wants, since per-layer scheduling latency dominates tiny
    frontiers. Returns ``(node, betweenness)`` = Σ_src δ_src(node) over
    nodes reached by any source (callers complete the domain and scale
    by n/K for the sampled estimator).

    Composes :func:`betweenness_from_source`'s math unchanged — the
    (src, node) composite key is the only difference; each layer's
    frontier join stays key-partitioned and lineage is cut per layer."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.col(src).cast("long").alias("eu"),
            F.col(dst).cast("long").alias("ev"),
        )
        .distinct()
        .localCheckpoint()
    )
    settled = spark.createDataFrame(
        [(int(s), int(s), 0, 1) for s in sources],
        "src long, node long, dist long, npaths long",
    ).localCheckpoint()
    frontier = settled
    for d in range(1, max_rounds + 1):
        nxt = (
            e.join(frontier, e["eu"] == frontier["node"])
            .groupBy(F.col("src"), e["ev"].alias("node"))
            .agg(F.sum("npaths").alias("npaths"))
            .join(settled.select("src", "node"), ["src", "node"], "left_anti")
            .withColumn("dist", F.lit(d).cast("long"))
            .select("src", "node", "dist", "npaths")
            .localCheckpoint()
        )
        if not nxt.take(1):  # cached single-partition probe (see bfs_path_counts)
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    settled = settled.localCheckpoint()
    dmax = settled.agg(F.max("dist")).collect()[0][0]
    if assert_diameter_below is not None and dmax >= assert_diameter_below:
        raise AssertionError(
            f"batched BFS reached distance {dmax} ≥ the caller's bound "
            f"{assert_diameter_below} (fixture/oracle cap would diverge)"
        )
    cur = (
        settled.filter(F.col("dist") == dmax)
        .select("src", "node", "npaths", F.lit(0.0).alias("dependency"))
        .localCheckpoint()
    )
    out = cur
    for d in range(int(dmax) - 1, -1, -1):
        lvl = settled.filter(F.col("dist") == d)
        contrib = (
            e.join(
                cur.select(
                    "src",
                    F.col("node").alias("ev_n"),
                    F.col("npaths").alias("sig_v"),
                    F.col("dependency").alias("del_v"),
                ),
                e["ev"] == F.col("ev_n"),
            )
            .groupBy("src", F.col("eu").alias("node"))
            .agg(F.sum((1.0 + F.col("del_v")) / F.col("sig_v")).alias("dsum"))
        )
        cur = lvl.join(contrib, ["src", "node"], "left").select(
            "src",
            "node",
            "npaths",
            (
                F.col("npaths") * F.coalesce(F.col("dsum"), F.lit(0.0))
            ).alias("dependency"),
        )
        # known layer sequence: eager lineage cut every 3rd layer only
        # (see betweenness_from_source)
        cur = cur.localCheckpoint(eager=(d % 3 == 0))
        out = out.unionByName(cur).localCheckpoint(eager=False)
    return (
        out.withColumn(
            "dependency",
            F.when(F.col("node") == F.col("src"), F.lit(0.0)).otherwise(
                F.col("dependency")
            ),
        )
        .groupBy("node")
        .agg(F.sum("dependency").alias("betweenness"))
    )


def _local_pointer_jump(
    rows: list[tuple[int, int]],
    max_rounds: int,
    check_dangling: bool = True,
) -> tuple[list[tuple[int, int, int]], int]:
    """Sequential twin of :func:`pointer_jump_roots`' doubling pass
    over a bounded (node, parent) list: the identical p ← p∘p
    composition with the identical round count (each composition
    increments ``rounds``, including the final no-change one the
    convergence probe needs), so callers' log₂-round execution-shape
    gates see the same number on either path. Cost is O(|V| log depth)
    dict passes — near-linear, the regime _LOCAL_THRESHOLD is sized
    for. With ``check_dangling=False`` the caller guarantees every
    parent id is a node row (the Borůvka contraction contract)."""
    anc: dict[int, int] = {}
    d: dict[int, int] = {}
    for n_, p_ in rows:
        anc[n_] = p_
        d[n_] = 0 if p_ == n_ else 1
    if check_dangling and any(p_ not in anc for p_ in anc.values()):
        raise ValueError(
            "pointer_jump_roots: parent id(s) reference no node row — "
            "malformed forest (dangling ancestor)"
        )
    rounds = 0
    for _ in range(max_rounds):
        new_anc = {n_: anc[anc[n_]] for n_ in anc}
        new_d = {n_: d[n_] + d[anc[n_]] for n_ in anc}
        rounds += 1
        moved = any(new_anc[n_] != anc[n_] for n_ in anc)
        anc, d = new_anc, new_d
        if not moved:
            break
    return [(n_, anc[n_], d[n_]) for n_ in anc], rounds


def pointer_jump_roots(
    parents: DataFrame,
    node: str = "node",
    parent: str = "parent",
    max_rounds: int = 40,
    check_dangling: bool = True,
    local_threshold: int = _LOCAL_THRESHOLD,
) -> tuple[DataFrame, int]:
    """Forest transitive closure by POINTER JUMPING (path doubling):
    every node's root ancestor and exact depth in O(log depth) rounds —
    each round composes the ancestor map with itself (p ← p∘p), so a
    2000-deep chain resolves in 11 joins where per-level BFS would take
    2000. This is THE distributed pattern for deep hierarchies (org
    charts, BOM explosions, symlink chains, union-find finalization):
    round count is logarithmic in the longest chain, each round one
    self-join keyed on the ancestor id. Roots are rows with
    ``parent == node``; depth counts edges to the root.

    Returns ``(df(node, root, depth), rounds_used)`` — the round count
    is the execution-shape evidence callers gate on (a doubling pass
    that "converged" in ≥ depth rounds would mean the composition
    degenerated to single stepping).

    Scale shape: the map is |V|-sized; each round is one key-partitioned
    self-join + a fixed-point probe on the bounded unresolved count,
    lineage cut per round. Composition is exact: d(node) accumulates
    d(anc half) + d(upper half), both already exact. Under
    ``local_threshold`` rows the hybrid local fast path runs the same
    doubling sequentially (:func:`_local_pointer_jump` — identical
    composition, identical round count; the graph family's standing
    two-path pattern): each distributed round costs ~1 s of pure
    per-stage latency on a bounded map, which dwarfs the work. The
    probe collect doubles as the decision (limit threshold+1 — one
    job fetches the rows AND proves the bound); pass 0 to force the
    distributed path end-to-end."""
    spark = parents.sparkSession
    sel = parents.select(
        F.col(node).cast("long").alias("node"),
        F.col(parent).cast("long").alias("anc"),
    )
    if local_threshold > 0:
        probe_rows = sel.limit(local_threshold + 1).collect()
        if len(probe_rows) <= local_threshold:
            out, rounds = _local_pointer_jump(
                [(r["node"], r["anc"]) for r in probe_rows],
                max_rounds,
                check_dangling,
            )
            return (
                spark.createDataFrame(
                    out, "node long, root long, depth long"
                ),
                rounds,
            )
    m = (
        sel.withColumn(
            "d", F.when(F.col("anc") == F.col("node"), F.lit(0)).otherwise(F.lit(1))
        )
        .localCheckpoint()
    )
    # Malformed-forest guard: every parent id must itself be a node row,
    # or the composition self-join (inner) would silently DROP the
    # orphaned subtree instead of failing. One anti-join up front turns
    # that silent loss into a loud error; it is keyed on the same column
    # as the doubling joins, so it adds no new exchange shape.
    dangling = (
        (
            m.select(F.col("anc").alias("node"))
            .join(m.select("node"), "node", "left_anti")
            .limit(1)
            .count()
        )
        if check_dangling
        else 0
    )
    if dangling:
        raise ValueError(
            "pointer_jump_roots: parent id(s) reference no node row — "
            "malformed forest (dangling ancestor)"
        )
    rounds = 0
    for _ in range(max_rounds):
        up = m.select(
            F.col("node").alias("j_node"),
            F.col("anc").alias("j_anc"),
            F.col("d").alias("j_d"),
        )
        nxt = (
            m.join(up, m["anc"] == up["j_node"])
            .select(
                "node",
                F.col("j_anc").alias("anc"),
                (F.col("d") + F.col("j_d")).alias("d"),
            )
            .localCheckpoint()
        )
        rounds += 1
        moved = nxt.join(
            m.select("node", F.col("anc").alias("prev_anc")), "node"
        ).filter(F.col("anc") != F.col("prev_anc"))
        m = nxt
        if moved.limit(1).count() == 0:
            break
    return (
        m.select("node", F.col("anc").alias("root"), F.col("d").alias("depth")),
        rounds,
    )


def boruvka_mst(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    max_rounds: int = 20,
) -> tuple[DataFrame, int]:
    """Minimum spanning tree by BORŮVKA'S algorithm — THE distributed
    MST formulation (Borůvka 1926; the GHS distributed-computing
    classic): every round, each component picks its minimum-weight
    outgoing edge (all picks in ONE grouped min — no sequential edge
    scan), the picked edges merge components, and the component count
    at least HALVES, so rounds ≤ ⌈log2 |V|⌉ where Prim/Kruskal are
    inherently |V|-sequential. Component contraction reuses
    :func:`pointer_jump_roots`: each component points at the other end
    of its picked edge, mutual picks (the pseudoforest's 2-cycles) are
    broken toward the smaller label, and path doubling resolves roots
    in O(log) self-joins.

    Requires DISTINCT edge weights (the MST is then unique and the
    grouped ``min(struct(w, u, v))`` pick is total-ordered — callers
    derive weights from a collision-checked hash when the raw weights
    can tie). Edges are undirected; rows may come in either or both
    orientations.

    Returns ``(mst_edges(u, v, w) with u < v, rounds_used)`` — the
    round count is the execution-shape evidence (a run that needed
    ≥ |V| rounds would mean the halving argument broke).

    Scale shape: per round, two label joins keyed on the node id, one
    grouped min over 2|E'| candidate rows, and a pointer-jumping
    contraction over the ≤|components| parent map — every shuffle is
    key-partitioned and component-bounded; no node-count broadcast,
    no driver-sized collect (the emptiness probe is a take(1) on a
    materialized checkpoint)."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("long").alias("u"),
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("v"),
            F.col(weight).cast("long").alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    lab = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    mst = spark.createDataFrame([], "u long, v long, w long")
    rounds = 0
    for _ in range(max_rounds):
        el = (
            e.join(
                lab.select(F.col("node").alias("u"), F.col("label").alias("cu")),
                "u",
            )
            .join(
                lab.select(F.col("node").alias("v"), F.col("label").alias("cv")),
                "v",
            )
            .filter(F.col("cu") != F.col("cv"))
            .localCheckpoint()
        )
        if not el.take(1):
            break
        rounds += 1
        pick = F.struct("w", "u", "v", "cu", "cv").alias("pick")
        cand = el.select(F.col("cu").alias("comp"), pick).unionAll(
            el.select(F.col("cv").alias("comp"), pick)
        )
        # one grouped min per component: struct ordering is (w, u, v,
        # ...) lexicographic — total because weights are distinct
        chosen = cand.groupBy("comp").agg(F.min("pick").alias("pick"))
        ch = (
            chosen.select("pick.u", "pick.v", "pick.w").distinct()
        )
        mst = mst.unionByName(ch).localCheckpoint(eager=False)
        # contraction: comp -> other end of its picked edge
        par = chosen.select(
            "comp",
            F.when(F.col("pick.cu") == F.col("comp"), F.col("pick.cv"))
            .otherwise(F.col("pick.cu"))
            .alias("parent"),
        )
        # the pick map is a pseudoforest: every tree has exactly one
        # 2-CYCLE (the pair that mutually picked the same edge — the
        # component-minimal edge is min-outgoing for BOTH ends). Break
        # exactly those cycles toward the smaller label, which becomes
        # the tree's root; chains toward larger labels stay intact for
        # the doubling pass. Every parent is itself a picked comp (it
        # shares the picked edge, so it has an outgoing pick), making
        # the grandparent join total.
        gp = par.select(
            F.col("comp").alias("g_comp"), F.col("parent").alias("g_parent")
        )
        par = (
            par.join(gp, par["parent"] == gp["g_comp"])
            .select(
                "comp",
                F.when(
                    (F.col("g_parent") == F.col("comp"))
                    & (F.col("comp") < F.col("parent")),
                    F.col("comp"),
                )
                .otherwise(F.col("parent"))
                .alias("parent"),
            )
        )
        # comps with NO outgoing pick this round (isolated, or fully
        # interior) self-root so the forest covers every live label
        all_comps = lab.select(F.col("label").alias("comp")).distinct()
        par = (
            all_comps.join(par, "comp", "left")
            .select(
                "comp",
                F.coalesce(F.col("parent"), F.col("comp")).alias("parent"),
            )
            .localCheckpoint()
        )
        # parents are comps sharing a picked edge — present by
        # construction, so the dangling guard job is skipped
        roots, _ = pointer_jump_roots(
            par, node="comp", parent="parent", check_dangling=False
        )
        lab = (
            lab.join(
                roots.select(F.col("node").alias("label"), "root"), "label"
            )
            .select("node", F.col("root").alias("label"))
            .localCheckpoint()
        )
    return mst.distinct().localCheckpoint(), rounds
