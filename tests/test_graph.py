from __future__ import annotations

import math

from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.operators.graph import pagerank


def _ranks(spark, edges, iters=3):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: (r["outdeg"], r["rank"])
        for r in pagerank(df, iters=iters).collect()
    }


def test_pagerank_symmetric_pair_is_uniform(spark):
    # Two nodes pointing at each other: all mass stays put → rank 1.0.
    got = _ranks(spark, [(1, 2), (2, 1)])
    assert got[1] == (1, 1.0)
    assert got[2] == (1, 1.0)


def test_pagerank_star_center_accumulates(spark):
    # 3 leaves → center, center → one leaf. Hand-computed 1 iteration:
    # center gets 0.15 + 0.85·(1/1 + 1/1 + 1/1) = 2.7;
    # leaf1 gets 0.15 + 0.85·(1/1) = 1.0; leaf2/leaf3 get 0.15.
    got = _ranks(spark, [(1, 0), (2, 0), (3, 0), (0, 1)], iters=1)
    assert math.isclose(got[0][1], 2.7)
    assert math.isclose(got[1][1], 1.0)
    assert math.isclose(got[2][1], 0.15)
    assert got[0][0] == 1  # center outdeg
    assert got[1][0] == 1


def test_pagerank_dangling_node_keeps_base_rank(spark):
    # 1 → 2, 2 has no out-edges: node 2's mass is dropped (GraphX
    # semantics), node 1 decays to the base rank.
    # iter1: r(1)=0.15, r(2)=0.15+0.85·1=1.0; iter2: r(2)=0.15+0.85·0.15.
    got = _ranks(spark, [(1, 2)], iters=2)
    assert math.isclose(got[1][1], 0.15)
    assert got[2][0] == 0  # dangling: outdeg 0 reported
    assert math.isclose(got[2][1], 0.15 + 0.85 * 0.15)


def test_pagerank_total_mass_bounded(spark):
    # On a strongly-connected graph with no dangling nodes the total
    # rank mass is conserved at n (un-normalized formulation).
    cycle = [(i, (i + 1) % 5) for i in range(5)]
    got = _ranks(spark, cycle, iters=4)
    assert math.isclose(sum(r for _, r in got.values()), 5.0)


def test_pagerank_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    plan = pagerank(df, iters=1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_triangle_count_known_graphs(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import triangle_count

    # K4: every node sits in C(3,2)=3 triangles; 4 triangles total.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(spark.createDataFrame(k4, ["u", "v"])).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # square (no chord): zero triangles -> empty result
    sq = [(0, 1), (1, 2), (2, 3), (0, 3)]
    assert triangle_count(spark.createDataFrame(sq, ["u", "v"])).count() == 0
    # triangle + pendant edge: pendant node in no triangle
    tp = [(0, 1), (1, 2), (0, 2), (2, 3)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(spark.createDataFrame(tp, ["u", "v"])).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1}


def test_jaccard_link_prediction_semantics(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        jaccard_link_prediction,
    )

    # path 1-2-3 plus 3-4: predicted links are the 2-hop pairs
    # (1,3) via 2, (2,4) via 3; (1,2) etc. are existing edges, excluded.
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
    got = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard"])
        for r in jaccard_link_prediction(edges).collect()
    }
    # N(1)={2}, N(3)={2,4} -> inter {2}=1, union {2,4}=2 -> 0.5
    assert got[(1, 3)] == (1, 0.5)
    # N(2)={1,3}, N(4)={3} -> 1/2
    assert got[(2, 4)] == (1, 0.5)
    # (1,4): no common neighbor -> never a candidate
    assert (1, 4) not in got
    assert (1, 2) not in got and (2, 3) not in got


def test_jaccard_hub_cap_prunes_star_center(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        jaccard_link_prediction,
    )

    # Star K1,6 (center 0): uncapped, every leaf pair is a candidate
    # (C(6,2)=15 wedges all through one shuffle key). With the hub cap
    # below the center's degree, the center is excluded as a midpoint
    # and ZERO candidates survive — per-midpoint fan-out is bounded by
    # the cap, independent of hub degree.
    star = spark.createDataFrame([(0, i) for i in range(1, 7)], ["u", "v"])
    capped = jaccard_link_prediction(star, k_top=100, max_mid_degree=5)
    assert capped.count() == 0
    uncapped = jaccard_link_prediction(star, k_top=100, max_mid_degree=6)
    assert uncapped.count() == 15


def test_jaccard_hub_cap_keeps_sub_hub_wedges(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        jaccard_link_prediction,
    )

    # Path 1-2-3 (midpoint degree 2) plus star center 0 linked to all
    # of 1..3 and to 4..9 (degree 9 > cap 3): wedges through 0 are
    # dropped, the path wedge survives. (1,3) keeps n_common=1 — only
    # midpoint 2 counts — while the denominator still uses FULL degrees
    # (N(1)={0,2}, N(3)={0,2} -> 1/(2+2-1)).
    edges = [(1, 2), (2, 3)] + [(0, i) for i in range(1, 10)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard"])
        for r in jaccard_link_prediction(df, k_top=100, max_mid_degree=3).collect()
    }
    assert got[(1, 3)] == (1, round(1 / 3, 6))
    # leaf pairs through the hub only (e.g. 4,5) are gone entirely
    assert (4, 5) not in got


def test_adamic_adar_weights_by_inverse_log_degree(spark):
    import math

    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        adamic_adar_link_prediction,
    )

    # path 1-2-3 plus 3-4: (1,3) via mid 2 (deg 2), (2,4) via mid 3
    # (deg 2) -> both score 1/ln(2). Existing edges excluded.
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
    got = {
        (r["a"], r["b"]): (r["n_common"], r["aa_score"])
        for r in adamic_adar_link_prediction(edges).collect()
    }
    w = round(1 / math.log(2), 6)
    assert got == {(1, 3): (1, w), (2, 4): (1, w)}
    # low-degree shared neighbor outweighs a higher-degree one:
    # (a,b) share mid m1 (deg 2); (a,c) share hub h (deg 4).
    edges2 = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 20), (3, 20), (4, 20), (5, 20)], ["u", "v"]
    )
    rows = adamic_adar_link_prediction(edges2, k_top=100).collect()
    score = {(r["a"], r["b"]): r["aa_score"] for r in rows}
    assert score[(1, 2)] > score[(1, 3)]


def test_adamic_adar_hub_cap_zeroes_hub_contribution(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        adamic_adar_link_prediction,
    )

    star = spark.createDataFrame([(0, i) for i in range(1, 7)], ["u", "v"])
    assert (
        adamic_adar_link_prediction(star, k_top=100, max_mid_degree=5).count() == 0
    )


def test_kcore_peel_converges_to_core(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import kcore_peel

    # triangle {1,2,3} + chain 3-4-5: 2-core is the triangle, reached
    # only via the CASCADE (5 falls round 1, exposing 4 for round 2).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["u", "v"]
    )
    got = {
        r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=3).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    # one round only: the cascade hasn't reached 4 yet (superset)
    one = {r["node"] for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert one == {1, 2, 3, 4}
    # k above the max degree empties the graph
    assert kcore_peel(edges, k=4, rounds=2).count() == 0


def test_lpa_separates_bridge_joined_cliques(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        lpa_communities,
    )

    # two K4 cliques {0..3} and {10..13} joined by one bridge 3-10:
    # connected components would merge them; LPA keeps two communities
    # (each clique converges to its min id).
    k4a = [(a, b) for a in range(4) for b in range(4) if a < b]
    k4b = [(a + 10, b + 10) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4a + k4b + [(3, 10)], ["u", "v"])
    got = {r["node"]: r["community"] for r in lpa_communities(edges).collect()}
    assert {got[i] for i in range(4)} == {0}
    assert {got[i + 10] for i in range(4)} == {10}


def _chain_clique_edges(chain_len):
    """4-clique {0..3} + dangling chain 10..10+chain_len bridged at 3."""
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges.append((3, 10))
    edges += [(10 + i, 11 + i) for i in range(chain_len)]
    return edges


def test_kcore_exact_peels_deep_cascade(spark):
    # A dangling 8-node chain needs 8 peel rounds at k=2 — fixed-round
    # peeling (rounds=3) provably leaves chain remnants, the exact
    # variant must reach the true core (just the clique).
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        kcore_exact,
        kcore_peel,
    )

    df = spark.createDataFrame(_chain_clique_edges(7), ["u", "v"])
    exact = {r["node"]: r["degree"] for r in kcore_exact(df, k=2).collect()}
    assert exact == {0: 3, 1: 3, 2: 3, 3: 3}
    fixed = {r["node"] for r in kcore_peel(df, k=2, rounds=3).collect()}
    assert fixed > set(exact)  # strict superset: the under-peel case


def test_kcore_exact_empty_core(spark):
    # A bare path has no 2-core: the loop must peel to empty and stop.
    from glamira_end_to_end_data_pipeline_spark.operators.graph import kcore_exact

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
    assert kcore_exact(df, k=2).count() == 0


def test_lpa_exact_relays_through_chain(spark):
    # Two 4-cliques joined by a 6-node chain: the min label (0) must
    # relay the full chain length — more rounds than the fixed-3
    # lpa_communities sweeps — while the far clique keeps its own
    # majority label.
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        lpa_communities,
        lpa_exact,
    )

    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges.append((3, 10))
    edges += [(10 + i, 11 + i) for i in range(5)]
    edges.append((15, 50))
    edges += [(a + 50, b + 50) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["node"]: r["community"] for r in lpa_exact(df, max_rounds=12).collect()}
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 16)} == {0}  # wave crossed the chain
    assert {got[n] for n in range(50, 54)} == {50}
    # fixed-3-round labels freeze the wavefront mid-chain
    frozen = {
        r["node"]: r["community"] for r in lpa_communities(df, rounds=3).collect()
    }
    assert any(frozen[n] != 0 for n in range(10, 16))


def test_lpa_exact_early_exit_matches_cap(spark):
    # On an already-stable community structure (one triangle), early
    # exit at round 1 must equal any deeper cap (fixed-point invariance
    # — the property the unrolled oracle relies on).
    from glamira_end_to_end_data_pipeline_spark.operators.graph import lpa_exact

    df = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], ["u", "v"])
    a = sorted(map(tuple, lpa_exact(df, max_rounds=2).collect()))
    b = sorted(map(tuple, lpa_exact(df, max_rounds=8).collect()))
    assert a == b


def test_scc_exact_components_and_singletons(spark):
    """SCC fixed point: multi-node cycles collapse to min-id components,
    chain nodes stay singletons, the bridge never merges two SCCs, and
    a node on a cycle embedded mid-chain joins its 2-cycle partner."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import scc_exact

    edges = spark.createDataFrame(
        [
            (0, 1), (1, 2), (2, 0),          # triangle SCC {0,1,2}
            (2, 5), (5, 6),                  # tail -> singletons
            (6, 7), (7, 6),                  # 2-cycle {6,7}
            (8, 0),                          # into the triangle, no cycle back
        ],
        "u long, v long",
    )
    got = {r.node: r.scc_id for r in scc_exact(edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 6, 7: 6, 8: 8}


def test_scc_exact_empty_and_chain(spark):
    """Empty edge set returns an empty typed frame (not IndexError);
    a pure chain — all-trivial SCCs, the trim pre-pass fast path —
    labels every node its own singleton."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import scc_exact

    empty = spark.createDataFrame([], "u long, v long")
    out = scc_exact(empty)
    assert out.columns == ["node", "scc_id"]
    assert out.count() == 0

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "u long, v long"
    )
    got = {r.node: r.scc_id for r in scc_exact(chain).collect()}
    assert got == {i: i for i in range(11)}


def test_scc_exact_raises_on_round_exhaustion(spark):
    """max_rounds hit with unassigned nodes must raise, not silently
    drop them."""
    import pytest

    from glamira_end_to_end_data_pipeline_spark.operators.graph import scc_exact

    # cycle {10,11} downstream of cycle {0,1}: forward coloring paints
    # everything color 0, the backward flag only reaches {0,1}, so the
    # downstream cycle needs a second outer round — max_rounds=1
    # leaves it unassigned (trim removes nothing: every node has both
    # edge directions)
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 10), (10, 11), (11, 10)], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="unassigned"):
        # local_threshold=0: the default hybrid would finish this
        # driver-sized graph with Tarjan and never hit the round cap
        scc_exact(edges, max_rounds=1, local_threshold=0)


def test_bfs_distances_matches_python_bfs(spark):
    """Doubling-probe BFS equals a reference BFS on the doubling graph;
    unreachable nodes are absent."""
    from collections import deque

    from glamira_end_to_end_data_pipeline_spark.operators.graph import bfs_distances

    n = 60
    pairs = [(i, (2 * i) % n) for i in range(n)] + [
        (i, (2 * i + 1) % n) for i in range(n)
    ]
    # plus an unreachable island
    pairs += [(1000, 1001), (1001, 1000)]
    edges = spark.createDataFrame(pairs, "u long, v long")
    got = {r.node: r.dist for r in bfs_distances(edges, [0]).collect()}

    adj = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
    ref = {0: 0}
    q = deque([0])
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in ref:
                ref[v] = ref[u] + 1
                q.append(v)
    assert got == ref
    assert 1000 not in got and 1001 not in got


def test_bfs_multi_source_min_and_unreachable_absent(spark):
    """Multi-source BFS takes the MIN hop count over sources; nodes no
    source reaches never appear; an empty edge set returns exactly the
    seed rows at distance 0."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import bfs_distances

    # 0 -> 1 -> 2 -> 3 and 10 -> 3 (source 10 shortcuts node 3);
    # island 99 -> 100 unreachable from both sources.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 3), (99, 100)], "u long, v long"
    )
    got = {r.node: r.dist for r in bfs_distances(edges, [0, 10]).collect()}
    assert got == {0: 0, 10: 0, 1: 1, 2: 2, 3: 1}
    empty = spark.createDataFrame([], "u long, v long")
    got0 = {r.node: r.dist for r in bfs_distances(empty, [7]).collect()}
    assert got0 == {7: 0}


# ---------------------------------------------------------------------------
# Hybrid two-path equality: the driver-local finishers (Tarjan / queue
# peel / synchronous vote replay / sequential BFS) must be row-identical
# to the forced-distributed BSP loops (local_threshold=0) — the contract
# the hybrid's correctness rests on (operators/graph.py, the
# _LOCAL_THRESHOLD block).
# ---------------------------------------------------------------------------

def _hybrid_fixture_edges():
    # cycles + a bridged condensation + a trivial chain + a clique +
    # an island: every structural case the finishers branch on.
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (10, 11), (11, 12), (12, 10), (3, 10),
        (20, 21), (21, 22), (21, 23), (23, 21),
        (3, 30), *[(30 + i, 31 + i) for i in range(6)],
        (100, 101), (101, 100),
    ]
    return edges


def test_scc_hybrid_paths_identical(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import scc_exact

    df = spark.createDataFrame(_hybrid_fixture_edges(), "u long, v long")
    local = sorted(map(tuple, scc_exact(df).collect()))
    dist = sorted(map(tuple, scc_exact(df, local_threshold=0).collect()))
    assert local == dist


def test_kcore_hybrid_paths_identical(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import kcore_exact

    df = spark.createDataFrame(
        _hybrid_fixture_edges() + [(a, b) for a in range(60, 64) for b in range(a + 1, 64)],
        "u long, v long",
    )
    local = sorted(map(tuple, kcore_exact(df, k=2).collect()))
    dist = sorted(map(tuple, kcore_exact(df, k=2, local_threshold=0).collect()))
    assert local == dist


def test_lpa_hybrid_paths_identical(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import lpa_exact

    df = spark.createDataFrame(
        _hybrid_fixture_edges() + [(a, b) for a in range(60, 64) for b in range(a + 1, 64)],
        "u long, v long",
    )
    local = sorted(map(tuple, lpa_exact(df, max_rounds=10).collect()))
    dist = sorted(
        map(tuple, lpa_exact(df, max_rounds=10, local_threshold=0).collect())
    )
    assert local == dist


def test_bfs_hybrid_paths_identical(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import bfs_distances

    df = spark.createDataFrame(_hybrid_fixture_edges(), "u long, v long")
    local = sorted(map(tuple, bfs_distances(df, [0, 20]).collect()))
    dist = sorted(
        map(tuple, bfs_distances(df, [0, 20], local_threshold=0).collect())
    )
    assert local == dist


def test_scc_exact_stats_records_hybrid_paths(spark):
    """The stats out-param is the execution-path evidence the graded
    graph_scc_hybrid_live entry gates on: whole-graph-local runs report
    (0 BSP rounds, local finish); runs over the threshold report >=1
    BSP round, and a hybrid fixture also reports the local finish."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import scc_exact
    from glamira_end_to_end_data_pipeline_spark.plans.r10_queries import (
        _SCC_LIVE_BLOCKS,
        _SCC_LIVE_L,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 3), (3, 2)], "u long, v long"
    )
    st: dict = {}
    scc_exact(edges, stats=st).collect()
    assert st == {"initial_edges": 4, "bsp_rounds": 0, "local_finish": True}

    # the graded fixture: both paths must run
    n = _SCC_LIVE_BLOCKS * _SCC_LIVE_L
    base = spark.range(n)
    cyc = base.selectExpr(
        "id as u",
        f"cast(id / {_SCC_LIVE_L} as long) * {_SCC_LIVE_L}"
        f" + (id % {_SCC_LIVE_L} + 1) % {_SCC_LIVE_L} as v",
    ).unionAll(spark.createDataFrame([(0, _SCC_LIVE_L)], "u long, v long"))
    st2: dict = {}
    out = scc_exact(
        cyc, trim_batch0=1, fwd_batch0=2, bwd_batch0=1,
        local_threshold=200, stats=st2,
    ).collect()
    assert st2["bsp_rounds"] >= 1 and st2["local_finish"]
    assert st2["initial_edges"] == n + 1
    assert all(r.scc_id == (r.node // _SCC_LIVE_L) * _SCC_LIVE_L for r in out)
    assert len(out) == n


# ---------------------------------------------------------------------------
# Round-11: broadcast escape hatches produce identical results when OFF
# (the |V|-sized broadcasts are parameterized for web-scale vertex sets;
# the shuffled path must be semantics-identical, not just plausible).
# ---------------------------------------------------------------------------

_HATCH_EDGES = [
    (1, 2), (2, 3), (3, 1),   # triangle
    (3, 4), (4, 5), (5, 6),   # tail
    (6, 4),                   # second triangle
    (2, 7), (7, 8),           # branch
]


def test_personalized_pagerank_broadcast_paths_identical(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        personalized_pagerank,
    )

    df = spark.createDataFrame(_HATCH_EDGES, ["src", "dst"])
    seed = lambda c: c <= F.lit(2)  # noqa: E731
    on = {
        r["node"]: (r["outdeg"], round(r["rank"], 12))
        for r in personalized_pagerank(df, seed, iters=4).collect()
    }
    off = {
        r["node"]: (r["outdeg"], round(r["rank"], 12))
        for r in personalized_pagerank(
            df, seed, iters=4, broadcast_ranks=False
        ).collect()
    }
    assert on == off and len(on) == 8


def test_triangle_count_broadcast_paths_identical(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        triangle_count,
    )

    und = sorted({(min(a, b), max(a, b)) for a, b in _HATCH_EDGES})
    df = spark.createDataFrame(und, ["u", "v"])
    on = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    off = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(df, broadcast_degrees=False).collect()
    }
    assert on == off
    assert on[1] == 1 and on[4] == 1


def test_link_prediction_broadcast_paths_identical(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        adamic_adar_link_prediction,
        jaccard_link_prediction,
    )

    und = sorted({(min(a, b), max(a, b)) for a, b in _HATCH_EDGES})
    df = spark.createDataFrame(und, ["u", "v"])
    jac_on = [tuple(r) for r in jaccard_link_prediction(df, k_top=50).collect()]
    jac_off = [
        tuple(r)
        for r in jaccard_link_prediction(
            df, k_top=50, broadcast_degrees=False
        ).collect()
    ]
    assert jac_on == jac_off and len(jac_on) > 0
    aa_on = [tuple(r) for r in adamic_adar_link_prediction(df, k_top=50).collect()]
    aa_off = [
        tuple(r)
        for r in adamic_adar_link_prediction(
            df, k_top=50, broadcast_degrees=False
        ).collect()
    ]
    assert aa_on == aa_off and len(aa_on) > 0


def test_bfs_per_source_paths_equal_and_match_min_variant(spark):
    # The per-source BFS must (a) agree between the hybrid local fast
    # path and the forced distributed Pregel loop (unique fixed point),
    # (b) reduce to bfs_distances under min-over-sources, (c) keep each
    # landmark's distance separately.
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        bfs_distances,
        bfs_distances_per_source,
    )
    from pyspark.sql import functions as F

    n = 64
    ids = spark.range(n)
    edges = ids.select(
        F.col("id").alias("u"), (F.col("id") * 2 % n).alias("v")
    ).unionAll(
        ids.select(F.col("id").alias("u"), ((F.col("id") * 2 + 1) % n).alias("v"))
    )
    sources = (0, 17)
    local = sorted(
        tuple(r) for r in bfs_distances_per_source(edges, sources).collect()
    )
    dist = sorted(
        tuple(r)
        for r in bfs_distances_per_source(
            edges, sources, local_threshold=0, batch0=4
        ).collect()
    )
    assert local == dist and len(local) > 0
    # min over sources == the multi-source variant
    per_src = {}
    for s, node, d in local:
        per_src[node] = min(per_src.get(node, 1 << 30), d)
    min_variant = {
        r.node: r.dist for r in bfs_distances(edges, sources).collect()
    }
    assert per_src == min_variant
    # each source's own distance to itself is 0 and rows are per-pair
    assert (0, 0, 0) in local and (17, 17, 0) in local
    assert len({s for s, _, _ in local}) == 2


def test_bfs_path_counts_exact_on_diamond_and_doubling(spark):
    # sigma(s,v) must count EVERY distinct shortest path: the diamond
    # a->{b,c}->d gives sigma(d)=2; a longer alternative a->e->f->d must
    # NOT count. Then cross-check the doubling graph against a Python
    # BFS+count reference.
    from collections import deque

    from glamira_end_to_end_data_pipeline_spark.operators.graph import bfs_path_counts
    from pyspark.sql import functions as F

    diamond = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (0, 4), (4, 5), (5, 3)], ["u", "v"]
    )
    got = {r.node: (r.dist, r.npaths) for r in bfs_path_counts(diamond, 0).collect()}
    assert got == {0: (0, 1), 1: (1, 1), 2: (1, 1), 4: (1, 1), 3: (2, 2), 5: (2, 1)}

    n = 120
    edge_list = [(i, (2 * i) % n) for i in range(n)] + [
        (i, (2 * i + 1) % n) for i in range(n)
    ]
    edges = spark.createDataFrame(sorted(set(edge_list)), ["u", "v"])

    adj = {}
    for u, v in set(edge_list):
        adj.setdefault(u, []).append(v)
    dist = {0: 0}
    cnt = {0: 1}
    q = deque([0])
    while q:
        x = q.popleft()
        for y in adj.get(x, ()):
            if y not in dist:
                dist[y] = dist[x] + 1
                cnt[y] = cnt[x]
                q.append(y)
            elif dist[y] == dist[x] + 1:
                cnt[y] += cnt[x]
    expected = {k: (dist[k], cnt[k]) for k in dist}
    got2 = {r.node: (r.dist, r.npaths) for r in bfs_path_counts(edges, 0).collect()}
    assert got2 == expected


def test_betweenness_diamond_and_chain(spark):
    """Brandes single-source dependencies on hand-computed fixtures:
    the diamond s->{a,b}->t gives delta(a)=delta(b)=1/2 (each carries
    half of t's path mass), and the chain s->a->b->c gives delta(a)=2,
    delta(b)=1 (each interior node sits on every deeper target's only
    path). The source reports the conventional 0."""
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        betweenness_from_source,
    )

    diamond = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "u long, v long"
    )
    got = {
        r.node: (r.dist, r.npaths, r.dependency)
        for r in betweenness_from_source(diamond, 0).collect()
    }
    assert got == {
        0: (0, 1, 0.0),
        1: (1, 1, 0.5),
        2: (1, 1, 0.5),
        3: (2, 2, 0.0),
    }

    chain = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "u long, v long")
    got = {
        r.node: r.dependency
        for r in betweenness_from_source(chain, 0).collect()
    }
    assert got == {0: 0.0, 1: 2.0, 2: 1.0, 3: 0.0}


def test_betweenness_batched_equals_summed_single_source(spark):
    """The source-batched pass must equal the sum of independent
    single-source dependency passes over the same graph — the fused
    (source, node) keying is a scheduling optimization, not a semantic
    change."""
    from collections import defaultdict

    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        betweenness_batched,
        betweenness_from_source,
    )

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 4), (5, 0)],
        "u long, v long",
    )
    sources = [0, 5, 1]
    want = defaultdict(float)
    for s in sources:
        for r in betweenness_from_source(edges, s).collect():
            want[r.node] += r.dependency
    got = {
        r.node: r.betweenness
        for r in betweenness_batched(edges, sources).collect()
    }
    for node, btw in got.items():
        assert abs(btw - want.get(node, 0.0)) < 1e-9, (node, btw, want)
    assert set(got) == {n for n, v in want.items()} | set(got)


def test_pointer_jump_roots_rejects_dangling_parent(spark):
    """A parent id that is not itself a node row is a malformed forest:
    the doubling self-join would silently drop the orphaned subtree, so
    the operator must raise instead (regression for the silent-drop)."""
    import pytest

    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        pointer_jump_roots,
    )

    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 99)],  # 99 is nobody's node row
        "node long, parent long",
    )
    with pytest.raises(ValueError, match="dangling"):
        pointer_jump_roots(df)
    # both paths raise: the distributed anti-join and the local set diff
    with pytest.raises(ValueError, match="dangling"):
        pointer_jump_roots(df, local_threshold=0)


def test_pointer_jump_local_twin_matches_distributed(spark):
    """_local_pointer_jump (the hybrid fast path of pointer_jump_roots)
    produces EXACTLY the distributed doubling pass's output — (node,
    root, depth) AND the round count, which callers gate on as the
    log₂-doubling execution-shape signature — across random seeded
    forests including multi-root, chain, and star shapes."""
    import random

    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        pointer_jump_roots,
    )

    for seed in (3, 41, 2026):
        rng = random.Random(seed)
        n = rng.randint(2, 60)
        rows = []
        for i in range(n):
            draw = rng.randint(0, n - 1)
            rows.append((i, draw if draw < i else i))  # acyclic forest
        df = spark.createDataFrame(rows, "node long, parent long")
        loc_df, loc_rounds = pointer_jump_roots(df)
        dist_df, dist_rounds = pointer_jump_roots(df, local_threshold=0)
        loc = {r["node"]: (r["root"], r["depth"]) for r in loc_df.collect()}
        dist = {
            r["node"]: (r["root"], r["depth"]) for r in dist_df.collect()
        }
        assert loc == dist, (seed, loc, dist)
        assert loc_rounds == dist_rounds, (seed, loc_rounds, dist_rounds)


def test_boruvka_mst_matches_prim_and_handles_forest(spark):
    """Borůvka equals a local Prim on a weighted graph with distinct
    weights, and on a DISCONNECTED graph yields the minimum spanning
    FOREST (one tree per component) in logarithmic rounds."""
    import heapq

    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        boruvka_mst,
    )

    E = [
        (0, 1, 7), (0, 3, 5), (1, 2, 8), (1, 3, 9), (1, 4, 70),
        (2, 4, 50), (3, 4, 15), (3, 5, 6), (4, 5, 80), (4, 6, 90),
        (5, 6, 11),
        # second component
        (10, 11, 3), (11, 12, 1), (10, 12, 2),
    ]
    df = spark.createDataFrame(E, "u long, v long, w long")
    mst, rounds = boruvka_mst(df)
    got = sorted((r.u, r.v, r.w) for r in mst.collect())

    def prim(nodes, edges):
        adj = {}
        for u, v, w in edges:
            adj.setdefault(u, []).append((w, v))
            adj.setdefault(v, []).append((w, u))
        out, seen = [], set()
        for start in nodes:
            if start in seen or start not in adj:
                continue
            seen.add(start)
            h = [(w, start, v) for w, v in adj[start]]
            heapq.heapify(h)
            while h:
                w, u, v = heapq.heappop(h)
                if v in seen:
                    continue
                seen.add(v)
                out.append((min(u, v), max(u, v), w))
                for w2, x in adj[v]:
                    if x not in seen:
                        heapq.heappush(h, (w2, v, x))
        return sorted(out)

    assert got == prim(range(13), E)
    assert rounds <= 5  # ceil(log2(7)) + margin; never node-sequential


def test_local_cc_matches_distributed_min_label(spark):
    """_local_cc (driver union-find, the hybrid fast path of the
    incremental/decremental CC entries) lands on exactly the fixed
    point dedup.duplicate_clusters' converged min-label propagation
    computes — components labeled by their minimum node id."""
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        duplicate_clusters,
    )
    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        _local_cc,
    )

    # chains, a triangle, a star, singleton-free isolates via self-free
    # pairs, and a merge-order-adversarial zig-zag
    edges = [
        (1, 2), (2, 3), (3, 4),          # chain
        (10, 11), (11, 12), (12, 10),    # triangle
        (20, 21), (20, 22), (20, 23),    # star
        (30, 31),                        # pair
        (41, 40), (42, 41), (40, 43),    # zig-zag, larger-first unions
    ]
    local = dict(_local_cc(edges))
    df = spark.createDataFrame(edges, "u long, v long")
    # local_threshold=0 forces the DISTRIBUTED min-label loop — the
    # default would take the union-find path and compare local to local
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(df, "u", "v", local_threshold=0).collect()
    }
    assert local == dist
    # the hybrid default (union-find under the threshold) agrees too
    hyb = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(df, "u", "v").collect()
    }
    assert hyb == dist
    assert local[4] == 1 and local[12] == 10 and local[23] == 20
    assert local[43] == 40 and local[42] == 40


def test_triangle_delta_matches_full_recount(spark):
    """triangle_count_delta's per-node increments, merged onto the
    base counts, equal triangle_count over the union graph — across
    random base/batch splits of seeded random graphs, including
    triangles with 1, 2, and 3 batch edges."""
    import itertools
    import random

    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        triangle_count,
        triangle_count_delta,
    )

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        nodes = list(range(1, 25))
        edges = [
            (u, v)
            for u, v in itertools.combinations(nodes, 2)
            if rng.random() < 0.18
        ]
        batch = [e for e in edges if rng.random() < 0.35]
        base = [e for e in edges if e not in set(batch)]
        assert batch and base
        bdf = spark.createDataFrame(base, "u long, v long")
        ddf = spark.createDataFrame(batch, "u long, v long")
        full = {
            r["node"]: r["n_triangles"]
            for r in triangle_count(
                spark.createDataFrame(edges, "u long, v long")
            ).collect()
        }
        base_counts = {
            r["node"]: r["n_triangles"] for r in triangle_count(bdf).collect()
        }
        delta, _j1, _und = triangle_count_delta(bdf, ddf)
        merged = dict(base_counts)
        for r in delta.collect():
            merged[r["node"]] = merged.get(r["node"], 0) + r["dn"]
        merged = {k: v for k, v in merged.items() if v > 0}
        assert merged == full, f"seed {seed}: {merged} != {full}"


def test_local_triangle_twins_match_distributed(spark):
    """_local_triangle_counts / _local_triangle_delta (the hybrid fast
    path of graph_triangles_incremental) produce EXACTLY the
    distributed operators' numbers — per-node counts, per-node delta
    increments, AND the two gate quantities (n_wedges = the j1 row
    count, corpus_wedges = Σ_d C(d,2) over the merged adjacency) —
    across random base/batch splits of seeded random graphs."""
    import itertools
    import random

    from glamira_end_to_end_data_pipeline_spark.operators.graph import (
        _local_triangle_counts,
        _local_triangle_delta,
        triangle_count,
        triangle_count_delta,
    )
    from pyspark.sql import functions as F

    for seed in (5, 17, 101):
        rng = random.Random(seed)
        nodes = list(range(1, 25))
        edges = [
            (u, v)
            for u, v in itertools.combinations(nodes, 2)
            if rng.random() < 0.2
        ]
        batch = [e for e in edges if rng.random() < 0.3]
        base = [e for e in edges if e not in set(batch)]
        assert batch and base
        bdf = spark.createDataFrame(base, "u long, v long")
        ddf = spark.createDataFrame(batch, "u long, v long")
        # full-count twin
        dist_counts = {
            r["node"]: r["n_triangles"]
            for r in triangle_count(
                spark.createDataFrame(edges, "u long, v long")
            ).collect()
        }
        assert dict(_local_triangle_counts(edges)) == dist_counts
        # delta twin, including both gate numbers
        delta, j1, und = triangle_count_delta(bdf, ddf)
        dist_delta = {r["node"]: r["dn"] for r in delta.collect()}
        dist_wedges = j1.count()
        dist_corpus = int(
            und.groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(
                F.sum(
                    (F.col("d") * (F.col("d") - 1) / 2).cast("long")
                ).alias("w")
            )
            .first()["w"]
        )
        loc_delta, loc_wedges, loc_corpus = _local_triangle_delta(
            base, batch
        )
        assert dict(loc_delta) == dist_delta, f"seed {seed}"
        assert loc_wedges == dist_wedges, f"seed {seed}"
        assert loc_corpus == dist_corpus, f"seed {seed}"
