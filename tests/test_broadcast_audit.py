"""Static audit: every explicit ``F.broadcast`` hint in the plan layer
must sit on a GENUINELY BOUNDED relation.

Why a source-level audit and not a physical-plan assertion: the
optimized plan shows ``BroadcastHashJoin`` whether the broadcast came
from a hint or from size statistics — the defect being guarded against
is the HINT itself. A forced ``F.broadcast`` on an SF-proportional
table (customer/part/supplier/orders/lineitem/events/documents/
embeddings all grow linearly with scale factor) bypasses AQE's size
logic and Spark's broadcast ceiling: at the 100 TB design target
(SF ≈ 1e5) ``part`` is ~2e10 rows and the job fails outright. Bounded
relations — nation (25), region (5), date spines, one-row scalar
aggregates, k-bounded codebooks — are safe to hint at ANY scale, so
the audit enumerates exactly those, SCOPED PER ENCLOSING FUNCTION.

Scoping history: the r11→r12 audit keyed the allow-list per FILE by
root identifier — and exactly the name-collision hole its own design
comment warned about let one SF-proportional hint survive review: a
customer-derived frame named ``dim`` in ``j1_j5_star_join_defaults``
rode the allow-list entry that justified the ≤9-row status ``dim`` in
``j4_composite_key_null_miss`` (same file, same variable name,
unbounded vs bounded). The key is now the
``(file, enclosing function, root)`` triple, so a binding can only be
blessed inside the one function whose boundedness argument was
actually reviewed. A new hint site — even reusing an already-blessed
name elsewhere in the same file — fails this test until its own
justification lands here.

SF-proportional join sides carry no hint at all: Spark's statistics
(parquet size at small SF) and AQE (runtime sizes at scale) pick
broadcast-vs-shuffle per run, which is the correct 100 TB behavior —
small-at-small-SF stays broadcast, huge-at-large-SF degrades to SMJ
instead of OOMing the driver.
"""

from __future__ import annotations

import ast
import os

import pytest

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "glamira_end_to_end_data_pipeline_spark",
    "plans",
)

# (file, enclosing function, root identifier of the F.broadcast(...)
# argument) -> justification. Every entry is bounded INDEPENDENT of
# scale factor; the justification is the value. Adding a triple here is
# a design assertion, not a lint suppression: the boundedness argument
# must hold for THAT binding in THAT function.
ALLOWED_BROADCAST_SITES: dict[tuple[str, str, str], str] = {
    # --- models.py -------------------------------------------------
    ("models.py", "fact_sales_order", "product"): (
        "star dim_product: distinct product_source_id of the 2k-row "
        "seeded catalog (bounded dimension by design)"
    ),
    ("models.py", "fact_sales_order", "date"): "dim_date spine, calendar-bounded",
    # --- queries.py ------------------------------------------------
    ("queries.py", "j3_computed_date_key_join", "dim_date"): (
        "generated date spine, bounded by calendar range"
    ),
    ("queries.py", "j4_composite_key_null_miss", "dim"): (
        "status dim: returnflag x linestatus (<= 9 rows at any SF)"
    ),
    ("queries.py", "q5_local_supplier_volume", "nat"): "nation, 25 rows fixed",
    ("queries.py", "q5_local_supplier_volume", "reg"): "region, 5 rows fixed",
    ("queries.py", "q2_min_cost_supplier", "nation"): "nation, 25 rows fixed",
    ("queries.py", "q2_min_cost_supplier", "region"): "region, 5 rows fixed",
    ("queries.py", "q7_volume_shipping", "nation"): "nation, 25 rows fixed",
    ("queries.py", "q10_returned_items", "nation"): "nation, 25 rows fixed",
    ("queries.py", "q22_dormant_balances", "cutoff"): "one-row scalar aggregate",
    ("queries.py", "q8_market_share", "nation"): "nation, 25 rows fixed",
    ("queries.py", "q8_market_share", "region"): "region, 5 rows fixed",
    ("queries.py", "q9_product_profit", "nation"): "nation, 25 rows fixed",
    ("queries.py", "q11_important_parts", "total"): "one-row scalar aggregate",
    ("queries.py", "q15_top_supplier", "best"): "one-row max aggregate",
    ("queries.py", "j6_value_range_join", "ranges"): (
        "geo BIN ranges: bounded lookup table (50 bands)"
    ),
    ("queries.py", "w6_forward_fill", "spine"): "date spine, calendar-bounded",
    # --- streaming_queries.py ---------------------------------------
    ("streaming_queries.py", "s5_s6_incremental_ingest", "audit_stats"): (
        "one-row audit aggregate"
    ),
    ("streaming_queries.py", "s5_s6_incremental_ingest", "mani_rows"): (
        "one manifest row"
    ),
    # --- r5_queries.py ----------------------------------------------
    ("r5_queries.py", "text_tfidf_topterms", "n"): "one-row doc-count aggregate",
    ("r5_queries.py", "emb_ivf_partitioned_prune", "qs"): (
        "fixed probe/query set (constant literal)"
    ),
    ("r5_queries.py", "dq_freshness_check", "glob"): "one-row global aggregate",
    ("r5_queries.py", "text_bigram_pmi", "tot"): "one-row total",
    # --- r6_queries.py ----------------------------------------------
    ("r6_queries.py", "stream_static_enrich", "dim"): (
        "customer WHERE c_custkey < 100: <= 99 rows at any SF"
    ),
    # --- r7_queries.py ----------------------------------------------
    ("r7_queries.py", "dq_outlier_mad", "med"): "per-mktsegment medians: <= 5 rows",
    ("r7_queries.py", "dq_outlier_mad", "mad"): "per-mktsegment MADs: <= 5 rows",
    # --- r8_queries.py ----------------------------------------------
    ("r8_queries.py", "text_bigram_lm_score", "v"): "one-row vocab/total aggregate",
    ("r8_queries.py", "a_kmv_setops", "b"): "distinct event types (enum-bounded)",
    ("r8_queries.py", "priority_sample", "stats"): "one-row corpus stats",
    ("r8_queries.py", "priority_sample", "cut"): "one-row threshold",
    # --- r9_queries.py ----------------------------------------------
    ("r9_queries.py", "dq_benford_mad", "tot"): "one-row total",
    ("r9_queries.py", "dq_benford_mad", "sad"): "one-row sum-of-abs-deviations",
    ("r9_queries.py", "emb_pca_top_direction", "vdf"): (
        "64-row driver-literal direction table"
    ),
    ("r9_queries.py", "sample_temperature_mix", "tot"): "one-row total",
    ("r9_queries.py", "sample_temperature_mix", "rates"): (
        "per-source rates: source enum is bounded"
    ),
    ("r9_queries.py", "a_bloom_filter_probe", "sketch"): "k-bounded sketch rows",
    ("r9_queries.py", "a_bloom_filter_probe", "stats"): "one-row stats",
    ("r9_queries.py", "graph_randwalk_corpus", "f"): (
        "random-walk frontier: |starts|-bounded here (the docstring "
        "documents the |V|-frontier production variant switching to "
        "keyed Pregel rounds)"
    ),
    ("r9_queries.py", "emb_srp_sketch_recall", "pdf"): (
        "driver-literal Rademacher plane table"
    ),
    ("r9_queries.py", "graph_ego_sample", "roots"): "k-bounded cluster roots",
    ("r9_queries.py", "graph_ego_sample", "l1"): "k-bounded level-1 centroids",
    ("r9_queries.py", "dq_checksum_reconcile", "bad_key"): (
        "one-row poisoned-key scalar"
    ),
    ("r9_queries.py", "emb_binary_quant_recall", "q"): (
        "query vectors filtered to vec_id < 10"
    ),
    ("r9_queries.py", "emb_binary_quant_recall", "qv"): (
        "10 query vectors (vec_id < 10)"
    ),
    # --- r10_queries.py ----------------------------------------------
    ("r10_queries.py", "a_heavy_hitters_mg", "cands"): (
        "hot-key candidate set: top-k bounded"
    ),
    ("r10_queries.py", "a_heavy_hitters_mg", "tot"): "one-row total",
    ("r10_queries.py", "dq_ks_two_sample", "boff"): (
        "per-bucket offsets: <= |buckets|"
    ),
    ("r10_queries.py", "dq_ks_two_sample", "tot"): "one-row total",
    ("r10_queries.py", "sample_neyman_allocation", "wsum"): "one-row weighted sum",
    ("r10_queries.py", "sample_neyman_allocation", "bsum"): "one-row sum",
    ("r10_queries.py", "dq_chi2_categorical_drift", "tot"): "one-row total",
    # --- r11_queries.py ----------------------------------------------
    ("r11_queries.py", "w_theil_sen_trend", "nation"): "nation, 25 rows fixed",
    ("r11_queries.py", "w_theil_sen_trend", "b"): (
        "nation x month series: ~25 x 84 rows at ANY SF"
    ),
    ("r11_queries.py", "dq_benford_first_digit", "tot"): "one-row total",
    ("r11_queries.py", "_dense_monthly_revenue", "nation"): "nation, 25 rows fixed",
    ("r11_queries.py", "_dense_monthly_revenue", "bounds"): "one-row min/max",
    ("r11_queries.py", "a_mutual_information_terms", "mx"): "one-row marginal",
    ("r11_queries.py", "a_mutual_information_terms", "my"): "one-row marginal",
    ("r11_queries.py", "a_mutual_information_terms", "tot"): "one-row total",
    # --- r12_queries.py ----------------------------------------------
    ("r12_queries.py", "dq_mann_whitney_u", "tots"): "one-row totals",
    ("r12_queries.py", "a_spearman_corr", "rx"): (
        "per-distinct-value midrank rollup of a bounded discrete domain "
        "(l_quantity: 50 values)"
    ),
    ("r12_queries.py", "dq_t_closeness", "buckets"): "<= |buckets| rollup",
    ("r12_queries.py", "dq_t_closeness", "mrow"): "one-row scalar",
    ("r12_queries.py", "dq_bh_fdr_proportions", "glob"): "one-row global stats",
    ("r12_queries.py", "dq_bh_fdr_proportions", "thr"): "one-row threshold",
    ("r12_queries.py", "text_kneser_ney_bigram", "tt"): "one-row total",
    ("r12_queries.py", "a_market_basket_rules", "nb"): "one-row count",
    ("r12_queries.py", "dq_cramers_v", "cm"): "k-bounded centroids",
    ("r12_queries.py", "dq_cramers_v", "tot"): "one-row total",
    ("r12_queries.py", "j_dynamic_partition_pruning", "dimf"): (
        "month dim: bounded by calendar range"
    ),
    ("r12_queries.py", "a_kaplan_meier_survival", "tot"): "one-row total",
    ("r12_queries.py", "a_beta_binomial_shrinkage", "gm"): "one-row global mean",
    ("r12_queries.py", "a_beta_binomial_shrinkage", "pri"): "one-row prior",
    ("r12_queries.py", "a_pareto_concentration", "tot"): "one-row total",
    ("r12_queries.py", "a_pareto_concentration", "m_rank"): "top-10 rows",
    ("r12_queries.py", "a_pareto_concentration", "top10"): "10 rows",
    ("r12_queries.py", "dq_experiment_readout_panel", "b"): (
        "one-row Welch group stats"
    ),
    ("r12_queries.py", "dq_experiment_readout_panel", "tots"): "one-row totals",
    ("r12_queries.py", "text_isotonic_calibration", "jx"): (
        "isotonic j-side: <= 20 score-bucket rows"
    ),
    ("r12_queries.py", "text_isotonic_calibration", "kx"): (
        "isotonic k-side: <= 20 score-bucket rows"
    ),
    ("r12_queries.py", "a_logistic_irls_glm", "w"): (
        "IRLS one-row weight state"
    ),
    # --- r13_queries.py ----------------------------------------------
    ("r13_queries.py", "emb_ivf_incremental", "qs"): (
        "10 query vectors (vec_id < 10), exploded over <= 2 probe cells"
    ),
    ("r13_queries.py", "emb_ivf_incremental", "qd"): (
        "10 query vectors (vec_id < 10)"
    ),
    ("r13_queries.py", "emb_ivf_incremental", "q_reb"): (
        "10 query vectors (vec_id < 10), exploded over <= 2 probe cells"
    ),
    # --- r14_queries.py ----------------------------------------------
    ("r14_queries.py", "emb_ivf_incremental_refresh", "qs"): (
        "10 query vectors (vec_id < 10), exploded over <= 2 probe cells"
    ),
    ("r14_queries.py", "text_bm25_incremental", "df_t"): (
        "per-query-term df rows: <= 3 (|_BM25_TERMS|) at any SF"
    ),
    ("r14_queries.py", "text_bm25_incremental", "stats"): (
        "one-row merged (n_docs, total_dl) corpus aggregate"
    ),
    ("r14_queries.py", "emb_ivfpq_incremental", "probed"): (
        "10 query vectors (vec_id < 10), exploded over <= 2 probe cells"
    ),
    ("r14_queries.py", "emb_ivfpq_incremental", "lut"): (
        "ADC lookup table: |Q|*m*k = 10*8*16 rows, k-bounded"
    ),
    # --- r15_queries.py ----------------------------------------------
    ("r15_queries.py", "emb_ivf_decremental", "qs"): (
        "10 query vectors (vec_id < 10), exploded over <= 2 probe cells"
    ),
}

BANNED_SUBSTRINGS = (
    # SF-proportional base tables must never appear as a broadcast root
    "cust",
    "supplier",
    "supp",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _broadcast_sites(path: str):
    """Yield (enclosing function name, call node) for every
    ``F.broadcast(...)`` in the file. Module-level sites report
    ``<module>`` — nothing is blessed there."""
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read(), filename=path)
    sites: list[tuple[str, ast.Call]] = []
    stack: list[str] = []

    class _Visitor(ast.NodeVisitor):
        def visit_FunctionDef(self, node):
            stack.append(node.name)
            self.generic_visit(node)
            stack.pop()

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_Call(self, node):
            if (
                isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
                and node.args
            ):
                sites.append((stack[-1] if stack else "<module>", node))
            self.generic_visit(node)

    _Visitor().visit(tree)
    return sites


def _root_name(expr: ast.expr) -> str | None:
    # peel .alias()/.select()/... call-and-attribute chains to the root
    while True:
        if isinstance(expr, ast.Name):
            return expr.id
        if isinstance(expr, ast.Attribute):
            expr = expr.value
        elif isinstance(expr, ast.Call):
            expr = expr.func
        else:
            return None


@pytest.mark.parametrize(
    "fname",
    sorted(f for f in os.listdir(PLANS_DIR) if f.endswith(".py")),
)
def test_broadcast_hints_only_on_bounded_relations(fname):
    violations = []
    for func, call in _broadcast_sites(os.path.join(PLANS_DIR, fname)):
        root = _root_name(call.args[0])
        src = ast.unparse(call.args[0])
        if root is None or (fname, func, root) not in ALLOWED_BROADCAST_SITES:
            violations.append(
                f"{fname}:{call.lineno} in {func}(): F.broadcast({src})"
            )
        elif any(b in root for b in BANNED_SUBSTRINGS):
            violations.append(
                f"{fname}:{call.lineno} in {func}(): allow-listed root "
                f"'{root}' matches a banned SF-proportional table name"
            )
    assert not violations, (
        "F.broadcast hint at a (file, function, root) site not in the "
        "bounded allow-list (SF-proportional sides must carry NO hint — "
        "statistics/AQE decide):\n" + "\n".join(violations)
    )


def test_allowlist_has_no_orphan_entries():
    """Every blessed triple must correspond to a live site — stale
    entries are how the next name-collision slips back in."""
    live: set[tuple[str, str, str]] = set()
    for fname in os.listdir(PLANS_DIR):
        if not fname.endswith(".py"):
            continue
        for func, call in _broadcast_sites(os.path.join(PLANS_DIR, fname)):
            root = _root_name(call.args[0])
            if root is not None:
                live.add((fname, func, root))
    orphans = sorted(set(ALLOWED_BROADCAST_SITES) - live)
    assert not orphans, (
        "allow-list entries with no matching F.broadcast site (remove "
        "them):\n" + "\n".join(map(str, orphans))
    )
