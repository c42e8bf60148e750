"""Fleet-wide physical-plan audit — the 100 TB red-flag sweep.

Every registry entry's plan is checked for the patterns that kill a
1000-executor run regardless of small-SF correctness:

- ``CartesianProduct`` — always a bug at scale;
- ``BroadcastNestedLoopJoin`` — allowed only where it IS the design
  (brute-force exact top-k with a broadcast query side; banded range
  join against a broadcast literal table);
- ``BatchEvalPython`` — row-at-a-time Python UDF; Arrow paths
  (``ArrowEvalPython``, ``MapInPandas``, ``FlatMapGroupsInPandas``,
  ``AggregateInPandas``) are the sanctioned Python escapes;
- unpartitioned ``Window`` — an ordered window with no PARTITION BY
  moves the whole input to ONE task. Allowed only where the windowed
  input is a bounded pre-aggregate (a daily/batch rollup), never raw
  rows.

Entries whose construction already runs real work (streaming drains,
ingest round-trips) are audited too — their returned frame's plan is
what the driver collects.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.test_plans import plan_of

# BroadcastNestedLoopJoin is the intended plan here: a tiny broadcast
# side against a streamed big side, with a non-equi predicate.
BNLJ_OK = {
    # experiment panel: one-row Welch/MW/KS verdict rows assembled from
    # one-row broadcasts; prefixes stay bucket-partitioned.
    "dq_experiment_readout_panel",
    # Pareto crossing/top-decile scalars: one-row totals broadcast onto
    # the bounded located rows.
    "a_pareto_concentration",
    # KM product-limit: exp-cumsum-ln over the bounded distinct-
    # fulfilment-days rollup (~130 rows, domain-bounded) + one-row
    # total broadcast; the raw join output never enters a window.
    "a_kaplan_meier_survival",
    # beta-binomial prior fit: one-row global-mean and prior broadcasts
    # onto the 25-row per-nation rollup.
    "a_beta_binomial_shrinkage",
    # market-basket scalars: one-row basket total broadcast onto the
    # count-ordered top-15 (the text_bm25_topk pattern).
    "a_market_basket_rules",
    # Cramer's V dense grid: 5x3 marginal cross (both sides bounded
    # rollups) + one-row scalar totals.
    "dq_cramers_v",
    # Kneser-Ney's bigram-type total is a ONE-ROW broadcast onto the
    # count-ordered top-15 (the text_bm25_topk scalar pattern).
    "text_kneser_ney_bigram",
    # incremental BM25: the ONE-ROW merged (n_docs, total_dl) stats
    # broadcast crossed onto the query terms' pruned postings (the
    # same scalar pattern as text_bm25_topk's corpus row).
    "text_bm25_incremental",
    # MW's one-row (r2) stats × one-row totals scalar cross — O(1).
    "dq_mann_whitney_u",
    # t-closeness dense grid: |nations| × |balance-buckets| ≈ 275-row
    # broadcast cross (both sides bounded rollups), plus the one-row
    # (m, n) scalar — never data-sized.
    "dq_t_closeness",
    # BH step-up: one-row global-rate scalar and one-row threshold rank
    # broadcast onto the 25-row per-nation rollup.
    "dq_bh_fdr_proportions",
    # Benford expectation join: the population total is a ONE-ROW
    # broadcast cross-joined onto the ≤9-row digit rollup (q11/q15
    # scalar pattern) — O(9) work.
    "dq_benford_first_digit",
    "emb_cosine_topk",      # exact baseline: broadcast queries x corpus
    "mm_feature_ann_topk",  # same shape over media features
    "j6_value_range_join",  # broadcast 50-row band table, range predicate
    "a5_minmax_date_range", # scalar bounds row cross-joined to output
    # Q22's scalar-avg cutoff is a ONE-ROW broadcast gating the pool.
    "q22_dormant_balances",
    # Q11's total-value threshold and Q15's max-revenue gate: ONE-ROW
    # re-aggregates of an already-persisted grouped result, broadcast
    # back onto it (the q22 cutoff pattern).
    "q11_important_parts",
    "q15_top_supplier",
    "s5_s6_incremental_ingest",  # broadcast single-row audit/manifest stats
    # anti-join pushed through the union: the injected literal orphan key
    # constant-folds into a 1-row x <=1-row BNLJ existence branch (with
    # LocalLimit) beside the real BroadcastHashJoin LeftAnti — O(1) work.
    "dq_schema_checks",
    "w6_forward_fill",  # users x broadcast bounded date spine (the grid)
    # BM25's corpus scalars (N, avgdl) are a ONE-ROW broadcast
    # cross-joined onto the query-term postings — O(|postings|) work.
    "text_bm25_topk",
    # hybrid RRF composes brute_force_topk (broadcast 1-query × corpus,
    # the exact-recall baseline shape) and BM25's one-row scalars.
    "text_hybrid_rrf",
    # recall@k evaluation's ground-truth side IS brute_force_topk
    # (broadcast queries × corpus — exactness is the point of a recall
    # measurement); the probe join itself is k-bounded per query.
    "emb_ann_recall",
    # matryoshka truncation recall: BOTH rankings are brute_force_topk
    # (full-dim ground truth + prefix-dim candidate) — same broadcast
    # queries × corpus shape; the recall join is k-bounded per query.
    "emb_matryoshka_recall",
    # MMR's pool stage IS brute_force_topk (broadcast queries × corpus);
    # the greedy rerank then runs on the pool-bounded rows only.
    "emb_mmr_rerank",
    # DSIR's two normalizing totals are a ONE-ROW broadcast cross-
    # joined onto the n_buckets-row ratio table — O(n_buckets) work.
    "text_dsir_select",
    # CCNet bucketing's tercile thresholds are a ONE-ROW exact-
    # percentile aggregate broadcast onto the scored docs (the
    # distributed formulation of ntile(3)).
    "text_ppl_buckets",
    # TF-IDF's corpus size N is a ONE-ROW broadcast cross-joined onto
    # the probe-doc term rows (the BM25 scalar discipline).
    "text_tfidf_topterms",
    # freshness's high-water mark is a ONE-ROW broadcast onto the
    # per-feed rollup (|event types| rows).
    "dq_freshness_check",
    # PMI's two corpus totals (n_uni, n_bi) are a ONE-ROW broadcast
    # onto the min-support-filtered bigram table.
    "text_bigram_pmi",
    # PSI's two population totals are a ONE-ROW broadcast onto the
    # 10-row bucket spine.
    "dq_psi_drift",
    # bigram LM's vocabulary size V is a ONE-ROW broadcast cross-
    # joined onto the probe-doc bigram rows (the BM25/TF-IDF scalar
    # discipline).
    "text_bigram_lm_score",
    # KMV set-ops: the pairwise stage crosses |segments| broadcast
    # sketch rows (bounded metadata — k·8 bytes each, segment count
    # small by construction); the raw scan never enters the BNLJ.
    "a_kmv_setops",
    # priority sampling's tau (the (k+1)-th priority) is a ONE-ROW
    # broadcast back onto the k+1 TakeOrderedAndProject survivors —
    # the raw corpus never enters the BNLJ.
    "sample_priority_weighted",
    # hard-negative mining's scoring pass IS brute_force_topk's shape
    # (broadcast labeled queries × corpus — the exact-recall baseline;
    # IVF/LSH candidate generators compose in front of it at scale).
    "emb_hard_negatives",
    # Benford's two one-row re-aggregates of the 9-digit rollup (total,
    # sum-of-deviations) broadcast back onto it — the q11/q15 pattern.
    "dq_benford_mad",
    # temperature mixing's two corpus totals (Σn, Σsqrt-micro) are a
    # ONE-ROW broadcast onto the |sources|-row rate table.
    "sample_temperature_mix",
    # the bloom probe stats are a ONE-ROW re-aggregate broadcast onto
    # the bounded 512-word sketch (the q11/q15 pattern).
    "a_bloom_filter_probe",
    # SRP recall's ground truth IS brute_force_topk (broadcast queries
    # × corpus — exactness is the point of a recall measurement).
    "emb_srp_sketch_recall",
    # reconciliation's corrupted-replica fixture perturbs ONE row keyed
    # by a one-row broadcast min() — the q22 scalar-cutoff pattern.
    "dq_checksum_reconcile",
    # BQ recall: the Hamming candidate pass crosses broadcast 2-word
    # query codes × corpus codes (the recall-baseline shape), and the
    # ground truth IS brute_force_topk.
    "emb_binary_quant_recall",
    # heavy hitters: the ONE-ROW total broadcasts onto the bounded
    # candidate-count rollup (≤ (k-1)×partitions + 1 groups); the raw
    # scan enters only the candidate semi-annotation equi-join.
    "a_heavy_hitters_mg",
    # KS: the ONE-ROW (n_a, n_b) total broadcasts onto the per-value
    # CDF rows (the q11/q15 scalar pattern); CDF prefixes come from
    # bucket-partitioned windows, never a cross join of data.
    "dq_ks_two_sample",
    # Neyman: the ONE-ROW Σ(N_h·σ_h) and Σfloor(quota) totals
    # broadcast onto the |sources|-row stratum table.
    "sample_neyman_allocation",
    # chi2: the ONE-ROW margins broadcast onto the |event-types|-row
    # contingency rollup (the q11/q15 scalar pattern).
    "dq_chi2_categorical_drift",
    # dense monthly spine: the ONE-ROW (min,max) month bounds broadcast
    # onto the 25-row nation dim to explode the calendar — O(nations ×
    # months), dimension-sized at any SF (q11/q15 scalar pattern).
    "w_seasonal_decompose",
    "w_autocorrelation",
    # the TWO-ROW quantile-spec table (p50, p90) cross-joined onto the
    # bounded (group × bucket) rollup to locate target buckets —
    # O(2 × buckets), never data-sized.
    "a_weighted_quantiles_exact",
    # MI: the ONE-ROW population total broadcast onto the bounded
    # |X|·|Y| contingency-cell table (q11/q15 scalar pattern).
    "a_mutual_information_terms",
    # IRLS: the ONE-ROW weight state cross-joins onto the scan each
    # Newton pass (the q11/q15 scalar pattern), and the one-row solve
    # cross-joins the one-row aggregate — never data x data.
    "a_logistic_irls_glm",
    # isotonic minimax: the two inequality joins enumerate (i, j, k)
    # triples over the ≤20-row score-bucket ROLLUP (O(|buckets|^3)
    # bounded metadata); the raw document scan reduced to that rollup
    # one exchange earlier and never enters a nested loop.
    "text_isotonic_calibration",
}

# Unpartitioned ordered windows allowed ONLY over inputs that are
# bounded pre-aggregates (cardinality independent of, or reduced
# orders-of-magnitude below, the raw row count):
UNPARTITIONED_WINDOW_OK = {
    # experiment panel: three exclusive-prefix bucket-OFFSET rollups
    # (bounded by |revenue-range / 1e6-cent buckets|), the MW/KS spine.
    "dq_experiment_readout_panel",
    # Pareto's two exclusive-prefix calls + rank locate: each
    # unpartitioned window is the primitive's bucket-OFFSET rollup,
    # bounded by |revenue-range / 1e6-cent buckets| (~hundreds), never
    # by customer count — per-value cumulatives stay bucket-partitioned.
    "a_pareto_concentration",
    # KM cumulative product over the bounded distinct-times rollup
    # (~130 rows, fulfilment-day domain).
    "a_kaplan_meier_survival",
    # MW bucket-offset prefix sum over the ≤|value-range/50| bucket
    # rollup (the dq_ks_two_sample spine); per-value cumulatives stay
    # bucket-partitioned.
    "dq_mann_whitney_u",
    # Spearman's two bucket-offset rollups (quantity: ≤10 buckets,
    # price: ≤|price-range/1000| buckets) — per-value cumulatives are
    # bucket-partitioned, rows never enter an unpartitioned window.
    "a_spearman_corr",
    # BH rank + step-up max over the 25-row per-nation p-value rollup.
    "dq_bh_fdr_proportions",
    # cumulative-users running sum over the DAILY rollup — |days| rows.
    "w7_new_vs_returning",
    # lag(7) week-over-week deltas over the DAILY rollup — |days| rows.
    "w_period_over_period",
    # trailing mean/stddev z-score over the DAILY rollup — |days| rows.
    "dq_volume_anomaly",
    # running counters over the per-1000-event batch rollup — the
    # declarative twin of the reference's sequential driver counter
    # (inherently ordered); input is raw/1000, never raw events.
    "a8_running_counters",
    # RRF rank derivation over the BOUNDED top-50 lists (post-
    # TakeOrderedAndProject); the raw corpus never enters a window.
    "text_hybrid_rrf",
    # PSI total over the FIXED 10-row bucket spine — never data-sized.
    "dq_psi_drift",
    # Benford population total over the ≤9-row first-digit rollup.
    "dq_benford_check",
    # cumulative-distinct running sum over the DAILY first-seen rollup
    # — |days| rows, same shape as w7/a8.
    "w_cumulative_distinct",
    # rank derivation over the BOUNDED top-512 token list (post-
    # TakeOrderedAndProject); raw tokens never enter the window.
    "text_zipf_octaves",
    # chi2 total over the |event-types|-row contingency rollup —
    # bounded by type cardinality, the dq_psi_drift spine shape.
    "dq_chi2_categorical_drift",
    # KS bucket-offset prefix sum over the ≤|value-range/50| bucket
    # rollup (~10 rows here, bounded by the value domain, never by the
    # row count); per-value cumulatives are bucket-partitioned.
    "dq_ks_two_sample",
    # largest-remainder ranking over the |sources|-row stratum table
    # (bounded by stratum cardinality — the multitouch discipline).
    "sample_neyman_allocation",
    # isotonic prefix sums over the ≤20-row score-bucket rollup —
    # bounded by the n_chars//50 (capped 19) bucket domain, never by
    # document count.
    "text_isotonic_calibration",
}


def unpartitioned_windows(df) -> list[str]:
    """Node names of logical Window operators with an EMPTY partition
    spec anywhere in the optimized plan (the pattern that moves the
    whole windowed input into a single task)."""
    hits = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            hits.append(node.nodeName())
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return hits


def _entries():
    from __spark_entry__ import queries

    return sorted(queries().items())


@pytest.mark.parametrize("name,fn", _entries(), ids=[n for n, _ in _entries()])
def test_plan_has_no_scale_red_flags(spark, name, fn):
    df = fn(spark, SF_SMALL)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unintended nested-loop join\n{plan}"
        )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF\n{plan}"
    )
    if name not in UNPARTITIONED_WINDOW_OK:
        hits = unpartitioned_windows(df)
        assert not hits, (
            f"{name}: unpartitioned window over a potentially unbounded "
            f"input ({hits}) — partition it, or orderBy().limit(k) for "
            f"top-k, or allow-list with a boundedness justification\n{plan}"
        )
