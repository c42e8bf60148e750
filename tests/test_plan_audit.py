"""Fleet-wide physical-plan audit — the 100 TB red-flag sweep.

Every registry entry's plan is checked for the patterns that kill a
1000-executor run regardless of small-SF correctness:

- ``CartesianProduct`` — always a bug at scale;
- ``BroadcastNestedLoopJoin`` — allowed only where it IS the design
  (brute-force exact top-k with a broadcast query side; banded range
  join against a broadcast literal table);
- ``BatchEvalPython`` — row-at-a-time Python UDF; Arrow paths
  (``ArrowEvalPython``, ``MapInPandas``, ``FlatMapGroupsInPandas``,
  ``AggregateInPandas``) are the sanctioned Python escapes.

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
    "emb_cosine_topk",      # exact baseline: broadcast queries x corpus
    "mm_feature_ann_topk",  # same shape over media features
    "j6_value_range_join",  # broadcast 50-row band table, range predicate
    "a5_minmax_date_range", # scalar bounds row cross-joined to output
    "s5_s6_incremental_ingest",  # broadcast single-row audit/manifest stats
    # anti-join pushed through the union: the injected literal orphan key
    # constant-folds into a 1-row x <=1-row BNLJ existence branch (with
    # LocalLimit) beside the real BroadcastHashJoin LeftAnti — O(1) work.
    "dq_schema_checks",
    "w6_forward_fill",  # users x broadcast bounded date spine (the grid)
    # BM25's corpus scalars (N, avgdl) are a ONE-ROW broadcast
    # cross-joined onto the query-term postings — O(|postings|) work.
    "text_bm25_topk",
}


def _entries():
    from __spark_entry__ import queries

    return sorted(queries().items())


@pytest.mark.parametrize("name,fn", _entries(), ids=[n for n, _ in _entries()])
def test_plan_has_no_scale_red_flags(spark, name, fn):
    plan = plan_of(fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unintended nested-loop join\n{plan}"
        )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF\n{plan}"
    )
