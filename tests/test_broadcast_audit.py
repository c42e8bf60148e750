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
the audit enumerates exactly those, per file, by the root identifier
of the broadcast argument. A new hint site fails this test until its
boundedness is justified here.

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

# file -> {root identifier of the F.broadcast(...) argument}. Every
# entry is bounded INDEPENDENT of scale factor; the justification is
# the comment. Adding a name here is a design assertion, not a lint
# suppression.
ALLOWED_BROADCAST_ROOTS: dict[str, set[str]] = {
    "queries.py": {
        "nation",        # 25 rows, fixed by TPC-H spec
        "region",        # 5 rows, fixed
        "nat",           # nation alias, 25 rows
        "reg",           # region alias, 5 rows
        "dim",           # j4 status dim: returnflag x linestatus (<= 9 rows)
        "dim_date",      # generated date spine, bounded by calendar range
        "spine",         # generated date spine, calendar-bounded
        "cutoff",        # one-row scalar aggregate
        "total",         # one-row scalar aggregate
        "best",          # one-row max aggregate
        "ranges",        # geo BIN ranges: bounded lookup table
    },
    "models.py": {
        "product",       # star dim_product: distinct product_source_id of the
                         # 2k-row seeded catalog (bounded dimension by design)
        "date",          # dim_date spine
    },
    "streaming_queries.py": {
        "audit_stats",   # one-row audit aggregate
        "mani_rows",     # one manifest row
    },
    "r5_queries.py": {
        "n",             # nation
        "qs",            # fixed probe/query set (constant literal)
        "glob",          # one-row global aggregate
        "tot",           # one-row total
    },
    "r6_queries.py": {
        "dim",           # customer WHERE c_custkey < 100: <= 99 rows at any SF
    },
    "r7_queries.py": {
        "med",           # per-mktsegment medians: <= 5 rows
        "mad",           # per-mktsegment MADs: <= 5 rows
    },
    "r8_queries.py": {
        "v",             # one-row vocab/total aggregate
        "b",             # distinct event types (enum-bounded)
        "stats",         # one-row corpus stats
        "cut",           # one-row threshold
    },
    "r9_queries.py": {
        "tot",           # one-row totals
        "sad",           # one-row sum-of-abs-deviations
        "vdf",           # 64-row driver-literal direction table
        "pdf",           # driver-literal Rademacher plane table
        "rates",         # per-source rates: source enum is bounded
        "sketch",        # k-bounded sketch rows
        "stats",         # one-row stats
        "f",             # random-walk frontier: |starts|-bounded here (the
                         # docstring documents the |V|-frontier production
                         # variant switching to keyed Pregel rounds)
        "roots",         # k-bounded cluster roots
        "l1",            # k-bounded level-1 centroids
        "bad_key",       # one-row poisoned-key scalar
        "q",             # query vectors filtered to vec_id < 10
        "qv",            # 10 query vectors (vec_id < 10)
    },
    "r10_queries.py": {
        "cands",         # hot-key candidate set: top-k bounded
        "tot",           # one-row totals
        "boff",          # per-bucket offsets: <= |buckets|
        "wsum",          # one-row weighted sum
        "bsum",          # one-row sum
    },
    "r11_queries.py": {
        "nation",        # 25 rows, fixed by TPC-H spec
        "b",             # nation x month series: ~25 x 84 rows at ANY SF
        "tot",           # one-row total
        "bounds",        # one-row min/max
        "mx",            # one-row marginal
        "my",            # one-row marginal
    },
    "r12_queries.py": {
        "rx",            # per-distinct-value midrank rollup of a bounded
                         # discrete domain (l_quantity: 50 values)
        "tots",          # one-row totals
        "buckets",       # <= |buckets| rollup
        "mrow",          # one-row scalar
        "glob",          # one-row global stats
        "thr",           # one-row threshold
        "tt",            # one-row total
        "nb",            # one-row count
        "cm",            # k-bounded centroids
        "tot",           # one-row total
        "dimf",          # month dim: bounded by calendar range
        "gm",            # one-row global mean
        "pri",           # one-row prior
        "m_rank",        # top-10 rows
        "top10",         # 10 rows
        "b",             # one-row Welch group stats
        "w",             # IRLS one-row weight state
        "jx",            # isotonic j-side: <= 20 score-bucket rows
        "kx",            # isotonic k-side: <= 20 score-bucket rows
    },
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
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read(), filename=path)
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "broadcast"
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "F"
            and node.args
        ):
            yield node


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
    allowed = ALLOWED_BROADCAST_ROOTS.get(fname, set())
    violations = []
    for call in _broadcast_sites(os.path.join(PLANS_DIR, fname)):
        root = _root_name(call.args[0])
        src = ast.unparse(call.args[0])
        if root is None or root not in allowed:
            violations.append(f"{fname}:{call.lineno} F.broadcast({src})")
        elif any(b in root for b in BANNED_SUBSTRINGS):
            violations.append(
                f"{fname}:{call.lineno} allow-listed root '{root}' matches a "
                "banned SF-proportional table name"
            )
    assert not violations, (
        "F.broadcast hint on a relation not in the bounded allow-list "
        "(SF-proportional sides must carry NO hint — statistics/AQE "
        "decide):\n" + "\n".join(violations)
    )
