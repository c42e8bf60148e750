"""Driver-contract smoke + oracle-differential tests at sf0.001."""

from __future__ import annotations

import pytest

from __spark_entry__ import entry, oracle_sql, queries
from glamira_end_to_end_data_pipeline_spark.testing import (
    compare_frames,
    duckdb_oracle,
)
from tests.conftest import SF_SMALL


def test_entry_smoke(spark):
    df = entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "event_date",
        "event_type",
        "n_events",
        "n_users",
        "total_value",
    }


def test_every_query_has_oracle_or_is_declared():
    qs, os_ = queries(), oracle_sql()
    assert set(os_) <= set(qs), "oracle without query"
    # every oracle-less query must be deliberate (documented non-SQL ops)
    for name in set(qs) - set(os_):
        assert qs[name].__doc__ and "no oracle" in qs[name].__doc__.lower(), name


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_matches_oracle(spark, duck, name):
    qs, os_ = queries(), oracle_sql()
    sp = qs[name](spark, SF_SMALL).toPandas()
    if name not in os_:
        assert len(sp) >= 0  # rows-only check, mirrors driver's weak gate
        return
    du = duckdb_oracle(duck, os_[name])
    r = compare_frames(name, sp, du)
    assert r.ok, f"{name}: {r.detail} (spark={r.spark_rows}, oracle={r.oracle_rows})"
