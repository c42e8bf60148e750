"""dbt-style data-quality assertions (schema tests as a query).

The reference's dbt project aspires to `dbt test`
(``7.dtv/dbt-project-glamira/README.md`` — "Try running … dbt test")
but declares no column tests (SURVEY §5). This operator supplies that
surface Spark-side: the four dbt core checks — ``unique``,
``not_null``, ``relationships``, ``accepted_values`` — each returning
(check_name, failures, passed) rows, unioned into one report frame.

Failure semantics mirror dbt exactly:

- unique: number of VALUES occurring more than once (not row count);
- not_null: number of NULL rows;
- relationships: child rows whose non-null key misses the parent;
- accepted_values: rows outside the allowed list.

Scale: not_null / accepted_values are conditional sums — any number of
them over one table fuse into a single scan (see ``row_checks``).
unique and relationships each need a shuffle (groupBy / anti-join) —
the same cost dbt pays as separate queries, here sharable via cached
inputs."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Fuse row-predicate checks (each Column = TRUE means the row
    FAILS) into one aggregation pass over the table."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col(name).alias("failures"),
                    )
                    for name in checks
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.check_name", "r.failures")


def unique_check(df: DataFrame, name: str, col: str) -> DataFrame:
    dupes = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("failures"))
    )
    return dupes.select(F.lit(name).alias("check_name"), "failures")


def relationship_check(
    child: DataFrame, parent: DataFrame, name: str, child_key: str, parent_key: str
) -> DataFrame:
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(parent, child[child_key] == parent[parent_key], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("failures"))
    )
    return orphans.select(F.lit(name).alias("check_name"), "failures")


def dq_report(parts: Sequence[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name", "failures", (F.col("failures") == 0).alias("passed")
    )
