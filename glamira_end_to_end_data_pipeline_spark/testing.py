"""Cross-engine comparison helpers (Spark result vs DuckDB oracle).

Mimics the driver's t2 gate: row count + schema (sorted column names) +
order-insensitive value hash. Canonicalization is exact — doubles compare
bit-for-bit via ``repr`` — so a pass here implies a pass under any
reasonable driver hash.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import pandas as pd


def canonicalize(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    pdf = pdf[sorted(pdf.columns)]

    def cell(v: object) -> str:
        try:
            if v is None or pd.isna(v):
                return "NULL"
        except (TypeError, ValueError):
            pass
        if isinstance(v, float):
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    rows = sorted("|".join(cell(v) for v in row) for row in pdf.itertuples(index=False))
    digest = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(pdf), list(pdf.columns), digest


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    n1, c1, h1 = canonicalize(spark_pdf)
    n2, c2, h2 = canonicalize(oracle_pdf)
    if (n1, c1, h1) == (n2, c2, h2):
        return CompareResult(name, True, n1, n2)
    detail = ""
    if c1 != c2:
        detail = f"columns differ: spark={c1} oracle={c2}"
    elif n1 != n2:
        detail = "row counts differ"
    else:
        cols = sorted(spark_pdf.columns)
        s = spark_pdf[cols].sort_values(cols).reset_index(drop=True)
        d = oracle_pdf[cols].sort_values(cols).reset_index(drop=True)
        for col in cols:
            if not s[col].astype(str).equals(d[col].astype(str)):
                diff = s[col].astype(str) != d[col].astype(str)
                i = int(diff.idxmax())
                detail = (
                    f"col={col} row={i}: spark={s[col][i]!r} "
                    f"oracle={d[col][i]!r} ({int(diff.sum())} differing)"
                )
                break
        else:
            detail = "values differ only at sub-str canonicalization level"
    return CompareResult(name, False, n1, n2, detail)


def duckdb_oracle(con, sql: str) -> pd.DataFrame:
    """Run oracle SQL and fetch via Arrow (type fidelity: DATE → date32 →
    datetime.date objects, matching Spark's toPandas)."""
    return con.sql(sql).arrow().to_pandas()


def register_duckdb_views(con, sf_dir: str) -> None:
    from glamira_end_to_end_data_pipeline_spark.sources.tables import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
