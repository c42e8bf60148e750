"""Ingest/egress surface (SURVEY §2.1 S5/S7/S8, §2.2 P8/P9, §2.8 F22-F24).

Reproduces the semantics of the reference's export + load-trigger pair:

- **Master-schema unification** (ref ``6.data-pipeline-storage/
  export_to_GCS.py:107-209``): the reference streams Mongo docs in 10k
  chunks through pandas, freezes the first chunk's pyarrow schema, and
  coerces every later chunk to it. Declared columns (``utm_*``,
  ``gclid``; ``:51,116``) are forced to string; everything else is
  best-effort ``to_numeric`` else string (``:141-149``). Our
  :func:`unify_master_schema` applies the same rules ONCE over the whole
  dataset — a single stats pass decides numeric-vs-string per column
  (all non-null values must parse, matching pandas' all-or-nothing
  ``to_numeric(errors='raise')``), then one select casts. Chunks ≡
  partitions; the frozen-schema dance disappears.

- **Load-trigger routing** (ref ``6.data-pipeline-storage/
  trigger_bigquery_load.py``): object path → {keep if under prefix
  (``:128-131``), format from extension (``:35-43``), table name from
  subfolder else filename stem (``:48-74``), sanitized (``:45-46``),
  stable job id for replay idempotency (``:92-94``)} — all pure column
  expressions here, so routing a billion object names is one narrow
  scan, no UDFs.

- **Manifest** (ref ``export_to_GCS.py:319-333``): small driver-side
  JSON summary of an export run, written via ``df.write.json``.

Scale: routing and unification are narrow projections — column pruning
keeps the scan to the path/routed columns only; the stats pass for
schema inference aggregates to one row per column (map-side combine,
negligible shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Columns the reference forces to string regardless of content
# (export_to_GCS.py:51,116): ad-tracking fields whose values look
# numeric often enough to mis-infer.
FORCE_STRING_COLUMNS = ("utm_source", "utm_medium", "utm_campaign", "gclid")

#: extension → load format (trigger_bigquery_load.py:35-43)
_FORMAT_BY_EXT = {
    ".parquet": "PARQUET",
    ".json": "NEWLINE_DELIMITED_JSON",
    ".csv": "CSV",
}


# ---------------------------------------------------------------------------
# S7 — master-schema unification
# ---------------------------------------------------------------------------


def numeric_parseable_columns(
    df: DataFrame, candidates: list[str] | None = None
) -> list[str]:
    """One stats pass deciding, per string column, whether EVERY non-null
    value parses as a number (pandas ``to_numeric(errors='raise')``
    semantics, ref ``export_to_GCS.py:141-149``). Returns the columns to
    promote. Single aggregate row collected — no per-chunk drift."""
    if candidates is None:
        candidates = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
        ]
    candidates = [c for c in candidates if c not in FORCE_STRING_COLUMNS]
    if not candidates:
        return []
    stats = df.agg(
        *[
            (
                F.count(F.col(c))
                == F.count(F.col(c).try_cast("double"))
            ).alias(c)
            for c in candidates
        ]
    ).first()
    return [c for c in candidates if stats[c]]


def unify_master_schema(df: DataFrame) -> DataFrame:
    """Apply the reference's frozen-master-schema rules to a free-schema
    (all-string) frame: force-string columns stay string; other string
    columns become double iff every non-null value parses; non-string
    columns pass through. The decision is data-dependent but made once,
    mirroring the first-chunk schema freeze (``export_to_GCS.py:152-160``)
    without its order-dependence."""
    promote = set(numeric_parseable_columns(df))
    return df.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if f.name in promote
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


# ---------------------------------------------------------------------------
# P8/P9 + F22-F24 — load-trigger routing (pure column expressions)
# ---------------------------------------------------------------------------


def under_prefix(path: Column | str, prefix: str = "data_in_parquet/") -> Column:
    """P8 — keep only objects under the watched prefix
    (``trigger_bigquery_load.py:128-131``)."""
    return F.col(path).startswith(prefix) if isinstance(path, str) else path.startswith(prefix)


def dispatch_format(path: Column | str) -> Column:
    """P9 — file extension → load format enum
    (``trigger_bigquery_load.py:35-43``); NULL for unsupported."""
    c = F.col(path) if isinstance(path, str) else path
    expr = F.lit(None).cast("string")
    for ext, fmt in reversed(_FORMAT_BY_EXT.items()):
        expr = F.when(c.endswith(ext), F.lit(fmt)).otherwise(expr)
    return expr


def sanitize_table_name(name: Column | str) -> Column:
    """F22 — ``re.sub(r'[^a-zA-Z0-9_]', '_', s)``
    (``trigger_bigquery_load.py:45-46``)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_replace(c, "[^a-zA-Z0-9_]", "_")


def table_name_from_path(
    path: Column | str, prefix: str = "data_in_parquet/"
) -> Column:
    """F23 — table from first subfolder under the prefix when present,
    else the filename stem (``trigger_bigquery_load.py:48-74``),
    sanitized per F22."""
    c = F.col(path) if isinstance(path, str) else path
    rel = F.substring(c, len(prefix) + 1, 2_000_000)
    parts = F.split(rel, "/")
    filename = F.element_at(parts, -1)
    stem = F.regexp_replace(filename, r"\.[^.]*$", "")
    raw = F.when(F.size(parts) > 1, F.element_at(parts, 1)).otherwise(stem)
    return sanitize_table_name(raw)


def stable_job_id(uri: Column | str, table: Column | str) -> Column:
    """F24 — replay-idempotent load-job id. The reference uses Python
    ``abs(hash((uri, table)))`` (``trigger_bigquery_load.py:92-94``),
    which is process-salted; we keep the *property* (stable, collision-
    resistant per (uri, table)) with a portable recipe: md5 over a
    delimited concat — deterministic across engines and runs."""
    u = F.col(uri) if isinstance(uri, str) else uri
    t = F.col(table) if isinstance(table, str) else table
    return F.md5(F.concat_ws("|", u, t))


def route_load_events(objects: DataFrame, path_col: str = "path") -> DataFrame:
    """Full S9 routing pipeline over an object-arrival frame: prefix
    filter → format dispatch → table inference → job id. One narrow
    projection; at 100 TB of arrivals this is a metadata-only scan."""
    p = F.col(path_col)
    return (
        objects.filter(under_prefix(p))
        .select(
            p.alias("uri"),
            dispatch_format(p).alias("load_format"),
            table_name_from_path(p).alias("target_table"),
        )
        .filter(F.col("load_format").isNotNull())
        .withColumn("job_id", stable_job_id("uri", "target_table"))
    )


# ---------------------------------------------------------------------------
# S4 — one-value-per-line text sink/source (worklist files)
# ---------------------------------------------------------------------------


def write_text_worklist(
    df: DataFrame, path: str, value_col: str | None = None
) -> None:
    """S4 sink — one value per line, skipping blank/NULL values after
    strip (ref ``5.data-collection-storage/ip_processor.py:88-99``: the
    unique-IP worklist is written as a plain text file, one IP per
    line). Distributed write — one part-file per partition; no
    coalesce(1), so a billion-row worklist writes in parallel."""
    col = F.col(value_col if value_col is not None else df.columns[0])
    out = df.select(F.trim(col.cast("string")).alias("value")).filter(
        F.col("value").isNotNull() & (F.col("value") != "")
    )
    out.write.mode("overwrite").text(path)


def read_text_worklist(spark, path: str, value_col: str = "value") -> DataFrame:
    """S4 source — read a one-per-line worklist back, stripping
    whitespace and dropping blank lines (ref ``ip_processor.py:110-117``
    re-loads the same file with per-line strip + skip-empty)."""
    trimmed = F.trim(F.col("value")).alias(value_col)
    return (
        spark.read.text(path)
        .select(trimmed)
        .filter(F.col(value_col).isNotNull() & (F.col(value_col) != ""))
    )


# ---------------------------------------------------------------------------
# S5 — export manifest
# ---------------------------------------------------------------------------


def write_manifest(
    summaries: DataFrame, manifest_dir: str
) -> None:
    """S5 — export-manifest sink (``export_to_GCS.py:319-333``): one JSON
    record per exported table {table, row_count, export_ts}. Tiny frame;
    coalesce(1) keeps the manifest a single human-readable file."""
    summaries.withColumn(
        "export_ts",
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss"),
    ).coalesce(1).write.mode("overwrite").json(manifest_dir)


def read_manifest(spark, manifest_dir: str) -> DataFrame:
    """S5 — manifest source (``spark.read.json``)."""
    return spark.read.json(manifest_dir)
