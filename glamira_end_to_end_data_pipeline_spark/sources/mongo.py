"""MongoDB-protocol source hook (SURVEY §2.1 S1).

The reference's raw zone is a live MongoDB collection streamed to
chunked Parquet (``6.dps/export_to_GCS.py:24-42,107-209``). This
engine's canonical at-rest format is Parquet (``tables.py``) — the
right call for a 100 TB lake — but a user pointing the engine at a
live collection should not have to hand-write connector plumbing, so
this module provides the ``format("mongodb")``-shaped reader config
for the official MongoDB Spark connector
(https://www.mongodb.com/docs/spark-connector/):

- The connector jar ships OUTSIDE this repo (add
  ``org.mongodb.spark:mongo-spark-connector`` to ``spark.jars.packages``);
  nothing here imports it — the hook only assembles reader options.
- Schema should be supplied explicitly for production reads: connector
  schema inference samples the collection (an extra scan) and infers
  from a sample, which is exactly the per-chunk drift the reference's
  frozen master schema exists to prevent (S7,
  ``export_to_GCS.py:107-130``).
- ``partitioner`` defaults to the sharded-cluster-friendly sample
  partitioner; at 100 TB set ``partitioner.options.partition.size`` so
  each input partition is a bounded chunk, mirroring the reference's
  chunked export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from glamira_end_to_end_data_pipeline_spark.sources.tables import read_table

#: options every production read should pin (see module docstring)
DEFAULT_READ_OPTIONS = {
    "partitioner": "com.mongodb.spark.sql.connector.read.partitioner"
    ".SamplePartitioner",
    "outputExtendedJson": "false",
}


def mongo_reader_options(
    uri: str,
    database: str,
    collection: str,
    pipeline: str | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble the option map for ``spark.read.format("mongodb")``.

    ``pipeline`` is a JSON aggregation pipeline pushed INTO MongoDB —
    the predicate-pushdown equivalent for the protocol source (the
    connector also pushes column pruning and simple filters itself)."""
    opts = dict(DEFAULT_READ_OPTIONS)
    opts.update(
        {
            "connection.uri": uri,
            "database": database,
            "collection": collection,
        }
    )
    if pipeline is not None:
        opts["aggregation.pipeline"] = pipeline
    if extra:
        opts.update(extra)
    return opts


def read_mongo(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    schema: StructType | None = None,
    pipeline: str | None = None,
    extra: dict[str, str] | None = None,
) -> DataFrame:
    """Read a collection through the official connector.

    Raises a actionable error when the connector jar is not on the
    classpath (this container ships without it) instead of the
    connector's bare ClassNotFoundException."""
    reader = spark.read.format("mongodb")
    for k, v in mongo_reader_options(
        uri, database, collection, pipeline, extra
    ).items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.load()
    except Exception as exc:
        # Only the connector-jar-absent markers map to the actionable
        # install hint. Anything else (timeouts, auth, bad URI) almost
        # always embeds "mongodb://" in its message, so matching on the
        # word "mongodb" would misdiagnose genuine connection failures
        # as a missing jar — let those propagate unchanged.
        msg = str(exc)
        if "DATA_SOURCE_NOT_FOUND" in msg or "ClassNotFoundException" in msg:
            raise RuntimeError(
                "MongoDB Spark connector not available in this session. "
                "Submit with --packages org.mongodb.spark:"
                "mongo-spark-connector_2.13:<version>, or use the Parquet "
                "lake path (sources.tables.read_table) — the engine's "
                "canonical at-rest format."
            ) from exc
        raise


def read_collection_or_lake(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    uri: str | None = None,
    database: str | None = None,
    schema: StructType | None = None,
) -> DataFrame:
    """S1 routing: a live collection when a Mongo URI is configured,
    else the Parquet lake table of the same name — so pipelines written
    against the lake run unchanged against the protocol source."""
    if uri and database:
        return read_mongo(spark, uri, database, name, schema=schema)
    return read_table(spark, sf_dir, name)
