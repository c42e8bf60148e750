"""glamira_end_to_end_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``audreydng/glamira-end-to-end-data-pipeline``
(a MongoDB → Parquet/GCS → BigQuery/dbt clickstream ELT), plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Design principles (see SURVEY.md §7):

- DataFrame/SQL API only; Catalyst/AQE owns physical planning.
- No row-at-a-time Python UDFs in hot paths; Arrow-batched pandas UDFs
  only where built-ins genuinely cannot express the semantics.
- Every operator is a *lazy* plan over Parquet; materialization is the
  caller's choice (mirrors dbt's ``view`` default materialization).
"""

from glamira_end_to_end_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
