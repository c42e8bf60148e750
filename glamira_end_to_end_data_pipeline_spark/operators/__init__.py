from glamira_end_to_end_data_pipeline_spark.operators import (
    dedup,
    geo,
    similarity,
    skew,
    text,
)

__all__ = ["dedup", "geo", "similarity", "skew", "text"]
