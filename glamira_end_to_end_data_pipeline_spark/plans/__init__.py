from glamira_end_to_end_data_pipeline_spark.plans.queries import ORACLES, QUERIES

# registration side-effects: each module adds entries to QUERIES/ORACLES
from glamira_end_to_end_data_pipeline_spark.plans import (  # noqa: E402,F401
    ingest_queries,
    northstar_queries,
    star_queries,
    streaming_queries,
)

__all__ = ["ORACLES", "QUERIES"]
