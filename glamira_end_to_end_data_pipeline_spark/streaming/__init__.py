from glamira_end_to_end_data_pipeline_spark.streaming.dedup import (
    dedup_replayed_events,
)
from glamira_end_to_end_data_pipeline_spark.streaming.incremental import (
    incremental_file_load,
    run_incremental_load_once,
    tumbling_event_counts,
)
from glamira_end_to_end_data_pipeline_spark.streaming.joins import (
    attribution_join,
    attribution_join_left_outer,
)
from glamira_end_to_end_data_pipeline_spark.streaming.sessions import (
    session_aggregate,
    sessionize_stateful,
)

__all__ = [
    "attribution_join",
    "attribution_join_left_outer",
    "dedup_replayed_events",
    "incremental_file_load",
    "run_incremental_load_once",
    "session_aggregate",
    "sessionize_stateful",
    "tumbling_event_counts",
]
