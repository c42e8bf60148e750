from glamira_end_to_end_data_pipeline_spark.streaming.incremental import (
    incremental_file_load,
    run_incremental_load_once,
    tumbling_event_counts,
)

__all__ = [
    "incremental_file_load",
    "run_incremental_load_once",
    "tumbling_event_counts",
]
