from glamira_end_to_end_data_pipeline_spark.sources.tables import (
    TABLES,
    read_table,
    register_views,
)

__all__ = ["TABLES", "read_table", "register_views"]
