from glamira_end_to_end_data_pipeline_spark.sources.bucketing import (
    bucketed_table,
    write_bucketed,
)
from glamira_end_to_end_data_pipeline_spark.sources.lake import (
    read_partitioned,
    write_partitioned,
)
from glamira_end_to_end_data_pipeline_spark.sources.mongo import (
    mongo_reader_options,
    read_collection_or_lake,
    read_mongo,
)
from glamira_end_to_end_data_pipeline_spark.sources.tables import (
    TABLES,
    read_table,
    register_views,
)

__all__ = [
    "TABLES",
    "bucketed_table",
    "mongo_reader_options",
    "read_collection_or_lake",
    "read_mongo",
    "read_partitioned",
    "read_table",
    "register_views",
    "write_bucketed",
    "write_partitioned",
]
