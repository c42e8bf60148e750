from glamira_end_to_end_data_pipeline_spark.plans.queries import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
