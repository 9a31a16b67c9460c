from data_ingestion_tool_bakasura__spark.plans.catalog import ORACLE, QUERIES

__all__ = ["ORACLE", "QUERIES"]
