from data_ingestion_tool_bakasura__spark.sources.readers import (
    FIXTURE_TABLES,
    load_table,
    read_binary_files,
    register_fixture_views,
)

__all__ = [
    "FIXTURE_TABLES",
    "load_table",
    "read_binary_files",
    "register_fixture_views",
]
