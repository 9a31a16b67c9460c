from data_ingestion_tool_bakasura__spark.functions import text, embed, vector, textstats

__all__ = ["text", "embed", "vector", "textstats"]
