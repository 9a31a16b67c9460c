from data_ingestion_tool_bakasura__spark.functions import text, embed, ranking, vector, textstats

__all__ = ["text", "embed", "ranking", "vector", "textstats"]
