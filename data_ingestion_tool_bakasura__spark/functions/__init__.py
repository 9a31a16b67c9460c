from data_ingestion_tool_bakasura__spark.functions import (
    bpe,
    embed,
    ranking,
    redact,
    text,
    textstats,
    urls,
    vector,
)

__all__ = ["bpe", "embed", "ranking", "redact", "text", "textstats", "urls", "vector"]
