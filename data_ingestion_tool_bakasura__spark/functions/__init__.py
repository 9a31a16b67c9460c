from data_ingestion_tool_bakasura__spark.functions import (
    boilerplate,
    bpe,
    embed,
    htmlmeta,
    quality,
    ranking,
    redact,
    text,
    textstats,
    unigram,
    urls,
    vector,
)

__all__ = [
    "boilerplate", "bpe", "embed", "htmlmeta", "quality", "ranking",
    "redact", "text", "textstats", "unigram", "urls", "vector",
]
