from data_ingestion_tool_bakasura__spark.operators import (
    asof,
    crawl,
    dedup,
    grouped,
    hnsw,
    ingest,
    linkgraph,
    maintenance,
    sampling,
    shards,
    similarity,
    skew,
    topk,
    upsert,
)

__all__ = [
    "asof", "crawl", "dedup", "grouped", "hnsw", "ingest", "linkgraph",
    "maintenance", "sampling", "shards", "similarity", "skew", "topk",
    "upsert",
]
