from data_ingestion_tool_bakasura__spark.operators import (
    asof,
    dedup,
    hnsw,
    ingest,
    maintenance,
    sampling,
    similarity,
    topk,
    upsert,
)

__all__ = [
    "asof", "dedup", "hnsw", "ingest", "maintenance", "sampling",
    "similarity", "topk", "upsert",
]
