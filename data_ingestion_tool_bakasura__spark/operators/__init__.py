from data_ingestion_tool_bakasura__spark.operators import (
    asof,
    dedup,
    ingest,
    similarity,
    topk,
    upsert,
)

__all__ = ["asof", "dedup", "ingest", "similarity", "topk", "upsert"]
