"""Query catalog: merges every domain module's queries + oracles.

``QUERIES[name](spark, sf_dir) -> DataFrame``; ``ORACLE[name]`` is the
DuckDB-equivalent SQL when the operator is SQL-expressible (the driver
records a weaker rows-only check otherwise — currently the recursive
chunker pipeline, LSH/IVF approximate search, and the full ingest
composition, each covered by dedicated tests instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.plans import (
    curation_q,
    documents_q,
    events_q,
    multimodal_q,
    relational,
    streaming_q,
    vectors_q,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for mod in (relational, documents_q, events_q, streaming_q, multimodal_q, vectors_q, curation_q):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)


# --- full ingest pipeline (recursive chunker -> dedup -> embed) -----------
# Not SQL-expressible (recursive splitter + hash-embedding); covered by
# golden/property tests in tests/test_ingest.py. Registered rows-only.

def q_ingest_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from data_ingestion_tool_bakasura__spark.operators.ingest import (
        IngestConfig,
        ingest_documents,
    )
    from data_ingestion_tool_bakasura__spark.sources.readers import load_table

    docs = load_table(spark, sf, "documents")
    rows = ingest_documents(docs, cfg=IngestConfig(embedding_dim=16))
    return (
        rows.groupBy("filename")
        .agg(
            F.count("*").alias("n_chunks"),
            F.round(F.avg(F.length("content")), 6).alias("avg_chunk_len"),
            F.countDistinct("text_hash").alias("n_unique"),
        )
        .orderBy("filename")
    )


QUERIES["q_ingest_pipeline"] = q_ingest_pipeline
