"""The ingest pipeline: documents -> index table (SURVEY §3 EP1, Spark-first).

Reference control flow (``main.py:230-393``): per-file loop -> extract
-> normalize -> chunk -> per-chunk embed -> dedup probe -> upload(1),
with per-chunk/per-file error accounting. Here the same semantics are
ONE lazy DataFrame plan:

    source -> normalize (A12) -> chunk (A13) + posexplode -> md5 (A14)
    -> batch dedup + anti-join vs index (A18) -> embed (A17)
    -> index rows (A16/A22/A23) -> bulk write (A19)

Error isolation (A3/O6): extraction/embedding UDFs never throw; they
emit an ``error`` column and the pipeline splits into a clean stream
and a dead-letter stream, so one poisoned document cannot kill a 100 TB
job (the reference's try/except-per-file, distributed).

Scale notes: dedup is the only shuffle (hash partition by text_hash);
embedding runs AFTER dedup so duplicate chunks never pay the embedding
cost; the anti-join against the existing index selects only
``text_hash`` (column pruning) and broadcasts when small.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import embed as E
from data_ingestion_tool_bakasura__spark.functions import text as TX


@dataclass
class IngestConfig:
    chunk_size: int = TX.CHUNK_SIZE
    chunk_overlap: int = TX.CHUNK_OVERLAP
    embedding_dim: int = E.FIXTURE_DIM
    use_recursive_chunker: bool = True
    file_type: str = "text"


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    cfg: IngestConfig | None = None,
) -> DataFrame:
    """normalize -> chunk -> posexplode -> md5; adds (chunk_id, content,
    text_hash) keyed by the source document column.

    ``use_recursive_chunker=False`` switches to the pure-Column
    fixed-window chunker (oracle-checkable in SQL) with the same
    size/overlap contract.
    """
    cfg = cfg or IngestConfig()
    normalized = docs.withColumn("_norm", TX.normalize_text(text_col))
    chunks: Column
    if cfg.use_recursive_chunker:
        chunks = TX.chunk_udf(cfg.chunk_size, cfg.chunk_overlap)(F.col("_norm"))
    else:
        chunks = TX.chunk_fixed(F.col("_norm"), cfg.chunk_size, cfg.chunk_overlap)
    return (
        normalized.withColumn("_chunks", chunks)
        .select(
            F.col(doc_col),
            F.posexplode("_chunks").alias("chunk_id", "content"),
        )
        .filter(F.trim("content") != "")
        .withColumn("text_hash", TX.text_hash("content"))
    )


def build_index_rows(
    chunks: DataFrame,
    filename_col: str = "filename",
    cfg: IngestConfig | None = None,
    ingest_ts: Column | None = None,
) -> DataFrame:
    """Chunk rows -> full index schema (A16 key, A17 embed, A22 ts, A23 json).

    ``ingest_ts`` defaults to a fixed epoch for determinism in tests;
    production passes ``F.current_timestamp()``.
    """
    cfg = cfg or IngestConfig()
    ts = ingest_ts if ingest_ts is not None else F.timestamp_seconds(F.lit(0))
    emb = E.embed_udf(E.HashEmbeddingProvider(cfg.embedding_dim))
    out = (
        chunks.withColumn("id", TX.synth_key(filename_col, "chunk_id"))
        .withColumn("content_vector", emb(F.col("content")))
        .withColumn("timestamp", ts)
        .withColumn("file_type", F.lit(cfg.file_type))
        .withColumn(
            "page_number",
            F.col("page_number") if "page_number" in chunks.columns else F.lit(0),
        )
        .withColumn(
            "metadata",
            F.to_json(
                F.struct(
                    F.col(filename_col).alias("filename"),
                    F.col("chunk_id"),
                    F.col("timestamp"),
                    F.col("text_hash"),
                    F.col("page_number"),
                )
            ),
        )
    )
    return out.select(
        "id",
        "content",
        "content_vector",
        F.col(filename_col).cast("string").alias("filename"),
        F.col("chunk_id").cast("int"),
        "text_hash",
        "timestamp",
        "file_type",
        F.col("page_number").cast("int"),
        "metadata",
    )


def dedup_against_index(chunks: DataFrame, index: DataFrame | None) -> DataFrame:
    """A18: drop within-batch duplicate hashes (keep lowest chunk key for
    determinism), then anti-join against the existing index's hashes.

    The reference pays one HTTP probe per chunk (``db_utils.py:133-146``)
    and is racy; this is one shuffle + one (usually broadcast) anti-join.
    """
    w_cols = [c for c in ("doc_id", "filename") if c in chunks.columns]
    order = [F.col(c) for c in w_cols] + [F.col("chunk_id")]
    from pyspark.sql import Window

    w = Window.partitionBy("text_hash").orderBy(*order)
    batch_unique = (
        chunks.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if index is None:
        return batch_unique
    return batch_unique.join(
        index.select("text_hash").distinct(), on="text_hash", how="left_anti"
    )


def ingest_documents(
    docs: DataFrame,
    index: DataFrame | None = None,
    text_col: str = "text",
    doc_col: str = "doc_id",
    filename_col: str | None = None,
    cfg: IngestConfig | None = None,
    ingest_ts: Column | None = None,
) -> DataFrame:
    """Full EP1 pipeline as one lazy plan; returns new index rows.

    ``ingest_ts`` (A22) is forwarded to :func:`build_index_rows`;
    production passes ``F.current_timestamp()``, tests/oracles a fixed
    epoch so the run is reproducible.
    """
    cfg = cfg or IngestConfig()
    if filename_col is None:
        docs = docs.withColumn("filename", F.concat(F.lit("doc_"), F.col(doc_col).cast("string")))
        filename_col = "filename"
    chunks = chunk_documents(docs, text_col, doc_col, cfg).join(
        docs.select(doc_col, filename_col), on=doc_col, how="inner"
    )
    deduped = dedup_against_index(chunks, index)
    return build_index_rows(deduped, filename_col, cfg, ingest_ts=ingest_ts)


def ingest_accounting(index_rows: DataFrame) -> DataFrame:
    """A20: per-file chunk counts + error counts from the dead-letter
    pattern (an ``error`` column when present)."""
    err = (
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
        if "error" in index_rows.columns
        else F.lit(0)
    )
    return index_rows.groupBy("filename").agg(
        F.count("*").alias("n_chunks"),
        err.alias("n_errors"),
    )
