"""End-to-end ingest pipeline tests (SURVEY §5.3): deterministic
providers make the whole pipeline reproducible; dedup idempotence and
planted duplicates exercise A18."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.operators.ingest import (
    IngestConfig,
    chunk_documents,
    dedup_against_index,
    ingest_accounting,
    ingest_documents,
)
from data_ingestion_tool_bakasura__spark.schema import INDEX_SCHEMA
from data_ingestion_tool_bakasura__spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_ingest_schema_matches_reference(spark):
    rows = ingest_documents(_docs(spark).limit(20), cfg=IngestConfig(embedding_dim=8))
    assert [f.name for f in rows.schema.fields] == [f.name for f in INDEX_SCHEMA.fields]
    assert rows.count() > 0


def test_ingest_deterministic(spark):
    cfg = IngestConfig(embedding_dim=8)
    a = ingest_documents(_docs(spark).limit(50), cfg=cfg).orderBy("id").collect()
    b = ingest_documents(_docs(spark).limit(50), cfg=cfg).orderBy("id").collect()
    assert a == b


def test_ingest_dedup_idempotent(spark):
    """Ingesting the same batch against its own output index yields zero
    new rows (SURVEY §5.5 property)."""
    cfg = IngestConfig(embedding_dim=8)
    docs = _docs(spark).limit(30)
    first = ingest_documents(docs, cfg=cfg)
    again = ingest_documents(docs, index=first.select("text_hash"), cfg=cfg)
    assert again.count() == 0


def test_planted_duplicates_deduped(spark):
    docs = spark.createDataFrame(
        [(1, "identical text body"), (2, "identical text body"), (3, "different body")],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs)
    assert chunks.count() == 3
    deduped = dedup_against_index(chunks, None)
    assert deduped.count() == 2  # one copy of the dup + the distinct doc
    # deterministic keep rule: lowest doc_id survives
    kept = {r["doc_id"] for r in deduped.collect()}
    assert kept == {1, 3}


def test_dead_letter_accounting(spark):
    rows = spark.createDataFrame(
        [("f1", None), ("f1", "boom"), ("f2", None)], "filename string, error string"
    )
    acct = {r["filename"]: (r["n_chunks"], r["n_errors"]) for r in ingest_accounting(rows).collect()}
    assert acct == {"f1": (2, 1), "f2": (1, 0)}


def test_upsert_semantics(spark):
    from data_ingestion_tool_bakasura__spark.operators.upsert import upsert_by_key

    current = spark.createDataFrame([("a", 1), ("b", 1)], "id string, v int")
    updates = spark.createDataFrame([("b", 2), ("c", 2)], "id string, v int")
    out = {r["id"]: r["v"] for r in upsert_by_key(current, updates).collect()}
    assert out == {"a": 1, "b": 2, "c": 2}


def test_index_roundtrip(spark, tmp_path):
    from data_ingestion_tool_bakasura__spark.schema import (
        ensure_index_table,
        read_index,
        write_index,
    )

    path = str(tmp_path / "index")
    ensure_index_table(spark, path)
    assert read_index(spark, path).count() == 0
    rows = ingest_documents(_docs(spark).limit(10), cfg=IngestConfig(embedding_dim=8))
    write_index(rows, path)
    back = read_index(spark, path)
    assert back.count() == rows.count()
    assert [f.name for f in back.schema.fields] == [f.name for f in INDEX_SCHEMA.fields]
