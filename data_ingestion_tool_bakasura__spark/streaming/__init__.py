"""Structured Streaming surface (SURVEY §2.C17).

`windows` — watermarked tumbling/sliding/session aggregations and
stateful dedup as readStream transformations, plus a bounded-replay
harness (availableNow trigger -> memory sink) that lets the same
computation be checked against its batch/DuckDB oracle.

`pipeline` — incremental document ingest: file stream -> chunk ->
dedup -> embed -> foreachBatch upsert, the streaming form of
``operators.ingest``.
"""
