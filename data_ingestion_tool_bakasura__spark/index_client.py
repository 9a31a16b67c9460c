"""IndexClient — the reference's service API re-expressed over a Spark
table (drop-in parity layer; SURVEY §2.B, §3 EP2/EP3).

Reference surface (file:line into /root/reference/):
- ``initialize_search_client`` / create-or-update index schema
  (``db_utils.py:36-49,52-127``)  -> :meth:`IndexClient.initialize`
- ``store_embedding`` dedup-checked upsert (``db_utils.py:131-174``)
  -> :meth:`IndexClient.store` (batched, atomic per call)
- ``get_index_stats`` match-all count (``main.py:34-53``)
  -> :meth:`IndexClient.stats`
- ``get_document_stats`` count + filename facet (``db_utils.py:177-189``)
  -> :meth:`IndexClient.document_stats`
- search with filter/top/select/facets (``db_utils.py:135-146``)
  -> :meth:`IndexClient.search`
- embed connection test (``main.py:130-139``) -> :meth:`IndexClient.ping`

Differences by design: operations are set-oriented (one DataFrame in,
one atomic parquet append) instead of per-chunk HTTP round-trips; the
dedup probe is an anti-join, not a racy check-then-write.
"""

from __future__ import annotations

import contextlib
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import embed as E
from data_ingestion_tool_bakasura__spark.schema import INDEX_SCHEMA


class IndexClient:
    """Query/ingest client over one index table (parquet directory)."""

    def __init__(self, spark: SparkSession, path: str, embedding_dim: int = E.FIXTURE_DIM):
        self.spark = spark
        self.path = path
        self.embedding_dim = embedding_dim

    # -- lifecycle ---------------------------------------------------------

    def initialize(self) -> None:
        """Create-if-not-exists with the fixed schema (O7 idempotency):
        an empty dataframe write establishes schema + directory."""
        if not self._exists():
            empty = self.spark.createDataFrame([], INDEX_SCHEMA)
            empty.write.mode("overwrite").parquet(self.path)

    def _exists(self) -> bool:
        try:
            self.spark.read.parquet(self.path).limit(1).collect()
            return True
        except Exception:
            return False

    def table(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception as e:
            raise RuntimeError(
                f"index table not found at {self.path!r}: call initialize() first"
            ) from e

    def ping(self) -> bool:
        """EP3 health check: 1 row through the embed provider; False on
        the zero-vector fallback (mirrors ``any(test)``, main.py:134)."""
        udf = E.embed_udf(E.HashEmbeddingProvider(self.embedding_dim))
        row = self.spark.range(1).select(udf(F.lit("test")).alias("v")).first()
        return any(x != 0.0 for x in row["v"])

    # -- ingest ------------------------------------------------------------

    @contextlib.contextmanager
    def _writer_lock(self, timeout: float = 120.0, stale: float = 600.0):
        """Serialize probe+append across concurrent writers.

        The reference's probe-then-upload races under two writers
        (``db_utils.py:135-169``) — the one bug SURVEY §7 pledges not to
        replicate. Plain parquet has no transaction log, so mutual
        exclusion is explicit: an atomic ``os.mkdir`` lock next to the
        table (POSIX mkdir either creates or fails — no TOCTOU), with
        stale-lock breaking for crashed writers. The break itself is
        atomic too: a stale lock is ``os.rename``d to a unique name
        first, so exactly one waiter wins the rename and removes it —
        two waiters passing the staleness check concurrently cannot
        each rmdir/re-mkdir and end up both holding the lock.
        Local-filesystem scope by design; on a cluster this becomes a
        lakehouse transactional MERGE (Delta/Iceberg), not a bigger
        lock.
        """
        lock = self.path.rstrip("/") + ".lock"
        deadline = time.monotonic() + timeout
        while True:
            try:
                os.mkdir(lock)
                break
            except FileExistsError:
                with contextlib.suppress(OSError):
                    if time.time() - os.path.getmtime(lock) > stale:
                        # atomic break: only the waiter whose rename wins
                        # may clean up; losers get ENOENT and re-loop
                        trash = f"{lock}.stale.{os.getpid()}.{time.monotonic_ns()}"
                        os.rename(lock, trash)
                        os.rmdir(trash)
                        continue
                if time.monotonic() > deadline:
                    raise TimeoutError(f"could not acquire writer lock {lock!r}")
                time.sleep(0.05)
        try:
            yield
        finally:
            with contextlib.suppress(OSError):
                os.rmdir(lock)

    def store(self, index_rows: DataFrame) -> int:
        """Dedup-checked append (A18+A19, batched): drops rows whose
        text_hash already exists, appends the rest; returns rows added.
        The probe and append run under :meth:`_writer_lock`, so two
        concurrent ``store`` calls cannot both pass the probe and write
        duplicate keys."""
        with self._writer_lock():
            fresh = index_rows.join(
                self.table().select("text_hash").distinct(), on="text_hash", how="left_anti"
            ).cache()
            n = fresh.count()
            if n:
                fresh.select([f.name for f in INDEX_SCHEMA.fields]).write.mode("append").parquet(
                    self.path
                )
            fresh.unpersist()
        return n

    # -- query surface (B1-B7) ---------------------------------------------

    def stats(self) -> dict:
        """EP2: total chunk count + unique files (B5/B6)."""
        t = self.table()
        row = t.agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("filename").alias("n_files"),
        ).first()
        return {"document_count": row["n_chunks"], "unique_files": row["n_files"]}

    def document_stats(self) -> DataFrame:
        """Filename facet (B6): chunks per file."""
        return self.table().groupBy("filename").agg(F.count("*").alias("n_chunks"))

    def search(
        self,
        where: str | None = None,
        select: list[str] | None = None,
        top: int | None = None,
        order_by: str | None = None,
    ) -> DataFrame:
        """The OData-ish surface: filter (B2) / project (B3) / top (B4)
        / sort (B7) as one lazy plan — predicates and pruning reach the
        parquet scan."""
        t = self.table()
        if where:
            t = t.filter(where)
        if order_by:
            t = t.orderBy(order_by)
        if select:
            t = t.select(*select)
        if top is not None:
            t = t.limit(top)
        return t

    # -- relevance search (B8/B9/B10: the leg the reference delegates
    # -- to Azure Search scoring / the VectorizedQuery it never issues)

    def search_text(self, query: str, k: int = 10) -> DataFrame:
        """Full-text relevance (B8): whitespace-tokenized query terms
        scored by one-scan Okapi BM25 over ``content``
        (case-insensitive). Returns (id, content, filename, bm25)."""
        from data_ingestion_tool_bakasura__spark.functions.ranking import bm25_topk

        terms = [t for t in query.split() if t]
        hits = bm25_topk(self.table(), terms, k=k, id_col="id", text_col="content")
        return (
            hits.join(self.table().select("id", "content", "filename"), "id")
            .select("id", "content", "filename", "bm25")
            .orderBy(F.desc("bm25"), "id")
        )

    def search_vector(self, query: str, k: int = 10) -> DataFrame:
        """Vector KNN (B9) — the query the reference CONFIGURES but
        never issues (``VectorizedQuery`` imported, never called,
        ``db_utils.py:24``): embed the query text with the same
        provider that built the index, exact cosine top-k over
        ``content_vector``. Returns (id, content, filename, cos_sim)."""
        from data_ingestion_tool_bakasura__spark.operators.similarity import cosine_topk

        qv = E.hash_embed_py(query, self.embedding_dim)
        hits = cosine_topk(
            self.table(), qv, k=k, id_col="id", vec_col="content_vector"
        )
        return (
            hits.join(self.table().select("id", "content", "filename"), "id")
            .select("id", "content", "filename", "cos_sim")
            .orderBy(F.desc("cos_sim"), "id")
        )

    def search_hybrid(self, query: str, k: int = 10) -> DataFrame:
        """Hybrid retrieval (B10): BM25 and vector legs each cut to
        their bounded top-(4k) first, fused by Reciprocal Rank Fusion
        (k=60). Returns (id, content, filename, rrf)."""
        from pyspark.sql import Window

        from data_ingestion_tool_bakasura__spark.functions.ranking import rrf_fuse

        cut = max(4 * k, 20)
        bm = self.search_text(query, k=cut).withColumn(
            "r_bm", F.row_number().over(Window.orderBy(F.desc("bm25"), "id"))
        )
        vec = self.search_vector(query, k=cut).withColumn(
            "r_vec", F.row_number().over(Window.orderBy(F.desc("cos_sim"), "id"))
        )
        fused = rrf_fuse(bm, vec, "id", rank_a="r_bm", rank_b="r_vec", topn=k)
        return (
            fused.join(self.table().select("id", "content", "filename"), "id")
            .select("id", "content", "filename", "rrf")
            .orderBy(F.desc("rrf"), "id")
        )
