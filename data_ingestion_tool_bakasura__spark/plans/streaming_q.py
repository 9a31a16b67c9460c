"""Streaming queries for the driver gate: each runs a REAL Structured
Streaming query (file source -> availableNow -> memory sink) and is
checked against the same DuckDB oracle as its batch twin in
``events_q.py`` — the stream==batch equivalence contract, enforced by
the correctness gate itself.

Complete output mode is used for window aggregations (a bounded replay
must emit every window, including those the final watermark has not
passed); the dedup query uses append mode (its emitted rows are final).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.streaming import windows as SW

ORACLE: dict[str, str] = {}


def q_stream_tumbling_hourly(spark: SparkSession, sf: str) -> DataFrame:
    ev = SW.stream_events(spark, sf)
    out = SW.replay_to_table(SW.tumbling_agg(ev), spark, mode="complete")
    return out.orderBy("window_start", "event_type")


ORACLE["q_stream_tumbling_hourly"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def q_stream_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    ev = SW.stream_events(spark, sf).filter(F.col("user_id") < 30)
    out = SW.replay_to_table(SW.session_agg(ev), spark, mode="complete")
    return out.orderBy("user_id", "session_start")


ORACLE["q_stream_session_windows"] = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WHERE user_id < 30
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 10 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def q_stream_sliding_1h_30m(spark: SparkSession, sf: str) -> DataFrame:
    ev = SW.stream_events(spark, sf)
    out = SW.replay_to_table(SW.sliding_agg(ev), spark, mode="complete")
    return out.orderBy("window_start")


ORACLE["q_stream_sliding_1h_30m"] = """
WITH grid AS (
  SELECT unnest(range(TIMESTAMP '2023-12-31 23:30:00',
                      TIMESTAMP '2024-02-01 00:00:00',
                      INTERVAL 30 MINUTE)) AS window_start
)
SELECT g.window_start, count(*) AS n_events, round(avg(e.value), 6) AS avg_value
FROM events e
JOIN grid g
  ON e.ts >= g.window_start AND e.ts < g.window_start + INTERVAL 60 MINUTE
GROUP BY 1
ORDER BY window_start
"""


def q_stream_dedup_keys(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked stateful dedup; output projected to the key set
    (which physical duplicate survives is replay-order-dependent, the
    key set is exact)."""
    ev = SW.stream_events(spark, sf)
    out = SW.replay_to_table(
        SW.stream_dedup_keys(ev, ["user_id", "event_type"]), spark, mode="append"
    )
    return out.distinct().orderBy("user_id", "event_type")


ORACLE["q_stream_dedup_keys"] = """
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
"""


def q_stream_click_purchase_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream inner join with watermark-bounded state: purchases
    matched to same-user clicks within the previous 30 minutes; append
    mode (stream-stream inner joins emit immutable rows)."""
    joined = SW.stream_stream_join_clicks_purchases(spark, sf)
    out = SW.replay_to_table(joined, spark, mode="append")
    return out.select("user_id", "purchase_id", "click_id").orderBy(
        "user_id", "purchase_id", "click_id"
    )


ORACLE["q_stream_click_purchase_join"] = """
SELECT p.user_id AS user_id, p.event_id AS purchase_id, c.event_id AS click_id
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts <= p.ts
 AND p.ts < c.ts + INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase'
ORDER BY user_id, purchase_id, click_id
"""


def q_stream_enriched_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static enrichment join + streaming aggregation: the events
    stream joined to the static customer dimension (broadcast, stateless
    — no watermark buffering, unlike stream-stream), aggregated per
    (nation, event_type). Oracle is the equivalent batch join."""
    from data_ingestion_tool_bakasura__spark.sources.readers import load_table

    ev = SW.stream_events(spark, sf).withColumnRenamed("user_id", "c_custkey")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    enriched = SW.stream_static_enrich(ev, cust, "c_custkey")
    agg = enriched.groupBy("c_nationkey", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    out = SW.replay_to_table(agg, spark, mode="complete")
    return out.orderBy("c_nationkey", "event_type")


ORACLE["q_stream_enriched_nation"] = """
SELECT c.c_nationkey AS c_nationkey, e.event_type,
       count(*) AS n_events, round(sum(e.value), 2) AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
ORDER BY c_nationkey, event_type
"""


# --- C17/C18: streaming funnel (stateful per-user mins) -------------------

def q_stream_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming twin of q_funnel_conversion: the per-user conditional
    mins run INSIDE the stream (complete-mode aggregation — per-user
    state is one row of three timestamps; at production scale bound the
    key space with a watermarked window or state TTL), and only the
    1-row funnel rollup happens on the replayed result."""
    ev = SW.stream_events(spark, sf)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    out = SW.replay_to_table(per_user, spark, mode="complete")
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    return out.agg(
        F.sum(viewed.cast("bigint")).alias("n_viewed"),
        F.sum(clicked.cast("bigint")).alias("n_clicked_after_view"),
        F.sum(bought.cast("bigint")).alias("n_full_funnel"),
    )


ORACLE["q_stream_funnel"] = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM events GROUP BY user_id
)
SELECT CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
       CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
       CAST(sum(CASE WHEN t_click > t_view AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT)
           AS n_full_funnel
FROM per_user
"""


# --- C17/C18: applyInPandasWithState custom stateful operator -------------

def q_stream_running_stats(spark: SparkSession, sf: str) -> DataFrame:
    """The GroupState surface (streaming/stateful.py running_user_stats,
    applyInPandasWithState) under a value oracle: per-user running
    (count, sum, high-water-mark breaks) with the fold pinned to
    event_id order, replayed availableNow in update mode. The final
    state per user (max_by on the monotone n_events) must equal the
    batch grouped aggregate + running-max window — C17's last
    previously-uncertified corner (r5 verdict #4)."""
    from data_ingestion_tool_bakasura__spark.streaming.stateful import (
        running_user_stats,
    )

    ev = SW.stream_events(spark, sf).filter(F.col("user_id") < 30)
    out = SW.replay_to_table(
        running_user_stats(ev, order_col="event_id"), spark, mode="update"
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.expr("max_by(sum_value, n_events)"), 2).alias("sum_value"),
            F.expr("max_by(n_new_highs, n_events)").alias("n_new_highs"),
        )
        .orderBy("user_id")
    )


ORACLE["q_stream_running_stats"] = """
WITH ranked AS (
  SELECT user_id, value,
         max(value) OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM events WHERE user_id < 30
)
SELECT user_id, count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(sum(CASE WHEN prev_max IS NULL OR value > prev_max THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new_highs
FROM ranked GROUP BY user_id ORDER BY user_id
"""


# --- C13/C17: streaming near-dedup (one-batch replay) ---------------------

def q_stream_near_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """The continuously-deduplicated-corpus pipeline replayed over the
    documents fixture as ONE availableNow micro-batch: survivors are
    every doc not LSH-paired with a smaller-id doc (min-id canonical —
    within a single batch the drop rule is exactly `greatest(pair)`, so
    the oracle is the batch LSH-pairs SQL minus its id_b set). Uses the
    same hash family / banding / bucket cap as q_minhash_lsh_candidates.
    """
    import os
    import tempfile

    from data_ingestion_tool_bakasura__spark.plans.documents_q import (
        _MH_BANDS,
        _MH_HASHES,
    )
    from data_ingestion_tool_bakasura__spark.streaming import pipeline as SP

    src = os.path.join(sf, "documents.parquet")
    # per-run scratch ONLY (mkdtemp): the staging dir the stream reads
    # is private to this invocation — no shared host path, so two
    # concurrent harness processes on one machine cannot couple.
    scratch = tempfile.mkdtemp(prefix="neardedup_q_")
    stage = os.path.join(scratch, "stage")
    os.makedirs(stage)
    os.symlink(src, os.path.join(stage, "documents.parquet"))
    corpus = os.path.join(scratch, "corpus")
    index = os.path.join(scratch, "index")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(stage)
    SP.start_streaming_near_dedup(
        stream,
        corpus,
        index,
        num_hashes=_MH_HASHES,
        bands=_MH_BANDS,
        checkpoint=os.path.join(scratch, "ckpt"),
    ).awaitTermination()
    return spark.read.parquet(corpus).select("doc_id").orderBy("doc_id")


def _near_dedup_oracle() -> str:
    from data_ingestion_tool_bakasura__spark.plans.documents_q import (
        _TOKS,
        _band_keys_sql,
        _mh_sql_exprs,
    )

    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
sh AS (
  SELECT doc_id, list_distinct(
           CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                ELSE [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)]
           END) AS sh
  FROM toks
),
sig AS (
  SELECT doc_id,
       {_mh_sql_exprs()}
  FROM sh
),
keys AS (
{_band_keys_sql()}
),
ok AS (
  SELECT bkey FROM keys GROUP BY bkey HAVING count(*) <= 100
),
kept AS (
  SELECT k.doc_id, k.bkey FROM keys k JOIN ok USING (bkey)
),
drops AS (
  SELECT DISTINCT b.doc_id AS doc_id
  FROM kept a JOIN kept b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM drops)
ORDER BY doc_id
"""


ORACLE["q_stream_near_dedup"] = _near_dedup_oracle()


def q_stream_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming SemDeDup replayed over the embeddings fixture as ONE
    availableNow micro-batch: within a single batch the incremental
    decisions are exactly the batch ``semantic_dedup`` decisions
    (first-seen == lowest id), so the oracle is q_semantic_dedup's SQL
    verbatim — certifying the whole foreachBatch path (assign-once,
    index bootstrap, per-cluster GEMM probe, decision append) at the
    driver, not just in tests."""
    import os
    import tempfile

    from data_ingestion_tool_bakasura__spark.operators.similarity import (
        pick_seed_centroids,
    )
    from data_ingestion_tool_bakasura__spark.streaming import pipeline as SP

    src = os.path.join(sf, "embeddings.parquet")
    # per-run scratch ONLY (mkdtemp) — same no-shared-host-state rule
    # as q_stream_near_dedup above.
    scratch = tempfile.mkdtemp(prefix="semdedup_q_")
    stage = os.path.join(scratch, "stage")
    os.makedirs(stage)
    os.symlink(src, os.path.join(stage, "embeddings.parquet"))
    emb = spark.read.parquet(src)
    cents = pick_seed_centroids(emb, 8)
    schema = emb.schema
    stream = spark.readStream.schema(schema).parquet(stage)
    SP.start_streaming_semantic_dedup(
        stream,
        cents,
        os.path.join(scratch, "decisions"),
        os.path.join(scratch, "index"),
        eps=0.30,
        checkpoint=os.path.join(scratch, "ckpt"),
    ).awaitTermination()
    return (
        spark.read.parquet(os.path.join(scratch, "decisions"))
        .select("vec_id", "c_id", "is_dup", "dup_of", "max_sim")
        .orderBy("vec_id")
    )


# one-batch replay == batch semantics: share q_semantic_dedup's oracle
from data_ingestion_tool_bakasura__spark.plans import vectors_q as _VQ

ORACLE["q_stream_semantic_dedup"] = _VQ.ORACLE["q_semantic_dedup"]


QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if name.startswith("q_") and callable(fn)
}
