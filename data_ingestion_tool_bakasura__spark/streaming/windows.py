"""Watermarked window aggregations + stateful dedup over a stream.

Reference parity: the reference has no streaming at all — its
"incremental" path is a human re-running the uploader (``main.py:263``
per-file loop). The driver's ``events`` fixture mandates a real stream
surface (SURVEY §2.C17): these are the streaming forms of the batch
queries in ``plans/events_q.py``; Structured Streaming's contract is
that a streaming query over a bounded input equals the batch query over
the same input, and ``replay_to_table`` makes that contract testable
(availableNow trigger -> memory sink -> compare against the DuckDB
oracle of the batch form).

Scale notes (100 TB/day streams):
- every aggregation is keyed by (window, key): state is bounded by the
  watermark — Spark drops window state once the watermark passes the
  window end, so memory tracks the number of LIVE windows, not stream
  history.
- session windows merge in-state (no re-sort of history); skewed users
  produce skewed state — key-salting does not apply to stateful ops, so
  cap per-key event rates upstream (sample or pre-aggregate in a
  stateless stage) when a key can exceed executor state budgets.
- dedup state is one entry per key within the watermark horizon;
  `dropDuplicatesWithinWatermark` expires entries, unbounded
  `dropDuplicates` does not (only use the latter on finite replays).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events fixture with the same ts normalization
    as the batch reader (nanos-as-long -> timestamp).

    The file-stream source monitors a DIRECTORY; the fixture is a single
    parquet file, so it is staged (symlinked) into a scratch dir — the
    production shape is simply a landing directory that files arrive in.
    """
    import os

    from ..sources.readers import normalize_event_ts

    # Runtime-settable; makes the nanos-ts scan work under any caller
    # session (the batch reader does the same in load_table).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = os.path.join(sf_dir, "events.parquet")
    # per-run staging dir (mkdtemp): no shared host path, so concurrent
    # harness processes on one machine cannot couple through it.
    stage = tempfile.mkdtemp(prefix="bakasura_stream_stage_")
    os.symlink(src, os.path.join(stage, "events.parquet"))

    batch = spark.read.parquet(src)
    sdf = spark.readStream.schema(batch.schema).parquet(stage)
    # ts must land as TIMESTAMP whatever the fixture's parquet logical
    # type is — withWatermark rejects LONG and TIMESTAMP_NTZ alike.
    return normalize_event_ts(sdf)


def tumbling_agg(ev: DataFrame, duration: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count/sum per event_type (streaming form of
    q_tumbling_hourly)."""
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    ev: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window count/avg (streaming form of q_sliding_1h_30m)."""
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


def session_agg(
    ev: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window (gap-based) per-user aggregation — the genuinely
    stateful operator: sessions merge in-state as events arrive."""
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup_keys(ev: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    """First-seen-per-key dedup with watermark-bounded state
    (`dropDuplicatesWithinWatermark`): the streaming form of A18.
    Projects to the key columns — WHICH duplicate survives a replay is
    batch-order-dependent, the key set is not."""
    return (
        ev.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def stream_stream_join_clicks_purchases(
    spark: SparkSession, sf_dir: str, horizon: str = "30 minutes"
) -> DataFrame:
    """Stream-stream inner join: purchases matched to SAME-USER clicks
    in the preceding ``horizon`` (click_ts <= purchase_ts < click_ts +
    horizon). Both sides carry watermarks, so Spark bounds the join
    state: a buffered click can be dropped once the other stream's
    watermark passes click_ts + horizon — without the time-range
    condition the state would grow with the whole stream.
    """
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id", "purchase_ts", "click_ts"
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Stream-static join: enrich a stream with a (small) dimension
    table. The static side is broadcast — each micro-batch probes the
    dim map-side, no shuffle of the stream and NO join state (unlike
    stream-stream joins, the static side is re-resolvable per batch, so
    nothing is buffered against a watermark). The canonical 100 TB/day
    pattern: key the stream once, broadcast the dimension, aggregate
    after."""
    return stream.join(F.broadcast(dim), on, how)


def replay_to_table(
    sdf: DataFrame,
    spark: SparkSession,
    mode: str = "complete",
    name: str | None = None,
    shuffle_partitions: int | None = 4,
) -> DataFrame:
    """Run a bounded streaming query to completion (availableNow) into a
    memory sink and return the result as a batch DataFrame.

    ``complete`` mode emits every window regardless of watermark (right
    for equivalence checks over a finite replay); ``append`` emits only
    watermark-finalized rows (right for dedup, whose sink rows are
    immutable). Memory-sink results are driver-resident — this is a test
    /verification harness, not a production sink (use foreachBatch /
    parquet sinks from `pipeline` for real output paths).

    Every stateful operator keeps one state store per shuffle partition,
    and a state store is not free (provider, snapshot and commit files
    per micro-batch) — a bounded local replay over fixture data wants a
    handful, not the session's batch-sized setting (measured: the
    stream-stream join replay drops ~3x). ``shuffle_partitions``
    temporarily overrides the session conf for the replay, then restores
    it; pass None to keep the session setting (a production stream sizes
    this to its real key cardinality and executor count — the partition
    count is baked into the checkpoint at first start).
    """
    import os

    name = name or f"replay_{uuid.uuid4().hex[:12]}"
    # a bounded replay's checkpoint needs no durability — prefer tmpfs
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_", dir=ckpt_base)
    conf_key = "spark.sql.shuffle.partitions"
    # default-arg form: a bare session with no explicit setting must not
    # raise here (restoring to "200" == restoring Spark's own default)
    saved = spark.conf.get(conf_key, "200")
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(conf_key, saved)
    return spark.table(name)
