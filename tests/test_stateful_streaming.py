"""applyInPandasWithState tests: the custom stateful operator's final
state over a bounded replay equals the batch aggregate (count/sum), and
the anomaly counter matches the batch running-max-break count."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.sources.readers import load_table
from data_ingestion_tool_bakasura__spark.streaming import windows as SW
from data_ingestion_tool_bakasura__spark.streaming.stateful import running_user_stats
from tests.conftest import SF_SMOKE


def test_stateful_running_stats_equal_batch(spark):
    stream = SW.stream_events(spark, SF_SMOKE).filter(F.col("user_id") < 25)
    out = SW.replay_to_table(running_user_stats(stream), spark, mode="update")
    # update mode may emit once per micro-batch; the LAST row per user is
    # the final state (single batch under availableNow -> exactly one)
    final = (
        out.withColumn("_rn", F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("n_events"))))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("user_id") < 25)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], round(r["sum_value"], 6)) for r in batch.collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-3


def test_stateful_new_highs_pinned_to_event_id_order(spark):
    """With order_col the high-water-mark counter is a pure function of
    the data: it must equal the batch running-max window in event_id
    order (the q_stream_running_stats oracle contract)."""
    stream = SW.stream_events(spark, SF_SMOKE).filter(F.col("user_id") < 25)
    out = SW.replay_to_table(
        running_user_stats(stream, order_col="event_id"), spark, mode="update"
    )
    final = (
        out.withColumn("_rn", F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("n_events"))))
        .filter(F.col("_rn") == 1)
    )
    got = {r["user_id"]: r["n_new_highs"] for r in final.collect()}
    batch = load_table(spark, SF_SMOKE, "events").filter(F.col("user_id") < 25)
    w = (
        Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max("value").over(w)
    want = {
        r["user_id"]: r["n_new_highs"]
        for r in batch.withColumn(
            "hi", (prev.isNull() | (F.col("value") > prev)).cast("long")
        )
        .groupBy("user_id")
        .agg(F.sum("hi").alias("n_new_highs"))
        .collect()
    }
    assert got == want
