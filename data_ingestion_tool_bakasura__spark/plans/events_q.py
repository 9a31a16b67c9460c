"""Event-stream analytics (SURVEY §2.C17, batch-checkable forms).

Each query here is the BATCH expression of a streaming operator —
tumbling/sliding/session windows, stateful dedup, JSON extraction —
checked against DuckDB. The `streaming/` package runs the same
transformations through Structured Streaming (readStream ->
availableNow) and the test suite asserts stream == batch, which is the
correctness contract Structured Streaming itself guarantees.

Scale notes: windowed aggs shuffle on (window, key) — at 100 TB the
watermark bounds state, and session windows merge in-state rather than
re-sorting history. The batch forms below use the same shuffle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.sources.readers import load_table

ORACLE: dict[str, str] = {}


# --- C17 tumbling window ---------------------------------------------------

def q_tumbling_hourly(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
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
        .orderBy("window_start", "event_type")
    )


ORACLE["q_tumbling_hourly"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


# --- C17 sliding window ----------------------------------------------------

def q_sliding_1h_30m(spark: SparkSession, sf: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
        .orderBy("window_start")
    )


ORACLE["q_sliding_1h_30m"] = """
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


# --- C17 session window ----------------------------------------------------

def q_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    """10-minute-gap sessions per user via F.session_window; session end
    = last event + gap (Spark semantics), reproduced in the oracle with
    the lag/cumsum session-id construction."""
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 30)
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


ORACLE["q_session_windows"] = """
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


# --- C17 stateful dedup (batch form) --------------------------------------

def q_event_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Keep the earliest event per (user_id, event_type) — the batch
    semantics of dropDuplicatesWithinWatermark with an unbounded
    watermark. Deterministic keep rule via min(ts, event_id)."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


ORACLE["q_event_dedup"] = """
SELECT user_id, event_type, event_id, ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) t
WHERE rn = 1
ORDER BY user_id, event_type
"""


# --- C12 JSON extraction ---------------------------------------------------

def q_json_props(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").cast("int").alias("max_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
        )
        .orderBy("event_type")
    )


ORACLE["q_json_props"] = """
SELECT event_type,
       round(avg(json_extract_string(props, '$.k')::INTEGER), 6) AS avg_k,
       max(json_extract_string(props, '$.k')::INTEGER)::INTEGER AS max_k,
       count(CASE WHEN json_extract_string(props, '$.k')::INTEGER > 50 THEN 1 END) AS n_high
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- C5 conditional aggregation (pivot shape) -----------------------------

def q_user_event_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user event-type counts as explicit conditional aggregates
    (the scale-safe pivot: fixed output columns, one shuffle)."""
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 50)
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")  # noqa: E731
    return (
        ev.groupBy("user_id")
        .agg(
            cnt("click"),
            cnt("view"),
            cnt("purchase"),
            cnt("error"),
            cnt("signup"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


ORACLE["q_user_event_matrix"] = """
SELECT user_id,
       count(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
       count(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error,
       count(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
       round(sum(value), 2) AS sum_value
FROM events
WHERE user_id < 50
GROUP BY user_id
ORDER BY user_id
"""


# --- C6 retention-style consecutive-activity windows ----------------------

def q_user_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user activity continuity: distinct active hours + how many
    were immediately consecutive (lag over the per-user hour sequence).
    One shuffle on user_id serving both the distinct and the window."""
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 50)
    hours = ev.select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("h")
    marked = hours.withColumn(
        "consec",
        F.when(
            F.col("h") == F.lag("h").over(w) + F.expr("INTERVAL 1 HOUR"), 1
        ).otherwise(0),
    )
    return (
        marked.groupBy("user_id")
        .agg(
            F.count("*").alias("n_active_hours"),
            F.sum("consec").alias("n_consecutive"),
        )
        .orderBy("user_id")
    )


ORACLE["q_user_retention"] = """
WITH hours AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
  FROM events WHERE user_id < 50
),
marked AS (
  SELECT user_id,
         CASE WHEN h = lag(h) OVER (PARTITION BY user_id ORDER BY h) + INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS consec
  FROM hours
)
SELECT user_id, count(*) AS n_active_hours,
       CAST(sum(consec) AS BIGINT) AS n_consecutive
FROM marked
GROUP BY user_id
ORDER BY user_id
"""


# --- C18 grouped-map + grouped-agg pandas UDFs ----------------------------

def q_value_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """applyInPandas grouped-map: per-event-type z-score of value
    (N rows in, N rows out), SQL-checked via window avg/stddev_pop."""
    from data_ingestion_tool_bakasura__spark.operators.grouped import zscore_within_group

    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    z = zscore_within_group(ev, "event_type", "value")
    return z.select("event_id", "event_type", F.round("zscore", 6).alias("zscore")).orderBy(
        "event_id"
    )


ORACLE["q_value_zscore"] = """
SELECT event_id, event_type,
       round(CASE WHEN stddev_pop(value) OVER w = 0 THEN 0.0
                  ELSE (value - avg(value) OVER w) / stddev_pop(value) OVER w
             END, 6) AS zscore
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY event_type)
ORDER BY event_id
"""


def q_value_zscore_builtin(spark: SparkSession, sf: str) -> DataFrame:
    """Built-in twin of q_value_zscore (avg/stddev_pop over a
    partitionBy window — one shuffle, whole-stage codegen, no Arrow
    hop): the production path for plain per-group z-scores, mirroring
    the q_label_centroids_builtin precedent; the applyInPandas form
    stays as the C18 grouped-map gate (PLANS.md hot-spot note)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("event_type")
    mu = F.avg("value").over(w)
    sd = F.stddev_pop("value").over(w)
    z = F.when(sd == 0, F.lit(0.0)).otherwise((F.col("value") - mu) / sd)
    return ev.select(
        "event_id", "event_type", F.round(z, 6).alias("zscore")
    ).orderBy("event_id")


ORACLE["q_value_zscore_builtin"] = ORACLE["q_value_zscore"]


def q_geomean_by_type(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (geometric mean of positive values) beside
    built-in aggregates in one groupBy."""
    from data_ingestion_tool_bakasura__spark.operators.grouped import geometric_mean

    from data_ingestion_tool_bakasura__spark.operators.grouped import pandas_count

    ev = load_table(spark, sf, "events")
    # GROUPED_AGG pandas UDFs cannot share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT), but two pandas UDFs can — one
    # aggregation, one scan, no join-back of a recomputed subtree.
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(geometric_mean("value"), 6).alias("geo_mean"),
            pandas_count("value").alias("n"),
        )
        .orderBy("event_type")
    )


ORACLE["q_geomean_by_type"] = """
SELECT event_type,
       round(exp(avg(CASE WHEN value > 0 THEN ln(value) END)), 6) AS geo_mean,
       count(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_json_variants(spark: SparkSession, sf: str) -> DataFrame:
    """The three JSON-parse APIs cross-checked on the same field
    (C12): `from_json` (schema-ful struct, the scale path — one parse,
    typed access), `json_tuple` (generator, multi-field single parse),
    `get_json_object` (per-path). Identical sums per event_type prove
    value agreement; the oracle pins them all to DuckDB."""
    ev = load_table(spark, sf, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k_struct"),
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        F.json_tuple("props", "k"),
    ).withColumnRenamed("c0", "k_tuple")
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum("k_struct").alias("sum_struct"),
            F.sum("k_path").alias("sum_path"),
            F.sum(F.col("k_tuple").cast("int")).alias("sum_tuple"),
        )
        .orderBy("event_type")
    )


ORACLE["q_json_variants"] = """
SELECT event_type,
       CAST(sum(json_extract_string(props, '$.k')::INTEGER) AS BIGINT) AS sum_struct,
       CAST(sum(json_extract_string(props, '$.k')::INTEGER) AS BIGINT) AS sum_path,
       CAST(sum(json_extract_string(props, '$.k')::INTEGER) AS BIGINT) AS sum_tuple
FROM events
GROUP BY event_type
ORDER BY event_type
"""


_EVENT_TYPES = ("click", "view", "purchase", "error", "signup")


def q_pivot_daily_value(spark: SparkSession, sf: str) -> DataFrame:
    """The pivot OPERATOR (vs q_user_event_matrix's hand-rolled
    conditional aggregates): daily avg value per event type as columns.
    Pivot values are passed EXPLICITLY — without them Spark runs an
    extra distinct-values job over the whole input and caps cardinality
    at `spark.sql.pivotMaxValues`; with them the pivot compiles to the
    same single-shuffle conditional-aggregate plan as the hand-rolled
    form, which is why it is safe at 100 TB."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.round(F.avg("value"), 6))
        .orderBy("day")
    )


ORACLE["q_pivot_daily_value"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       round(avg(CASE WHEN event_type = 'click'    THEN value END), 6) AS click,
       round(avg(CASE WHEN event_type = 'view'     THEN value END), 6) AS view,
       round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
       round(avg(CASE WHEN event_type = 'error'    THEN value END), 6) AS error,
       round(avg(CASE WHEN event_type = 'signup'   THEN value END), 6) AS signup
FROM events
GROUP BY 1
ORDER BY day
"""


# --- C5/C10: ordered funnel conversion ------------------------------------

def q_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """view -> click -> purchase funnel: a user advances a stage only if
    the next event's FIRST occurrence is strictly after the previous
    stage's first occurrence (min-timestamp monotonicity — the standard
    simplified funnel). ONE aggregation per user (three conditional
    mins from one scan), then a 1-row roll-up; no joins, no windows."""
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    return per_user.agg(
        F.sum(viewed.cast("bigint")).alias("n_viewed"),
        F.sum(clicked.cast("bigint")).alias("n_clicked_after_view"),
        F.sum(bought.cast("bigint")).alias("n_full_funnel"),
    )


ORACLE["q_funnel_conversion"] = """
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


QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if name.startswith("q_") and callable(fn)
}
