"""Relational query layer (SURVEY §2.C3-C12) over the driver fixtures.

Each query is a function ``(spark, sf_dir) -> DataFrame`` with a
DuckDB-equivalent oracle SQL string in ``ORACLE`` under the same name;
every computed column is aliased identically on both sides (the
driver's value-hash sorts columns by name).

These queries dual as the performance suite, so each is written the
way it should run at 100 TB:
- dimension tables are broadcast explicitly (`F.broadcast`);
- aggregates go partial->final via ordinary groupBy (map-side combine);
- top-k is orderBy+limit (TakeOrderedAndProject, no global sort);
- money sums are rounded in-query (both sides) so the oracle hash
  can't flip on double summation order at 6-decimal rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.operators.asof import asof_join
from data_ingestion_tool_bakasura__spark.sources.readers import load_table

ORACLE: dict[str, str] = {}


# --- C5 aggregation: TPC-H Q1-style pricing summary -----------------------

def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE["q_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                           AS sum_qty,
       round(sum(l_extendedprice), 2)                                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
       round(avg(l_quantity), 6)                                           AS avg_qty,
       round(avg(l_extendedprice), 6)                                      AS avg_price,
       round(avg(l_discount), 6)                                           AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- C7 top-k: global orderBy+limit ---------------------------------------

def q_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    from data_ingestion_tool_bakasura__spark.operators.topk import global_topk

    o = load_table(spark, sf, "orders")
    projected = o.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total_price"),
        "o_orderstatus",
    )
    return global_topk(projected, [F.desc("total_price"), F.asc("o_orderkey")], 10)


ORACLE["q_top_orders"] = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price, o_orderstatus
FROM orders
ORDER BY total_price DESC, o_orderkey
LIMIT 10
"""


# --- C4 join + C5: TPC-H Q3-style shipping priority -----------------------

def q_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE["q_shipping_priority"] = """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- C4 multi-way join w/ broadcast dims: TPC-H Q5-style ------------------

def q_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    region = load_table(spark, sf, "region")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    sup = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(cust.c_nationkey == sup.s_nationkey)
        .join(dims, sup.s_nationkey == dims.n_nationkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


ORACLE["q_region_revenue"] = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# --- C4 semi/anti joins ----------------------------------------------------

def q_customers_with_orders(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


ORACLE["q_customers_with_orders"] = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """left_anti: customers with no URGENT order (every fixture customer
    has SOME order, so the unrestricted anti-join matched vacuously on
    empty — caught by check_oracle's empty-result warning)."""
    cust = load_table(spark, sf, "customer")
    urgent = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ORACLE["q_customers_without_orders"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# --- C6 window functions ---------------------------------------------------

def q_top3_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    from data_ingestion_tool_bakasura__spark.operators.topk import grouped_topk

    orders = load_table(spark, sf, "orders")
    top3 = grouped_topk(
        orders, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
    )
    return (
        top3.withColumn("rnk", F.col("rnk").cast("bigint"))
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rnk",
        )
        .orderBy("o_custkey", "rnk")
    )


ORACLE["q_top3_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) t
WHERE rnk <= 3 AND o_custkey < 100
ORDER BY o_custkey, rnk
"""


def q_running_revenue(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


ORACLE["q_running_revenue"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS cum_spend
FROM orders
WHERE o_custkey < 50
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def q_order_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """lag/lead: days since a customer's previous order."""
    orders = load_table(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("last_orderkey"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


ORACLE["q_order_gaps"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       datediff('day',
                lag(o_orderdate) OVER w,
                o_orderdate)::INTEGER AS days_since_prev,
       lead(o_orderkey) OVER w AS next_orderkey,
       first_value(o_orderkey) OVER w AS first_orderkey,
       last_value(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_orderkey
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def q_rank_dense_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank over part prices.

    CARDINALITY: the unpartitioned window is the operator under test —
    global ntile/percent_rank semantics REQUIRE a total order, so Spark
    plans a single-partition window (the plan's Exchange SinglePartition
    is inherent, not an accident). At 100 TB this query shape is only
    valid as written when the windowed relation fits one task; the scale
    path is either (a) partition the window (see q_top3_orders_per_
    customer: per-group rank shuffles by key and scales), or (b) global
    APPROXIMATE quantiles via approx_percentile / percentile_approx,
    which aggregates with partial combines instead of sorting. Kept
    as-is because the global-total-order functions themselves are the
    capability being value-checked here.
    """
    part = load_table(spark, sf, "part")
    w = Window.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select(
            "p_partkey",
            "p_brand",
            F.rank().over(w).cast("bigint").alias("price_rank"),
            F.dense_rank().over(w).cast("bigint").alias("price_dense_rank"),
            F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        )
        .filter(F.col("price_rank") <= 50)
        .orderBy("price_rank", "p_partkey")
    )


ORACLE["q_rank_dense_ntile"] = """
SELECT p_partkey, p_brand, price_rank, price_dense_rank, price_quartile, price_pct_rank
FROM (
  SELECT p_partkey, p_brand,
         rank()        OVER w AS price_rank,
         dense_rank()  OVER w AS price_dense_rank,
         ntile(4)      OVER w AS price_quartile,
         round(percent_rank() OVER w, 6) AS price_pct_rank
  FROM part
  WINDOW w AS (ORDER BY p_retailprice DESC, p_partkey)
) t
WHERE price_rank <= 50
ORDER BY price_rank, p_partkey
"""


# --- C5 rollup / cube / grouping sets -------------------------------------

def q_rollup_returns(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ORACLE["q_rollup_returns"] = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


def q_cube_orders(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORACLE["q_cube_orders"] = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS via the SQL layer (C5 + spark.sql entry point)."""
    load_table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS sum_price,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


ORACLE["q_grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


# --- C8 set operations -----------------------------------------------------

def q_nation_setops(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    sup = load_table(spark, sf, "supplier")
    c_n = cust.select(F.col("c_nationkey").alias("nationkey")).distinct()
    s_n = sup.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = c_n.intersect(s_n).withColumn("which", F.lit("both"))
    cust_only = c_n.exceptAll(s_n).withColumn("which", F.lit("customer_only"))
    return both.unionByName(cust_only).orderBy("which", "nationkey")


ORACLE["q_nation_setops"] = """
SELECT nationkey, 'both' AS which
FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier) t
UNION ALL
SELECT nationkey, 'customer_only' AS which
FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey FROM supplier) t
ORDER BY which, nationkey
"""


# --- C9 string functions ---------------------------------------------------

def q_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part").filter(F.col("p_partkey") < 500)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devowel"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.when(F.col("p_name").like("%red%"), 1).otherwise(0).alias("has_red"),
        F.levenshtein(F.lit("STANDARD"), F.col("p_type")).cast("bigint").alias(
            "lev_standard"
        ),
    ).orderBy("p_partkey")


ORACLE["q_string_funcs"] = """
SELECT p_partkey,
       upper(p_name)  AS name_upper,
       lower(p_brand) AS brand_lower,
       length(p_name) AS name_len,
       substr(p_type, 1, 5) AS type_prefix,
       concat_ws('/', p_brand, p_type) AS brand_type,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
       coalesce(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word,
       CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS has_red,
       levenshtein('STANDARD', p_type) AS lev_standard
FROM part
WHERE p_partkey < 500
ORDER BY p_partkey
"""


# --- C10 date/time functions ----------------------------------------------

def q_orders_by_month(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.min(F.date_trunc("day", "o_orderdate")).alias("first_day"),
        )
        .orderBy("order_year", "order_month")
    )


ORACLE["q_orders_by_month"] = """
SELECT year(o_orderdate)::INTEGER AS order_year,
       month(o_orderdate)::INTEGER AS order_month,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       min(date_trunc('day', o_orderdate)) AS first_day
FROM orders
GROUP BY 1, 2
ORDER BY order_year, order_month
"""


# --- C11 math functions ----------------------------------------------------

def q_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow(F.col("l_quantity"), 2), 6).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
    ).orderBy("l_orderkey", "l_linenumber")


ORACLE["q_math_funcs"] = """
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       floor(l_extendedprice)::BIGINT AS price_floor,
       ceil(l_extendedprice)::BIGINT  AS price_ceil,
       abs(l_discount - 0.05) AS disc_dev,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       round(ln(l_extendedprice + 1.0), 6) AS price_ln
FROM lineitem
WHERE l_orderkey < 300
ORDER BY l_orderkey, l_linenumber
"""


# --- C3 case/cast/filter ---------------------------------------------------

def q_price_buckets(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        orders.select(bucket.alias("price_bucket"), "o_totalprice")
        .groupBy("price_bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
        .orderBy("price_bucket")
    )


ORACLE["q_price_buckets"] = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       count(*) AS n_orders,
       round(avg(o_totalprice), 6) AS avg_price
FROM orders
GROUP BY 1
ORDER BY price_bucket
"""


# --- C4 range (non-equi) join ---------------------------------------------

def q_ship_within_30d(spark: SparkSession, sf: str) -> DataFrame:
    """Equi key + range predicate: lineitems shipped within 30 days of
    their order date. Equi key keeps this a hash join (range as
    post-filter), never a nested-loop."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= F.expr("o_orderdate + INTERVAL 30 DAYS"))
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_fast_ships"),
            F.round(F.avg(F.datediff("l_shipdate", "o_orderdate")), 6).alias(
                "avg_lag_days"
            ),
        )
        .orderBy("o_orderstatus")
    )


ORACLE["q_ship_within_30d"] = """
SELECT o_orderstatus, count(*) AS n_fast_ships,
       round(avg(datediff('day', o_orderdate, l_shipdate)), 6) AS avg_lag_days
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- C4 as-of join ---------------------------------------------------------

def q_asof_click_error(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each click event picks up the user's most recent
    error event at-or-before it (union+window, one shuffle)."""
    ev = load_table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, errors, on="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("last_error_ts"),
        F.round("value_asof", 6).alias("last_error_value"),
    ).orderBy("event_id")


ORACLE["q_asof_click_error"] = """
SELECT c.event_id, c.user_id, c.ts,
       (SELECT max(e.ts) FROM events e
         WHERE e.user_id = c.user_id AND e.event_type = 'error' AND e.ts <= c.ts)
         AS last_error_ts,
       (SELECT round(e.value, 6) FROM events e
         WHERE e.user_id = c.user_id AND e.event_type = 'error' AND e.ts <= c.ts
         ORDER BY e.ts DESC LIMIT 1)
         AS last_error_value
FROM events c
WHERE c.event_type = 'click'
ORDER BY c.event_id
"""


# --- scalar subquery / correlated pattern ---------------------------------

def q_orders_above_cust_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Orders above their customer's average (decorrelated via join —
    the scalable plan for a correlated scalar subquery)."""
    orders = load_table(spark, sf, "orders")
    avgs = orders.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("_avg"))
    return (
        orders.join(avgs, on="o_custkey")
        .filter(F.col("o_totalprice") > F.col("_avg") * 1.5)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("_avg", 6).alias("cust_avg"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORACLE["q_orders_above_cust_avg"] = """
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS total_price,
       round(cust_avg, 6) AS cust_avg
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
) t
WHERE o_totalprice > cust_avg * 1.5
ORDER BY o_custkey, o_orderkey
"""


# --- C5 distinct aggregation ----------------------------------------------

def q_distinct_stats(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["q_distinct_stats"] = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- C4/C5 correlated aggregate subquery (TPC-H Q17 shape) ----------------

def q_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Lineitems below 40% of their part's average quantity (TPC-H Q17
    shape). The correlated scalar subquery decorrelates to a window
    average per partkey — NOT an aggregate-plus-self-join, which would
    scan lineitem twice (DataFrame branches share no subtrees). The
    brand filter prunes via broadcast semi-join BEFORE the window (the
    per-part average only needs that part's rows, and brand selects
    whole parts), so the plan is: one pruned fact scan, one shuffle on
    partkey, one global agg."""
    li = load_table(spark, sf, "lineitem")
    brand_parts = (
        load_table(spark, sf, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    pruned = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    w = Window.partitionBy("l_partkey")
    return (
        pruned.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


ORACLE["q_small_quantity_revenue"] = """
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
WHERE l.l_quantity < 0.4 * (
    SELECT avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
"""


# --- C4 EXISTS / NOT EXISTS subqueries (SQL layer) ------------------------

def q_exists_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS / NOT EXISTS through the SQL entry point — Catalyst
    rewrites to semi/anti joins (same plans as q_customers_with_orders,
    proving the SQL layer and the DataFrame layer converge)."""
    from data_ingestion_tool_bakasura__spark.sources.readers import register_fixture_views

    register_fixture_views(spark, sf)
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               count_if(has_order) AS n_with_orders
        FROM (
          SELECT c_mktsegment,
                 EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_order
          FROM customer c
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


ORACLE["q_exists_subquery"] = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       count(*) FILTER (WHERE EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders
FROM customer c
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- C5 exact percentiles --------------------------------------------------

def q_price_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per returnflag (Spark
    ``percentile`` == DuckDB ``quantile_cont``). At 100 TB use
    ``approx_percentile`` (t-digest sketch, mergeable map-side) — exact
    percentile keeps per-group value buffers."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["q_price_percentiles"] = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- C4 multi-EXISTS decorrelation (TPC-H Q21 shape) ----------------------

def q_lone_late_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier order ("late" = shipped >60 days after order date;
    the fixture has no receipt/commit dates). The textbook form is a
    correlated EXISTS + NOT EXISTS pair — the oracle runs exactly that.
    Here both quantifiers decorrelate into ONE per-order aggregate
    (distinct suppliers, distinct late suppliers), then an equi-join
    back: a single shuffle on orderkey replaces two correlated
    re-scans of lineitem, which is the difference between O(orders)
    subquery executions and one pass at 100 TB."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "late", F.col("l_shipdate") > F.date_add("o_orderdate", 60)
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supps"),
    )
    qual = (
        lo.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1))
    )
    return (
        qual.join(F.broadcast(sup), qual.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


ORACLE["q_lone_late_supplier"] = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders o
WHERE s_suppkey = l1.l_suppkey
  AND o.o_orderkey = l1.l_orderkey
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


# --- C4/C5 scalar-subquery argmax (TPC-H Q15 shape) -----------------------

def q_top_revenue_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 shape: the supplier(s) whose 1995-H1 revenue equals the
    maximum over all suppliers. The scalar subquery (global max over a
    derived aggregate) is a whole-frame window max over the per-supplier
    aggregate — a broadcast-join formulation would DUPLICATE the revenue
    subtree (Spark plans no common-subexpression reuse across DataFrame
    branches; measured 4 lineitem scans), while the window computes it
    once: one fact scan, one agg shuffle, one exchange of ~n_suppliers
    16-byte rows to a single partition for the max. Revenue is rounded
    to cents before the max-compare so the equality is engine-stable."""
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-07-01")
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_rev"))
    )
    return (
        # CARDINALITY ASSUMPTION: this whole-frame window runs over the
        # ALREADY-AGGREGATED per-supplier rows (one row per supplier —
        # ~10k at sf1, bounded by the supplier dimension), so the single
        # partition it collapses to holds a dimension's worth of 16-byte
        # rows, not fact data. Do NOT copy this pattern onto an
        # unaggregated input — there it is the single-task scale-killer
        # (see token_budget_select for the distributed alternative).
        rev.withColumn("max_rev", F.max("total_rev").over(Window.partitionBy()))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


ORACLE["q_top_revenue_supplier"] = """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
"""


# --- C4 anti-join + scalar average (TPC-H Q22 shape) ----------------------

def q_rich_inactive_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 shape: customers with above-average (positive) balance with no order
    since 1999, rolled up per market segment. The scalar average is
    a lazy 1-row broadcast; "inactive" is a left_anti join on the keys of recent orders (no NOT IN null traps, no per-row subquery)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") >= "1999-01-01"
    ).select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE["q_rich_inactive_customers"] = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= DATE '1999-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- C4/C5/C10 nation-flow revenue (TPC-H Q7 shape) -----------------------

def q_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 shape: bilateral revenue flow between two nations by ship
    year. Fact scan joins two broadcast dimension chains (supplier->
    nation, orders->customer->nation); the nation-pair filter lands
    after both broadcasts, the date filter is pushed to the scan. One
    agg exchange on (supp_nation, cust_nation, year)."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    pair = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat.withColumnRenamed("n_name", "supp_nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .drop("n_nationkey")
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat.withColumnRenamed("n_name", "cust_nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        pair.filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE["q_volume_shipping"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::INTEGER AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --- C5 conditional-share aggregate (TPC-H Q8 shape) ----------------------

def q_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 shape: NATION_3 suppliers' share of PROMO-part revenue sold to
    ASIA customers, per order year. The share is one conditional
    aggregate (sum(case)/sum), NOT a join of two aggregations — a single
    agg exchange after an all-broadcast dimension chain."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select("p_partkey", "p_type")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
                li.l_partkey == part.p_partkey)
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
        )
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


ORACLE["q_market_share"] = """
SELECT year(o_orderdate)::INTEGER AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY o_year
ORDER BY o_year
"""


# --- C5 profit rollup by nation/year (TPC-H Q9 shape) ---------------------

def q_profit_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Q9 shape adapted to the fixture schema (no partsupp table, so
    supply cost is proxied as 60% of p_retailprice): profit per supplier
    nation per order year over STANDARD-type parts. The p_type filter
    prunes the broadcast part dim BEFORE the fact join."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select("p_partkey", "p_type", "p_retailprice")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    # Exact decimal arithmetic (the q_returned_items lesson, caught at
    # sf0.1 by the full-scale oracle sweep: one nation-year's double
    # sum landed a cent apart between engines on summation order).
    # Decimal sums are order-independent; round, then cast back.
    profit = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        - F.lit("0.6").cast("decimal(18,2)")
        * F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_type") == "STANDARD")),
                li.l_partkey == part.p_partkey)
        .join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE["q_profit_by_nation"] = """
SELECT n_name AS nation, year(o_orderdate)::INTEGER AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      - CAST('0.6' AS DECIMAL(18,2))
                        * CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'STANDARD'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# --- C5 two-level conditional counts (TPC-H Q12 shape) --------------------

def q_ship_delay_classes(spark: SparkSession, sf: str) -> DataFrame:
    """Q12 shape adapted (no l_shipmode column): orders bucketed by
    ship delay (days from order to ship), counting high- vs low-priority
    line items per class. CASE-sum conditional counts — one scan-side
    join + one agg exchange."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    cls = (
        F.when(delay <= 30, "fast")
        .when(delay <= 90, "normal")
        .otherwise("slow")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy(cls.alias("delay_class"))
        .agg(
            F.sum(hi.cast("bigint")).alias("high_line_count"),
            F.sum((~hi).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


ORACLE["q_ship_delay_classes"] = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'normal'
            ELSE 'slow' END AS delay_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
           AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY delay_class
ORDER BY delay_class
"""


# --- C4/C5 left-join count distribution (TPC-H Q13 shape) -----------------

def q_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts INCLUDING
    zero-order customers (left outer join, count of non-null keys, then
    a second aggregation over the counts). Two agg exchanges; the second
    input is one row per customer."""
    cust = load_table(spark, sf, "customer").select("c_custkey")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE["q_order_count_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- C5 conditional-revenue ratio (TPC-H Q14 shape) -----------------------

def q_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 shape: PROMO parts' percentage of revenue in one quarter.
    One conditional aggregate over the date-pruned fact scan with a
    broadcast part dim; single output row."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_pct")
        )
    )


ORACLE["q_promo_revenue"] = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
"""


# --- C5 distinct-count by attributes (TPC-H Q16 shape) --------------------

def q_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Q16 shape adapted (no partsupp table: supplier-part pairs come
    from shipped line items): distinct suppliers per (brand, size band)
    excluding one brand. countDistinct after a broadcast dim join; the
    distinct is the only wide exchange."""
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    return (
        li.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
                )
            ),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


ORACLE["q_supplier_part_counts"] = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# --- C4/C5 group-having semi-join (TPC-H Q18 shape) -----------------------

def q_large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds 300, with their
    customers. ONE lineitem aggregation serves both the HAVING filter
    and the output quantity (the textbook IN-subquery would scan
    lineitem twice — Spark shares no subtrees across DataFrame
    branches); qualifying orders are tiny, so the joins broadcast."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(F.broadcast(orders), big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(20)
    )


ORACLE["q_large_volume_customers"] = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 20
"""


# --- C3 disjunctive pushdown predicates (TPC-H Q19 shape) -----------------

def q_brand_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: revenue under an OR of (brand, size, quantity-band)
    predicate groups. The part-side conjuncts prune the broadcast dim;
    the common l_quantity bounds are scan predicates. Single-row output."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    g1 = (
        (F.col("p_brand") == "Brand#11") & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    g2 = (
        (F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    g3 = (
        (F.col("p_brand") == "Brand#13") & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(g1 | g2 | g3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


ORACLE["q_brand_quantity_revenue"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --- C4 relative-threshold semi-join (TPC-H Q20 shape) --------------------

def q_top_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 shape adapted (no partsupp): suppliers whose 1996 shipped
    quantity of SMALL-type parts exceeds the cross-supplier average.
    The scalar average is a whole-frame window over the per-supplier
    aggregate (dimension cardinality — same bounded pattern as Q15,
    see the cardinality comment there); the final step is a broadcast
    semi-join into the supplier dim."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select("p_partkey", "p_type")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    sq = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(F.broadcast(part.filter(F.col("p_type") == "SMALL")),
              li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    picked = (
        sq.withColumn("avg_qty", F.avg("qty").over(Window.partitionBy()))
        .filter(F.col("qty") > F.col("avg_qty"))
        .select("l_suppkey", "qty")
    )
    return (
        sup.join(F.broadcast(picked), sup.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


ORACLE["q_top_shippers"] = """
WITH sq AS (
  SELECT l_suppkey, round(sum(l_quantity), 2) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL'
    AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM sq WHERE qty > (SELECT avg(qty) FROM sq))
ORDER BY s_suppkey
"""


# --- C3/C5: TPC-H Q6 shape — forecast revenue change ----------------------

def q_revenue_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """Q6 shape: one-row revenue-change forecast over a year of
    discount-band, low-quantity lineitems. The whole query is a scan
    with every predicate pushed to the parquet footers and a single
    partial->final aggregate — the canonical 'filters reach the scan'
    probe (PushedFilters shows the date/discount/quantity range)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        # Decimal sum: a single global sum over ~1% of lineitem is the
        # worst case for double summation-order drift at cent rounding
        # (see q_returned_items); decimal is order-independent.
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ),
                2,
            ).cast("double").alias("forecast_revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


ORACLE["q_revenue_forecast"] = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS forecast_revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --- C4/C6: TPC-H Q2 shape — per-part min-cost supplier -------------------

def q_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 shape (no partsupp fixture, so offers come from lineitem): for
    each small part, the EUROPE supplier with the lowest observed unit
    price. Per-group argmin is a row_number window partitioned by
    partkey — a hash exchange on the group key, never a global sort; the
    supplier/nation/region chain collapses to one broadcast before the
    fact scan, so the only wide ops are that window exchange and the
    final top-100 (TakeOrderedAndProject). Unit price is rounded to 6
    decimals on BOTH sides before ranking, with suppkey as tiebreak, so
    the argmin is engine-stable."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select("p_partkey", "p_size")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    reg = load_table(spark, sf, "region")
    eu_sup = (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg.filter(F.col("r_name") == "EUROPE"),
              nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    offers = (
        li.join(F.broadcast(part.filter(F.col("p_size") <= 15)),
                li.l_partkey == part.p_partkey)
        .join(F.broadcast(eu_sup), li.l_suppkey == F.col("s_suppkey"))
        .select(
            "p_partkey", "s_suppkey", "s_name",
            F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("unit_price"),
        )
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_price", "s_suppkey")
    return (
        offers.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("p_partkey")
        .limit(100)
    )


ORACLE["q_min_cost_supplier"] = """
WITH eu_sup AS (
  SELECT s_suppkey, s_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT p_partkey, s_suppkey, s_name,
         round(l_extendedprice / l_quantity, 6) AS unit_price
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN eu_sup ON l_suppkey = s_suppkey
  WHERE p_size <= 15
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY unit_price, s_suppkey) AS rn
  FROM offers
)
SELECT p_partkey, s_suppkey, s_name, unit_price
FROM ranked WHERE rn = 1
ORDER BY p_partkey LIMIT 100
"""


# --- C5/C7: TPC-H Q10 shape — returned-item lost revenue ------------------

def q_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 shape: top-20 customers by revenue lost to returns in one
    quarter. The 100 TB plan aggregates BEFORE touching any dimension:
    fact-fact join (lineitem R-flag x quarter orders) -> per-customer
    agg -> top-20 via TakeOrderedAndProject -> only then are the 20
    survivor rows broadcast against customer and nation, so the
    dimension joins see 20 rows, not the corpus. Deterministic order:
    revenue desc, custkey asc."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    rev = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1995-01-01")
                & (F.col("o_orderdate") < "1995-04-01")
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_custkey")
        # Exact decimal arithmetic: the per-customer sum lands on .xx5
        # boundaries at sf0.01, where double summation ORDER flips a
        # round-to-cents result between engines. Decimal sums are
        # order-independent; round, then cast back for stable hashing.
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_custkey")
        .limit(20)
    )
    return (
        cust.join(F.broadcast(rev), cust.c_custkey == rev.o_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
    )


ORACLE["q_returned_items"] = """
WITH rev AS (
  SELECT o_custkey,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
              AS DOUBLE) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
  GROUP BY o_custkey
  ORDER BY revenue DESC, o_custkey LIMIT 20
)
SELECT c_custkey, c_name, c_acctbal, n_name, revenue
FROM rev JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
"""


# --- C5: TPC-H Q11 shape — part value concentration -----------------------

def q_part_value_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 shape (lineitem as the value ledger): parts supplied by
    NATION_1 whose shipped value exceeds 0.1% of that nation's total.
    The global threshold is a whole-frame window sum over the ALREADY-
    AGGREGATED per-part rows (one row per part — bounded by the part
    dimension; see q_top_revenue_supplier for the cardinality-assumption
    discipline), which costs one narrow exchange instead of duplicating
    the fact-scan lineage into a scalar-subquery branch."""
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    n1_sup = (
        sup.join(nat.filter(F.col("n_name") == "NATION_1"),
                 sup.s_nationkey == nat.n_nationkey)
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(n1_sup), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("part_value"))
    )
    return (
        per_part.withColumn(
            "_total", F.sum("part_value").over(Window.partitionBy()))
        .filter(F.col("part_value") > 0.001 * F.col("_total"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


ORACLE["q_part_value_concentration"] = """
WITH per_part AS (
  SELECT l_partkey, round(sum(l_extendedprice), 2) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM (SELECT *, sum(part_value) OVER () AS total FROM per_part)
WHERE part_value > 0.001 * total
ORDER BY part_value DESC, l_partkey
"""


QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if name.startswith("q_") and callable(fn)
}
