"""Sketch aggregates (C5 approximate paths): HLL++ distinct counts and
t-digest percentiles checked against their exact counterparts within the
sketch's accuracy contract. These are the 100 TB forms — both are
mergeable map-side (partial aggregation), unlike exact countDistinct
(shuffle-expand) and exact percentile (per-group value buffers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.sources.readers import load_table
from tests.conftest import SF_ORACLE


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    rsd = 0.02
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx"),
    ).first()
    # HLL++ guarantees rsd as a standard deviation; 5 sigma is a safe bound
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 5 * rsd


def test_approx_percentile_within_accuracy(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("exact_p99"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("approx_p99"),
    ).first()
    # accuracy=10000 -> rank error <= n/10000; translate to a loose value bound
    assert abs(row["approx_p50"] - row["exact_p50"]) / row["exact_p50"] < 0.01
    assert abs(row["approx_p99"] - row["exact_p99"]) / row["exact_p99"] < 0.01
