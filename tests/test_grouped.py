"""Grouped pandas-UDF operators: centroid_per_group semantics and the
dim guard (a wrong `dim` or ragged vectors must fail loudly, not emit a
wrong-length centroid)."""

from __future__ import annotations

import pytest

from data_ingestion_tool_bakasura__spark.operators.grouped import centroid_per_group


def _df(spark, rows):
    return spark.createDataFrame(rows, "label string, embedding array<double>")


def test_centroid_values(spark):
    df = _df(
        spark,
        [
            ("a", [0.0, 2.0]),
            ("a", [2.0, 0.0]),
            ("b", [1.0, 1.0]),
        ],
    )
    got = {r["label"]: (r["centroid"], r["n_members"]) for r in centroid_per_group(df).collect()}
    assert got["a"] == ([1.0, 1.0], 2)
    assert got["b"] == ([1.0, 1.0], 1)


def test_centroid_explicit_dim_matches_inferred(spark):
    df = _df(spark, [("a", [1.0, 2.0, 3.0]), ("a", [3.0, 2.0, 1.0])])
    inferred = centroid_per_group(df).collect()
    explicit = centroid_per_group(df, dim=3).collect()
    assert inferred == explicit


def test_centroid_wrong_dim_raises(spark):
    df = _df(spark, [("a", [1.0, 2.0])])
    with pytest.raises(Exception, match="centroid_per_group"):
        centroid_per_group(df, dim=5).collect()


def test_centroid_ragged_vectors_raise(spark):
    df = _df(spark, [("a", [1.0, 2.0]), ("a", [1.0, 2.0, 3.0])])
    with pytest.raises(Exception, match="centroid_per_group"):
        centroid_per_group(df, dim=2).collect()


def test_geometric_mean_no_positive_values_is_null(spark):
    """ADVICE r01: a group with no positive values must yield NULL (SQL
    exp(avg(ln(x)) FILTER (WHERE x > 0)) semantics), not 0.0."""
    import math

    from pyspark.sql import functions as F

    from data_ingestion_tool_bakasura__spark.operators.grouped import geometric_mean

    df = spark.createDataFrame(
        [("pos", 2.0), ("pos", 8.0), ("neg", -1.0), ("neg", 0.0)],
        "g string, v double",
    )
    got = {r["g"]: r["gm"] for r in df.groupBy("g").agg(geometric_mean("v").alias("gm")).collect()}
    assert got["neg"] is None
    assert math.isclose(got["pos"], 4.0, rel_tol=1e-9)


def test_upsert_conflicting_batch_is_deterministic(spark):
    """ADVICE r01: conflicting rows for one key in a single update batch
    must merge deterministically (lexicographic max over non-key cols)."""
    from data_ingestion_tool_bakasura__spark.operators.upsert import upsert_by_key

    current = spark.createDataFrame([("k1", "old", 1)], "id string, txt string, v int")
    updates = spark.createDataFrame(
        [("k1", "zebra", 5), ("k1", "apple", 9), ("k2", "new", 3)],
        "id string, txt string, v int",
    )
    for _ in range(3):
        rows = {r["id"]: (r["txt"], r["v"]) for r in upsert_by_key(current, updates).collect()}
        assert rows == {"k1": ("zebra", 5), "k2": ("new", 3)}
