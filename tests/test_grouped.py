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
