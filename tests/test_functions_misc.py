"""Map-function surface (SURVEY §2.C12: map_keys/values & friends) and
unionByName (C8) — value-checked JVM-side expressions."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_map_functions(spark):
    df = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "id int, k string, v int")
    row = (
        df.select(
            "id",
            F.create_map(F.col("k"), F.col("v")).alias("m"),
        )
        .select(
            "id",
            F.map_keys("m").alias("keys"),
            F.map_values("m").alias("vals"),
            F.element_at("m", F.col("keys")[0]).alias("looked_up"),
            F.map_concat("m", F.create_map(F.lit("x"), F.lit(99))).alias("merged"),
        )
        .orderBy("id")
        .collect()
    )
    assert row[0]["keys"] == ["a"] and row[0]["vals"] == [10]
    assert row[0]["looked_up"] == 10
    assert sorted(row[1]["merged"].items()) == [("b", 20), ("x", 99)]


def test_map_from_entries_aggregated(spark):
    df = spark.createDataFrame(
        [("g1", "a", 1), ("g1", "b", 2), ("g2", "c", 3)], "g string, k string, v int"
    )
    got = {
        r["g"]: dict(r["m"])
        for r in df.groupBy("g")
        .agg(F.map_from_entries(F.sort_array(F.collect_list(F.struct("k", "v")))).alias("m"))
        .collect()
    }
    assert got == {"g1": {"a": 1, "b": 2}, "g2": {"c": 3}}


def test_union_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    b = spark.createDataFrame([("y", 2)], "name string, id int")
    got = sorted(map(tuple, a.unionByName(b).collect()))
    assert got == [(1, "x"), (2, "y")]
    # allowMissingColumns fills absent columns with null
    c = spark.createDataFrame([(3,)], "id int")
    got2 = sorted(
        map(tuple, a.unionByName(c, allowMissingColumns=True).collect()),
        key=lambda t: t[0],
    )
    assert got2 == [(1, "x"), (3, None)]
