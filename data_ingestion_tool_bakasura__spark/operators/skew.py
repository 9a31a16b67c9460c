"""Skew-handling join utilities (SURVEY §2.C4 scale notes).

AQE's skew-join splitting (on in `session.py`) handles most runtime
skew by splitting oversized shuffle partitions. Salting is the
plan-level fallback for the pathological case AQE can't fix: a single
join KEY so hot that one reducer would own it entirely (AQE splits
partitions, not keys, for aggregations; for joins it needs sortMergeJoin
post-shuffle). The pattern:

    fact side:  key -> (key, salt = pmod(hash(row-unique), S))
    dim side:   replicate each row S times, one per salt value
    join on (key, salt) -> hot key now spreads over S reducers

Replication multiplies the small side by S — use only when the small
side is genuinely small (it usually is: skew means few hot keys), and
prefer isolating the hot keys first (`split_hot_keys`) so only traffic
for hot keys pays the replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, salted ``num_salts``
    ways. Result equals ``fact.join(dim, on, how)`` for inner/left
    joins; the hot key's rows spread across ``num_salts`` reducers."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(num_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("_salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def split_hot_keys(
    fact: DataFrame, on: str, hot_threshold: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Partition ``fact`` into (hot rows, cold rows, hot key list) by
    key frequency. Join cold normally, hot with :func:`salted_join` (or
    broadcast if the dim side allows), union the results — replication
    cost is then paid only for hot-key traffic."""
    counts = fact.groupBy(on).agg(F.count("*").alias("_n"))
    hot_keys = counts.filter(F.col("_n") > hot_threshold).select(on)
    hot = fact.join(F.broadcast(hot_keys), on=on, how="left_semi")
    cold = fact.join(F.broadcast(hot_keys), on=on, how="left_anti")
    return hot, cold, hot_keys
