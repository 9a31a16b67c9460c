"""Top-k operators (B4/C7).

Global top-k: ``orderBy(...).limit(k)`` — Catalyst plans
TakeOrderedAndProject: each partition keeps a k-heap, the driver merges
P*k rows. No global sort at any scale.

Grouped top-k: row_number over a (group, order) window then filter —
one shuffle on the group key; AQE splits skewed groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def grouped_topk(
    df: DataFrame, group: list[str], order: list[Column], k: int, rank_col: str = "rnk"
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
