"""Key-addressed upsert (A19/B11).

Azure Search upserts by document key (``db_utils.py:54,169``): a
re-upload with the same ``id`` overwrites. Without Delta's MERGE in
this environment, the same semantics compose from set operations:

    merged = updates ∪ (current ⟕anti updates on key)

i.e. every current row whose key is NOT updated survives, every update
row wins. One anti-join (broadcast when the update batch is small — the
common case: incremental batches vs a huge base table) + union; writing
partitioned-by-key-bucket means unchanged partitions could be skipped
with a real lakehouse format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_by_key(
    current: DataFrame,
    updates: DataFrame,
    key: str = "id",
    order_by: list[str] | None = None,
) -> DataFrame:
    """Return the post-merge state of ``current`` with ``updates`` applied.

    Updates deduped on key first. Last-writer-wins needs an explicit
    order: with ``order_by`` (a CDC version / sequence / event-time
    column list) the kept row is the max under those columns — the
    grouping-insensitive choice, so replaying several batches as one
    micro-batch elects the same winners as applying them one at a time.
    Without it the kept row is the lexicographic max over the remaining
    columns: still deterministic across retries (``dropDuplicates``
    keeps an arbitrary row — that would make conflicting-batch merges
    nondeterministic) but NOT order-aware — concurrent writers or
    checkpoint-loss replays that regroup batches need ``order_by``.
    Remaining columns break ties under ``order_by`` so the result is
    fully deterministic even for duplicate versions.
    """
    others = [c for c in updates.columns if c != key]
    if order_by:
        others = list(order_by) + [c for c in others if c not in order_by]
    if others:
        w = Window.partitionBy(key).orderBy(
            *[F.col(c).desc_nulls_last() for c in others]
        )
        upd = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        upd = updates.dropDuplicates([key])
    survivors = current.join(F.broadcast(upd.select(key)), on=key, how="left_anti")
    return survivors.unionByName(upd)
