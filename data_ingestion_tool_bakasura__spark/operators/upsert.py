"""Key-addressed upsert (A19/B11).

Azure Search upserts by document key (``db_utils.py:54,169``): a
re-upload with the same ``id`` overwrites. Without Delta's MERGE in
this environment, the same semantics compose from set operations:

    merged = updates ∪ (current ⟕anti updates on key)

i.e. every current row whose key is NOT updated survives, every update
row wins. One anti-join + union; the update-key side is broadcast only
when the caller vouches the batch is small (``updates_small``, the
default — incremental batches vs a huge base table), otherwise join
strategy is left to AQE/statistics so a large backfill merge degrades
to a shuffled join instead of OOMing the executors on a forced
broadcast. Writing partitioned-by-key-bucket means unchanged partitions
could be skipped with a real lakehouse format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_by_key(
    current: DataFrame,
    updates: DataFrame,
    key: str = "id",
    order_by: list[str] | None = None,
    updates_small: bool = True,
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

    ``updates_small=False`` drops the broadcast hint on the update-key
    side of the anti-join — pass it for bulk backfills whose key set
    won't fit in driver/executor memory; AQE then picks the join
    strategy from runtime sizes.
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
    upd_keys = upd.select(key)
    if updates_small:
        upd_keys = F.broadcast(upd_keys)
    survivors = current.join(upd_keys, on=key, how="left_anti")
    return survivors.unionByName(upd)
