"""Key-addressed upsert (A19/B11).

Azure Search upserts by document key (``db_utils.py:54,169``): a
re-upload with the same ``id`` overwrites. The same semantics compose
from set operations:

    merged = updates ∪ (current ⟕anti updates on key)

i.e. every current row whose key is NOT updated survives, every update
row wins. One anti-join + union; the update-key side is broadcast only
when the caller vouches the batch is small (``updates_small``, the
default — incremental batches vs a huge base table), otherwise join
strategy is left to AQE/statistics so a large backfill merge degrades
to a shuffled join instead of OOMing the executors on a forced
broadcast.

**Sink form** (:func:`upsert_into_path`, r6 verdict #7): the parquet
fallback materializes the merged table and near-atomically swaps it in
— a FULL table rewrite per batch, right for dimension/index tables,
the dominant cost of the B11 path at 100 TB. When ``delta-spark`` is
importable and the target is a Delta table, the same call issues a
true ``MERGE INTO`` instead — O(touched files) rewrite + transactional
commit — behind the same import-gated seam pattern as the optional
PDF/OCR/embedding providers (multimodal/extract.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    upd = elect_winners(updates, key=key, order_by=order_by)
    upd_keys = upd.select(key)
    if updates_small:
        upd_keys = F.broadcast(upd_keys)
    survivors = current.join(upd_keys, on=key, how="left_anti")
    return survivors.unionByName(upd)


def elect_winners(
    updates: DataFrame, key: str = "id", order_by: list[str] | None = None
) -> DataFrame:
    """One winning row per key from ``updates`` — the election half of
    :func:`upsert_by_key`, shared with the Delta MERGE path (MERGE
    requires a unique source key: two source rows matching one target
    row is a runtime error, so winners must be elected first either
    way, and sharing the code keeps both engines' semantics identical).
    """
    others = [c for c in updates.columns if c != key]
    if order_by:
        others = list(order_by) + [c for c in others if c not in order_by]
    if not others:
        return updates.dropDuplicates([key])
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc_nulls_last() for c in others]
    )
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _delta_table_or_none(spark: SparkSession, table_path: str):
    """The Delta seam: a DeltaTable handle when delta-spark is importable
    AND ``table_path`` already holds a Delta table, else None. Import
    failure is a normal outcome in this environment (no pip installs),
    exercised by ``test_upsert_seam.py``."""
    try:
        from delta.tables import DeltaTable  # optional dep, import-gated
    except ImportError:
        return None
    try:
        if DeltaTable.isDeltaTable(spark, table_path):
            return DeltaTable.forPath(spark, table_path)
    except Exception:
        return None
    return None


def upsert_into_path(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key: str = "id",
    order_by: list[str] | None = None,
    updates_small: bool = True,
    use_delta: bool | None = None,
) -> str:
    """MERGE ``updates`` into the table at ``table_path`` and return the
    engine used (``"delta"`` or ``"parquet"``) — the sink form of
    :func:`upsert_by_key` with identical winner election on both paths.

    - **Delta path** (``use_delta=None`` auto-detects; ``True``
      requires it): ``MERGE INTO`` via ``whenMatchedUpdateAll`` /
      ``whenNotMatchedInsertAll`` — rewrites only touched files and
      commits transactionally; at 100 TB this is the difference between
      O(batch ∩ files) and O(table) per batch.
    - **Parquet fallback**: read current, :func:`upsert_by_key`,
      materialize to a tmp dir (the plan reads ``table_path`` — writing
      in place would overwrite its own input mid-scan), then
      near-atomic :func:`~.maintenance.swap_directory`.

    First batch (no table yet): winners are written directly on either
    path, so within-batch key conflicts resolve identically.
    """
    import os

    from data_ingestion_tool_bakasura__spark.operators.maintenance import (
        recover_swap,
        swap_directory,
    )

    if use_delta is None or use_delta:
        dt = _delta_table_or_none(spark, table_path)
        if use_delta and dt is None:
            raise ImportError(
                "upsert_into_path(use_delta=True): delta-spark is not "
                "importable in this environment (or the target is not a "
                "Delta table). Install delta-spark and write the table "
                "with format('delta') first, or drop use_delta for the "
                "parquet fallback."
            )
        if dt is not None:
            upd = elect_winners(updates, key=key, order_by=order_by)
            (
                dt.alias("t")
                .merge(upd.alias("u"), f"t.`{key}` = u.`{key}`")
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            return "delta"

    # r14-late review hardening of the parquet leg's crash story:
    # (1) a replay after a crash between swap_directory's two renames
    #     must restore the displaced table FIRST — the exists-check
    #     otherwise takes the fresh-table branch and the NEXT swap's
    #     entry cleanup deletes the only full copy (silent data loss);
    # (2) 'directory exists' is not 'table exists': a crashed first
    #     write leaves only Spark's _temporary dir, which must take the
    #     fresh-write branch (mode=overwrite clears it), not wedge the
    #     read-merge branch on an unreadable directory;
    # (3) swap_directory speaks plain os paths — strip file:// before
    #     handing it the table (the pipeline callers' contract);
    # (4) REFUSE other schemes loudly: on an object store the os-level
    #     exists-check is always False and the fresh-write branch would
    #     overwrite the whole table with one batch, every call. Remote
    #     tables belong on the Delta path.
    if "://" in table_path and not table_path.startswith("file://"):
        raise ValueError(
            f"upsert_into_path parquet leg requires a local or file:// "
            f"path, got {table_path!r}: its crash/replay guards are "
            "driver-local filesystem checks — use delta-spark (the "
            "Delta MERGE path) for object-store tables"
        )
    local = table_path.removeprefix("file://")
    recover_swap(local)
    has_table = os.path.isdir(local) and any(
        not e.startswith(("_", ".")) for e in os.listdir(local)
    )
    if has_table:
        current = spark.read.parquet(table_path)
        merged = upsert_by_key(
            current, updates, key=key, order_by=order_by,
            updates_small=updates_small,
        )
        tmp = local.rstrip("/") + "_upsert_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        swap_directory(spark, local, tmp)
    else:
        elect_winners(updates, key=key, order_by=order_by).write.mode(
            "overwrite"
        ).parquet(table_path)
    return "parquet"
