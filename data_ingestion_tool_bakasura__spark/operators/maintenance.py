"""Table maintenance (the operational side of A19/C2 at 100 TB).

Streaming ingest (`streaming/pipeline.py`) appends one parquet file set
per micro-batch — after a week of 1-minute batches a table is 10k tiny
files and every scan pays 10k footer reads + tasks. `compact` rewrites
a table to right-sized files; `table_file_stats` measures when it's
needed. With a lakehouse format this is OPTIMIZE/auto-compaction; on
plain parquet it's an atomic rewrite-and-swap (write to _compact_tmp,
then swap) so readers never see a partial table.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024  # match files.maxPartitionBytes


def table_file_stats(spark: SparkSession, path: str) -> dict:
    """File-level health of a parquet table: count, bytes, avg size.

    Only local (``file://`` / bare) paths are supported: sizes come from
    a filesystem stat. A remote path would silently yield zeros — and
    zeros feed ``compact``'s output-file count — so it is an error, not
    a guess. (On a real cluster use the Hadoop FileSystem listing.)
    """
    files = [
        r["file_path"]
        for r in spark.read.parquet(path)
        .select(F.input_file_name().alias("file_path"))
        .distinct()
        .collect()
    ]
    remote = [p for p in files if "://" in p and not p.startswith("file:")]
    if remote:
        raise ValueError(
            f"table_file_stats only stats local paths; got remote files like {remote[0]!r}"
        )
    # sizes via filesystem (input_file_name gives paths; cheap local stat)
    sizes = []
    for p in files:
        local = p.removeprefix("file://")
        if os.path.exists(local):
            sizes.append(os.path.getsize(local))
    total = sum(sizes)
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "avg_bytes": (total // len(sizes)) if sizes else 0,
    }


def recover_swap(path: str) -> None:
    """Restore a table wedged by a crash between ``swap_directory``'s
    two renames (r14-late review): ``path`` missing with the displaced
    copy intact at ``*_swap_old``. Every operation that READS the table
    before swapping (compact, delete_keys, the parquet upsert sink)
    must call this first — recovery logic living only inside
    ``swap_directory`` was unreachable, because the pre-swap read
    failed on the missing path first; worse, the parquet upsert's
    exists-check took the fresh-table branch after such a crash and the
    NEXT swap's entry cleanup then deleted the only full copy."""
    old = path.rstrip("/") + "_swap_old"
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` with right-sized files; returns before/after
    stats. Row content is preserved exactly; only the file layout
    changes.

    Swap discipline: the rewrite lands in ``_compact_tmp``; the swap is
    two renames with a try/except that restores the original directory
    if the second rename fails, and the old copy is deleted only after
    the new path reads back. The swap is near-atomic, not atomic — a
    hard crash between the two renames can leave ``path`` briefly
    missing with data intact in ``_compact_old`` (a true atomic swap
    needs a lakehouse table format or ``renameat2``-style exchange)."""
    recover_swap(path)  # un-wedge a crash between a prior swap's renames
    before = table_file_stats(spark, path)
    df = spark.read.parquet(path)
    n_out = max(1, math.ceil(max(before["total_bytes"], 1) / target_file_bytes))
    tmp = path.rstrip("/") + "_compact_tmp"
    writer = df.repartition(n_out).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    swap_directory(spark, path, tmp)
    after = table_file_stats(spark, path)
    return {"before": before, "after": after, "target_files": n_out}


def swap_directory(spark: SparkSession, path: str, tmp: str) -> None:
    """Replace table directory ``path`` with ``tmp`` (near-atomic swap).

    Two renames with a restore-on-failure guard; the displaced copy is
    deleted only after the new path reads back. A hard crash between
    the renames can leave ``path`` briefly missing with data intact in
    ``*_swap_old`` (a true atomic exchange needs a lakehouse format or
    ``renameat2``). Shared by ``compact`` and the streaming upsert sink.

    Crash recovery: a leftover ``*_swap_old`` from a prior interrupted
    swap is removed at entry — once ``path`` exists again it is by
    contract the live copy and the old directory is superseded, but its
    presence would fail this swap's first rename with ENOTEMPTY and
    wedge all table maintenance until manual cleanup.
    """
    old = path.rstrip("/") + "_swap_old"
    if os.path.exists(old):
        if not os.path.exists(path):
            # crashed between the two renames: the displaced copy is the
            # only copy — restore it rather than deleting data
            os.rename(old, path)
        else:
            shutil.rmtree(old)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # restore: the table must never stay missing
        raise
    # verify the new layout reads before dropping the old copy; on a
    # verify FAILURE put the good copy back live and park the bad bytes
    # at tmp for inspection (r14-late review: leaving the unreadable
    # copy live defeated the very check the verify exists to enforce)
    try:
        spark.read.parquet(path).schema
    except Exception:
        os.rename(path, tmp)
        os.rename(old, path)
        raise
    shutil.rmtree(old)


def write_partitioned(
    df,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout — the 100 TB data-layout story.

    Scans that filter on ``partition_cols`` prune whole directories
    before any I/O (``PartitionFilters`` in the plan; pruned partitions
    cost zero reads — at a 1000-day events table, a one-day query reads
    1/1000th of the files). ``sort_cols`` additionally clusters rows
    inside each partition's files so parquet row-group min/max stats
    prune *within* the partition for secondary predicates.

    The repartition-by-partition-cols before the write is what keeps
    the file count sane: without it every task writes a file into
    every partition directory (tasks x partitions small files); with it
    each partition's rows land in one task. Skewed partitions can be
    split by adding a salt column to the repartition (see
    operators/skew.py).
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*(list(partition_cols) + list(sort_cols)))
    out.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def delete_keys(
    spark: SparkSession,
    path: str,
    keys,
    key_col: str = "id",
    count_rows: bool = False,
) -> dict:
    """Targeted delete (the right-to-be-forgotten / takedown op): remove
    every row whose ``key_col`` is in ``keys`` from the parquet table at
    ``path``, via anti-join rewrite + the shared near-atomic swap.

    ``keys`` is a DataFrame with ``key_col`` (or an iterable of values,
    wrapped here). The delete set is broadcast — takedown lists are
    small against a 100 TB table, and the rewrite is ONE scan + one
    write. Before/after row counts are gated behind ``count_rows``
    (default off): each count is an extra full-table scan, and a 100 TB
    takedown should not pay 3x its cost for a return value. With
    ``count_rows=False`` the counts come back None.

    With a partitioned layout, restricting the rewrite to partitions
    that can contain the keys (filter before ``write_partitioned``)
    turns this into a partial rewrite; on a lakehouse format it would
    be a MERGE DELETE.
    """
    from pyspark.sql import DataFrame

    recover_swap(path)  # un-wedge a crash between a prior swap's renames
    if not isinstance(keys, DataFrame):
        vals = list(keys)
        if not vals:
            return {
                "n_before": spark.read.parquet(path).count() if count_rows else None,
                "n_after": None,
                "n_deleted": 0,
            }
        kind = "string" if isinstance(vals[0], str) else "long"
        keys = spark.createDataFrame([(k,) for k in vals], f"{key_col} {kind}")
    cur = spark.read.parquet(path)
    n_before = cur.count() if count_rows else None
    kept = cur.join(F.broadcast(keys.select(key_col)), on=key_col, how="left_anti")
    tmp = path.rstrip("/") + "_delete_tmp"
    kept.write.mode("overwrite").parquet(tmp)
    swap_directory(spark, path, tmp)
    n_after = spark.read.parquet(path).count() if count_rows else None
    return {
        "n_before": n_before,
        "n_after": n_after,
        "n_deleted": (n_before - n_after) if count_rows else None,
    }


def write_clustered(
    df,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
    mode: str = "overwrite",
) -> None:
    """Stats-clustered parquet write — the plain-parquet analog of
    Delta's OPTIMIZE ZORDER for a single clustering dimension set:
    range-repartition on ``cluster_cols`` (each output file owns a
    contiguous key range) then sort within partitions (each ROW GROUP's
    min/max stats cover a narrow slice). Point/range predicates on the
    cluster columns then skip whole row groups in the parquet reader
    (PushedFilters + footer stats), and file ranges are pairwise
    near-disjoint so a future file-stats-aware reader skips whole
    files. Contrast ``write_partitioned``: directory partitioning
    prunes at PLAN time but needs low-cardinality columns; clustering
    handles high-cardinality keys (timestamps, ids) where a directory
    per value would melt the namenode. The footer-disjointness contract
    is asserted by test_maintenance_properties via pyarrow metadata.

    Scale: one range exchange (samples the key distribution) + local
    sorts — the same cost as a global orderBy write, which is what a
    clustered table IS. Re-cluster after heavy appends with
    ``compact`` + this writer.

    ``n_files`` defaults to size-derived (VERDICT r7 #7): Catalyst's
    ``sizeInBytes`` estimate for the plan divided by
    ``target_file_bytes``, like ``compact``. For the scan-rooted
    frames re-clustering actually operates on, the estimate IS the sum
    of input file sizes; for derived plans it is a heuristic —
    callers with better knowledge pass ``n_files`` explicitly. An
    unknown estimate (Catalyst's Long.Max default) falls back to the
    cluster's default parallelism rather than one-file-per-exabyte."""
    if not cluster_cols:
        raise ValueError("write_clustered: cluster_cols must be non-empty")
    if n_files is None:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if 0 < est < 2**60:
            n_files = max(1, math.ceil(est / target_file_bytes))
        else:
            n_files = df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )
