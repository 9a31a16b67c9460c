"""Training-shard export/import (round 11): WebDataset-style tar
shards — the packaging an LLM training stack consumes (one tar per
shard, one file set per sample, samples read sequentially by the
dataloader).

Layout (WebDataset convention): sample key ``k`` with columns
``{"text": ".txt", "meta": ".json", "image": ".bin"}`` becomes tar
members ``k.txt``, ``k.json``, ``k.bin`` stored CONSECUTIVELY; a shard
holds ``rows_per_shard`` samples and is named
``shard-{partition:05d}-{seq:04d}.tar``.

Scale shape: ``write_tar_shards`` is map-only — each task tars its own
partition's rows into its own files (partition id in the name, so no
two tasks ever collide and no driver coordination exists); sorting
within the partition (and optionally repartitioning by key first)
makes the layout deterministic for a given partitioning.
``read_tar_shards`` is the inverse: a binaryFile scan of ``*.tar`` +
one Arrow pass that walks tar members and reassembles samples. Neither
direction shuffles anything.

The reference has no export surface (it writes to a search index);
this family is from the mandated training-data-pipeline extension
list (training shards for dataloaders).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed mtime so shard bytes are reproducible run-to-run
_EPOCH = 0


def _member(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = _EPOCH
    tar.addfile(info, io.BytesIO(data))


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str = "key",
    columns: dict[str, str] | None = None,
    rows_per_shard: int = 1000,
    sort_within: bool = True,
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``out_dir``; returns
    a small manifest DataFrame (shard, n_samples, n_bytes) — also
    persisted as ``_manifest.json`` in ``out_dir`` for dataloaders
    that want the list without a Spark session.

    ``columns`` maps column name -> member extension (default: every
    non-key column; strings get ``.txt``, binary ``.bin``, everything
    else JSON-encodes to ``.json``). NULL cells skip their member (the
    WebDataset convention for optional fields). Keys are sanitized for
    path safety ('/' -> '_').

    Determinism: with ``sort_within`` (default) each partition's
    samples are tar'd in key order and member bytes use a fixed mtime,
    so a given (partitioning, data) always produces byte-identical
    shards. Repartition by key first if you need a canonical global
    layout.

    ``out_dir`` is written with plain file IO from each task, so it
    must be a filesystem every executor can reach — local mode, NFS,
    or a FUSE-mounted object store. (Tar is not a Hadoop output
    format; on a cluster without a shared mount, write per-executor
    local shards and ship them with your object-store client.)

    Member-name collisions FAIL LOUDLY (r16 trust-boundary review,
    both reproduced): two columns mapped to the same extension, or two
    keys whose sanitized forms collide within one partition (``"a/b"``
    vs ``"a_b"``), would otherwise write duplicate member names — tar
    accepts them, the manifest counts both samples, and the read
    silently merges/drops one. The extension check is driver-side;
    the key check is a per-PARTITION set in the writing task (not
    per-shard: a collision straddling a rows_per_shard cut must not
    escape). Equal keys in DIFFERENT partitions are the caller's
    contract — detecting them would cost a shuffle."""
    if rows_per_shard < 1:
        raise ValueError(f"rows_per_shard must be >= 1, got {rows_per_shard}")
    if columns is None:
        dtypes = dict(df.dtypes)
        columns = {
            c: (".txt" if dtypes[c] == "string"
                else ".bin" if dtypes[c] == "binary" else ".json")
            for c in df.columns if c != key_col
        }
    rev: dict[str, str] = {}
    for c, e in columns.items():
        if e in rev:
            raise ValueError(
                f"columns {rev[e]!r} and {c!r} both map to member "
                f"extension {e!r}: their members would share a name and "
                f"the read would silently merge them"
            )
        rev[e] = c
    os.makedirs(out_dir, exist_ok=True)
    # pre-clean our OWN naming scheme (r14-late review): stale shards
    # from a prior export with a different partitioning / shard size
    # would survive the overwrite and read_tar_shards' glob would
    # silently mix deleted/duplicated samples into the result,
    # disagreeing with _manifest.json. Only shard-*.tar, their hidden
    # attempt temps and the manifest are touched — never foreign files.
    import fnmatch

    for e in os.listdir(out_dir):
        if (fnmatch.fnmatch(e, "shard-*.tar")
                or fnmatch.fnmatch(e, ".shard-*.tar.*.tmp")
                or e in ("_manifest.json", "._manifest.json.tmp")):
            os.remove(os.path.join(out_dir, e))
    cols = [key_col, *columns]
    src = df.select(*cols)
    if sort_within:
        src = src.sortWithinPartitions(key_col)

    ext = dict(columns)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId()
        # per-attempt HIDDEN temp + os.replace (the write_warc
        # discipline, r14-late review): speculative/zombie attempts of
        # the same partition must never truncate or interleave a
        # committed shard, and a crashed task must never leave a
        # truncated tar at a FINAL name where read_tar_shards'
        # 'shard-*.tar' glob would pick it up
        att = tc.taskAttemptId()
        seq = 0
        n = 0
        tar = None
        path = None
        tmp = None
        seen: set[str] = set()
        out: list[tuple[str, int, int]] = []

        def _open():
            nonlocal tar, path, tmp
            name = f"shard-{pid:05d}-{seq:04d}.tar"
            path = os.path.join(out_dir, name)
            tmp = os.path.join(out_dir, f".{name}.{att}.tmp")
            tar = tarfile.open(tmp, "w")
            # ``seen`` is per-PARTITION, not per-shard (r16 fix-chain
            # review): clearing it at each shard cut let a sanitized
            # collision straddling a rows_per_shard boundary through
            # unguarded. Cross-partition equal keys remain the
            # caller's contract (checking them needs a shuffle).

        def _close():
            nonlocal tar, seq, n
            if tar is not None:
                tar.close()
                os.replace(tmp, path)
                out.append((os.path.basename(path), n, os.path.getsize(path)))
                tar = None
                seq += 1
                n = 0

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                r = dict(zip(pdf.columns, row))
                if tar is None:
                    _open()
                key = str(r[key_col]).replace("/", "_")
                # sanitized-collision guard (r16 review, reproduced):
                # a second "a_b" after an "a/b" in the same shard would
                # duplicate every member name — the manifest would
                # count both samples, the read would return one with
                # fields silently mixed between them
                if key in seen:
                    raise ValueError(
                        f"duplicate sample key {key!r} in partition {pid} "
                        f"(two equal keys, or two keys whose '/'->'_' "
                        f"sanitized forms collide): duplicate member "
                        f"names within a shard silently merge on read, "
                        f"and across shards the samples become "
                        f"indistinguishable by key"
                    )
                seen.add(key)
                for c, e in ext.items():
                    v = r[c]
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    if isinstance(v, (bytes, bytearray)):
                        data = bytes(v)
                    elif isinstance(v, str):
                        data = v.encode("utf-8")
                    else:
                        data = json.dumps(
                            v, sort_keys=True,
                            default=lambda o: o.tolist()
                            if hasattr(o, "tolist") else list(o),
                        ).encode()
                    _member(tar, key + e, data)
                n += 1
                if n >= rows_per_shard:
                    _close()
        _close()
        yield pd.DataFrame(out, columns=["shard", "n_samples", "n_bytes"])

    manifest = src.mapInPandas(
        _write, "shard string, n_samples long, n_bytes long"
    )
    rows = manifest.collect()  # O(shards), the export's only action
    # atomic manifest (r14-late review): a crash mid-dump — or a
    # dataloader polling during a re-export — must never observe
    # truncated JSON at the advertised final name
    mtmp = os.path.join(out_dir, "._manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(
            [{"shard": r["shard"], "n_samples": r["n_samples"],
              "n_bytes": r["n_bytes"]} for r in sorted(rows)],
            f, indent=0, sort_keys=True,
        )
    os.replace(mtmp, os.path.join(out_dir, "_manifest.json"))
    return df.sparkSession.createDataFrame(
        rows, "shard string, n_samples long, n_bytes long"
    )


def read_tar_shards(
    spark: SparkSession,
    shard_dir: str,
    extensions: dict[str, str] | None = None,
    glob: str = "shard-*.tar",
) -> DataFrame:
    """Inverse of ``write_tar_shards``: scan ``*.tar`` (binaryFile, one
    task per shard) and reassemble one row per sample key. With
    ``extensions`` (column -> member extension) the columns come back
    typed (``.txt`` utf-8 string, ``.bin`` binary, ``.json`` parsed to
    its JSON string); without it, returns the raw member table
    (shard, key, ext, pos, data) — ``pos`` is the member's ordinal in
    its tar. Map-only.

    Trust-boundary semantics (r16 review — shard tars from other
    producers are untrusted input, like CDX lines): tar permits
    DUPLICATE member names, and WebDataset's contract is last-wins;
    the old ``max(data)`` pick resolved a duplicate by byte
    comparison, so an appended ``k.txt`` could lose to the original
    (reproduced). Typed reassembly now takes the member with the
    highest ``pos`` per (shard, key, ext). Members whose extension is
    not requested — including extensionless foreign files like a
    stray README — are filtered before the pivot, so they can no
    longer materialize phantom all-null samples."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(shard_dir)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("shard"), "content"
        )
    )

    def _untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard, content in zip(pdf["shard"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(content)) as tar:
                    for pos, m in enumerate(tar.getmembers()):
                        if not m.isfile():
                            continue
                        stem, dot, e = m.name.rpartition(".")
                        if not dot:  # extensionless: name is the key
                            stem, e = m.name, ""
                        rows.append(
                            (shard, stem, dot + e, pos,
                             tar.extractfile(m).read())
                        )
            yield pd.DataFrame(
                rows, columns=["shard", "key", "ext", "pos", "data"]
            )

    members = raw.mapInPandas(
        _untar, "shard string, key string, ext string, pos long, data binary"
    )
    if extensions is None:
        return members
    members = members.filter(F.col("ext").isin(list(extensions.values())))
    cols = [
        # last occurrence wins (WebDataset overwrite semantics): the
        # value at the max tar ordinal among this extension's members
        F.max_by(
            F.col("data"), F.when(F.col("ext") == e, F.col("pos"))
        ).alias(c)
        for c, e in extensions.items()
    ]
    wide = members.groupBy("shard", "key").agg(*cols)
    for c, e in extensions.items():
        if e == ".bin":
            continue
        wide = wide.withColumn(c, F.col(c).cast("string"))
    return wide
