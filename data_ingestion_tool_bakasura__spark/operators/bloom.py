"""Persisted Bloom-filter seen-set (C20 crawl curation, scale path).

The streaming crawl's cross-batch URL dedup guard is an anti-join of
each micro-batch against the persisted corpus' ``norm_url`` column —
correct, but at crawl scale that is a corpus-wide scan AND shuffle per
trigger. A Bloom filter over the landed URLs turns the guard into:

1. a map-only membership probe of the batch (definitely-new rows skip
   the corpus entirely — the steady-state majority);
2. an exact check of ONLY the maybe-seen minority, done as a
   broadcast-reversed pair of joins: the (small) maybe set broadcasts
   against one map-only corpus scan, so the corpus is never shuffled.

False positives are SAFE (they just take the exact check); false
negatives would be corruption, so the persisted bitmap must always be
a SUPERSET of the corpus URLs — the crash-ordering contract is
therefore *bloom write BEFORE corpus append*: a crash in between
leaves extra bits (harmless), never missing ones. Replayed batches
see their own URLs as maybe-seen, exact-check against the corpus,
and land exactly once.

Layout on disk: ``<path>/meta.json`` (m bits, k hashes, n_added —
the count of add ATTEMPTS including replays/reconciliation, an upper
bound on distinct keys, not an exact cardinality) +
``<path>/bitmap.bin`` (m/8 bytes), fsync'd and written to a temp
sibling then ``os.replace``d file-by-file (meta last) so readers
never see a torn bitmap; saves MERGE with the on-disk copy so a
concurrent writer's bits are never erased. Sizing: 1e9 URLs at 1% FP
is ~1.2 GiB; the broadcast ships once per executor JVM but each
PYTHON WORKER process unpickles its own copy for the probe — budget
bitmap_size x cores-per-executor of Python-side memory, or cap
worker parallelism for very large bitmaps. ``n_expected`` overflow
degrades the FP rate gracefully (more exact checks), never
correctness.

Hashing: positions are ``xxhash64(value, seed=i) mod m`` computed
JVM-side (codegen) on BOTH the build and the probe path — the only
Python is a vectorized numpy gather over the broadcast bitmap
(build: per-partition numpy bitmaps OR-combined via treeReduce — the
sanctioned per-partition imperative case, like the sketch builds).

The reference's dedup probe is one HTTP search round-trip per chunk
(``db_utils.py:135-146``); this is that idea rebuilt for a corpus that
does not fit a service call.
"""

from __future__ import annotations

import json
import logging
import math
import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bloom_params(n_expected: int, fpp: float = 0.01,
                 max_bits: int = 1 << 33) -> tuple[int, int]:
    """Optimal (m bits, k hashes) for ``n_expected`` keys at ``fpp``.

    m is clamped to ``max_bits`` (1 GiB default) and rounded up to a
    byte boundary; k is clamped to [1, 16].
    """
    n = max(1, n_expected)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(1024, min(m, max_bits))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _positions(col, m: int, k: int) -> list:
    """The k bit positions of a value — pure codegen exprs, shared by
    build and probe so the two paths cannot disagree."""
    c = F.col(col) if isinstance(col, str) else col
    return [F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m)).cast("long")
            for i in range(k)]


class BloomSeenSet:
    """A persisted, incrementally-updatable Bloom seen-set."""

    def __init__(self, spark: SparkSession, path: str, m: int, k: int,
                 bitmap: np.ndarray, n_added: int = 0) -> None:
        self.spark = spark
        self.path = path
        self.m = m
        self.k = k
        self.bitmap = bitmap  # uint8[m/8]
        self.n_added = n_added
        self._bc = None

    # --- persistence ---------------------------------------------------

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, "meta.json"))

    @classmethod
    def create(cls, spark: SparkSession, path: str,
               n_expected: int = 1_000_000, fpp: float = 0.01,
               m: int | None = None, k: int | None = None) -> "BloomSeenSet":
        if m is None or k is None:
            m, k = bloom_params(n_expected, fpp)
        return cls(spark, path, m, k, np.zeros(m // 8, dtype=np.uint8))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BloomSeenSet":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if not isinstance(meta, dict):
            raise ValueError(
                f"bloom meta {path}: not a JSON object — corrupt artifact"
            )
        m, k = meta.get("m"), meta.get("k")
        # validate the UNTRUSTED meta shape BEFORE building anything on
        # it (r17 themed review, both reproduced): m=0 passed the size
        # check against an empty bitmap and every later probe died
        # mid-query with REMAINDER_BY_ZERO — a corrupt CACHE artifact
        # bricking the stream, exactly what load_or_create's fallback
        # exists to absorb; and k is the count of codegen exprs built
        # per probe, so k=200_000 from a garbled meta wedges the DRIVER
        # for ~15 min before any error. Bounds are generous over what
        # this class ever writes (bloom_params: m >= 1024, k <= 16).
        if not isinstance(m, int) or isinstance(m, bool) or m < 64 or m % 8:
            raise ValueError(
                f"bloom meta {path}: invalid m={m!r} — corrupt artifact"
            )
        if not isinstance(k, int) or isinstance(k, bool) or not 1 <= k <= 256:
            raise ValueError(
                f"bloom meta {path}: invalid k={k!r} — corrupt artifact"
            )
        n_added = meta.get("n_added", 0)
        if not isinstance(n_added, int) or isinstance(n_added, bool) or n_added < 0:
            n_added = 0  # informational only; never worth a rebuild
        bitmap = np.fromfile(os.path.join(path, "bitmap.bin"), dtype=np.uint8)
        if bitmap.size != m // 8:
            raise ValueError(
                f"bloom bitmap {path}: {bitmap.size} bytes, meta says "
                f"{m // 8} — torn artifact"
            )
        return cls(spark, path, m, k, bitmap, n_added)

    @classmethod
    def load_or_create(cls, spark: SparkSession, path: str,
                       n_expected: int = 1_000_000,
                       fpp: float = 0.01, **create_kw) -> "BloomSeenSet":
        """Load, falling back to a FRESH set when the artifact is
        corrupt/torn (r14-late review): the bitmap is by contract a
        cache over the corpus, so a detected-torn artifact must
        rebuild-and-reconcile, never brick the stream. Callers that
        need the superset invariant re-add the landed corpus after
        this (idempotent OR) — the streaming crawl does.

        The catch is NARROW (r15, from the r14 advice): only the
        torn-artifact shapes — short/garbled files (ValueError, which
        covers json.JSONDecodeError), missing keys (KeyError),
        mis-typed JSON like a bare ``null`` (TypeError), and IO
        errors (OSError) — fall back to a fresh set, and the fallback
        is LOGGED so a caller that skips corpus reconciliation has a
        signal that the superset invariant was reset. Anything else
        (a programming error, an interrupt) propagates."""
        if cls.exists(path):
            try:
                return cls.load(spark, path)
            except (ValueError, OSError, KeyError, TypeError) as exc:
                # torn/corrupt cache: rebuild below
                logging.getLogger(__name__).warning(
                    "bloom seen-set at %r failed to load (%r); creating "
                    "a fresh set — reconcile it from the landed corpus "
                    "or the superset invariant is lost", path, exc,
                )
        return cls.create(spark, path, n_expected, fpp, **create_kw)

    def save(self) -> None:
        """Atomic per-file replace, bitmap first, meta LAST — a reader
        that sees the new meta always sees a complete bitmap of the
        matching size (and meta.json presence is the existence gate).

        r14-late review hardening: (1) the bitmap MERGES with the
        on-disk copy before replacing it (OR is the set's union), so a
        concurrent/zombie writer's bits are folded in rather than
        erased — best-effort only, the contract is one writer per
        path (one streaming driver); (2) both files fsync before the
        rename and the directory fsyncs after — rename ordering alone
        does not survive power loss on delayed-allocation filesystems,
        and a corpus append outliving the bloom bits would invert the
        superset invariant into silent re-lands."""
        os.makedirs(self.path, exist_ok=True)
        final_bm = os.path.join(self.path, "bitmap.bin")
        if os.path.exists(final_bm):
            try:
                # merge only when the on-disk META agrees on m AND k
                # (r15, from the r14 advice): byte-size equality alone
                # admits a same-m bitmap built under a different k —
                # OR-merging it and republishing under self's meta
                # would hand the OTHER writer false negatives, the
                # exact inversion of the invariant this merge protects.
                # A missing/unreadable sibling meta (torn write) also
                # skips: the documented one-writer contract covers it.
                with open(os.path.join(self.path, "meta.json")) as f:
                    dm = json.load(f)
                if (dm["m"], dm["k"]) == (self.m, self.k):
                    disk = np.fromfile(final_bm, dtype=np.uint8)
                    if disk.size == self.bitmap.size:
                        np.bitwise_or(self.bitmap, disk, out=self.bitmap)
                        self._invalidate()
            except (OSError, ValueError, KeyError, TypeError):
                pass
        for fname, data in (
            ("bitmap.bin", self.bitmap.tobytes()),
            ("meta.json", json.dumps(
                {"m": self.m, "k": self.k, "n_added": self.n_added}
            ).encode()),
        ):
            fd, tmp = tempfile.mkstemp(dir=self.path, prefix="._tmp_")
            with os.fdopen(fd, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(self.path, fname))
        dfd = os.open(self.path, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    # --- build / update ------------------------------------------------

    def add_df(self, df: DataFrame, col: str, save: bool = True) -> int:
        """OR the column's bit positions into the bitmap (and persist).

        Positions are computed JVM-side; each partition folds its rows
        into a local m/8-byte numpy bitmap and the bitmaps OR-combine
        via treeReduce — the driver receives O(log partitions) bitmaps,
        never rows. Returns the number of rows added."""
        m, k, nbytes = self.m, self.k, self.m // 8
        pos = df.select(*_positions(col, m, k)).rdd

        def fold(it):
            # chunked numpy fold (r14-late review): the per-row
            # per-hash Python bit loop dominated bootstrap cost at
            # corpus scale; batching rows into (chunk, k) arrays makes
            # the set-bits a vectorized scatter
            bm = np.zeros(nbytes, dtype=np.uint8)
            n = 0
            chunk: list[tuple] = []

            def flush():
                nonlocal n
                if chunk:
                    arr = np.asarray(chunk, dtype=np.int64)
                    n += arr.shape[0]
                    np.bitwise_or.at(
                        bm, arr >> 3, (1 << (arr & 7)).astype(np.uint8)
                    )
                    chunk.clear()

            for row in it:
                chunk.append(tuple(row))
                if len(chunk) >= 65536:
                    flush()
            flush()
            yield (bm, n)

        def comb(a, b):
            return (np.bitwise_or(a[0], b[0]), a[1] + b[1])

        # treeAggregate, not treeReduce: an empty batch (streaming
        # replay) must fold to the zero bitmap, not raise
        delta, n = pos.mapPartitions(fold).treeAggregate(
            (np.zeros(nbytes, dtype=np.uint8), 0), comb, comb
        )
        np.bitwise_or(self.bitmap, delta, out=self.bitmap)
        self.n_added += n
        self._invalidate()
        if save:
            self.save()
        return n

    # --- probe ---------------------------------------------------------

    def _broadcast(self):
        if self._bc is None:
            self._bc = self.spark.sparkContext.broadcast(self.bitmap)
        return self._bc

    def _invalidate(self) -> None:
        if self._bc is not None:
            self._bc.unpersist()
            self._bc = None

    def maybe_contains(self, df: DataFrame, col: str,
                       out: str = "maybe_seen") -> DataFrame:
        """Append a boolean ``out`` column: False = DEFINITELY not in
        the set; True = maybe (resolve with an exact check). Positions
        are the same codegen exprs as the build; the bitmap ships once
        per executor as a broadcast and the per-row work is a
        vectorized numpy gather in one Arrow batch pass."""
        bc = self._broadcast()

        @F.pandas_udf("boolean")
        def _probe(pos: pd.Series) -> pd.Series:
            bits = bc.value
            if len(pos) == 0:
                return pd.Series([], dtype=bool)
            arr = np.array(pos.tolist(), dtype=np.int64)  # (n, k)
            hit = (bits[arr >> 3] >> (arr & 7).astype(np.uint8)) & 1
            return pd.Series(hit.all(axis=1))

        return df.withColumn(
            out, _probe(F.array(*_positions(col, self.m, self.k)))
        )

    def guard_anti_join(self, batch: DataFrame, col: str,
                        corpus: DataFrame | None) -> DataFrame:
        """The full seen-guard: rows of ``batch`` whose ``col`` is NOT
        in the seen-set, with the corpus consulted only for the
        maybe-seen minority. Plan: map-only bloom probe; the maybe set
        broadcasts into a left-semi against ONE map-only corpus scan
        (the corpus is never shuffled); actually-seen rows (small)
        broadcast back as the anti side.

        With no corpus yet the batch passes UNTOUCHED — the bitmap is
        a cache OVER the corpus and must never out-vote it: after a
        crash between the bloom save and the first corpus append, the
        replayed batch's URLs are all in the bitmap but nothing has
        landed; filtering on the probe alone would drop those rows
        forever."""
        if corpus is None:
            return batch
        probed = self.maybe_contains(batch, col, "_bloom_maybe")
        maybe_keys = probed.filter(F.col("_bloom_maybe")).select(col)
        # no forced broadcast hints (r14-late review): in the steady
        # state the maybe set is tiny and AQE broadcasts it from its
        # RUNTIME size; on the recovery/saturated paths (a replayed
        # batch probes all-maybe, or n_added >> n_expected) it is the
        # whole batch, and a forced broadcast would blow the driver on
        # exactly the recovery path — AQE falls back to a shuffle join
        seen_hit = corpus.select(col).join(maybe_keys, col, "left_semi")
        return probed.join(
            seen_hit, col, "left_anti"
        ).drop("_bloom_maybe")
