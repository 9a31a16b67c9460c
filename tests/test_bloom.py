"""Bloom seen-set (operators/bloom.py): persisted bitmap, incremental
add, no-false-negative contract, FP-safe exact guard, streaming crawl
integration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.operators.bloom import (
    BloomSeenSet,
    bloom_params,
)


def test_params_math():
    m, k = bloom_params(1_000_000, 0.01)
    assert m % 8 == 0 and 9_000_000 < m < 10_500_000  # ~9.6 Mbit
    assert 6 <= k <= 8  # optimum ~7
    m2, _ = bloom_params(10, 0.01)
    assert m2 >= 1024  # floor


def _urls(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("https://ex.com/p/"), F.col("id")).alias("u")
    )


def test_no_false_negatives_and_fp_rate(spark, tmp_path):
    b = BloomSeenSet.create(spark, str(tmp_path / "bl"), n_expected=2000,
                            fpp=0.01)
    n = b.add_df(_urls(spark, 0, 2000), "u")
    assert n == 2000
    # every added key probes maybe=True (the Bloom contract)
    added = b.maybe_contains(_urls(spark, 0, 2000), "u")
    assert added.filter(~F.col("maybe_seen")).count() == 0
    # unseen keys: FP rate near the design point, far below 1
    probe = b.maybe_contains(_urls(spark, 10_000, 14_000), "u")
    fp = probe.filter(F.col("maybe_seen")).count() / 4000
    assert fp < 0.05


def test_persist_roundtrip_and_incremental(spark, tmp_path):
    p = str(tmp_path / "bl")
    b = BloomSeenSet.create(spark, p, n_expected=1000)
    b.add_df(_urls(spark, 0, 500), "u")
    b2 = BloomSeenSet.load(spark, p)
    assert np.array_equal(b.bitmap, b2.bitmap) and b2.n_added == 500
    # wave 2 through the RELOADED handle: old and new keys all present
    b2.add_df(_urls(spark, 500, 800), "u")
    b3 = BloomSeenSet.load(spark, p)
    assert b3.n_added == 800
    assert (
        b3.maybe_contains(_urls(spark, 0, 800), "u")
        .filter(~F.col("maybe_seen")).count() == 0
    )
    # empty add is a no-op, not an error (streaming replay leg)
    b3.add_df(_urls(spark, 0, 0), "u")
    assert b3.n_added == 800


def test_guard_equals_exact_anti_join_under_heavy_fp(spark, tmp_path):
    """A deliberately tiny bitmap (massive FP rate) must still produce
    EXACTLY the anti-join result — false positives only route rows
    through the exact check, never drop them."""
    b = BloomSeenSet.create(spark, str(tmp_path / "bl"), m=1024, k=2)
    corpus = _urls(spark, 0, 300)
    b.add_df(corpus, "u")
    batch = _urls(spark, 200, 600)  # 100 dup, 300 new
    got = sorted(r["u"] for r in b.guard_anti_join(batch, "u", corpus).collect())
    want = sorted(r["u"] for r in batch.join(corpus, "u", "left_anti").collect())
    assert got == want and len(got) == 300
    # sanity: the tiny bitmap really is FP-heavy, so the exact path ran
    probed = b.maybe_contains(_urls(spark, 10_000, 10_200), "u")
    assert probed.filter(F.col("maybe_seen")).count() > 0


def test_torn_bitmap_detected(spark, tmp_path):
    p = str(tmp_path / "bl")
    b = BloomSeenSet.create(spark, p, n_expected=100)
    b.add_df(_urls(spark, 0, 10), "u")
    (tmp_path / "bl" / "bitmap.bin").write_bytes(b"short")
    with pytest.raises(ValueError, match="torn"):
        BloomSeenSet.load(spark, p)


def test_streaming_crawl_seen_bloom(spark, tmp_path):
    """start_streaming_crawl(seen_bloom=True): cross-batch
    first-arrival-wins holds through the bloom guard, and the bloom
    artifact tracks the landed corpus."""
    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc
    from data_ingestion_tool_bakasura__spark.streaming.pipeline import (
        start_streaming_crawl,
    )

    def rec(uri, html, rid):
        body = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode() + html
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\nWARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return head + body + b"\r\n\r\n"

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = start_streaming_crawl(
            read_warc(spark, str(crawl), streaming=True),
            corpus,
            seen_bloom=True,
            checkpoint=ckpt,
        )
        q.awaitTermination(120)

    (crawl / "w1.warc").write_bytes(
        rec("https://a.example.org/p?utm_source=x", b"<p>first copy</p>", "a1")
        + rec("https://a.example.org/p", b"<p>second copy</p>", "a2")
    )
    run_once()
    rows = {r["norm_url"]: r["text"] for r in spark.read.parquet(corpus).collect()}
    assert rows == {"https://a.example.org/p": "first copy"}
    bloom = BloomSeenSet.load(spark, corpus + "_bloom")
    assert bloom.n_added == 1

    (crawl / "w2.warc").write_bytes(
        rec("https://a.example.org/p?utm_medium=y", b"<p>third copy</p>", "b1")
        + rec("https://new.example.org/q", b"<p>fresh page</p>", "b2")
    )
    run_once()
    rows = {r["norm_url"]: r["text"] for r in spark.read.parquet(corpus).collect()}
    assert rows == {
        "https://a.example.org/p": "first copy",  # bloom-blocked re-land
        "https://new.example.org/q": "fresh page",
    }
    # n_added counts add ATTEMPTS incl. the per-stream-start corpus
    # reconciliation (r14-late: the superset repair) — an upper bound
    # on distinct keys, never below them
    assert BloomSeenSet.load(spark, corpus + "_bloom").n_added >= 2


def test_streaming_crawl_bloom_bootstrap_from_corpus(spark, tmp_path):
    """Enabling seen_bloom on an EXISTING corpus bootstraps the bitmap
    from the corpus URLs — the superset invariant holds from the first
    gated batch."""
    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc
    from data_ingestion_tool_bakasura__spark.streaming.pipeline import (
        start_streaming_crawl,
    )

    def rec(uri, html, rid):
        body = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode() + html
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\nWARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return head + body + b"\r\n\r\n"

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    corpus = str(tmp_path / "corpus")

    (crawl / "w1.warc").write_bytes(
        rec("https://a.example.org/p", b"<p>first</p>", "a1")
    )
    q = start_streaming_crawl(
        read_warc(spark, str(crawl), streaming=True), corpus,
        checkpoint=str(tmp_path / "ck1"),
    )  # bloom OFF: corpus exists, no bloom artifact
    q.awaitTermination(120)
    assert not BloomSeenSet.exists(corpus + "_bloom")

    (crawl / "w2.warc").write_bytes(
        rec("https://a.example.org/p", b"<p>dup</p>", "b1")
        + rec("https://b.example.org/q", b"<p>new</p>", "b2")
    )
    q = start_streaming_crawl(
        read_warc(spark, str(crawl), streaming=True), corpus,
        seen_bloom=True, checkpoint=str(tmp_path / "ck2"),
    )
    q.awaitTermination(120)
    rows = {r["norm_url"]: r["text"] for r in spark.read.parquet(corpus).collect()}
    assert rows == {
        "https://a.example.org/p": "first",
        "https://b.example.org/q": "new",
    }
    # n_added counts add ATTEMPTS incl. the per-stream-start corpus
    # reconciliation (r14-late: the superset repair) — an upper bound
    # on distinct keys, never below them
    assert BloomSeenSet.load(spark, corpus + "_bloom").n_added >= 2


def test_streaming_crawl_compact_every(spark, tmp_path):
    """compact_every: after the N-th batch the corpus is rewritten to
    right-sized files with rows preserved exactly."""
    import glob as _glob

    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc
    from data_ingestion_tool_bakasura__spark.streaming.pipeline import (
        start_streaming_crawl,
    )

    def rec(uri, html, rid):
        body = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode() + html
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\nWARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return head + body + b"\r\n\r\n"

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = start_streaming_crawl(
            read_warc(spark, str(crawl), streaming=True), corpus,
            compact_every=1, checkpoint=ckpt,
        )
        q.awaitTermination(120)

    (crawl / "w1.warc").write_bytes(
        rec("https://a.example.org/1", b"<p>one</p>", "a1")
        + rec("https://a.example.org/2", b"<p>two</p>", "a2")
    )
    run_once()  # batch 0: no compaction yet (batch_id 0)
    (crawl / "w2.warc").write_bytes(
        rec("https://a.example.org/3", b"<p>three</p>", "b1")
    )
    run_once()  # batch 1: append then compact
    rows = {r["norm_url"]: r["text"] for r in spark.read.parquet(corpus).collect()}
    assert rows == {
        "https://a.example.org/1": "one",
        "https://a.example.org/2": "two",
        "https://a.example.org/3": "three",
    }
    # compacted to the target layout: one data file
    assert len(_glob.glob(corpus + "/*.parquet")) == 1


def test_guard_with_no_corpus_ignores_bitmap(spark, tmp_path):
    """Crash-replay leg: bitmap saved but the first corpus append never
    landed. With corpus=None the guard must pass the batch UNTOUCHED —
    the bitmap is a cache over the corpus and never out-votes it."""
    b = BloomSeenSet.create(spark, str(tmp_path / "bl"), n_expected=100)
    batch = _urls(spark, 0, 50)
    b.add_df(batch, "u")  # the crashed attempt's bloom write
    got = b.guard_anti_join(batch, "u", None)
    assert got.count() == 50 and "u" in got.columns


def test_stale_bloom_reconciles_from_corpus(spark, tmp_path):
    """r14-late review (the superset-invariant hole): a bitmap STALE
    relative to the corpus — here, a run with seen_bloom OFF landed a
    URL through the plain anti-join — must not re-land that URL when
    the bloom guard comes back on. The stream now reconciles the
    bitmap from the landed corpus at every start (idempotent OR, one
    scan per start), so the superset invariant holds unconditionally.
    A TORN bloom artifact likewise rebuilds + reconciles instead of
    bricking the stream."""
    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc
    from data_ingestion_tool_bakasura__spark.streaming.pipeline import (
        start_streaming_crawl,
    )

    def rec(uri, html, rid):
        body = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode() + html
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\nWARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return head + body + b"\r\n\r\n"

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    corpus = str(tmp_path / "corpus")

    def run(n, bloom):
        q = start_streaming_crawl(
            read_warc(spark, str(crawl), streaming=True), corpus,
            seen_bloom=bloom, checkpoint=str(tmp_path / f"ckpt{n}"),
        )
        q.awaitTermination(120)

    (crawl / "w1.warc").write_bytes(
        rec("https://a.example.org/p", b"<p>alpha</p>", "a1"))
    run(1, True)  # bloom on: lands a, bitmap has a
    (crawl / "w2.warc").write_bytes(
        rec("https://b.example.org/q", b"<p>beta</p>", "b1"))
    run(2, False)  # bloom OFF: lands b via plain anti-join — bitmap stale
    (crawl / "w3.warc").write_bytes(
        rec("https://b.example.org/q", b"<p>RE-LAND of beta</p>", "b2"))
    run(3, True)  # bloom back on: must NOT re-land b
    rows = {r["norm_url"]: r["text"]
            for r in spark.read.parquet(corpus).collect()}
    assert rows == {"https://a.example.org/p": "alpha",
                    "https://b.example.org/q": "beta"}
    # torn artifact: truncate the bitmap; the next start rebuilds and
    # still blocks a re-land
    import os

    bm = os.path.join(corpus + "_bloom", "bitmap.bin")
    with open(bm, "wb") as f:
        f.write(b"\x00")  # size no longer matches meta
    (crawl / "w4.warc").write_bytes(
        rec("https://a.example.org/p", b"<p>RE-LAND of alpha</p>", "a2"))
    run(4, True)
    rows = {r["norm_url"]: r["text"]
            for r in spark.read.parquet(corpus).collect()}
    assert rows == {"https://a.example.org/p": "alpha",
                    "https://b.example.org/q": "beta"}


def test_save_merges_same_meta_but_skips_mismatched_k(spark, tmp_path):
    """save()'s disk merge (the zombie-writer fold) requires the sibling
    meta to agree on m AND k (r15, from the r14 advice): OR-merging a
    same-size bitmap built under a different k and republishing it under
    self's meta would hand the other writer false negatives — inverting
    the superset invariant the merge exists to protect."""
    p = str(tmp_path / "bl")
    a = BloomSeenSet.create(spark, p, m=8192, k=4)
    a.add_df(_urls(spark, 0, 50), "u")  # saves: disk = A's bits, k=4
    # same meta -> a second handle's save FOLDS the disk bits in
    b = BloomSeenSet.create(spark, p, m=8192, k=4)
    b.add_df(_urls(spark, 100, 150), "u")
    merged = BloomSeenSet.load(spark, p)
    both = _urls(spark, 0, 50).union(_urls(spark, 100, 150))
    assert (
        merged.maybe_contains(both, "u")
        .filter(~F.col("maybe_seen")).count() == 0
    )
    # mismatched k, same byte size -> merge SKIPPED: the republished
    # bitmap is exactly the new writer's own bits, nothing folded in
    c = BloomSeenSet.create(spark, p, m=8192, k=7)
    c.add_df(_urls(spark, 500, 510), "u")
    disk = np.fromfile(str(tmp_path / "bl" / "bitmap.bin"), dtype=np.uint8)
    assert np.array_equal(disk, c.bitmap)
    assert not np.array_equal(disk, np.bitwise_or(merged.bitmap, c.bitmap))


def test_load_or_create_warns_on_torn_artifact(spark, tmp_path, caplog):
    """load_or_create's fallback-to-fresh is narrow and LOGGED (r15,
    from the r14 advice): a caller that skips corpus reconciliation
    gets a signal that the superset invariant was reset."""
    import logging

    p = str(tmp_path / "bl")
    b = BloomSeenSet.create(spark, p, n_expected=100)
    b.add_df(_urls(spark, 0, 10), "u")
    (tmp_path / "bl" / "meta.json").write_text("{not json")
    with caplog.at_level(
        logging.WARNING,
        logger="data_ingestion_tool_bakasura__spark.operators.bloom",
    ):
        fresh = BloomSeenSet.load_or_create(spark, p, n_expected=100)
    assert fresh.n_added == 0
    assert any("failed to load" in r.message for r in caplog.records)


def test_orphaned_save_temp_invisible_to_load(spark, tmp_path):
    """r15 hidden-temp audit: a save() killed between mkstemp and
    os.replace leaves a ``._tmp_*`` sibling inside the set's dir; the
    reader addresses meta.json/bitmap.bin by exact name, so the debris
    must never affect load, save, or the probe."""
    p = str(tmp_path / "bl")
    b = BloomSeenSet.create(spark, p, n_expected=100)
    b.add_df(_urls(spark, 0, 10), "u")
    (tmp_path / "bl" / "._tmp_zombie").write_bytes(b"\xff" * 7)
    b2 = BloomSeenSet.load(spark, p)
    assert np.array_equal(b.bitmap, b2.bitmap)
    b2.add_df(_urls(spark, 10, 20), "u")  # save alongside the debris
    assert (
        BloomSeenSet.load(spark, p)
        .maybe_contains(_urls(spark, 0, 20), "u")
        .filter(~F.col("maybe_seen")).count() == 0
    )


def test_load_or_create_tolerates_mistyped_meta_json(spark, tmp_path, caplog):
    """r15 review: meta.json that is VALID JSON but not a well-typed
    dict (a bare null, a list, a string m) raises TypeError inside
    load — which must take the same logged fallback-to-fresh path as
    garbled JSON, never brick the stream."""
    import logging

    p = str(tmp_path / "bl")
    b = BloomSeenSet.create(spark, p, n_expected=100)
    b.add_df(_urls(spark, 0, 10), "u")
    (tmp_path / "bl" / "meta.json").write_text("null")
    with caplog.at_level(
        logging.WARNING,
        logger="data_ingestion_tool_bakasura__spark.operators.bloom",
    ):
        fresh = BloomSeenSet.load_or_create(spark, p, n_expected=100)
    assert fresh.n_added == 0
    assert any("failed to load" in r.message for r in caplog.records)


def test_load_rejects_hostile_meta_values(spark, tmp_path):
    """r17 themed review (both reproduced): (1) meta m=0 with an empty
    bitmap passed the size check, and every probe then died mid-query
    with REMAINDER_BY_ZERO (pmod by m) — a corrupt cache artifact
    bricking the stream instead of triggering the documented
    fallback-to-fresh; (2) a garbled k like 200_000 built that many
    codegen exprs PER PROBE on the driver (~43 s per 10k exprs — a
    quarter-hour wedge before any error). load() now validates the
    untrusted meta shape and raises ValueError, the class
    load_or_create already maps to a logged fresh set."""
    import json

    import pytest

    def plant(name, meta, bitmap):
        p = tmp_path / name
        p.mkdir()
        (p / "meta.json").write_text(json.dumps(meta))
        (p / "bitmap.bin").write_bytes(bitmap)
        return str(p)

    for meta, bitmap in [
        ({"m": 0, "k": 3}, b""),                      # pmod-by-zero
        ({"m": -8192, "k": 3}, b""),                  # negative m
        ({"m": 8193, "k": 3}, b"\x00" * 1024),        # non-byte m
        ({"m": 8192, "k": 200_000}, b"\x00" * 1024),  # driver wedge
        ({"m": 8192, "k": 0}, b"\x00" * 1024),        # degenerate k
        ({"m": True, "k": 3}, b""),                   # bool is not int
    ]:
        path = plant(f"bl_{meta['m']}_{meta['k']}", meta, bitmap)
        with pytest.raises(ValueError, match="corrupt artifact"):
            BloomSeenSet.load(spark, path)
        # ...and the tolerant entry point takes the fresh-set path
        fresh = BloomSeenSet.load_or_create(spark, path, n_expected=100)
        assert fresh.n_added == 0

    # a mistyped n_added is informational: normalized, not rejected
    ok = plant("bl_nadd", {"m": 8192, "k": 3, "n_added": "nan"},
               b"\x00" * 1024)
    assert BloomSeenSet.load(spark, ok).n_added == 0

    # a legit artifact still round-trips bit-for-bit
    p = str(tmp_path / "bl_ok")
    b = BloomSeenSet.create(spark, p, n_expected=100)
    b.add_df(_urls(spark, 0, 10), "u")
    again = BloomSeenSet.load(spark, p)
    assert (again.m, again.k) == (b.m, b.k)
    assert np.array_equal(again.bitmap, b.bitmap)
